package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for the nonlinearity smoke (SURVEY §8): replicates
  * the driver's sf0.1 tables `copies`× with key offsets so per-query
  * sf-ratio checks can catch super-linear cliffs the single-SF bench
  * cannot see.
  *
  * `runMain graft.ScaleUp <srcSfDir> <dstDir> [copies=10]`
  *
  * Replication is NOT naive duplication — naive copies would be exact
  * near-duplicates of each other, turning the dedup queries into an
  * intentionally quadratic workload and making their ratios meaningless
  * as a LINEARITY check:
  *  - documents: copy k>0 suffixes every token with `_c<k>`, so every
  *    word-3-gram shingle of a copy contains the copy tag — cross-copy
  *    shingle sets are disjoint, within-copy structure (and the q23
  *    planted twin relation) is preserved, and near-dup work scales
  *    linearly in copies;
  *  - events: ids offset per copy, timestamps shifted by k·35 days —
  *    group/window sizes stay constant, group count grows 10×;
  *  - lineitem: order keys offset per copy (q01 aggregates are
  *    replication-insensitive; the offset keeps keys unique for joins);
  *  - dimension tables and embeddings are copied verbatim (the ANN
  *    queries probe fixed-size codebooks; scaling them is a different
  *    experiment than the corpus-scaling smoke).
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleUp <srcSfDir> <dstDir> [copies]")
    val (src, dst) = (args(0), args(1))
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")

    def replicate(t: String, copy: (DataFrame, Int) => DataFrame): Unit = {
      val base = read(t)
      write((0 until copies).map(k => copy(base, k)).reduce(_ unionAll _), t)
    }

    // `mediaScale` additionally CIRCULAR-SHIFTS each copy's text by
    // k·41 chars: the token-suffix replication preserves the byte-level
    // GRADIENT structure the perceptual hashes key on (every copy of a
    // doc is a genuine media near-dup of every other — a quadratic
    // TRUE-pair corpus no banding scheme can or should thin), so media
    // linearity audits need copies whose box-filter cells sample
    // different text regions. The shift decorrelates cross-copy cell
    // sums while each copy's planted twin relation (value-level
    // perturbation of the copy's own bytes) is untouched.
    val mediaScale = args.length > 3 && args(3) == "mediaScale"
    replicate("documents", (d, k) =>
      if (k == 0) d
      else {
        val suffixed = d.selectExpr(
          s"doc_id + ${k * 100000L}L as doc_id",
          s"array_join(transform(split(text, ' '), w -> concat(w, '_c$k')), ' ') as text",
          "lang", "source")
        val shifted =
          if (!mediaScale) suffixed
          else suffixed.selectExpr("doc_id",
            s"concat(substr(text, (${k * 41} % length(text)) + 1), " +
              s"substr(text, 1, ${k * 41} % length(text))) as text",
            "lang", "source")
        shifted.withColumn("n_chars", length(col("text")).cast("long"))
      })

    // ts shipped as INT64 nanos through round 10, TIMESTAMP(MICROS) from
    // round 11 — shift by +k·35 days in whichever unit the file carries
    val tsShift: Int => String = {
      val isLong = read("events").schema("ts").dataType ==
        org.apache.spark.sql.types.LongType
      k => if (isLong) s"ts + ${k * 35L * 86400L * 1000000000L}L as ts"
           else s"timestampadd(DAY, ${k * 35}, ts) as ts"
    }
    replicate("events", (e, k) =>
      if (k == 0) e
      else e.selectExpr(
        s"event_id + ${k * 1000000L}L as event_id",
        tsShift(k),
        s"user_id + ${k * 100000L}L as user_id",
        "event_type", "value", "props"))

    replicate("lineitem", (l, k) =>
      if (k == 0) l
      else l.withColumn("l_orderkey", col("l_orderkey") + lit(k * 100000000L)))

    // embeddings are copied verbatim by default (the ANN queries probe
    // fixed-size codebooks — scaling them is a different experiment).
    // `embScale` opts in for the q28/q75 linearity audits: vec_ids offset
    // per copy, labels kept, and each copy's vectors CIRCULAR-SHIFTED by
    // k — preserves the norm/coordinate distribution while decorrelating
    // copies from their base (autocorrelation of i.i.d. coordinates at
    // lag k ≈ 0), so the within-cell duplicate structure stays constant
    // per copy and pair work scales linearly, not quadratically.
    val embScale = args.length > 3 && args(3) == "embScale"
    if (embScale)
      replicate("embeddings", (e, k) =>
        if (k == 0) e
        else e.selectExpr(
          s"vec_id + ${k * 100000L}L as vec_id",
          s"concat(slice(embedding, ${k % 64 + 1}, ${64 - k % 64}), " +
            s"slice(embedding, 1, ${k % 64})) as embedding",
          "label"))
    val verbatim = Seq("region", "nation", "customer", "supplier", "part",
      "orders") ++ (if (embScale) Nil else Seq("embeddings"))
    verbatim.foreach(t => write(read(t), t))
    println(s"[scaleup] wrote ${copies}x of $src to $dst (embScale=$embScale)")
    spark.stop()
  }
}
