package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Replica-scale audit for the adaptive perceptual-hash band dial
  * (VERDICT r16 #1): per media family, the dialed width, the measured
  * same-key pair volume at that width (pairs/doc — the quantity the
  * dial budgets), the production query's wall, and planted-twin recall.
  * Run against sf0.1 and its mediaScale replicas:
  *
  *   runMain graft.ScaleUp /root/testdata/sf0.1 tmp/me10 10 mediaScale
  *   runMain graft.MediaAudit /root/testdata/sf0.1
  *   runMain graft.MediaAudit tmp/me10
  *
  * Prints one JSON line per family — the BENCH_NOTES_r17 table rows.
  * Linearity claim under audit: pairs/doc ~flat and twin recall 100%
  * across the replica steps, at whatever width the volume dial picks.
  */
object MediaAudit {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: MediaAudit <sfDir>")
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // twins within the exact verify bar, computed WITHOUT banding — the
    // recall denominator that isolates banding loss from bar exits (a
    // twin beyond Hamming 6 is "not a near-dup" by the operator's own
    // definition, identically in both engines)
    def hamEligible(h: DataFrame): Long = {
      val a = h.select(col("doc_id"), col("v"))
      a.alias("x").join(a.alias("y"), expr("y.doc_id = x.doc_id + 10000"))
        .selectExpr("""aggregate(zip_with(x.v, y.v,
          |  (p, q) -> bit_count(cast(p as bigint) ^ cast(q as bigint))),
          |  cast(0 as bigint), (acc, z) -> acc + z) as ham"""
          .stripMargin.replace("\n", " "))
        .filter("ham <= 6").count()
    }
    def frameEligible(h: DataFrame): Long = {
      val a = h.select(col("doc_id"), col("v"))
      a.alias("x").join(a.alias("y"), expr("y.doc_id = x.doc_id + 10000"))
        .selectExpr("""size(filter(sequence(0, 2), f ->
          |  aggregate(transform(sequence(0, 3), b ->
          |    bit_count(cast(element_at(x.v, f * 4 + b + 1) as bigint)
          |      ^ cast(element_at(y.v, f * 4 + b + 1) as bigint))),
          |    cast(0 as bigint), (a2, z) -> a2 + z) <= 6)) as mf"""
          .stripMargin.replace("\n", " "))
        .filter("mf >= 2").count()
    }

    def audit(tag: String, hashes: DataFrame, bpd: Int,
              query: => DataFrame, eligible: DataFrame => Long,
              plantedTwins: Long): Unit = {
      val h = hashes.persist()
      val docs = h.count() // base + planted twins
      val t0 = System.nanoTime()
      val width = MediaOps.cachedBandWidth(tag, dir, h, bpd)
      val probeS = (System.nanoTime() - t0) / 1e9
      val vol = h
        .selectExpr("doc_id",
          s"posexplode(transform(bk, x -> substring(x, 1, $width))) as (band_idx, band_hash)")
        .groupBy("band_idx", "band_hash").agg(count(lit(1)).as("bn"))
        .agg(sum(expr("(bn * (bn - 1)) div 2")).as("pairs"))
        .collect()(0)
      val pairs = if (vol.isNullAt(0)) 0L else vol.getLong(0)
      val elig = eligible(h)
      val t1 = System.nanoTime()
      val out = query.persist()
      val nOut = out.count()
      val wallS = (System.nanoTime() - t1) / 1e9
      val twins = out.filter(col("is_twin")).count()
      out.unpersist()
      h.unpersist()
      println(f"""{"family":"$tag","dir":"$dir","docs":$docs,"width":$width,""" +
        f""""pairs":$pairs,"pairs_per_doc":${pairs.toDouble / math.max(docs, 1)}%.1f,""" +
        f""""probe_s":$probeS%.2f,"wall_s":$wallS%.2f,"out_pairs":$nOut,""" +
        f""""band_recall":"$twins/$elig","bar_exits":${plantedTwins - elig}}""")
    }

    val corpus = MediaOps.mediaCorpus(spark, dir)
    def expected(mime: String, minLen: Int): Long =
      corpus.filter(col("mime") === mime && length(col("media")) >= minLen).count()

    audit("q107", MediaOps.imageHashes(spark, dir), 4,
      MediaOps.imageDedup(spark, dir), hamEligible, expected("image/png", 72))
    audit("q113", MediaOps.audioFingerprints(spark, dir), 4,
      MediaOps.audioDedup(spark, dir), hamEligible, expected("audio/wav", 85))
    audit("q111", MediaOps.videoFrameHashes(spark, dir), 12,
      MediaOps.videoDedup(spark, dir), frameEligible, expected("video/mp4", 216))
    spark.stop()
  }
}
