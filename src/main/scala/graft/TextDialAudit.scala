package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The TEXT plane-dial crossing audit (r18, VERDICT r17 #6): the media
  * band dial was measured through its crossing on all three modalities
  * in r17 (volume collapse + absolute wall DROP on more data); this is
  * the text twin. The em replicas only ever showed the smaller depths
  * meeting budget — here a replica large enough to move the dial (em100,
  * 200k vectors) runs the q118 kNN-graph pair stage twice in one
  * process:
  *
  *  - at a FROZEN depth (default 15 — what em30 dialed; the depth a
  *    build-time-frozen statistic would keep serving as the corpus
  *    grows), seeded into the standing-statistic cache exactly as a
  *    stale artifact would present it;
  *  - at the depth the CURRENT corpus prices (the dial's own answer).
  *
  * Prints ONE JSON line: the measured pair volume per row at both
  * depths (the dial's own probe aggregate, reported instead of just
  * compared) and both min-of-3 walls. The crossing claim checks out
  * when pairs/row collapses frozen→dialed and the wall DROPS at the
  * deeper depth on the same data.
  *
  *   sbt "runMain graft.TextDialAudit <sfDir> [frozenDepth=15]"
  */
object TextDialAudit {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TextDialAudit <sfDir> [frozenDepth]")
    val sfDir = args(0)
    val frozen = if (args.length > 1) args(1).toInt else 15
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Similarity.withFns(spark)
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    // the dial's own probe, reported per depth: one depth-40 bucket scan,
    // one two-level aggregate (the adaptivePlanesFor sweep)
    val vols = emb
      .selectExpr(s"${Similarity.bucketExpr("embedding", Similarity.PlanesCeil)} as b40")
      .selectExpr(s"explode(sequence(${Similarity.PlanesFloor}, ${Similarity.PlanesCeil})) as p", "b40")
      .selectExpr("p", "b40 & (shiftleft(1L, p) - 1L) as b")
      .groupBy("p", "b").agg(count(lit(1)).as("bn"))
      .groupBy("p").agg(sum(expr("(bn * (bn - 1)) div 2")).as("pairs"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val dialed = Similarity.adaptivePlanesFor(emb, "embedding")
    // seed the standing-statistic cache the way a stale (or fresh) dial
    // artifact would present it — the exact file cachedPlanes reads
    def seed(p: Int): Unit = {
      val path = java.nio.file.Paths.get(ScratchPaths.indexPathFor(
        s"planes-base-${ScratchPaths.tableFingerprint(sfDir, "embeddings")}", sfDir))
      java.nio.file.Files.deleteIfExists(path)
      java.nio.file.Files.write(path, p.toString.getBytes("UTF-8")): Unit
    }
    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def timeQ118(p: Int): Double = {
      seed(p)
      (1 to 3).map { _ =>
        clear()
        val t0 = System.nanoTime()
        Similarity.knnGraph(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    val wallFrozen = timeQ118(frozen)
    val wallDialed = timeQ118(dialed)
    def f3(v: Double) = math.round(v * 1000) / 1000.0
    def ppr(p: Int) = f3(vols.getOrElse(p, 0L).toDouble / n)
    println(s"""{"audit":"text_dial","sf":"$sfDir","n":$n,""" +
      s""""frozen":$frozen,"dialed":$dialed,""" +
      s""""pairs_per_row_frozen":${ppr(frozen)},"pairs_per_row_dialed":${ppr(dialed)},""" +
      s""""wall_frozen_sec":${f3(wallFrozen)},"wall_dialed_sec":${f3(wallDialed)}}""")
    spark.stop()
  }
}
