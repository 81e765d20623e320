package graft

import org.apache.spark.sql.SparkSession

/** Linearity audit for the q140 ANN refit (r18): times the three
  * lifecycle stages — once-per-life build, drifted-delta merge, and
  * the 2-round rebuild-and-swap — separately on one corpus and prints
  * ONE JSON line. Run against sf0.1 and the tmp/em{10,30,100} embScale
  * replicas: a linear refit shows rebuild_sec scaling ~copies× (each
  * Lloyd round is a k-buffer partial aggregate + a broadcast-k argmax
  * re-route + the corpus-sized version write — all O(n)).
  *
  *   sbt "runMain graft.RebuildScale <sfDir>"
  */
object RebuildScale {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RebuildScale <sfDir>")
    val sfDir = args(0)
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
    val n = Tables.embeddings(spark, sfDir).count() // warm the scan + JIT
    val path = Similarity.refitIndexPathFor(sfDir) + "-scale"
    def timed[T](f: => T): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    val buildSec = timed(Similarity.buildAnnIndex(spark, sfDir, path))
    val mergeSec = timed(Similarity.mergeDeltaIntoIndex(
      Similarity.annDelta(spark, sfDir), path))
    val rebuildSec = timed(Similarity.rebuildAnnIndex(spark, path))
    val reportRows = Similarity.rebuildReport(spark, path).count()
    def f3(v: Double) = math.round(v * 1000) / 1000.0
    println(s"""{"audit":"rebuild_scale","sf":"$sfDir","n":$n,""" +
      s""""build_sec":${f3(buildSec)},"merge_sec":${f3(mergeSec)},""" +
      s""""rebuild_sec":${f3(rebuildSec)},"report_cells":$reportRows}""")
    spark.stop()
  }
}
