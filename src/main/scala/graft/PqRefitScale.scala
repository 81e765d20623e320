package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Linearity audit for the q150 PQ refit (r19c — the RebuildScale
  * discipline at compressed grain): times the lifecycle stages — the
  * once-per-life build (carries the PQ fit + the distortion-stat pass),
  * a frozen-codebook merge, the distortion report (the decay pass the
  * auto-refit prices once per population doubling), and the
  * refit-and-swap — separately on one corpus and prints ONE JSON line.
  * Run against sf0.1 and the tmp/em{10,30,100} embScale replicas: a
  * linear refit shows refit_sec scaling ~copies× (the fit's k-means
  * iterations collect k·m codebook rows only; the re-encode and the
  * stat re-price are the corpus-sized terms — both O(n)).
  *
  *   sbt "runMain graft.PqRefitScale <sfDir>"
  */
object PqRefitScale {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PqRefitScale <sfDir>")
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
    val path = Similarity.pqIndexPathFor(sfDir) + "-refitscale"
    def timed[T](f: => T): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    val buildSec = timed(Similarity.buildPqIndex(spark, sfDir, path))
    val mergeSec = timed(Similarity.mergePqBatchIntoIndex(
      Similarity.annDelta(spark, sfDir).filter(col("vec_id") < 200000L)
        .selectExpr("vec_id + 200000 as vec_id", "embedding"),
      path))
    val reportSec = timed(
      Similarity.pqIndexDistortionReport(spark, path).collect())
    val refitSec = timed(Similarity.rebuildPqIndex(spark, path))
    def f3(v: Double) = math.round(v * 1000) / 1000.0
    println(s"""{"audit":"pq_refit_scale","sf":"$sfDir","n":$n,""" +
      s""""build_sec":${f3(buildSec)},"merge_sec":${f3(mergeSec)},""" +
      s""""report_sec":${f3(reportSec)},"refit_sec":${f3(refitSec)}}""")
    spark.stop()
  }
}
