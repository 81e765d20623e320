package graft
// In-JVM variance prober for the bench-ledger stability items (r7 verdict:
// q38 min 0.454 / median 1.646, q21 0.178 / 0.706 within ONE process on
// flat calibration — a 4-6x spread the suite-bracketing cal scalars cannot
// see). Times one query N times in a row with a forced-GC + settle-job
// quiescence window between runs, and records the per-run JVM GC time and
// count deltas, so a slow run can be ATTRIBUTED (GC pause vs scheduler vs
// genuinely bimodal plan) instead of eyeballed.
// Run: SPARK_GRAFT_VAR_ONLY=q38_ivf_search,q21_fingerprint \
//      SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Variance"
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

object Variance {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_VAR_ITERS", "8").toInt
    val names = sys.env.getOrElse("SPARK_GRAFT_VAR_ONLY",
      "q38_ivf_search,q21_fingerprint")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def gcStats(): (Long, Long) = {
      val beans = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.asScala
      (beans.map(_.getCollectionCount).sum, beans.map(_.getCollectionTime).sum)
    }
    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.sparkContext.parallelize(Seq(1), 1).count()
    }
    // quiescence: force a full GC OUTSIDE the timed window so a pending
    // old-gen collection cannot land inside the next run's timer — the
    // bench deliberately does NOT do this (it measures steady-state cost
    // including amortized GC); here the point is attribution.
    def quiesce(): Unit = { System.gc(); Thread.sleep(100L) }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm-up (JIT + codegen + footers), untimed
      fn(spark, d).write.format("noop").mode("overwrite").save(); clear()
      val rows = (1 to iters).map { i =>
        quiesce()
        val (gc0, gt0) = gcStats()
        val t0 = System.nanoTime()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        val (gc1, gt1) = gcStats()
        clear()
        (i, dt, gc1 - gc0, (gt1 - gt0) / 1e3)
      }
      rows.foreach { case (i, dt, gcs, gcSec) =>
        println(f"[variance] $name run$i%2d ${dt}%.3f s  gc_count=$gcs gc_time=${gcSec}%.3f s")
      }
      val ts = rows.map(_._2).sorted
      // even-sized samples (default iters=8) average the two middle
      // elements — the upper-middle pick biased the reported median up
      val med =
        if (ts.size % 2 == 1) ts(ts.size / 2)
        else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2.0
      println(f"[variance] $name SUMMARY min=${ts.head}%.3f median=$med%.3f max=${ts.last}%.3f spread=${ts.last / ts.head}%.2f")
    }
    spark.stop()
  }
}
