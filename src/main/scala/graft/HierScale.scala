package graft

import org.apache.spark.sql.SparkSession

/** Linearity audit for the L-level hierarchical assignment (r14,
  * VERDICT r13 #3's "Done" clause): times fitHierPlan and the full
  * corpus assignCellsHierJoined at a small targetCellSize (so
  * k ∝ corpus — the regime where the 2-level form's O(n·√k·d) term is
  * super-linear) and prints ONE JSON line. Run it against sf0.1 and
  * the tmp/e10 / tmp/e30 embScale replicas: linear assignment shows as
  * assign_sec scaling ~copies× while per-row work stays O(L·fan·d).
  *
  *   sbt "runMain graft.HierScale <sfDir> [targetCellSize=10] [levels=3]"
  */
object HierScale {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: HierScale <sfDir> [targetCellSize] [levels]")
    val sfDir = args(0)
    val targetCellSize = if (args.length > 1) args(1).toInt else 10
    val levels = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the q75 corpus shape: base + planted twins
    val base = Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) as e")
    val corpus = base.unionAll(
      base.selectExpr("vec_id + 10000000 as vec_id",
        "zip_with(e, sequence(0, 63), (x, i) -> x + 0.004 * cast(i % 5 as double)) as e"))
    val n = corpus.count() // warms the scan + JIT before the timers
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (plan, fitSec) = timed(Similarity.fitHierPlan(spark, sfDir, targetCellSize, levels))
    val (_, assignSec) = timed {
      Similarity.assignCellsHierJoined(corpus, plan)
        .write.format("noop").mode("overwrite").save()
    }
    def f3(v: Double) = math.round(v * 1000) / 1000.0
    println(s"""{"audit":"hier_scale","sf":"$sfDir","n":$n,"k":${plan.k},""" +
      s""""fan":${plan.fan},"levels":${plan.levels},""" +
      s""""fit_sec":${f3(fitSec)},"assign_sec":${f3(assignSec)}}""")
    spark.stop()
  }
}
