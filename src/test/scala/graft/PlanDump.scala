package graft

/** Diagnostic main: print one query's executed formatted plan. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = TestSession.spark
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val df = SparkEntry.queries(args(0))(spark, sf)
    df.collect()
    println(PlanWalk.shapeOf(df))
    df.explain("formatted")
    spark.stop()
  }
}
