package graft

/** Prints the executed-plan Shape of every budgeted query at the test
  * fixture scale — the measurement side of PlanBudgetSpec. Run:
  *   sbt "Test/runMain graft.PlanBudgetReport"           // all budgeted
  *   sbt "Test/runMain graft.PlanBudgetReport q144_… …"  // named only
  * and transcribe the lines into PlanBudgetSpec.budgets. */
object PlanBudgetReport {
  def main(args: Array[String]): Unit = {
    val spark = TestSession.spark
    val sf = "/root/testdata/sf0.001"
    val names =
      if (args.nonEmpty) args.toSeq
      else PlanBudgetSpec.budgets.keys.toSeq.sorted
    names.foreach { name =>
      spark.catalog.clearCache() // hermetic, matches the spec's discipline
      val shape = PlanWalk.shapeOf(SparkEntry.queries(name)(spark, sf))
      println(s"""    "$name" -> $shape,""")
    }
    spark.stop()
  }
}
