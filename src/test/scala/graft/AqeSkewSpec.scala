package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE skew-join handling, demonstrated on a skew-amplified fixture
  * (SURVEY.md §8 follow-up): one join key holding ~90% of the fact rows —
  * the layout that turns a sort-merge join into a single straggler task.
  * With adaptive skew-join splitting, the oversized shuffle partition is
  * divided into multiple reader splits, each joined against a replicated
  * copy of the matching build side; results are identical, wall-clock
  * scales with splits. This is the engine's runtime answer to data skew
  * (complementing the STATIC triangle-blocking in Dedup.boundedBucketPairs
  * for the O(n²) pairwise case).
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the skewed partition of a sort-merge join (skew=true in final plan)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
    ).map(k => k -> conf.getOption(k))
    try {
      // force a shuffle join and make the skew thresholds test-sized
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // hot key 0 carries 90% of 60k fact rows with fat payloads
      val fact = spark.range(60000)
        .select(
          when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") % 97).as("k"),
          concat(lit("v"), col("id").cast("string"), lit("x" * 64)).as("payload"))
      val dim = spark.range(97).select(col("id").as("k"),
        concat(lit("d"), col("id").cast("string")).as("dname"))
      val joined = fact.join(dim, "k")

      // collect() drives joined.queryExecution itself, so the SAME
      // QueryExecution holds the final adaptive plan afterwards
      assert(joined.collect().length == 60000) // every fact key 0..96 in dim

      // the FINAL adaptive plan must show the skew-split sort-merge join
      val exec = joined.queryExecution.executedPlan
      val finalPlan = exec.collectFirst { case a: AdaptiveSparkPlanExec => a }
        .map(_.executedPlan).getOrElse(exec)
      val planStr = finalPlan.toString
      assert(planStr.contains("skew=true"),
        s"expected a skew-split join in the final AQE plan:\n$planStr")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
