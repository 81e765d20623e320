package graft

/** Tables.fanOut — the scan-parallelism floor for row-heavy chains.
  * Contract under test:
  *  - when the planned scan has fewer partitions than the session's
  *    parallelism (every single-file test table), the chain gains
  *    exactly one hash exchange on the id column;
  *  - when the input already plans >= cores partitions (the production
  *    regime — thousands of scan tasks), fanOut is an exact no-op:
  *    same plan object, zero added exchanges;
  *  - `spark.graft.fanout=off` disables the site entirely (the knob
  *    Verify/Bench users can flip without touching operator code).
  */
class FanOutSpec extends SparkSpec {

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int =
    PlanWalk.shapeOf(df).shuffles // shapeOf executes df and reads the final AQE plan

  test("fanOut adds one hash exchange when the scan underfills the cores") {
    val docs = Tables.documents(spark, sf)
    assert(docs.rdd.getNumPartitions < spark.sparkContext.defaultParallelism,
      "fixture assumption: single-file scan plans fewer partitions than cores")
    val fanned = Tables.fanOut(docs, "doc_id")
    assert(fanned.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(shuffleCount(fanned) == shuffleCount(docs) + 1)
  }

  test("fanOut is an exact no-op when the input already fills the cores") {
    val cores = spark.sparkContext.defaultParallelism
    val wide = Tables.documents(spark, sf).repartition(cores + 3, org.apache.spark.sql.functions.col("doc_id"))
    val out = Tables.fanOut(wide, "doc_id")
    assert(out eq wide, "at-scale inputs must pass through untouched")
  }

  test("fanOut never executes upstream exchanges while probing (plan-time decision)") {
    // the r6 ADVICE footgun: probing df.rdd under AQE finalizes the
    // adaptive plan and eagerly RUNS upstream shuffle stages. fanOut now
    // decides from the planned physical tree — constructing the decision
    // for an exchange-containing frame must launch zero Spark jobs.
    import java.util.concurrent.atomic.AtomicInteger
    val starts = new AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          jobStart: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        starts.incrementAndGet(); ()
      }
    }
    // build the frame BEFORE the counting window: spark.read's footer
    // schema read may itself job, and that cost is the caller's either
    // way — the contract under test is that the fanOut PROBE adds none
    val wide = Tables.documents(spark, sf).repartition(
      spark.sparkContext.defaultParallelism + 3,
      org.apache.spark.sql.functions.col("doc_id"))
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = Tables.fanOut(wide, "doc_id")
      assert(out eq wide)
      // marker job: listener events deliver in order, so once the
      // marker's start lands, any job fanOut triggered is already counted
      spark.sparkContext.parallelize(Seq(1), 1).count()
      val deadline = System.currentTimeMillis() + 10000
      while (starts.get() < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(starts.get() == 1,
        s"fanOut probing launched ${starts.get() - 1} unexpected Spark job(s)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("spark.graft.fanout=off disables the site") {
    spark.conf.set("spark.graft.fanout", "off")
    try {
      val docs = Tables.documents(spark, sf)
      val out = Tables.fanOut(docs, "doc_id")
      assert(out eq docs)
    } finally spark.conf.unset("spark.graft.fanout")
  }
}
