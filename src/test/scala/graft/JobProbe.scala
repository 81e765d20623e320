package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Diagnostic main: runs one SparkEntry query under a job listener and
  * prints the driver-blocking job ladder (id, duration, description) —
  * the instrument behind the r15 PQ fit-ladder work. Not a test. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = TestSession.spark
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (js.time,
          Option(js.properties.getProperty("spark.job.description")).getOrElse("")))
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        done.put(je.jobId, je.time)
    })
    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    for (name <- args) {
      // cold pass (codegen, cache fill) — then measure the WARM pass,
      // which is what the bench's min-of-N reports
      SparkEntry.queries(name)(spark, sf).collect()
      clear()
      Thread.sleep(200)
      jobs.clear(); done.clear()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sf).collect().length
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      import scala.jdk.CollectionConverters._
      val rows = jobs.asScala.toSeq.sortBy(_._1)
      // driver-side gap: wall minus the union of job intervals — the
      // planning/collect/scheduling time no job accounts for
      val iv = rows.flatMap { case (id, (start, _)) =>
        done.asScala.get(id).map(e => (start, e)) }.sortBy(_._1)
      val covered = iv.foldLeft((0L, 0L)) { case ((acc, hi), (s, e)) =>
        (acc + math.max(0L, e - math.max(s, hi)), math.max(hi, e)) }._1 / 1e3
      println(f"[jobprobe] $name rows=$n wall=$wall%.2fs jobs=${rows.length} " +
        f"jobCovered=${covered}%.2fs driverGap=${math.max(0, wall - covered)}%.2fs")
      rows.foreach { case (id, (start, desc)) =>
        val dur = done.asScala.get(id).map(e => (e - start) / 1e3).getOrElse(-1.0)
        println(f"[jobprobe]   job $id%3d ${dur}%8.3fs  ${desc.take(110)}")
      }
      clear()
    }
    spark.stop()
  }
}
