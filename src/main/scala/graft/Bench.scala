package graft
import org.apache.spark.sql.SparkSession

/** Headline benchmark. Prints ONE JSON line the driver parses.
  *
  * Methodology:
  *  - one full untimed warm-up pass (JIT + codegen cache + parquet footers);
  *  - then each query timed as MIN of `SPARK_GRAFT_BENCH_RUNS` (default 3)
  *    end-to-end runs — min-of-N reports the query's intrinsic cost rather
  *    than whichever run absorbed a GC pause or host contention spike;
  *  - the cache manager is cleared after every run so queries that persist
  *    intermediate frames (q23/q38) are always timed cold and never leak
  *    cached blocks into later measurements;
  *  - the noop sink forces FULL evaluation of every output column —
  *    count() would let Catalyst prune per-row work a real consumer pays.
  *
  * Failures are never silently folded into the total: a query that throws
  * reports value -1 and lands in the "errors" list, and ANY error
  * invalidates the headline total (value -1) — a newly-crashing query can
  * only read as a regression, never as a speedup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      // cacheManager only drops .persist()ed plans; localCheckpoint blocks
      // (the CC loops' per-round frames) sit in persistentRDDs until a
      // driver GC lets ContextCleaner reap them. Left alone they pile up
      // across the 60+-query suite, squeeze unified memory, and inflate
      // every later query's time (q29 measured 0.18 s isolated vs 3.0 s
      // late in the round-3 full suite). Freeing them between queries is
      // safe: nothing outlives its query.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // SPARK_GRAFT_BENCH_ONLY=q01_...,q23_... runs a subset (the sf-ratio
    // smoke); unset — the driver's path — runs everything.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val suite = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    suite.foreach { case (_, fn) =>
      try run(fn(spark, sfDir)) catch { case _: Throwable => () }
      clear()
    }
    val results = suite.map { case (name, fn) =>
      val times = (1 to runs).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok = try { run(fn(spark, sfDir)); true }
                 catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        clear()
        if (ok) Some(dt) else None
      }
      name -> (if (times.nonEmpty) times.min else -1.0)
    }
    // The driver keeps only the last ~2000 chars of stdout; the JSON line
    // must fit there WHOLE (plus sbt's trailing "[success]" line) or the
    // driver records parsed:null. Short keys ("q01" for "q01_pricing_
    // summary" — the driver-contract example's own key style) and
    // millisecond precision keep the line ≈ 900 chars at 63 queries.
    def ms(v: Double): String =
      if (v < 0) "-1" else (math.round(v * 1000) / 1000.0).toString
    val qs = results.map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + ms(v)
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = if (results.exists(_._2 < 0)) -1.0 else results.map(_._2).sum
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
