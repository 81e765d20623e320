package graft
// Phase-split profiler for the heaviest bench queries (q23/q41/q60): times
// each stage of the shared MinHash pair pipeline and each CC variant on
// pre-materialized edges, so a regression can be attributed to a phase
// instead of eyeballed. Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Profile"
// (round-5 numbers recorded in SURVEY.md §8)
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    // warm-up
    Dedup.dupComponents(spark, d).write.format("noop").mode("overwrite").save(); clear()
    // inside nearDupPairs: stage-wise split over the SAME production
    // stage builders (Dedup.signedCorpus/lshBands/boundedBandCandidates/
    // verifyPairs) — localCheckpoint between stages isolates each phase
    locally {
      val sh = time("  sign (mapPartitions minhash)") {
        Dedup.signedCorpus(spark, Dedup.nearDupCorpus(spark, d)).localCheckpoint()
      }
      val cand = time("  band candidates") {
        Dedup.boundedBandCandidates(spark, Dedup.lshBands(sh), cap = 1024)
          .localCheckpoint()
      }
      println(s"[profile]   candidates = ${cand.count()}")
      time("  verify join (jaccard)") {
        Dedup.verifyPairs(cand, sh)
          .write.format("noop").mode("overwrite").save()
      }
      clear()
    }
    // phase split: pair finding vs CC
    val pairs = time("nearDupPairs materialize") {
      val p = Dedup.nearDupPairs(spark, d)
        .select(col("doc_a").as("src"), col("doc_b").as("dst")).localCheckpoint()
      println(s"[profile] pairs = ${p.count()}")
      p
    }
    val docs = Tables.documents(spark, d)
    val vertices = docs.select(col("doc_id").as("id")).unionAll(
      docs.select((col("doc_id") + 10000).as("id"))).localCheckpoint()
    println(s"[profile] vertices = ${vertices.count()}")
    time("hash-min CC on materialized edges") {
      Dedup.connectedComponents(vertices, pairs).write.format("noop").mode("overwrite").save()
    }
    time("star CC on materialized edges") {
      val (lab, rounds) = Dedup.connectedComponentsStar(vertices, pairs)
      lab.write.format("noop").mode("overwrite").save()
      println(s"[profile] star rounds = $rounds")
    }
    clear()
    time("q41 end-to-end") {
      Dedup.dupComponents(spark, d).write.format("noop").mode("overwrite").save()
    }
    clear()
    time("q60 end-to-end") {
      Dedup.dupComponentsStar(spark, d).write.format("noop").mode("overwrite").save()
    }
    clear()
    time("q23 end-to-end") {
      Dedup.minhashLsh(spark, d).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
