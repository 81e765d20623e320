package graft

import java.sql.Timestamp

import graft.streaming.{StreamingOps, ThreadEvent, HistoryMsg}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Every stateful streaming route re-run on the RocksDB state store —
  * the provider a 100 TB-state deployment actually configures (the
  * default HDFS-backed store keeps all state on the executor heap; the
  * SURVEY §8 deployment notes tell users to flip this conf, so a spec
  * must prove our operators run under it). Same fixtures as the
  * StreamingSpec twins; what changes is only
  * `spark.sql.streaming.stateStore.providerClass`. */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._

  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ConfKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocksDb[A](body: => A): A = {
    val prev = spark.conf.getOption(ConfKey)
    spark.conf.set(ConfKey, Provider)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ConfKey, v)
      case None    => spark.conf.unset(ConfKey)
    }
  }

  private def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)

  test("A1 threadMembership (flatMapGroupsWithState + event-time TTL) runs on RocksDB") {
    withRocksDb {
      val in = MemoryStream[ThreadEvent](spark)
      val out = StreamingOps.threadMembership(in.toDS(), "5 minutes",
        ttlMillis = 60L * 60000)
      val q = out.writeStream.format("memory").queryName("rocks_a1")
        .outputMode("append").start()
      in.addData(
        ThreadEvent("C1", ts(1), Some("t1")),
        ThreadEvent("C1", ts(2), Some("t1")),   // same thread — no re-emit
        ThreadEvent("C2", ts(3), None))
      q.processAllAvailable()
      in.addData(ThreadEvent("C1", ts(10), Some("t2")))
      q.processAllAvailable(); q.stop()
      val keys = spark.table("rocks_a1").select("thread_key").as[String]
        .collect().toSet
      assert(keys == Set("C1-t1", s"C2-${ts(3)}", "C1-t2"))
    }
  }

  test("A2/A3 rollingHistory (mapGroupsWithState) runs on RocksDB") {
    withRocksDb {
      val in = MemoryStream[HistoryMsg](spark)
      val out = StreamingOps.rollingHistory(in.toDS(), k = 2)
      val q = out.writeStream.format("memory").queryName("rocks_a2")
        .outputMode("update").start()
      in.addData(
        HistoryMsg("C1", 1000L, "m1", "u1", "first"),
        HistoryMsg("C1", 2000L, "m2", "u2", "second"))
      q.processAllAvailable()
      in.addData(HistoryMsg("C1", 3000L, "m3", "u1", "third")) // evicts m1 (k=2)
      q.processAllAvailable(); q.stop()
      val fin = spark.table("rocks_a2").as[graft.streaming.HistoryContext]
        .collect().last
      assert(fin.n_msgs == 2)
      assert(fin.context == "u2: second\nu1: third")
    }
  }

  test("A1 bounded-state dropDuplicatesWithinWatermark evicts on RocksDB") {
    withRocksDb {
      val in = MemoryStream[(Timestamp, String)](spark)
      val deduped = in.toDF().toDF("ts", "k")
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark("k")
      val q = deduped.writeStream.format("memory").queryName("rocks_dd")
        .outputMode("append").start()
      in.addData((ts(1), "a"), (ts(2), "a"), (ts(3), "b"))
      q.processAllAvailable()
      in.addData((ts(60), "z"))   // watermark → 50min: a/b expire
      q.processAllAvailable()
      in.addData((ts(61), "a"))   // reappears after expiry
      q.processAllAvailable(); q.stop()
      val got = spark.table("rocks_dd").select("k").as[String].collect()
      assert(got.count(_ == "a") == 2 && got.count(_ == "b") == 1)
    }
  }

  test("q68 packStream (cross-batch fill carry) runs on RocksDB") {
    withRocksDb {
      import graft.streaming.{PackAssign, PackDoc}
      val in = MemoryStream[PackDoc](spark)
      val out = StreamingOps.packStream(in.toDS(), budget = 100L)
      val q = out.writeStream.format("memory").queryName("rocks_pack")
        .outputMode("append").start()
      in.addData(PackDoc("sA", 1L, 40L), PackDoc("sA", 2L, 50L))
      q.processAllAvailable()
      // the carried (seq_no, fill) state must round-trip through RocksDB:
      // doc 3 continues seq 0 at offset 90, doc 4 overflows into seq 1
      in.addData(PackDoc("sA", 3L, 10L), PackDoc("sA", 4L, 60L))
      q.processAllAvailable(); q.stop()
      val got = spark.table("rocks_pack").as[PackAssign].collect()
        .map(a => a.doc_id -> (a.seq_no, a.offset_chars)).toMap
      assert(got == Map(1L -> (0L, 0L), 2L -> (0L, 40L),
                        3L -> (0L, 90L), 4L -> (1L, 0L)))
    }
  }

  test("q69 frequentLines (cross-batch df accumulation) runs on RocksDB") {
    withRocksDb {
      import graft.streaming.{FrequentLine, LineOcc}
      val in = MemoryStream[LineOcc](spark)
      val out = StreamingOps.frequentLines(in.toDS(), threshold = 3L)
      val q = out.writeStream.format("memory").queryName("rocks_freq")
        .outputMode("append").start()
      in.addData(LineOcc("footer", 1L), LineOcc("footer", 2L), LineOcc("solo", 1L))
      q.processAllAvailable()
      // df=2 persisted in RocksDB; one more distinct doc crosses the bar
      in.addData(LineOcc("footer", 3L))
      q.processAllAvailable(); q.stop()
      val got = spark.table("rocks_freq").as[FrequentLine].collect().toSeq
      assert(got == Seq(FrequentLine("footer", 3L)))
    }
  }

  test("q70 keepStream (cross-batch keeper displacement) runs on RocksDB") {
    withRocksDb {
      import graft.streaming.{KeepDoc, KeeperChange}
      val in = MemoryStream[KeepDoc](spark)
      val out = StreamingOps.keepStream(in.toDS())
      val q = out.writeStream.format("memory").queryName("rocks_keep")
        .outputMode("append").start()
      in.addData(KeepDoc(5L, 1L, 40L))
      q.processAllAvailable()
      // the keeper state must round-trip through RocksDB: a longer doc
      // in a later batch displaces it, a shorter one does not re-emit
      in.addData(KeepDoc(5L, 2L, 80L))
      q.processAllAvailable()
      in.addData(KeepDoc(5L, 3L, 50L))
      q.processAllAvailable(); q.stop()
      val got = spark.table("rocks_keep").as[KeeperChange].collect().toSeq
      assert(got == Seq(KeeperChange(5L, 1L, 40L), KeeperChange(5L, 2L, 80L)))
    }
  }

  test("q75 semDedupStream (exemplar-history vector state) runs on RocksDB") {
    withRocksDb {
      import graft.streaming.{SemVec, SemVerdict}
      val in = MemoryStream[SemVec](spark)
      val out = StreamingOps.semDedupStream(in.toDS(), tau = 0.95,
        idleTtlMillis = 0L)
      val q = out.writeStream.format("memory").queryName("rocks_sem")
        .outputMode("append").start()
      val e1 = Array.tabulate(4)(i => (i + 1).toDouble)      // (1,2,3,4)
      val nrm1 = math.sqrt(e1.map(x => x * x).sum)
      val far = Array[Double](-4.0, 3.0, -2.0, 1.0)          // cos < 0
      val nrmF = math.sqrt(far.map(x => x * x).sum)
      in.addData(SemVec(7, 1L, e1, nrm1), SemVec(7, 2L, far, nrmF))
      q.processAllAvailable()
      // the exemplar VECTORS must round-trip through RocksDB: a later
      // batch's near-copy of e1 has to match against the stored array
      val twin = e1.map(_ * 1.001)
      val nrmT = math.sqrt(twin.map(x => x * x).sum)
      in.addData(SemVec(7, 3L, twin, nrmT))
      q.processAllAvailable(); q.stop()
      val got = spark.table("rocks_sem").as[SemVerdict].collect()
        .map(v => v.vec_id -> (v.dup_of, v.keep)).toMap
      assert(got(1L) == ((None, true)) && got(2L) == ((None, true)))
      assert(got(3L)._1 == Some(1L) && !got(3L)._2,
        s"cross-batch near-dup not caught against RocksDB state: $got")
    }
  }

  test("q94 psiDriftStream (weekly histogram state) runs on RocksDB") {
    withRocksDb {
      import graft.streaming.{PsiDesign, PsiEvent, PsiReport}
      val in = MemoryStream[PsiEvent](spark)
      val design = PsiDesign(0.0, 10.0)
      val week = 604800000000L
      val q = StreamingOps.psiDriftStream(in.toDS(), design)
        .writeStream.format("memory").queryName("rocks_psi")
        .outputMode("update").start()
      in.addData((1L to 20L).map(i => PsiEvent("click", i, week, (i % 10).toDouble)): _*)
      q.processAllAvailable()
      in.addData((21L to 40L).map(i => PsiEvent("click", i, 2 * week, 9.0)): _*)
      q.processAllAvailable(); q.stop()
      val rows = spark.table("rocks_psi").as[PsiReport].collect()
      val fin = rows.maxBy(_.rev)
      assert(fin.week_from == 1L && fin.week_to == 2L && fin.n_from == 20L && fin.n_to == 20L)
      assert(fin.psi > 0.2 && fin.drift, s"forced shift must flag: $fin")
    }
  }

  test("q93 trendingStream (Misra-Gries counter state) runs on RocksDB") {
    withRocksDb {
      import graft.streaming.{TrendDoc, TrendReport}
      val in = MemoryStream[TrendDoc](spark)
      val q = StreamingOps.trendingStream(in.toDS())
        .writeStream.format("memory").queryName("rocks_trend")
        .outputMode("update").start()
      // 20 distinct rare tokens + one heavy token across two batches:
      // counters overflow (k=16) and the heavy token must survive
      in.addData((1L to 10L).map(i =>
        TrendDoc("s", i, Array(s"rare$i") ++ Array.fill(10)("hot"))): _*)
      q.processAllAvailable()
      in.addData((11L to 20L).map(i =>
        TrendDoc("s", i, Array(s"rare$i") ++ Array.fill(10)("hot"))): _*)
      q.processAllAvailable(); q.stop()
      val rows = spark.table("rocks_trend").as[TrendReport].collect()
      val fin = rows.filter(_.rev == rows.map(_.rev).max)
      assert(fin.length <= TextAnalysis.mgK)
      val hot = fin.find(_.tok == "hot").getOrElse(fail("heavy token lost"))
      assert(hot.n == 220L && hot.est <= 200L && (200L - hot.est) <= 220L / 17L)
    }
  }

  test("stream-stream click/purchase join (watermark-bounded state) runs on RocksDB") {
    withRocksDb {
      val cIn = MemoryStream[(Long, Timestamp, Long)](spark)
      val pIn = MemoryStream[(Long, Timestamp, Long)](spark)
      val joined = StreamingOps.clickPurchaseJoin(
        cIn.toDF().toDF("c_user_id", "c_ts", "c_id"),
        pIn.toDF().toDF("p_user_id", "p_ts", "p_id"),
        watermarkDelay = "10 minutes", windowMinutes = 30)
      val q = joined.writeStream.format("memory").queryName("rocks_ssj")
        .outputMode("append").start()
      cIn.addData((1L, ts(0), 101L), (1L, ts(25), 102L))
      pIn.addData((1L, ts(40), 901L))
      q.processAllAvailable()
      cIn.addData((9L, ts(120), 999L))
      pIn.addData((9L, ts(120), 998L))
      q.processAllAvailable(); q.stop()
      val got = spark.table("rocks_ssj").select("p_id", "c_id")
        .as[(Long, Long)].collect().toSet
      assert(got.contains((901L, 102L)) && !got.contains((901L, 101L)))
    }
  }
}
