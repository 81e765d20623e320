package graft

import org.scalatest.funsuite.AnyFunSuite

/** The contention-attribution protocol (BenchProtocol) under scripted
  * probes AND a real CPU burner — the round-9 "synthetic contention"
  * gate: the r8 official ledger carried a ~20 s throttled window the old
  * protocol could not localize; these tests prove the new one both
  * FLAGS a contended query (bracket vs session floor) and REQUEUES it,
  * and stays quiet on a calm or uniformly-slow host. */
class BenchProtocolSpec extends AnyFunSuite {
  import BenchProtocol.contended

  test("a query timed inside a contention window is requeued; calm queries are not") {
    // probe script: calm (0.02) except the probe taken right after q2 —
    // the q2/q3 boundary — which lands in the contention window (0.30);
    // requeue probes are calm again
    val probeScript = Iterator(0.02, 0.02, 0.30, 0.02, 0.02, 0.02, 0.02, 0.02)
    val calls = scala.collection.mutable.ArrayBuffer[String]()
    val out = BenchProtocol.run(
      names = Seq("q1", "q2", "q3"),
      timeQuery = { n => calls += n; Seq(1.0) },
      probe = () => probeScript.next())
    // the hot probe is q2's AFTER and q3's BEFORE: both requeue, q1 not
    assert(out.map(q => q.name -> q.requeues).toMap ==
      Map("q1" -> 0, "q2" -> 1, "q3" -> 1))
    assert(calls.toSeq == Seq("q1", "q2", "q3", "q2", "q3"))
    // requeued queries accumulate runs across passes (min-of-all wins)
    assert(out.find(_.name == "q2").get.times == Seq(1.0, 1.0))
    // every query carries its own bracket(s) in the record
    assert(out.forall(_.brackets.nonEmpty))
    assert(out.find(_.name == "q2").get.brackets ==
      Seq((0.02, 0.30), (0.02, 0.02)))
  }

  test("flat probes requeue nothing — calm AND uniformly-slow hosts") {
    for (level <- Seq(0.02, 0.50)) {
      val out = BenchProtocol.run(
        names = Seq("q1", "q2"),
        timeQuery = _ => Seq(1.0),
        probe = () => level)
      assert(out.forall(_.requeues == 0),
        s"flat probe level $level must not requeue (deviation, not absolutes)")
    }
  }

  test("a failed query (no successful runs) is never requeued") {
    val probeScript = Iterator(0.02, 0.50, 0.02)
    var calls = 0
    val out = BenchProtocol.run(
      names = Seq("qFail"),
      timeQuery = { _ => calls += 1; Seq.empty },
      probe = () => probeScript.next())
    assert(calls == 1 && out.head.requeues == 0 && out.head.min == -1.0)
  }

  test("seed probes join the floor pool (suite-level cal_pre sharpens the yardstick)") {
    // without the 0.02 seed the only probes are the inflated 0.3s — flat,
    // no requeue; the seed proves the session was actually 15x faster
    val out = BenchProtocol.run(
      names = Seq("q1"),
      timeQuery = _ => Seq(1.0),
      probe = () => 0.30,
      seedProbes = Seq(0.02))
    assert(out.head.requeues == 1)
  }

  test("contended() is either-side and strict") {
    assert(contended((0.05, 0.01), floor = 0.02, factor = 2.0))
    assert(contended((0.01, 0.05), floor = 0.02, factor = 2.0))
    assert(!contended((0.04, 0.04), floor = 0.02, factor = 2.0))
  }

  test("a real mid-run CPU burner inflates the bracket probe and triggers the requeue") {
    // fixed-work spin probe (the calSpin idiom, scaled to ~15-40 ms):
    // under a burner fleet 4x the core count its wall time multiplies by
    // the scheduling share, which is what the bench's probe measures
    def spin(): Double = {
      val t0 = System.nanoTime()
      var acc = 0L
      var i = 0
      while (i < 30000000) { acc = acc * 6364136223846793005L + i; i += 1 }
      if (acc == 42L) print("")
      (System.nanoTime() - t0) / 1e9
    }
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val burners = new scala.collection.mutable.ArrayBuffer[Thread]()
    def startBurners(): Unit = {
      val n = Runtime.getRuntime.availableProcessors() * 4
      (1 to n).foreach { _ =>
        val t = new Thread(() => {
          var x = 0L
          while (!stop.get()) { x = x * 25214903917L + 11 }
          if (x == 42L) print("")
        })
        t.setDaemon(true)
        t.start()
        burners += t
      }
      Thread.sleep(100) // let the fleet saturate the cores
    }
    try {
      var contendedPass = 0
      val out = BenchProtocol.run(
        names = Seq("calm", "stormy"),
        timeQuery = {
          case "calm" => Seq(0.01)
          case "stormy" =>
            // first pass: light the burner mid-"query", so the AFTER
            // probe lands in the storm; requeue pass: extinguish it
            if (contendedPass == 0) { contendedPass = 1; startBurners() }
            else { stop.set(true); burners.foreach(_.join(2000)); Thread.sleep(50) }
            Seq(0.01)
        },
        probe = () => spin())
      val stormy = out.find(_.name == "stormy").get
      assert(stormy.requeues == 1,
        s"burner did not trigger the requeue: brackets=${stormy.brackets}")
      // and the burner really was the cause: the contended bracket's max
      // probe exceeds the calm floor by the protocol factor
      val floor = out.flatMap(_.brackets).flatMap(b => Seq(b._1, b._2)).min
      val hot = stormy.brackets.head
      assert(math.max(hot._1, hot._2) > 2.0 * floor)
    } finally {
      stop.set(true)
      burners.foreach(_.join(2000))
    }
  }
}
