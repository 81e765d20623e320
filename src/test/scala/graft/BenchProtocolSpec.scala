package graft

import org.scalatest.funsuite.AnyFunSuite

/** The contention-attribution protocol (BenchProtocol) under scripted
  * probes AND a real CPU burner — the round-9 "synthetic contention"
  * gate: the r8 official ledger carried a ~20 s throttled window the old
  * protocol could not localize; these tests prove the new one both
  * FLAGS a contended query (bracket vs session floor) and REQUEUES it,
  * and stays quiet on a calm or uniformly-slow host. Round-10 hardening
  * (ADVICE r9): the floor is the lower QUARTILE of pooled probes, not
  * the min (min is an extreme statistic — the r9 ledger requeued 20/73
  * queries on a calm host from ordinary ~2x jitter on a 14 ms probe),
  * the driver-artifact `requeued` flag means "final bracket STILL reads
  * contended", and a query passed over in attempt 1 is reconsidered in
  * later attempts once calm requeue probes sharpen the floor. */
class BenchProtocolSpec extends AnyFunSuite {
  import BenchProtocol.{contended, floorOf}

  test("a query timed inside a contention window is requeued; calm queries are not") {
    // probe script: calm (0.02) except the probe taken right after q2 —
    // the q2/q3 boundary — which lands in the contention window (0.30);
    // requeue probes are calm again
    val probeScript = Iterator(0.02, 0.02, 0.30, 0.02, 0.02, 0.02, 0.02, 0.02)
    val calls = scala.collection.mutable.ArrayBuffer[String]()
    val out = BenchProtocol.run(
      names = Seq("q1", "q2", "q3"),
      timeQuery = { n => calls += n; Seq(1.0) },
      probe = () => probeScript.next()).timings
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
        probe = () => level).timings
      assert(out.forall(_.requeues == 0),
        s"flat probe level $level must not requeue (deviation, not absolutes)")
    }
  }

  test("p25 floor absorbs ordinary probe jitter that a min floor would flag") {
    // the r9 calm-host ledger: one extreme-fast probe (0.014) among
    // ordinary 0.025-0.033 jitter. floor=min would read every bracket
    // as contended (0.033 > 2 x 0.014) and requeue 20/73 queries on a
    // calm host; the quartile floor anchors to the fast QUARTER of the
    // session and requeues nothing here.
    val script = Seq(0.014, 0.030, 0.025, 0.032, 0.028, 0.033, 0.026, 0.031, 0.029)
    val it = script.iterator
    val out = BenchProtocol.run(
      names = (1 to 8).map(i => s"q$i"),
      timeQuery = _ => Seq(1.0),
      probe = () => it.next()).timings
    assert(out.forall(_.requeues == 0),
      s"calm-host jitter must not requeue: ${out.map(q => q.name -> q.brackets)}")
    // and the floor really is the quartile, not the min
    assert(floorOf(script) == 0.026 && script.min == 0.014)
  }

  test("a failed query (no successful runs) is never requeued") {
    val probeScript = Iterator(0.02, 0.50, 0.02)
    var calls = 0
    val out = BenchProtocol.run(
      names = Seq("qFail"),
      timeQuery = { _ => calls += 1; Seq.empty },
      probe = () => probeScript.next()).timings
    assert(calls == 1 && out.head.requeues == 0 && out.head.min == -1.0)
  }

  test("seed probes join the floor pool (suite-level cal_pre sharpens the yardstick)") {
    // without the 0.02 seed the only probes are the inflated 0.3s — flat,
    // no requeue; the seed proves the session was actually 15x faster
    val out = BenchProtocol.run(
      names = Seq("q1"),
      timeQuery = _ => Seq(1.0),
      probe = () => 0.30,
      seedProbes = Seq(0.02)).timings
    assert(out.head.requeues == 1)
  }

  test("contended() is either-side and strict") {
    assert(contended((0.05, 0.01), floor = 0.02, factor = 2.0))
    assert(contended((0.01, 0.05), floor = 0.02, factor = 2.0))
    assert(!contended((0.04, 0.04), floor = 0.02, factor = 2.0))
  }

  test("requeued-but-calm settles clean; still-hot requeue stays contended under the final floor") {
    // q2's requeue lands in calm air (clean re-measurement — must NOT
    // read contended afterwards); q3's requeue is still inside the storm
    // (its line stays flagged). This is exactly the driver-artifact
    // `requeued` field contract: final bracket vs final floor.
    val probeScript = Iterator(
      0.02, 0.02, 0.30, 0.30, // first pass: q1 calm, q2 and q3 bracketed hot
      0.02, 0.02,             // attempt 1, q2 requeue: calm
      0.30, 0.30)             // attempt 1, q3 requeue: still hot
    val result = BenchProtocol.run(
      names = Seq("q1", "q2", "q3"),
      timeQuery = _ => Seq(1.0),
      probe = () => probeScript.next())
    val floor = result.floor
    val stillHot = result.timings
      .filter(qt => contended(qt.brackets.last, floor, 2.0)).map(_.name)
    assert(stillHot == Seq("q3"),
      s"only the still-hot requeue may stay flagged: $stillHot, floor=$floor")
    // both were requeued — the requeue COUNT is a separate fact from the
    // still-contended flag
    assert(result.timings.map(q => q.name -> q.requeues).toMap ==
      Map("q1" -> 0, "q2" -> 1, "q3" -> 1))
  }

  test("a query passed over in attempt 1 is reconsidered after calm probes sharpen the floor") {
    // first pass runs on a throttled host (0.10 probes) with one storm
    // spike on q2; attempt 1's floor is 0.10 so q1's (0.10, 0.10)
    // bracket reads calm and only q2 requeues — into genuinely calm air
    // (0.02 probes). Those probes sharpen the attempt-2 floor to 0.02,
    // under which q1's bracket NOW reads contended: with maxRequeues=2
    // it must get its requeue (the old `requeues == attempt - 1` gate
    // froze it out forever).
    val probeScript = Iterator(
      0.10, 0.10, 0.50,  // first pass
      0.02, 0.02,        // attempt 1: q2 requeue (calm)
      0.02, 0.02)        // attempt 2: q1 reconsidered and requeued
    val calls = scala.collection.mutable.ArrayBuffer[String]()
    val result = BenchProtocol.run(
      names = Seq("q1", "q2"),
      timeQuery = { n => calls += n; Seq(1.0) },
      probe = () => probeScript.next(),
      maxRequeues = 2)
    assert(calls.toSeq == Seq("q1", "q2", "q2", "q1"))
    val byName = result.timings.map(q => q.name -> q).toMap
    // each was requeued exactly once (count, not last-attempt index)
    assert(byName("q1").requeues == 1 && byName("q2").requeues == 1)
    // and both settled: final brackets calm under the final floor
    assert(result.timings.forall(qt => !contended(qt.brackets.last, result.floor, 2.0)))
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
        probe = () => spin()).timings
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
