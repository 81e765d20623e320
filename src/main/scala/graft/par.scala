package graft

/** Driver-side concurrency for INDEPENDENT Spark actions (optimization
  * guide §2.6: "Overlap independent jobs" — Spark's scheduler happily
  * runs several jobs at once inside one application; actions are only
  * sequential because the driver calls them sequentially).
  *
  * Used where one query's computation contains legs with NO data
  * dependency between them — e.g. q116's raw and residual PQ fit
  * ladders (each a strictly sequential seed+Lloyd collect chain), or a
  * build's independent artifact writes. Submitting the legs from two
  * driver threads lets one leg's tasks back-fill the executor slots the
  * other leg's driver-blocking collects leave idle. Results are
  * unchanged: each leg computes exactly what it computed sequentially,
  * and the caller joins both before anything consumes them. */
private[graft] object Par {
  /** Evaluate `a` and `b` concurrently; rethrows either leg's failure.
    * A dedicated thread (not the ForkJoin common pool): legs block on
    * Spark collects/writes and must not starve unrelated pool users. */
  def run2[A, B](a: => A, b: => B): (A, B) = {
    val fb = new java.util.concurrent.FutureTask(
      new java.util.concurrent.Callable[B] { def call(): B = b })
    val t = new Thread(fb, "graft-par-leg")
    t.setDaemon(true)
    t.start()
    val ra = a // this thread runs leg a while the helper runs leg b
    try (ra, fb.get())
    catch {
      case e: java.util.concurrent.ExecutionException => throw e.getCause
    }
  }

  /** Three independent legs (a on the calling thread). */
  def run3[A, B, C](a: => A, b: => B, c: => C): (A, B, C) = {
    val (ra, (rb, rc)) = run2(a, run2(b, c))
    (ra, rb, rc)
  }
}
