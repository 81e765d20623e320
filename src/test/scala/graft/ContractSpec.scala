package graft

/** Driver-contract sanity: every query has a non-degenerate oracle and
  * the two maps stay in lockstep. Exists because Scala object vals
  * initialize in declaration order — an oracle built by interpolating a
  * LATER-declared val silently bakes the four characters `null` into
  * the SQL (it bit q97 and q101 during round 12; both are `lazy` now).
  * This spec turns the next occurrence into a named failure instead of
  * a driver-side parse error that zeroes the round's correctness. */
class ContractSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("every query key has an oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
  }

  test("no oracle SQL carries a null interpolation or empty body") {
    // the engine's SQL writes NULL uppercase everywhere; a lowercase
    // standalone `null` is the toString of a not-yet-initialized val
    val nullWord = "\\bnull\\b".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql != null && sql.trim.nonEmpty, s"$name: empty oracle")
      assert(nullWord.findFirstIn(sql).isEmpty,
        s"$name: literal `null` in the SQL — a val initialization-order leak")
    }
  }
}
