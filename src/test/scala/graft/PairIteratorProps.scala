package graft

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck pin of the r14 streamed block-pair iterator
  * ([[Dedup.blockPairIterator]]) against the naive buffered double loop
  * it replaced — the OOM fix must be a pure memory-shape change, never a
  * semantic one. Properties cover both block orientations (diagonal
  * triangle and off-diagonal cross product), permissive and restrictive
  * thresholds, and the exact emitted values (cos from the left-to-right
  * fold, id-ordered pairs). */
object PairIteratorProps extends Properties("PairIterator") {

  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(2000)

  private type Row = (Long, Int, Int, Int, Long, Array[Double], Double)

  private val dim = 4

  /** Rows with distinct ids, nonzero-norm small vectors, and a sub-group
    * tag in {0, 1} (the `sr` column the block machinery assigns). */
  private val genRows: Gen[Array[Row]] = for {
    n <- Gen.chooseNum(0, 12)
    vecs <- Gen.listOfN(n, Gen.listOfN(dim, Gen.chooseNum(-5, 5)))
    subs <- Gen.listOfN(n, Gen.oneOf(0, 1))
  } yield vecs.zip(subs).zipWithIndex.map { case ((v0, sr), idx) =>
    // nudge component 0 so the norm is never zero (the documented
    // precondition of the kernel)
    val v = v0.zipWithIndex.map { case (x, i) => if (i == 0) x + 0.5 else x.toDouble }.toArray
    var d2 = 0.0
    v.foreach(x => d2 += x * x)
    (0L, 0, 0, sr, idx.toLong, v, math.sqrt(d2))
  }.toArray

  private val genMinCos: Gen[Double] =
    Gen.oneOf(Gen.const(-2.0), Gen.chooseNum(-1.0, 1.0))

  /** The pre-r14 reference: buffer every pair of the block eagerly. */
  private def naive(rows: Array[Row], bi: Int, bj: Int,
                    minCos: Double): Seq[(Long, Long, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    def cosPair(a: Row, b: Row): Unit = {
      val (ida, ea, na) = (a._5, a._6, a._7)
      val (idb, eb, nb) = (b._5, b._6, b._7)
      var dot = 0.0
      var k = 0
      while (k < ea.length) { dot += ea(k) * eb(k); k += 1 }
      val cos = dot / (na * nb)
      if (cos >= minCos)
        out += (if (ida < idb) (ida, idb, cos) else (idb, ida, cos))
    }
    if (bi == bj) {
      var i = 0
      while (i < rows.length) {
        var j = i + 1
        while (j < rows.length) { cosPair(rows(i), rows(j)); j += 1 }
        i += 1
      }
    } else {
      val a = rows.filter(_._4 == bi)
      val b = rows.filter(_._4 == bj)
      var i = 0
      while (i < a.length) {
        var j = 0
        while (j < b.length) { cosPair(a(i), b(j)); j += 1 }
        i += 1
      }
    }
    out.toSeq
  }

  property("diagonal block: streamed == buffered, element for element") =
    Prop.forAll(genRows, genMinCos) { (rows, minCos) =>
      val got = Dedup.blockPairIterator(rows, 0, 0, minCos).toSeq
      val want = naive(rows, 0, 0, minCos)
      got == want
    }

  property("off-diagonal block: streamed == buffered, element for element") =
    Prop.forAll(genRows, genMinCos) { (rows, minCos) =>
      val got = Dedup.blockPairIterator(rows, 0, 1, minCos).toSeq
      val want = naive(rows, 0, 1, minCos)
      got == want
    }

  property("no threshold: diagonal emits exactly n-choose-2 id-ordered pairs, once each") =
    Prop.forAll(genRows) { rows =>
      val got = Dedup.blockPairIterator(rows, 0, 0, -2.0).toSeq
      val n = rows.length
      got.size == n * (n - 1) / 2 &&
        got.forall { case (a, b, _) => a < b } &&
        got.map(p => (p._1, p._2)).distinct.size == got.size
    }

  property("iterator is restartable-safe: hasNext is idempotent") =
    Prop.forAll(genRows, genMinCos) { (rows, minCos) =>
      val it = Dedup.blockPairIterator(rows, 0, 0, minCos)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      while (it.hasNext && it.hasNext) out += it.next()
      out.toSeq == naive(rows, 0, 0, minCos)
    }
}
