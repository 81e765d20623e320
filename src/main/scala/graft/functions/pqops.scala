package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Spark SQL's total order on doubles (SQLOrderingUtil.compareDoubles):
  * `-0.0 == 0.0`, NaN greatest and equal to itself — the comparator
  * behind array_min's struct ordering, replicated here so the native
  * argmin below is bit-identical to the higher-order-function form it
  * replaces. */
private object PqOps {
  @inline def cmpDouble(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)
}

/** `graft_pq_best(subs, bys)` — the PQ ENCODE argmin as one native
  * codegen-friendly expression.
  *
  * Exactly [[graft.Similarity]]'s `pqBestExpr` higher-order chain
  *
  * {{{ transform(sequence(0, m-1), sx -> array_min(transform(bys[sx],
  *     cx -> named_struct('d', (subs[sx].vv - (2 * graft_dot(subs[sx].v,
  *     cx.c))) + cx.cc, 'cid', cx.cid)))) }}}
  *
  * with m = size of both inputs: per subspace, the centroid minimizing
  * the expanded L2 distance d = vv − 2·(v·c) + cc, ties to the lowest
  * cid (array_min's struct order: d first via the SQL double order,
  * then cid). The dot is graft_dot's ascending float→double-widened
  * fold; the d arithmetic keeps the exact operation order, so results
  * are BIT-IDENTICAL to the HOF form (ExtensionsSpec pins it).
  *
  * Why native (guide §4 / §1.2 step 2): the HOF chain evaluates
  * interpreted — per corpus row it walks ~m·k lambda-bound expression
  * trees and allocates an m·k struct array just to take its min — and
  * this is THE per-row hot loop of the PQ family's encode/fit/search
  * paths (corpus-sized at 100 TB). This expression is one primitive
  * loop, no intermediate allocation, and inlines into whole-stage
  * codegen via a single method call.
  *
  * Input contract (the pqCorpusOf/pqCellsOf shapes): `subs` is
  * array<struct<s:int, v:array<float>, vv:double>>, `bys` is
  * array<array<struct<s:int, cid:int, c:array<double>, cc:double>>>,
  * elements non-null (same contract as graft_dot). An empty cell list
  * yields a null entry, exactly like array_min over an empty array. */
case class PqBest(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_pq_best"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("d", DoubleType, nullable = false),
      StructField("cid", IntegerType, nullable = false))),
    containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = {
    def subsOk(t: DataType) = t match {
      case ArrayType(StructType(fs), _) if fs.length == 3 =>
        fs(1).dataType == ArrayType(FloatType, false) ||
          fs(1).dataType == ArrayType(FloatType, true)
      case _ => false
    }
    def bysOk(t: DataType) = t match {
      case ArrayType(ArrayType(StructType(fs), _), _) if fs.length == 4 =>
        (fs(2).dataType match {
          case ArrayType(DoubleType, _) => true
          case _ => false
        }) && fs(3).dataType == DoubleType && fs(1).dataType == IntegerType
      case _ => false
    }
    if (subsOk(left.dataType) && bysOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (array<struct<s,v:array<float>,vv:double>>, " +
        s"array<array<struct<s,cid:int,c:array<double>,cc:double>>>), " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  /** The primitive loop — shared by interpreted eval and codegen (the
    * generated code calls this method once per row, which keeps the
    * surrounding stage in whole-stage codegen). */
  def best(subsA: ArrayData, bysA: ArrayData): ArrayData = {
    val m = math.min(subsA.numElements(), bysA.numElements())
    val out = new Array[Any](m)
    var sx = 0
    while (sx < m) {
      val sub = subsA.getStruct(sx, 3)
      val v = sub.getArray(1)
      val vv = sub.getDouble(2)
      val cells = bysA.getArray(sx)
      val nc = cells.numElements()
      var has = false
      var bestD = 0.0
      var bestCid = 0
      var j = 0
      while (j < nc) {
        val cx = cells.getStruct(j, 4)
        val c = cx.getArray(2)
        val n = math.min(v.numElements(), c.numElements())
        var acc = 0.0
        var i = 0
        while (i < n) { acc += v.getFloat(i).toDouble * c.getDouble(i); i += 1 }
        val d = (vv - (2 * acc)) + cx.getDouble(3)
        val cid = cx.getInt(1)
        val cmp = PqOps.cmpDouble(d, bestD)
        if (!has || cmp < 0 || (cmp == 0 && cid < bestCid)) {
          has = true; bestD = d; bestCid = cid
        }
        j += 1
      }
      out(sx) = if (has) InternalRow(bestD, bestCid) else null
      sx += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    best(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBest", this, classOf[PqBest].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.best($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqBest =
    copy(left = newLeft, right = newRight)
}

/** `graft_pq_adc(dtab, codes)` — the ADC table fold as one native
  * codegen-friendly expression.
  *
  * Exactly the higher-order chain
  *
  * {{{ aggregate(sequence(0, m-1), cast(0.0 as double), (acc, sx) ->
  *     acc + element_at(filter(dtab[sx], tx -> tx.cid = codes[sx]), 1).dq) }}}
  *
  * with m = size of both inputs: ascending-subspace sum of each stored
  * code's table entry — the first dtab[sx] entry whose cid equals the
  * row's code (the tables are cid-unique by construction; "first
  * match" replicates element_at(filter(...), 1) verbatim). A code with
  * NO table entry yields NULL, exactly like the HOF's null `.dq`
  * poisoning the fold. The addition order is the HOF's ascending-sx
  * fold, so results are BIT-IDENTICAL (ExtensionsSpec pins it).
  *
  * `codes` is array<int> (the stored-code shape) or the array<struct<d,
  * cid>> that [[PqBest]] returns (the search shape — saves the caller a
  * transform() just to project cid). Same motivation as [[PqBest]]:
  * this fold runs once per (query, stored-row) candidate, the hot loop
  * of every ADC scan. */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_pq_adc"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def codesAreStructs: Boolean = right.dataType match {
    case ArrayType(_: StructType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def dtabOk(t: DataType) = t match {
      case ArrayType(ArrayType(StructType(fs), _), _) if fs.length == 2 =>
        fs(0).dataType == IntegerType && fs(1).dataType == DoubleType
      case _ => false
    }
    def codesOk(t: DataType) = t match {
      case ArrayType(IntegerType, _) => true
      // the PqBest output shape: struct<d:double, cid:int>
      case ArrayType(StructType(fs), _) =>
        fs.length == 2 && fs(1).dataType == IntegerType
      case _ => false
    }
    if (dtabOk(left.dataType) && codesOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (array<array<struct<cid:int,dq:double>>>, " +
        s"array<int> | array<struct<d,cid:int>>), " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  /** The primitive fold — shared by interpreted eval and codegen. The
    * boxed return carries the HOF's null-poisoning semantics. */
  def adc(dtabA: ArrayData, codesA: ArrayData): java.lang.Double = {
    val structs = codesAreStructs
    val m = math.min(dtabA.numElements(), codesA.numElements())
    var acc = 0.0
    var sx = 0
    while (sx < m) {
      val code =
        if (structs) codesA.getStruct(sx, 2).getInt(1) else codesA.getInt(sx)
      val tab = dtabA.getArray(sx)
      val nt = tab.numElements()
      var j = 0
      var found = false
      var dq = 0.0
      while (j < nt && !found) {
        val tx = tab.getStruct(j, 2)
        if (tx.getInt(0) == code) { found = true; dq = tx.getDouble(1) }
        j += 1
      }
      if (!found) return null // ≡ acc + null.dq: the fold goes null
      acc += dq
      sx += 1
    }
    acc
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    adc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdc].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |java.lang.Double ${ev.value}Boxed = $ref.adc($a, $b);
         |if (${ev.value}Boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}Boxed.doubleValue();
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

/** `graft_pq_dcode(subs, bys, codes)` — the STORED-code distortion
  * reconstruction as one native codegen-friendly expression.
  *
  * Exactly the higher-order chain (with `at(sx)` =
  * `element_at(filter(bys[sx], cx -> cx.cid = codes[sx]), 1)`):
  *
  * {{{ aggregate(sequence(0, m-1), cast(0.0 as double), (acc, sx) ->
  *     acc + ((subs[sx].vv - (2 * graft_dot(subs[sx].v, at(sx).c)))
  *            + at(sx).cc)) }}}
  *
  * with m = size of the inputs: per subspace, look up the stored
  * code's centroid (first match — the tables are cid-unique by
  * construction) and accumulate d = vv − 2·(v·c) + cc in ascending-s
  * order, graft_dot's ascending float→double fold inside. The HOF form
  * evaluates the filter TWICE per subspace (once for `.c`, once for
  * `.cc`) and walks the lambda trees per corpus row — this is the
  * drift dial's full-corpus pass (q149 / the auto-refit trigger), the
  * same hot-loop shape [[PqBest]] removes from the encode path. A code
  * with no codebook entry yields NULL (the PqAdc lenient-edge stance:
  * unreachable in production, and the HOF under ANSI would error
  * there). Bit-identity with the HOF chain is pinned in
  * ExtensionsSpec. */
case class PqDcode(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def prettyName: String = "graft_pq_dcode"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def subsOk(t: DataType) = t match {
      case ArrayType(StructType(fs), _) if fs.length == 3 =>
        (fs(1).dataType match {
          case ArrayType(FloatType, _) => true
          case _ => false
        }) && fs(2).dataType == DoubleType
      case _ => false
    }
    def bysOk(t: DataType) = t match {
      case ArrayType(ArrayType(StructType(fs), _), _) if fs.length == 4 =>
        (fs(2).dataType match {
          case ArrayType(DoubleType, _) => true
          case _ => false
        }) && fs(3).dataType == DoubleType && fs(1).dataType == IntegerType
      case _ => false
    }
    def codesOk(t: DataType) = t match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (subsOk(first.dataType) && bysOk(second.dataType) && codesOk(third.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (array<struct<s,v:array<float>,vv:double>>, " +
        s"array<array<struct<s,cid:int,c:array<double>,cc:double>>>, array<int>), " +
        s"got ${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql}")
  }

  /** The primitive fold — shared by interpreted eval and codegen. */
  def dcode(subsA: ArrayData, bysA: ArrayData, codesA: ArrayData): java.lang.Double = {
    val m = math.min(subsA.numElements(),
      math.min(bysA.numElements(), codesA.numElements()))
    var acc = 0.0
    var sx = 0
    while (sx < m) {
      val sub = subsA.getStruct(sx, 3)
      val v = sub.getArray(1)
      val vv = sub.getDouble(2)
      val code = codesA.getInt(sx)
      val cells = bysA.getArray(sx)
      val nc = cells.numElements()
      var j = 0
      var found = false
      var d = 0.0
      while (j < nc && !found) {
        val cx = cells.getStruct(j, 4)
        if (cx.getInt(1) == code) {
          found = true
          val c = cx.getArray(2)
          val n = math.min(v.numElements(), c.numElements())
          var dot = 0.0
          var i = 0
          while (i < n) { dot += v.getFloat(i).toDouble * c.getDouble(i); i += 1 }
          d = (vv - (2 * dot)) + cx.getDouble(3)
        }
        j += 1
      }
      if (!found) return null // ≡ the null-poisoned HOF fold
      acc += d
      sx += 1
    }
    acc
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    dcode(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqDcode", this, classOf[PqDcode].getName)
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"""
         |java.lang.Double ${ev.value}Boxed = $ref.dcode($a, $b, $c);
         |if (${ev.value}Boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}Boxed.doubleValue();
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqDcode =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `graft_route_max(e, nrm, cells)` — the coarse-routing cosine argmax
  * as one native codegen-friendly expression.
  *
  * Exactly the higher-order chain
  *
  * {{{ array_max(transform(cells, c -> named_struct(
  *     'cos', graft_dot(e, c.centroid) /
  *       (nrm * sqrt(graft_dot(c.centroid, c.centroid))),
  *     'nl', -c.c_label))) }}}
  *
  * the per-row router of every IVF/ANN/PQ build, merge and probe: max
  * cosine, ties to the HIGHEST nl = lowest c_label (array_max's struct
  * order over the SQL double total order). Identical arithmetic per
  * cell — graft_dot's ascending widened fold, sqrt, the same
  * `dot / (nrm * sqrt(cc))` operation order — so results are
  * BIT-IDENTICAL to the HOF form (ExtensionsSpec pins it). The HOF
  * walked ~k lambda-bound trees per corpus row, recomputed each
  * centroid's self-dot + sqrt per row, allocated a k-struct array to
  * take its max, and broke whole-stage codegen; this is one primitive
  * loop. Empty cells → null (array_max semantics). */
case class RouteMax(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def prettyName: String = "graft_route_max"

  override def dataType: DataType = StructType(Seq(
    StructField("cos", DoubleType, nullable = false),
    StructField("nl", IntegerType, nullable = false)))

  private def arrOk(t: DataType) = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def cellsOk(t: DataType) = t match {
      case ArrayType(StructType(fs), _) if fs.length == 2 =>
        fs(0).dataType == IntegerType && arrOk(fs(1).dataType)
      case _ => false
    }
    if (arrOk(first.dataType) && second.dataType == DoubleType &&
        cellsOk(third.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (array<float|double>, double, " +
        s"array<struct<c_label:int,centroid:array<float|double>>>), " +
        s"got ${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql}")
  }

  private def eIsFloat: Boolean = first.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private def cIsFloat: Boolean = third.dataType match {
    case ArrayType(StructType(fs), _) => fs(1).dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    case _ => false
  }

  /** The primitive loop — shared by interpreted eval and codegen. */
  def route(eA: ArrayData, nrm: Double, cellsA: ArrayData): InternalRow = {
    val (ef, cf) = (eIsFloat, cIsFloat)
    val ne = eA.numElements()
    val k = cellsA.numElements()
    var has = false
    var bestCos = 0.0
    var bestNl = 0
    var j = 0
    while (j < k) {
      val cell = cellsA.getStruct(j, 2)
      val c = cell.getArray(1)
      val n = math.min(ne, c.numElements())
      var dot = 0.0
      var cc = 0.0
      var i = 0
      while (i < n) {
        val x = if (ef) eA.getFloat(i).toDouble else eA.getDouble(i)
        val y = if (cf) c.getFloat(i).toDouble else c.getDouble(i)
        dot += x * y
        i += 1
      }
      // the centroid self-dot runs over the FULL centroid length, like
      // the HOF's graft_dot(c.centroid, c.centroid)
      val nc = c.numElements()
      i = 0
      while (i < nc) {
        val y = if (cf) c.getFloat(i).toDouble else c.getDouble(i)
        cc += y * y
        i += 1
      }
      val cos = dot / (nrm * java.lang.Math.sqrt(cc))
      val nl = -cell.getInt(0)
      val cmp = PqOps.cmpDouble(cos, bestCos)
      if (!has || cmp > 0 || (cmp == 0 && nl > bestNl)) {
        has = true; bestCos = cos; bestNl = nl
      }
      j += 1
    }
    if (has) InternalRow(bestCos, bestNl) else null
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    route(a.asInstanceOf[ArrayData], b.asInstanceOf[Double],
      c.asInstanceOf[ArrayData])

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("routeMax", this, classOf[RouteMax].getName)
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"""
         |org.apache.spark.sql.catalyst.InternalRow ${ev.value}Row = $ref.route($a, $b, $c);
         |if (${ev.value}Row == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}Row;
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): RouteMax =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `graft_km_best(embedding, ee, cells)` — the k-means nearest-centroid
  * argmin as one native codegen-friendly expression.
  *
  * Exactly the higher-order chain
  *
  * {{{ array_min(transform(cells, x -> named_struct(
  *     'd', (ee - (2 * graft_dot(embedding, x.c))) + x.cc,
  *     'cid', x.cid))) }}}
  *
  * — the per-row Lloyd assignment of the k-means family (cells carry
  * the PREcomputed self-dot cc, unlike [[RouteMax]]): min expanded-L2
  * d, ties to the lowest cid. Same d arithmetic order and SQL double
  * order as [[PqBest]]; bit-identity pinned in ExtensionsSpec. Empty
  * cells → null (array_min semantics). */
case class KmBest(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def prettyName: String = "graft_km_best"

  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("cid", IntegerType, nullable = false)))

  private def arrOk(t: DataType) = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def cellsOk(t: DataType) = t match {
      case ArrayType(StructType(fs), _) if fs.length == 3 =>
        fs(0).dataType == IntegerType && arrOk(fs(1).dataType) &&
          fs(2).dataType == DoubleType
      case _ => false
    }
    if (arrOk(first.dataType) && second.dataType == DoubleType &&
        cellsOk(third.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (array<float|double>, double, " +
        s"array<struct<cid:int,c:array<float|double>,cc:double>>), " +
        s"got ${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql}")
  }

  private def eIsFloat: Boolean = first.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private def cIsFloat: Boolean = third.dataType match {
    case ArrayType(StructType(fs), _) => fs(1).dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    case _ => false
  }

  /** The primitive loop — shared by interpreted eval and codegen. */
  def best(eA: ArrayData, ee: Double, cellsA: ArrayData): InternalRow = {
    val (ef, cf) = (eIsFloat, cIsFloat)
    val ne = eA.numElements()
    val k = cellsA.numElements()
    var has = false
    var bestD = 0.0
    var bestCid = 0
    var j = 0
    while (j < k) {
      val cell = cellsA.getStruct(j, 3)
      val c = cell.getArray(1)
      val n = math.min(ne, c.numElements())
      var dot = 0.0
      var i = 0
      while (i < n) {
        val x = if (ef) eA.getFloat(i).toDouble else eA.getDouble(i)
        val y = if (cf) c.getFloat(i).toDouble else c.getDouble(i)
        dot += x * y
        i += 1
      }
      val d = (ee - (2 * dot)) + cell.getDouble(2)
      val cid = cell.getInt(0)
      val cmp = PqOps.cmpDouble(d, bestD)
      if (!has || cmp < 0 || (cmp == 0 && cid < bestCid)) {
        has = true; bestD = d; bestCid = cid
      }
      j += 1
    }
    if (has) InternalRow(bestD, bestCid) else null
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    best(a.asInstanceOf[ArrayData], b.asInstanceOf[Double],
      c.asInstanceOf[ArrayData])

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kmBest", this, classOf[KmBest].getName)
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"""
         |org.apache.spark.sql.catalyst.InternalRow ${ev.value}Row = $ref.best($a, $b, $c);
         |if (${ev.value}Row == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}Row;
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): KmBest =
    copy(first = newFirst, second = newSecond, third = newThird)
}
