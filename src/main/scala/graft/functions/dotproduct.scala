package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `graft_dot(a, b)` — left-to-right dot product of two numeric arrays,
  * each element widened to double, as a native Catalyst expression with
  * whole-stage codegen.
  *
  * Why custom: Spark's higher-order route
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)` is
  * semantically identical but evaluates interpreted (HOFs have no
  * codegen) and allocates the intermediate product array; in the
  * similarity suite the fold runs once per candidate PAIR, so it is the
  * hot loop. This expression generates a primitive loop — no
  * allocation, no boxing, fused into the surrounding stage.
  *
  * Exactness: identical operation order to both the HOF form and the
  * DuckDB oracle's list_reduce (sum_i a[i]·b[i], ascending i, IEEE
  * exactly-rounded ops) — results are bit-identical, which the oracle
  * gate and ExtensionsSpec assert. Array elements must be non-null;
  * lengths are clamped to the shorter input.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<float|double> inputs, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(aa.numElements(), bb.numElements())
    val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) aa.getFloat(i).toDouble else aa.getDouble(i)
      val y = if (rf) bb.getFloat(i).toDouble else bb.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getA = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $getA * $getB;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  private[functions] val fns: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))),
    (FunctionIdentifier("graft_bits2long"),
      new ExpressionInfo(classOf[Bits2Long].getName, "graft_bits2long"),
      (children: Seq[Expression]) => Bits2Long(children(0))),
    (FunctionIdentifier("graft_pq_best"),
      new ExpressionInfo(classOf[PqBest].getName, "graft_pq_best"),
      (children: Seq[Expression]) => PqBest(children(0), children(1))),
    (FunctionIdentifier("graft_pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "graft_pq_adc"),
      (children: Seq[Expression]) => PqAdc(children(0), children(1))),
    (FunctionIdentifier("graft_pq_dcode"),
      new ExpressionInfo(classOf[PqDcode].getName, "graft_pq_dcode"),
      (children: Seq[Expression]) => PqDcode(children(0), children(1), children(2))),
    (FunctionIdentifier("graft_route_max"),
      new ExpressionInfo(classOf[RouteMax].getName, "graft_route_max"),
      (children: Seq[Expression]) => RouteMax(children(0), children(1), children(2))),
    (FunctionIdentifier("graft_km_best"),
      new ExpressionInfo(classOf[KmBest].getName, "graft_km_best"),
      (children: Seq[Expression]) => KmBest(children(0), children(1), children(2))),
    (FunctionIdentifier("graft_lsh_bucket"),
      new ExpressionInfo(classOf[LshBucket].getName, "graft_lsh_bucket"),
      (children: Seq[Expression]) => children match {
        // optional 2nd arg: plane count, a plan-time integer literal
        // (callers derive it from the corpus size — Similarity.derivePlanes)
        case Seq(e) => LshBucket(e)
        case Seq(e, p) =>
          val planes = p match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
            case other => throw new IllegalArgumentException(
              s"graft_lsh_bucket: planes must be an integer literal, got $other")
          }
          LshBucket(e, planes)
        case other => throw new IllegalArgumentException(
          s"graft_lsh_bucket takes 1 or 2 arguments, got ${other.length}")
      }))

  /** Imperative registration for sessions built without the extensions
    * config (idempotent — re-registration overwrites with the same fn). */
  def ensureRegistered(spark: SparkSession): Unit = fns.foreach {
    case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` injects the
  * engine's native functions at session build time (the idiomatic
  * deployment route; GraftFunctions.ensureRegistered is the programmatic
  * twin used by the library entry points). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.fns.foreach(ext.injectFunction)
}
