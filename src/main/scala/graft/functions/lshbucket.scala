package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** `graft_lsh_bucket(e[, planes])` — random-hyperplane LSH bucket id
  * (`planes` sign bits, default 8) of a float-vector column, as ONE
  * native expression.
  *
  * The hyperplane coefficients are a closed-form integer formula,
  * coef(p, j) = ((p·73856093 + j·19349663) mod 97) / 48.0 − 1.0,
  * evaluated inline in the projection loop — so the expression tree is a
  * single node with zero references. The previous formulation inlined the
  * same planes as 8 × 64 literal doubles through the SQL parser: ~13 KB
  * of expression text per join side that every analyzer/optimizer pass —
  * and every AQE re-optimization at every stage boundary — re-traversed.
  * At 100 TB plane/dim counts grow; this keeps the plan O(1) regardless.
  *
  * `planes` is a plan-time constant (the callers derive it from the
  * corpus row count — [[graft.Similarity.derivePlanes]] — so bucket
  * occupancy stays ~constant as the corpus grows instead of the pair
  * stages going quadratic in a fixed 256-bucket space); it is a case
  * field, not a child, so canonicalization distinguishes bucket spaces.
  *
  * Bit-exactness: identical operation order to the literal-array form
  * and to the DuckDB oracle ([[graft.Similarity.bucketSqlDuck]]) — the
  * coefficient is exact integer arithmetic then one exact division and
  * subtraction; the projection is the same left-to-right
  * float→double-widened fold as [[DotProduct]]. ExtensionsSpec pins
  * equivalence against the literal-array route over the corpus.
  * Array elements must be non-null (same contract as graft_dot).
  */
case class LshBucket(child: Expression, planes: Int = LshBucket.NPlanes)
    extends UnaryExpression {
  require(planes >= 1 && planes <= 62,
    s"graft_lsh_bucket: planes must be in [1, 62], got $planes")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_bucket"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<float|double> input, got ${t.sql}")
    }

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val isF = elemIsFloat
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var acc = 0.0
      var j = 0
      while (j < n) {
        val coef = ((p.toLong * 73856093L + j.toLong * 19349663L) % 97L) / 48.0 - 1.0
        val x = if (isF) arr.getFloat(j).toDouble else arr.getDouble(j)
        acc += x * coef
        j += 1
      }
      if (acc > 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val coef = ctx.freshName("coef")
      val bucket = ctx.freshName("bucket")
      val getX = if (elemIsFloat) s"(double) $a.getFloat($j)" else s"$a.getDouble($j)"
      s"""
         |int $n = $a.numElements();
         |long $bucket = 0L;
         |for (int $p = 0; $p < $planes; $p++) {
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    double $coef = (((long) $p * 73856093L + (long) $j * 19349663L) % 97L) / 48.0 - 1.0;
         |    $acc += $getX * $coef;
         |  }
         |  if ($acc > 0) $bucket |= 1L << $p;
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object LshBucket {
  /** Default plane count — the FIXTURE-SCALE value of the derived dial
    * ([[graft.Similarity.derivePlanes]] floors at 8, and both fixture
    * corpora sit below the first growth threshold, so every oracle row
    * is unchanged by the parameterization). The DuckDB twin and the
    * equivalence spec pin the two engines together. */
  val NPlanes = 8
}
