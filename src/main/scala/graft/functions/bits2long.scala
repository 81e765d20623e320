package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_bits2long(s)` — packs a '0'/'1' character string into a long:
  * char j of the input sets bit j of the result (little-endian char
  * order, matching the prefix-structured band-key layout where char j
  * IS bit j — `graft.MediaOps.dhashBandKeys`). Chars beyond 64 are
  * ignored; any non-'1' char contributes a 0 bit.
  *
  * Why custom: the adaptive Hamming band keys travel the candidate-join
  * shuffle as up-to-80-char strings (4–12 per doc). Packing a width-w
  * prefix (w ≤ 64 on every dial step but the ceiling) into one long
  * cuts the exploded band frame's shuffle key from w bytes to 8 while
  * staying INJECTIVE — identical candidate sets, cheaper exchange. The
  * SQL route (`aggregate(split(...))`) is interpreted and allocates;
  * this is a primitive loop fused into whole-stage codegen.
  */
case class Bits2Long(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bits2long"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string input, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = math.min(s.numBytes(), 64)
    var acc = 0L
    var j = 0
    while (j < n) {
      if (s.getByte(j) == '1') acc |= 1L << j
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($s.numBytes(), 64);
         |long $acc = 0L;
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($s.getByte($j) == (byte) '1') $acc |= 1L << $j;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Bits2Long =
    copy(child = newChild)
}
