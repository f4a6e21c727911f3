package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Hamming distance between two equal-length
  * bit-strings (the SimHash signature form) in one fused byte loop, with
  * whole-stage codegen.
  *
  * The declarative form — 64 chained `substring(a,i,1) <> substring(b,i,1)`
  * terms (graft.operators.Dedup.simhashNearDup's verify step) — is
  * codegen'd too, but each term re-enters UTF8String.substring and the
  * 64-term sum bloats the generated method toward the JIT inline limits.
  * One byte-compare loop is the natural machine shape: SimHash signatures
  * are ASCII '0'/'1', so byte inequality IS bit inequality. Rung two of
  * the extension ladder (compose built-ins → custom Expression → custom
  * plan), same as [[CosineSimilarity]].
  *
  * Strings of unequal length count the overhang as distance (cannot occur
  * for fixed-width signatures; defined so the expression totals rather
  * than nulls).
  */
case class HammingDistance(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hamming_dist expects two string arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType

  override def prettyName: String = "hamming_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String].getBytes
    val y = b.asInstanceOf[UTF8String].getBytes
    val n = math.min(x.length, y.length)
    var d = math.abs(x.length - y.length).toLong
    var i = 0
    while (i < n) {
      if (x(i) != y(i)) d += 1L
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |byte[] $x = $a.getBytes();
         |byte[] $y = $b.getBytes();
         |int $n = Math.min($x.length, $y.length);
         |${ev.value} = (long) Math.abs($x.length - $y.length);
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x[$i] != $y[$i]) ${ev.value} += 1L;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}
