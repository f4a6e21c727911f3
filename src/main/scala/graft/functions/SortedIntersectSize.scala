package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: |A ∩ B| over two ASCENDING-SORTED string
  * arrays as one allocation-free merge walk, with whole-stage codegen.
  *
  * This is the verify-step kernel of every exact set-overlap operator in
  * the engine (shingle Jaccard in Dedup, token Jaccard in SetSimJoin,
  * winnow-candidate containment): candidates are generated per PAIR
  * (~10⁶ rows at sf0.1) while the arrays are built per DOC (~10⁴ rows),
  * so the per-pair kernel dominates. The built-in
  * `size(array_intersect(a, b))` is codegen'd but allocates an
  * OpenHashSet AND materializes the intersection as a result array per
  * row, only for `size` to throw the array away. Sorting each doc's
  * array ONCE at build time (n log n on the small side of the
  * pair/doc asymmetry) buys a zero-allocation two-pointer merge per
  * pair — the same trade PPJoin makes with its global token order.
  *
  * Contract: both arrays sorted ascending in UTF8String binary order
  * (`sort_array`'s default). Duplicates are allowed and counted ONCE
  * (set semantics — matches `size(array_intersect(a, b))` on NULL-FREE
  * arrays). Null elements sort first under `sort_array` and are
  * SKIPPED here, which diverges from `array_intersect` (Spark counts a
  * null present in BOTH arrays as a common element — ADVICE r7): no
  * in-repo producer emits null elements, so don't rely on equivalence
  * if one ever does. Null ARRAY input → null (standard
  * BinaryExpression null propagation). Unsorted input is NOT detected —
  * callers own the ordering (all in-repo callers sort at the doc-side
  * projection).
  *
  * Rung two of the extension ladder (compose built-ins → custom
  * Expression → custom plan), same as [[CosineSimilarity]] and
  * [[HammingDistance]].
  */
case class SortedIntersectSize(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isStringArray(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isStringArray(left.dataType) && isStringArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_size expects two array<string> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val xv = x.getUTF8String(i)
        val yv = y.getUTF8String(j)
        val cmp = xv.compareTo(yv)
        if (cmp < 0) i += 1
        else if (cmp > 0) j += 1
        else {
          c += 1
          i += 1
          j += 1
          while (i < n && !x.isNullAt(i) && x.getUTF8String(i).equals(xv))
            i += 1
          while (j < m && !y.isNullAt(j) && y.getUTF8String(j).equals(yv))
            j += 1
        }
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val cmp = ctx.freshName("cmp")
      val u = classOf[UTF8String].getName
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0;
         |int $j = 0;
         |${ev.value} = 0;
         |while ($i < $n && $j < $m) {
         |  if ($a.isNullAt($i)) { $i++; continue; }
         |  if ($b.isNullAt($j)) { $j++; continue; }
         |  $u $xv = $a.getUTF8String($i);
         |  $u $yv = $b.getUTF8String($j);
         |  int $cmp = $xv.compareTo($yv);
         |  if ($cmp < 0) { $i++; }
         |  else if ($cmp > 0) { $j++; }
         |  else {
         |    ${ev.value}++;
         |    $i++; $j++;
         |    while ($i < $n && !$a.isNullAt($i) &&
         |           $a.getUTF8String($i).equals($xv)) { $i++; }
         |    while ($j < $m && !$b.isNullAt($j) &&
         |           $b.getUTF8String($j).equals($yv)) { $j++; }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}
