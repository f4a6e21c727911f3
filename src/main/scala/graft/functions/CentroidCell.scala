package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: index of the max-dot centroid for an
  * embedding column, over a LITERAL centroid matrix (ties → lowest index).
  *
  * This is the IVF-assignment hot path's drop-to-native optimization — the
  * same ladder rung as [[CosineSimilarity]]. The declarative form (one
  * `aggregate(zip_with(vec, array(64 literals)))` per centroid, duplicated
  * again inside a `greatest`/CASE argmax chain — see the r6 history of
  * graft.operators.Similarity.centroidCell) runs its higher-order lambdas
  * OUTSIDE whole-stage codegen and re-evaluates every dot product ~3×;
  * at k=8, dim=64 that made per-row assignment the entire cost of the
  * trained-quantizer family (sim_diverse_sample at 42 s on a 0.8 MB
  * table, VERDICT r6). Here the k·dim matrix rides along as ONE flat
  * double[] reference object and each dot product accumulates once, in
  * ascending index order — bit-identical to the declarative fold and to
  * the DuckDB oracle's unnest-sum replay, so every trained-family
  * correctness row keeps its hash.
  *
  * Accepts `array<float>` (the raw embedding column) or `array<double>`
  * (the PQ subspace slices); floats widen to double per element exactly
  * like the `cast(array<double>)` the declarative form applied.
  */
abstract class CentroidArgmaxBase extends UnaryExpression {
  def cents: Seq[Seq[Double]]

  @transient protected lazy val k: Int = cents.length
  @transient protected lazy val dim: Int = cents.head.length
  @transient protected lazy val flat: Array[Double] = {
    val a = new Array[Double](k * dim)
    var c = 0
    while (c < k) {
      var i = 0
      while (i < dim) { a(c * dim + i) = cents(c)(i); i += 1 }
      c += 1
    }
    a
  }

  @transient protected lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _)
      if cents.nonEmpty && cents.forall(_.length == cents.head.length) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>/array<double> and a non-ragged " +
        s"centroid matrix, got ${other.simpleString}")
  }

  /** Per-centroid dot products, sequential fold in index order — the same
    * arithmetic as aggregate(zip_with(v, c, _*_), 0.0, _+_).
    */
  protected def scores(v: ArrayData): Array[Double] = {
    val n = math.min(dim, v.numElements())
    val s = new Array[Double](k)
    var c = 0
    while (c < k) {
      var acc = 0.0
      var i = 0
      if (elemIsFloat) while (i < n) {
        acc += v.getFloat(i).toDouble * flat(c * dim + i); i += 1
      } else while (i < n) {
        acc += v.getDouble(i) * flat(c * dim + i); i += 1
      }
      s(c) = acc
      c += 1
    }
    s
  }

  /** First index of the max — strict `>` keeps the LOWEST index on ties,
    * the same rule as the greatest/first-match CASE chain and the
    * oracle's row_number ORDER BY s DESC, cell.
    */
  protected def argmax(s: Array[Double]): Int = {
    var bi = 0
    var bs = s(0)
    var c = 1
    while (c < k) { if (s(c) > bs) { bs = s(c); bi = c }; c += 1 }
    bi
  }

  /** Shared codegen prologue: the per-centroid score array. Returns
    * (code, scoresVar).
    */
  protected def genScores(ctx: CodegenContext, a: String): (String, String) = {
    val flatRef = ctx.addReferenceObj("cents", flat, "double[]")
    val s = ctx.freshName("s")
    val n = ctx.freshName("n")
    val c = ctx.freshName("c")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    val getter = if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
    val code =
      s"""
         |int $n = Math.min($dim, $a.numElements());
         |double[] $s = new double[$k];
         |for (int $c = 0; $c < $k; $c++) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $getter * $flatRef[$c * $dim + $i];
         |  }
         |  $s[$c] = $acc;
         |}
       """.stripMargin
    (code, s)
  }

  /** Codegen argmax over `s` into a fresh int var (strict `>`, lowest
    * index on ties). Returns (code, idxVar).
    */
  protected def genArgmax(ctx: CodegenContext, s: String): (String, String) = {
    val bi = ctx.freshName("bi")
    val c = ctx.freshName("c")
    val code =
      s"""
         |int $bi = 0;
         |for (int $c = 1; $c < $k; $c++) {
         |  if ($s[$c] > $s[$bi]) { $bi = $c; }
         |}
       """.stripMargin
    (code, bi)
  }
}

/** `centroid_cell(vec, matrix)`: the IVF cell id (int). */
case class CentroidCell(child: Expression, cents: Seq[Seq[Double]])
  extends CentroidArgmaxBase {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "centroid_cell"

  override def nullSafeEval(input: Any): Any =
    argmax(scores(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val (scode, s) = genScores(ctx, a)
      val (acode, bi) = genArgmax(ctx, s)
      s"""
         |$scode
         |$acode
         |${ev.value} = $bi;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CentroidCell =
    copy(child = newChild)
}

/** `centroid_probe_cells(vec, matrix)`: [nearest, 2nd-nearest] cell ids —
  * the multi-probe recall knob. The runner-up is the argmax after masking
  * the winner's score to -Double.MaxValue, exactly the declarative
  * masking rule (and the oracle's -1.7976931348623157e308 literal).
  */
case class CentroidProbeCells(child: Expression, cents: Seq[Seq[Double]])
  extends CentroidArgmaxBase {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "centroid_probe_cells"

  override def nullSafeEval(input: Any): Any = {
    val s = scores(input.asInstanceOf[ArrayData])
    val first = argmax(s)
    s(first) = Double.MinValue
    new GenericArrayData(Array[Any](first, argmax(s)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val (scode, s) = genScores(ctx, a)
      val (acode, bi) = genArgmax(ctx, s)
      val (a2code, si) = genArgmax(ctx, s)
      s"""
         |$scode
         |$acode
         |$s[$bi] = -Double.MAX_VALUE;
         |$a2code
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  new Object[]{Integer.valueOf($bi), Integer.valueOf($si)});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CentroidProbeCells =
    copy(child = newChild)
}

/** `projection_bits(vec, planes)`: the sign-bit random-projection LSH
  * bucket as a '0'/'1' string — bit i is whether dot(vec, plane_i) ≥ 0.
  * Same native rationale as [[CentroidCell]]: the declarative form paid
  * one interpreted `aggregate(zip_with(vec, <dim literals>))` per plane
  * per row; here the planes ride as one flat double[] and each dot folds
  * once inside whole-stage codegen. Bit-identical to the declarative
  * `when(dot >= 0, "1").otherwise("0")` chain (NaN compares false →
  * '0' in both).
  */
case class ProjectionBits(child: Expression, cents: Seq[Seq[Double]])
  extends CentroidArgmaxBase {

  override def dataType: DataType = StringType
  override def prettyName: String = "projection_bits"

  override def nullSafeEval(input: Any): Any = {
    val s = scores(input.asInstanceOf[ArrayData])
    val bits = new Array[Char](k)
    var c = 0
    while (c < k) { bits(c) = if (s(c) >= 0.0) '1' else '0'; c += 1 }
    org.apache.spark.unsafe.types.UTF8String.fromString(new String(bits))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val (scode, s) = genScores(ctx, a)
      val bits = ctx.freshName("bits")
      val c = ctx.freshName("c")
      s"""
         |$scode
         |char[] $bits = new char[$k];
         |for (int $c = 0; $c < $k; $c++) {
         |  $bits[$c] = ($s[$c] >= 0.0) ? '1' : '0';
         |}
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  new String($bits));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ProjectionBits =
    copy(child = newChild)
}
