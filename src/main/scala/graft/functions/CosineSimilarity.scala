package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity of two `array<float>`
  * columns in ONE fused pass (dot product and both norms accumulate in the
  * same loop), with whole-stage codegen via `doGenCode`.
  *
  * This is the similarity hot path's drop-to-native optimization: the
  * declarative form (`zip_with` + `aggregate` + `sqrt`, see
  * graft.operators.Similarity.cosine) is codegen'd too but materializes an
  * intermediate array per row and walks each input three times. Per the
  * engine's extension ladder (builder brief: compose built-ins → custom
  * Expression → custom plan), this stays at rung two — a scalar expression
  * the optimizer can still push, prune, and fuse around.
  *
  * Float elements are widened to double BEFORE multiplying and the three
  * accumulators add in ascending index order — bit-identical to the
  * declarative form and to the DuckDB oracle, so both implementations
  * hash-match the same correctness rows.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  // Both children must be array<float> (AbstractDataType — the usual
  // ExpectsInputTypes route — is private[sql], so check explicitly).
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == ArrayType(FloatType)) ||
      Seq(left, right).forall(_.dataType == ArrayType(FloatType, containsNull = false))
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |double $na = 0.0;
         |double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y;
         |  $na += $x * $x;
         |  $nb += $y * $y;
         |}
         |${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column-API access for the engine's native expressions. */
object NativeFunctions {

  val cosineSimIdentifier: FunctionIdentifier = FunctionIdentifier("cosine_sim")

  val cosineSimInfo: ExpressionInfo =
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim")

  val cosineSimBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2, "cosine_sim takes exactly 2 arguments")
    CosineSimilarity(exprs.head, exprs(1))
  }

  val hammingIdentifier: FunctionIdentifier = FunctionIdentifier("hamming_dist")

  val hammingInfo: ExpressionInfo =
    new ExpressionInfo(classOf[HammingDistance].getName, "hamming_dist")

  val hammingBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2, "hamming_dist takes exactly 2 arguments")
    HammingDistance(exprs.head, exprs(1))
  }

  val sortedIntersectIdentifier: FunctionIdentifier =
    FunctionIdentifier("sorted_intersect_size")

  val sortedIntersectInfo: ExpressionInfo =
    new ExpressionInfo(classOf[SortedIntersectSize].getName,
      "sorted_intersect_size")

  val sortedIntersectBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2,
      "sorted_intersect_size takes exactly 2 arguments")
    SortedIntersectSize(exprs.head, exprs(1))
  }

  val kmvIdentifier: FunctionIdentifier = FunctionIdentifier("kmv_mink")

  val kmvInfo: ExpressionInfo =
    new ExpressionInfo(classOf[KmvMinK].getName, "kmv_mink")

  val kmvBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2, "kmv_mink takes exactly 2 arguments")
    exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(k: Int, IntegerType) =>
        KmvMinK(exprs.head, k)
      case other =>
        throw new IllegalArgumentException(
          s"kmv_mink's k must be an integer literal, got $other")
    }
  }

  /** Extract a literal `array<array<double>>` (from `typedlit`) as the
    * centroid matrix for the argmax expressions — the KmvMinK literal-k
    * pattern: the matrix is plan metadata, parsed once at build time.
    */
  private def matrixFromLiteral(e: Expression): Seq[Seq[Double]] = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(
        ad: org.apache.spark.sql.catalyst.util.ArrayData,
        ArrayType(ArrayType(DoubleType, _), _)) =>
      (0 until ad.numElements())
        .map(i => ad.getArray(i).toDoubleArray().toSeq)
    case other => throw new IllegalArgumentException(
      s"expected a literal array<array<double>> centroid matrix, got $other")
  }

  val centroidCellIdentifier: FunctionIdentifier =
    FunctionIdentifier("centroid_cell")

  val centroidCellInfo: ExpressionInfo =
    new ExpressionInfo(classOf[CentroidCell].getName, "centroid_cell")

  val centroidCellBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2, "centroid_cell takes exactly 2 arguments")
    CentroidCell(exprs.head, matrixFromLiteral(exprs(1)))
  }

  val centroidProbeIdentifier: FunctionIdentifier =
    FunctionIdentifier("centroid_probe_cells")

  val centroidProbeInfo: ExpressionInfo =
    new ExpressionInfo(classOf[CentroidProbeCells].getName,
      "centroid_probe_cells")

  val centroidProbeBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2,
      "centroid_probe_cells takes exactly 2 arguments")
    CentroidProbeCells(exprs.head, matrixFromLiteral(exprs(1)))
  }

  val projectionBitsIdentifier: FunctionIdentifier =
    FunctionIdentifier("projection_bits")

  val projectionBitsInfo: ExpressionInfo =
    new ExpressionInfo(classOf[ProjectionBits].getName, "projection_bits")

  val projectionBitsBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2, "projection_bits takes exactly 2 arguments")
    ProjectionBits(exprs.head, matrixFromLiteral(exprs(1)))
  }

  private def literalInt(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def literalBool(e: Expression, what: String): Boolean = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, BooleanType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a boolean literal, got $other")
  }

  val winnowFpSetIdentifier: FunctionIdentifier =
    FunctionIdentifier("winnow_fp_set")

  val winnowFpSetInfo: ExpressionInfo =
    new ExpressionInfo(classOf[WinnowFpSet].getName, "winnow_fp_set")

  val winnowFpSetBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 3, "winnow_fp_set takes exactly 3 arguments")
    WinnowFpSet(exprs.head, literalInt(exprs(1), "winnow_fp_set's k"),
      literalInt(exprs(2), "winnow_fp_set's w"))
  }

  val shinglesArrIdentifier: FunctionIdentifier =
    FunctionIdentifier("shingles_arr")

  val shinglesArrInfo: ExpressionInfo =
    new ExpressionInfo(classOf[ShinglesArr].getName, "shingles_arr")

  val shinglesArrBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 3, "shingles_arr takes exactly 3 arguments")
    ShinglesArr(exprs.head, literalInt(exprs(1), "shingles_arr's n"),
      literalBool(exprs(2), "shingles_arr's sorted"))
  }

  val minhashSigIdentifier: FunctionIdentifier =
    FunctionIdentifier("minhash_sig")

  val minhashSigInfo: ExpressionInfo =
    new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig")

  val minhashSigBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2, "minhash_sig takes exactly 2 arguments")
    MinhashSig(exprs.head, literalInt(exprs(1), "minhash_sig's k"))
  }

  /** Register the native expressions in the session's function registry
    * (idempotent). After this they are usable from both the Column API
    * ([[cosineSim]], [[hammingDist]], [[kmvMinK]]) and SQL text. Sessions
    * created with `spark.sql.extensions=graft.GraftExtensions` get this
    * automatically.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      winnowFpSetIdentifier, winnowFpSetInfo, winnowFpSetBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      shinglesArrIdentifier, shinglesArrInfo, shinglesArrBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      minhashSigIdentifier, minhashSigInfo, minhashSigBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      cosineSimIdentifier, cosineSimInfo, cosineSimBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      hammingIdentifier, hammingInfo, hammingBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      sortedIntersectIdentifier, sortedIntersectInfo, sortedIntersectBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      kmvIdentifier, kmvInfo, kmvBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      centroidCellIdentifier, centroidCellInfo, centroidCellBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      centroidProbeIdentifier, centroidProbeInfo, centroidProbeBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      projectionBitsIdentifier, projectionBitsInfo, projectionBitsBuilder)
  }

  /** Column-API form of the KMV min-k aggregate; requires [[register]]
    * on the owning session first.
    */
  def kmvMinK(h: Column, k: Int): Column =
    call_function("kmv_mink", h, org.apache.spark.sql.functions.lit(k))

  /** Column-API form; requires [[register]] on the owning session first. */
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** Column-API form; requires [[register]] on the owning session first. */
  def hammingDist(a: Column, b: Column): Column =
    call_function("hamming_dist", a, b)

  /** Column-API form; requires [[register]] on the owning session first.
    * Both arrays must be sorted ascending (see [[SortedIntersectSize]]).
    */
  def sortedIntersectSize(a: Column, b: Column): Column =
    call_function("sorted_intersect_size", a, b)

  /** Column-API form; requires [[register]] on the owning session first. */
  def centroidCell(vec: Column, cents: Array[Array[Double]]): Column =
    call_function("centroid_cell", vec,
      org.apache.spark.sql.functions.typedlit(cents.map(_.toSeq).toSeq))

  /** Column-API form; requires [[register]] on the owning session first. */
  def centroidProbeCells(vec: Column, cents: Array[Array[Double]]): Column =
    call_function("centroid_probe_cells", vec,
      org.apache.spark.sql.functions.typedlit(cents.map(_.toSeq).toSeq))

  /** Column-API form; requires [[register]] on the owning session first.
    * `tokens` is the raw token array; empty tokens are filtered inside
    * the kernel (the winnow pipeline's `length > 0` step).
    */
  def winnowFpSet(tokens: Column, k: Int, w: Int): Column =
    call_function("winnow_fp_set", tokens,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(w))

  /** Column-API form; requires [[register]] on the owning session first. */
  def shinglesArr(tokens: Column, n: Int, sorted: Boolean): Column =
    call_function("shingles_arr", tokens,
      org.apache.spark.sql.functions.lit(n),
      org.apache.spark.sql.functions.lit(sorted))

  /** Column-API form; requires [[register]] on the owning session first. */
  def minhashSig(sh: Column, k: Int): Column =
    call_function("minhash_sig", sh, org.apache.spark.sql.functions.lit(k))

  /** Column-API form; requires [[register]] on the owning session first. */
  def projectionBits(vec: Column, planes: Array[Array[Double]]): Column =
    call_function("projection_bits", vec,
      org.apache.spark.sql.functions.typedlit(planes.map(_.toSeq).toSeq))
}
