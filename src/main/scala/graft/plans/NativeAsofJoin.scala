package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.unsafe.types.UTF8String

/** NATIVE as-of join — the whole-operator rung of the extension ladder
  * (SURVEY.md §7.3c): a custom `LogicalPlan` node, a `SparkStrategy`
  * producing a custom `SparkPlan`, registered through
  * [[graft.GraftExtensions]] / `spark.experimental.extraStrategies`.
  *
  * Semantics are EXACTLY [[graft.operators.AsofJoin.asofJoin]] (every
  * left row picks the latest right row with `rightTime <= leftTime` in
  * its key group; right unique per (key, time) by contract; null keys
  * never match) — NativeAsofSpec asserts row-level equivalence and the
  * registered query shares the composed operator's DuckDB oracle.
  *
  * Why a custom operator when the composed plan is already scale-safe:
  * the union–carry-forward form materializes BOTH sides through one
  * union exchange, sorts the union, and runs a window that carries the
  * payload struct through every row. This exec instead asks Catalyst
  * for the standard sort-merge prerequisites — each side hash-clustered
  * by its own key and sorted by (key, time), the same contract
  * `SortMergeJoinExec` states — and then streams BOTH sorted iterators
  * through one forward-only merge per partition: O(1) state (the last
  * right payload seen per key), zero buffering, no union relation, no
  * window. Each side shuffles only itself, on its own volume, and AQE
  * still plans both exchanges. The merge never rewinds, so spill is
  * impossible by construction.
  */
case class AsofJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        payload: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinNode]] as [[AsofJoinExec]]. Injected per session. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lt, rt, payload) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt,
        payload) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        payload: Seq[Attribute])
    extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  /** Same contract SortMergeJoinExec states: each child hash-clustered
    * by its join key (EnsureRequirements co-partitions the two sides)…
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  /** …and sorted by (key, time) so the merge is forward-only. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  /** Copy an evaluated key/time value out of a reused row buffer.
    * Primitives/Decimals are immutable; UTF8String points into the
    * iterator's buffer and must be cloned.
    */
  private def copyVal(v: Any): Any = v match {
    case s: UTF8String => s.clone()
    case other => other
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val payloadExprs = payload
    val leftOut = left.output
    val rightOut = right.output
    val outTypes = (leftOut ++ payload).map(_.dataType).toArray

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val valueProj = UnsafeProjection.create(payloadExprs, rightOut)
      val resultProj = UnsafeProjection.create(outTypes)
      val joined = new JoinedRow
      val nulls = new GenericInternalRow(payloadExprs.length)

      // Lookahead right row, decomposed into copied key/time + payload.
      var rAvail = false
      var rK: Any = null
      var rT: Any = null
      var rVal: InternalRow = null
      def advanceRight(): Unit = {
        rAvail = rIter.hasNext
        if (rAvail) {
          val r = rIter.next()
          rK = copyVal(rKey.eval(r))
          rT = copyVal(rTime.eval(r))
          rVal = valueProj(r).copy()
        }
      }
      advanceRight()

      // Most recent right row consumed, per current key run.
      var lastK: Any = null
      var lastVal: InternalRow = null

      lIter.map { l =>
        val lk = copyVal(lKey.eval(l))
        val lt = copyVal(lTime.eval(l))
        // Consume right rows at earlier keys, or same key with
        // rightTime <= leftTime (inclusive as-of). Null right keys are
        // consumed but never stored (a null key matches nothing).
        var continue = rAvail
        while (continue) {
          val kc = if (rK == null) -1 else keyOrd.compare(rK, lk)
          if (kc < 0 || (kc == 0 && timeOrd.compare(rT, lt) <= 0)) {
            if (rK != null) { lastK = rK; lastVal = rVal }
            advanceRight()
            continue = rAvail
          } else continue = false
        }
        val matched = lk != null && lastVal != null &&
          keyOrd.compare(lastK, lk) == 0
        resultProj(joined(l, if (matched) lastVal else nulls))
      }
    }
  }
}

/** Public entry point: build the native as-of join over resolved child
  * plans (same signature family as the composed AsofJoin).
  */
object NativeAsof {

  /** Make [[AsofJoinStrategy]] active on `spark` even when the session
    * pre-dates extension injection (idempotent — mirrors
    * NativeFunctions.register's posture for functions).
    */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy

  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "payload columns required")
    val spark = left.sparkSession
    ensureRegistered(spark)
    val lPlan = left.queryExecution.analyzed
    // Self-join hygiene the analyzer's DeduplicateRelations would do for
    // a stock Join: when both sides derive from one base relation their
    // attributes share exprIds, making binding/pruning ambiguous — give
    // the right side fresh ids through an aliasing Project.
    val rPlan0 = right.queryExecution.analyzed
    val rPlan =
      if (rPlan0.outputSet.intersect(lPlan.outputSet).isEmpty) rPlan0
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        rPlan0.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()),
        rPlan0)
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"$side column not found: $n"))
    val node = AsofJoinNode(lPlan, rPlan,
      attr(lPlan, key, "left"), attr(rPlan, key, "right"),
      attr(lPlan, leftTime, "left"), attr(rPlan, rightTime, "right"),
      payload.map(attr(rPlan, _, "right payload")))
    org.apache.spark.sql.graft.PlanBridge.ofRows(spark, node)
  }
}
