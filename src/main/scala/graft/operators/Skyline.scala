package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto frontier (skyline) over two minimized dimensions — "cheapest
  * for its size", the multi-objective top-of-catalog query. A row is on
  * the skyline iff no other row is ≤ on BOTH dims and < on at least one.
  *
  * The naive formulation is a quadratic dominance anti-join. The 2-D
  * structure collapses it to prefix arithmetic instead: sort by x, and a
  * row survives iff (a) it holds the minimum y within its own x value and
  * (b) every strictly-smaller x has min-y strictly above it. Both facts
  * come from ONE hash aggregate (per-x min) plus a STRICT running min
  * over the per-x minima in x order.
  *
  * Scale shape: the per-x aggregate is a linear hash shuffle. The running
  * min never sees data rows — for a continuous x it runs two-phase like
  * [[TrainingMix.withRunningTotal]] (range-partition the per-x minima,
  * per-partition local prefix min, broadcast per-partition offsets), so
  * no task ever sorts more than its range slice and there is no global
  * single-reducer window anywhere in the plan. The frontier predicate
  * then joins back to the facts by x (broadcastable when |distinct x| is
  * small; AQE decides).
  */
object Skyline {

  /** Adds nothing, removes non-frontier rows: keeps exactly the rows of
    * `df` on the (minimize `xCol`, minimize `yCol`) Pareto frontier.
    * Duplicate frontier points all survive (neither dominates the other).
    * Null dims are excluded (NULL compares as unknown in the dominance
    * order — the oracle's NOT EXISTS drops them the same way).
    */
  def paretoMin2d(df: DataFrame, xCol: String, yCol: String,
                  numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val rows = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
    // Per-distinct-x minimum y: one linear hash aggregate; the ONLY pass
    // over the facts until the final join-back.
    val perX = rows.groupBy(col(xCol).as("_x"))
      .agg(min(col(yCol)).as("_ymin"))
      .repartitionByRange(n, col("_x"))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint() // pin _pid across the two reads below
    // Phase 1: per-range-partition minimum of _ymin (≤ n rows total).
    val partMins = perX.groupBy(col("_pid")).agg(min(col("_ymin")).as("_pmin"))
    // Phase 2: strict-prefix min ACROSS partitions — a window over ≤ n
    // rows, never over data.
    val offW = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = partMins
      .withColumn("_offmin", min(col("_pmin")).over(offW))
      .drop("_pmin")
    // Local strict-prefix min within each partition (per-x rows are
    // distinct on _x, so rowsBetween(..., -1) IS the strictly-smaller-x
    // min); combine with the cross-partition offset. `least` skips nulls.
    val localW = Window.partitionBy(col("_pid")).orderBy(col("_x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perX.join(broadcast(offsets), Seq("_pid"))
      .withColumn("_lpm", min(col("_ymin")).over(localW))
      .withColumn("_strictMin", least(col("_lpm"), col("_offmin")))
      // x survives iff every strictly-smaller x has min-y ABOVE its min-y.
      .where(col("_strictMin").isNull || col("_strictMin") > col("_ymin"))
      .select(col("_x"), col("_ymin"))
    // Join back: keep rows holding their x's minimum y on a surviving x.
    rows.join(frontier,
      col(xCol) === col("_x") && col(yCol) === col("_ymin"))
      .drop("_x", "_ymin")
  }
}
