package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-anonymity audit — the re-identification gate beside the PII scrub:
  * group a table by its quasi-identifier tuple and report how many
  * equivalence classes fall below `k` and how many rows they expose.
  * The kernel is shared by the batch gate (`dq_k_anonymity`) and the
  * streamed face ([[graft.streaming.KAnonStream]]) so the two can never
  * drift: both are [[reportFromCounts]] over a (QI keys..., n) count
  * table, and equivalence-class sizes are plain additive integers —
  * sum-mergeable across batches/partitions/days by construction.
  *
  * Scale shape: one grouped count over the audited table (map-side
  * combinable, hash-partitioned by the QI tuple), then one tiny scalar
  * aggregate over the |classes| rows. Nothing here is per-row beyond
  * the single scan.
  */
object Anonymity {

  /** Equivalence-class sizes: one (keys..., n) row per distinct
    * quasi-identifier tuple — the additive table both faces maintain.
    */
  def qiCounts(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))

  /** The audit report from an ALREADY-AGGREGATED class-size table —
    * one row: (n_groups, groups_below_k, rows_at_risk, min_group_size).
    * Identical expression structure to the original inline
    * `dq_k_anonymity` so the refactor is hash-invariant under the
    * oracle. The two risk sums coalesce to 0 so a ZERO-GROUP input —
    * reachable through the streamed face's report-before-first-batch —
    * reads as "0 classes exposed", matching the oracle's `count(*)
    * FILTER` / `coalesce(sum ...)` exactly rather than returning nulls
    * a downstream `> 0` gate would silently swallow; min_group_size
    * stays NULL there ("no groups") in both engines.
    */
  def reportFromCounts(counts: DataFrame, k: Int = 5): DataFrame =
    counts.agg(count(lit(1)).as("n_groups"),
      coalesce(sum(when(col("n") < k, 1L).otherwise(0L)), lit(0L))
        .as("groups_below_k"),
      coalesce(sum(when(col("n") < k, col("n")).otherwise(lit(0L))),
        lit(0L)).cast("long").as("rows_at_risk"),
      min(col("n")).as("min_group_size"))
}
