package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dense time-series scaffolding: turn an event log's sparse per-bucket
  * aggregates into a gap-free grid (every key × every bucket in the
  * observed span, absent buckets zero-filled) — what a monitoring
  * dashboard or a downstream `lag`/delta computation needs as input.
  *
  * Scale design: the dense axis is generated, not shuffled into
  * existence. The observed span comes from ONE tiny min/max aggregate
  * (broadcast scalar); the bucket spine is `explode(sequence(min, max,
  * interval))` over the (small) key dimension — |keys| × |buckets| rows,
  * independent of event count — and the sparse aggregate left-joins onto
  * it. The only data-sized operation is the per-bucket aggregate itself,
  * which shuffles once on (key, bucket) with map-side partial
  * aggregation. Nothing re-scans events to discover the grid.
  */
object TimeSeries {

  /** Per-(key, hour) event counts over a zero-filled hourly grid spanning
    * [min hour, max hour] of the whole log. Returns (keyCol, bucket, n).
    */
  def gapFillHourly(df: DataFrame, keyCol: String, tsCol: String)
      : DataFrame = {
    val hour: Column = date_trunc("hour", col(tsCol))
    // Span AND key dimension both derive from the sparse aggregate, not
    // from the raw log: min/max of the observed buckets ≡ the truncated
    // min/max timestamp, and the key set ≡ the aggregate's key values.
    // The aggregate is |keys|×|buckets| — tiny — so it is STAGED
    // (localCheckpoint) and its three consumers (span, keys, join probe)
    // share one materialization of ONE events scan; per-branch column
    // pruning would otherwise specialize the aggregate per consumer and
    // re-scan the log three times (asserted in PlanAuditSpec).
    val sparse = df.groupBy(col(keyCol), hour.as("bucket"))
      .agg(count(lit(1)).as("_n"))
      .localCheckpoint()
    val span = sparse.agg(min(col("bucket")).as("_lo"),
      max(col("bucket")).as("_hi"))
    val spine = sparse.select(col(keyCol)).distinct()
      .crossJoin(broadcast(span))
      .select(col(keyCol), explode(
        sequence(col("_lo"), col("_hi"), expr("interval 1 hour")))
        .as("bucket"))
    spine.join(sparse, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("_n"), lit(0L)).as("n"))
  }
}
