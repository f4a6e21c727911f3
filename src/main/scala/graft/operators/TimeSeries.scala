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

  /** Peak concurrency per hour — the interval-overlap sweep line. Each
    * row occupies the half-open interval [ts, ts + durationMin); the
    * answer is the maximum number of simultaneously-open intervals
    * within each hour.
    *
    * The sweep is the textbook ±1 delta trick made distributed: every
    * interval contributes (+1 at start, −1 at end), and the running sum
    * of deltas in (t, d) order IS the live concurrency after each
    * boundary. The running sum is [[TrainingMix.withRunningTotal]] —
    * range-partitioned two-phase prefix sum, so no task ever sorts more
    * than its time slice and the only unbounded window ranges over the
    * per-partition totals (≤ shuffle-partition-count rows), never over
    * events. Ordering −1 before +1 at equal t realizes the half-open
    * semantics (an interval ending exactly when another starts never
    * overlaps it); within a tie run the deltas are identical, so every
    * tie order yields the same prefix-value multiset and the per-hour
    * max is deterministic.
    *
    * A level can be SET in one hour and carried unchanged into the
    * next, so each hour-start also gets a zero-delta row (an hourly
    * spine off one tiny min/max aggregate, the [[gapFillHourly]]
    * pattern): every hour — including boundary-free gap hours — then
    * reports the max of its carried level and its own post-boundary
    * levels, the true sup of the step function over the hour.
    */
  def maxConcurrent(df: DataFrame, tsCol: String, durationMin: Int)
      : DataFrame = {
    require(durationMin > 0, s"durationMin must be positive: $durationMin")
    val live = df.where(col(tsCol).isNotNull)
    val deltas = live
      .select(col(tsCol).as("_t"), lit(1).as("_d"))
      .unionByName(live.select(
        (col(tsCol) + expr(s"INTERVAL $durationMin MINUTES")).as("_t"),
        lit(-1).as("_d")))
    val span = deltas.agg(
      date_trunc("hour", min(col("_t"))).as("_lo"),
      date_trunc("hour", max(col("_t"))).as("_hi"))
    val spine = span.select(explode(sequence(col("_lo"), col("_hi"),
        expr("INTERVAL 1 HOUR"))).as("_t"))
      .select(col("_t"), lit(0).as("_d"))
    val run = TrainingMix.withRunningTotal(deltas.unionByName(spine),
      Seq.empty, Seq(col("_t"), col("_d")), col("_d"), "_c")
    run.groupBy(date_trunc("hour", col("_t")).as("hr"))
      .agg(max(col("_c")).as("max_concurrent"))
  }
}
