package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Benford

/** Streaming Benford first-digit maintenance — the always-on face of
  * the `dq_benford` batch audit (is the revenue stream developing a
  * fabricated-data signature?): maintain the 9-row first-digit count
  * table of a streamed amount column and read the full audit report
  * from state at any moment, without re-reading the stream.
  *
  * Digit counts are plain additive integers, so exactly-once follows
  * the [[DriftStream]] recipe for non-idempotent counts: each
  * micro-batch writes ITS OWN partial (digit, n) table to
  * `statePath/batch=<batchId>/` with overwrite — a replayed batch
  * rewrites the same directory and the total is unchanged. The
  * maintained counts are the sum over partials; the report is
  * [[Benford.reportFromCounts]] — the IDENTICAL kernel the batch gate
  * runs, so streamed ≡ batch digit-for-digit on any batching
  * (machine-asserted in BenfordStreamSpec).
  *
  * Scale: per batch one grouped aggregate over the batch only, to ≤ 9
  * rows; state grows one 9-row parquet per batch until [[compact]]
  * folds the partials into a single `batch=compacted-<hwm>` directory
  * (call it every N-th batch — unbounded directory growth is a
  * file-listing scale-killer on an always-on stream). The read face
  * touches only state.
  */
object BenfordStream {

  /** Start-ready writer maintaining first-digit counts of `valCol`,
    * folding its own partials every `compactEvery` batches — bounded
    * directory growth without caller discipline.
    */
  def digitWriter(events: DataFrame, statePath: String, checkpoint: String,
                  valCol: String,
                  compactEvery: Int = PartialState.DefaultCompactEvery)
  : DataStreamWriter[Row] =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        maintainBatch(batch, batchId, statePath, valCol, compactEvery)
      }

  /** The writer's per-batch maintenance — apply the batch, then fold
    * the partials on the cadence ([[PartialState.cadenceDue]]). This
    * IS the `foreachBatch` body, named so the bounded-growth contract
    * is spec-replayable without a live stream.
    */
  def maintainBatch(batch: DataFrame, batchId: Long, statePath: String,
                    valCol: String,
                    compactEvery: Int = PartialState.DefaultCompactEvery)
  : Unit = {
    applyBatch(batch, batchId, statePath, valCol)
    if (PartialState.cadenceDue(batchId, compactEvery)) {
      compact(batch.sparkSession, statePath)
      ()
    }
  }

  /** One micro-batch (also the batch/backfill entry point): THIS
    * batch's digit counts to its own directory — replay overwrites,
    * never accumulates.
    */
  def applyBatch(batch: DataFrame, batchId: Long, statePath: String,
                 valCol: String): Unit = {
    if (batch.isEmpty) return
    Benford.firstDigitCounts(batch, valCol)
      .write.mode("overwrite").parquet(s"$statePath/batch=$batchId")
    ()
  }

  /** The maintained count table: per-digit totals over all partials. */
  def currentCounts(spark: SparkSession, statePath: String): DataFrame =
    PartialState.summed(spark, statePath, Seq("digit"), "n",
      spark.emptyDataFrame
        .select(lit("").as("digit"), lit(0L).as("n")).limit(0))

  /** The full audit report (digit, n, share, expected, deviation) from
    * the CURRENT state alone — the batch kernel over streamed counts.
    */
  def report(spark: SparkSession, statePath: String): DataFrame =
    Benford.reportFromCounts(currentCounts(spark, statePath))

  /** Fold all digit-count partials into one compacted directory —
    * read-equivalent before/after, replay of folded batches ignored
    * structurally ([[PartialState.compact]]). Returns the folded
    * high-water batch id.
    */
  def compact(spark: SparkSession, statePath: String): Long =
    PartialState.compact(spark, statePath, Seq("digit"), "n")
}
