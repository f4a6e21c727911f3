package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Dedup

/** Streaming corpus dup-rate monitoring — the always-on face of the
  * batch `t_dup_rate` report (is the crawl starting to re-fetch what
  * the lake already holds?): maintain the content-hash multiplicity
  * table of a streamed text column and read the freshness report
  * (docs / distinct / duplicate docs / duplicate share) from state at
  * any moment, without re-reading the stream.
  *
  * Hash counts are plain additive integers, so exactly-once follows
  * the [[DriftStream]] recipe for non-idempotent counts: each
  * micro-batch writes ITS OWN partial (h, n) table to
  * `statePath/batch=<batchId>/` with overwrite — a replayed batch
  * rewrites the same directory and the total is unchanged. The
  * maintained counts are the sum over partials; the report is
  * [[Dedup.dupRateFromCounts]] — the IDENTICAL kernel the batch gate
  * runs, so streamed ≡ batch on any batching (machine-asserted in
  * DupRateStreamSpec).
  *
  * Scale: per batch one grouped count over the batch only, to
  * |distinct-in-batch| rows; the maintained state is
  * distinct-content-sized — this is the EXACT face, the multiplicity
  * ledger a dedup pipeline reconciles against. The fixed-size variant
  * at extreme scale is a bloom membership sketch
  * ([[graft.operators.Sketches.bloomPrunedNewRows]]'s prune posture),
  * which answers "seen before?" but not "how many times?" — the
  * question this report exists to answer. State grows one parquet
  * directory per batch until [[compact]] folds the partials into a
  * single `batch=compacted-<hwm>` directory (call it every N-th
  * batch). The read face touches only state.
  */
object DupRateStream {

  /** Start-ready writer maintaining content-hash counts of `textCol`. */
  def hashWriter(events: DataFrame, statePath: String, checkpoint: String,
                 textCol: String,
                 compactEvery: Int = PartialState.DefaultCompactEvery)
  : DataStreamWriter[Row] =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        maintainBatch(batch, batchId, statePath, textCol, compactEvery)
      }

  /** The writer's per-batch maintenance — apply the batch, then fold
    * the partials on the cadence ([[PartialState.cadenceDue]]). The
    * `foreachBatch` body, named for spec replay.
    */
  def maintainBatch(batch: DataFrame, batchId: Long, statePath: String,
                    textCol: String,
                    compactEvery: Int = PartialState.DefaultCompactEvery)
  : Unit = {
    applyBatch(batch, batchId, statePath, textCol)
    if (PartialState.cadenceDue(batchId, compactEvery)) {
      compact(batch.sparkSession, statePath)
      ()
    }
  }

  /** One micro-batch (also the batch/backfill entry point): THIS
    * batch's hash counts to its own directory — replay overwrites,
    * never accumulates.
    */
  def applyBatch(batch: DataFrame, batchId: Long, statePath: String,
                 textCol: String): Unit = {
    if (batch.isEmpty) return
    Dedup.contentHashCounts(batch, textCol)
      .write.mode("overwrite").parquet(s"$statePath/batch=$batchId")
    ()
  }

  /** The maintained multiplicity table: per-hash totals over all
    * partials.
    */
  def currentCounts(spark: SparkSession, statePath: String): DataFrame =
    PartialState.summed(spark, statePath, Seq("h"), "n",
      spark.emptyDataFrame
        .select(lit("").as("h"), lit(0L).as("n")).limit(0))

  /** The freshness report (n_docs, n_distinct, dup_docs, dup_rate)
    * from the CURRENT state alone — the batch kernel over streamed
    * counts.
    */
  def report(spark: SparkSession, statePath: String): DataFrame =
    Dedup.dupRateFromCounts(currentCounts(spark, statePath))

  /** Fold all hash-count partials into one compacted directory —
    * read-equivalent before/after, replay of folded batches ignored
    * structurally ([[PartialState.compact]]). Returns the folded
    * high-water batch id.
    */
  def compact(spark: SparkSession, statePath: String): Long =
    PartialState.compact(spark, statePath, Seq("h"), "n")
}
