package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.{Drift, Histogram}

/** Streaming distribution monitoring: maintain a pinned-grid histogram
  * of a streamed column and alarm on TVD drift against a reference
  * distribution — the production face of the `dq_drift_*` batch gates
  * (is today's crawl shaped like the corpus we accepted yesterday?).
  *
  * Exactly-once WITHOUT idempotent algebra: unlike HLL registers
  * ([[SketchStream]] — maxes, replay-safe by construction), bucket
  * COUNTS double on replay. So each micro-batch writes its own partial
  * counts to `statePath/batch=<batchId>/` with overwrite — a replayed
  * batch rewrites the SAME directory and the total is unchanged.
  * The maintained histogram is the sum over partials (|batches|×nb tiny
  * rows, compacted on read); machine-asserted replay-idempotent and
  * batching-invariant in DriftStreamSpec.
  *
  * Scale: per batch one grouped aggregate over the batch only; state
  * grows one nb-row parquet per batch until [[compact]] folds the
  * partials into a single `batch=compacted-<hwm>` directory (call it
  * every N-th batch — unbounded directory growth is a file-listing
  * scale-killer on an always-on stream).
  */
object DriftStream {

  /** Start-ready writer bucketing `valCol` on the pinned [lo, hi]×nb
    * grid and persisting per-batch partial counts.
    */
  def histogramWriter(events: DataFrame, statePath: String,
                      checkpoint: String, valCol: String,
                      lo: Long, hi: Long, nb: Int,
                      compactEvery: Int = PartialState.DefaultCompactEvery)
  : DataStreamWriter[Row] =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        maintainBatch(batch, batchId, statePath, valCol, lo, hi, nb,
          compactEvery)
      }

  /** The numeric writer's per-batch maintenance — apply the batch,
    * then fold the partials on the cadence
    * ([[PartialState.cadenceDue]]). This IS the `foreachBatch` body,
    * named so the bounded-growth contract is spec-replayable without
    * a live stream.
    */
  def maintainBatch(batch: DataFrame, batchId: Long, statePath: String,
                    valCol: String, lo: Long, hi: Long, nb: Int,
                    compactEvery: Int = PartialState.DefaultCompactEvery)
  : Unit = {
    applyBatch(batch, batchId, statePath, valCol, lo, hi, nb)
    if (PartialState.cadenceDue(batchId, compactEvery)) {
      compact(batch.sparkSession, statePath)
      ()
    }
  }

  /** One micro-batch (also the batch/backfill entry point): bucket
    * counts for THIS batch only, written to the batch's own directory —
    * replay overwrites, never accumulates.
    */
  def applyBatch(batch: DataFrame, batchId: Long, statePath: String,
                 valCol: String, lo: Long, hi: Long, nb: Int): Unit = {
    if (batch.isEmpty) return
    batch.where(col(valCol).isNotNull)
      .groupBy(Histogram.bucketOf(col(valCol), lit(lo), lit(hi), nb)
        .as("cat"))
      .agg(count(lit(1)).as("n"))
      .write.mode("overwrite")
      .parquet(s"$statePath/batch=$batchId")
    ()
  }

  /** The maintained histogram: per-bucket totals over all partials. */
  def currentHistogram(spark: SparkSession, statePath: String): DataFrame =
    PartialState.summed(spark, statePath, Seq("cat"), "n",
      spark.emptyDataFrame
        .select(lit(0L).as("cat"), lit(0L).as("n")).limit(0))

  /** One-row drift verdict of the maintained histogram against a
    * reference (cat, n) distribution — [[Drift.totalVariationFromCounts]]
    * exact-integer arithmetic; alarm on `tvd` above the gate.
    */
  def tvdAgainstReference(spark: SparkSession, statePath: String,
                          reference: DataFrame): DataFrame =
    Drift.totalVariationFromCounts(
      currentHistogram(spark, statePath), reference)

  // ── Categorical face (round 10): the streamed twin of the
  // `dq_drift_chisq` batch gate. Same per-batch-partial exactly-once
  // recipe as the numeric histogram above, but over a categorical
  // column's raw values, and the read face is the per-category χ²
  // attribution kernel shared with the batch query
  // (Drift.chisqFromCounts) — streamed ≡ batch category-for-category
  // on any batching (machine-asserted in DriftStreamSpec).

  /** Start-ready writer maintaining per-category counts of `catCol`. */
  def categoryWriter(events: DataFrame, statePath: String,
                     checkpoint: String, catCol: String,
                     compactEvery: Int = PartialState.DefaultCompactEvery)
  : DataStreamWriter[Row] =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        maintainCategoryBatch(batch, batchId, statePath, catCol,
          compactEvery)
      }

  /** The categorical writer's per-batch maintenance — apply the
    * batch, then fold on the cadence. The `foreachBatch` body, named
    * for spec replay.
    */
  def maintainCategoryBatch(batch: DataFrame, batchId: Long,
                            statePath: String, catCol: String,
                            compactEvery: Int =
                              PartialState.DefaultCompactEvery): Unit = {
    applyCategoryBatch(batch, batchId, statePath, catCol)
    if (PartialState.cadenceDue(batchId, compactEvery)) {
      compact(batch.sparkSession, statePath)
      ()
    }
  }

  /** One micro-batch: THIS batch's category counts to its own
    * directory — replay overwrites, never accumulates.
    */
  def applyCategoryBatch(batch: DataFrame, batchId: Long,
                         statePath: String, catCol: String): Unit = {
    if (batch.isEmpty) return
    batch.where(col(catCol).isNotNull)
      .groupBy(col(catCol).as("cat"))
      .agg(count(lit(1)).as("n"))
      .write.mode("overwrite")
      .parquet(s"$statePath/batch=$batchId")
    ()
  }

  /** The maintained category counts: per-category totals over all
    * partials.
    */
  def currentCategories(spark: SparkSession, statePath: String): DataFrame =
    PartialState.summed(spark, statePath, Seq("cat"), "n",
      spark.emptyDataFrame
        .select(lit("").as("cat"), lit(0L).as("n")).limit(0))

  /** Per-category χ² drift attribution of the maintained counts against
    * a reference (cat, n) distribution — [[Drift.chisqFromCounts]], the
    * identical kernel the `dq_drift_chisq` batch gate runs; alarm on
    * the categories whose `contrib` dominates.
    */
  def chisqAgainstReference(spark: SparkSession, statePath: String,
                            reference: DataFrame): DataFrame =
    Drift.chisqFromCounts(currentCategories(spark, statePath), reference)

  /** One-row TVD verdict of the maintained CATEGORICAL counts against a
    * reference (cat, n) distribution — the single drift score beside
    * [[chisqAgainstReference]]'s attribution, through the same
    * [[Drift.totalVariationFromCounts]] kernel. Distinct from the
    * numeric [[tvdAgainstReference]] only in the empty-state fallback:
    * this one types `cat` as STRING, so a never-started categorical
    * stream cannot produce a type-coerced join against a string-keyed
    * reference.
    */
  def tvdCategoriesAgainstReference(spark: SparkSession, statePath: String,
                                    reference: DataFrame): DataFrame =
    Drift.totalVariationFromCounts(
      currentCategories(spark, statePath), reference)

  /** Fold all (cat, n) partials — numeric-histogram or categorical
    * state, both share the layout — into one compacted directory:
    * read-equivalent before/after, replay of folded batches ignored
    * structurally ([[PartialState.compact]]). Returns the folded
    * high-water batch id.
    */
  def compact(spark: SparkSession, statePath: String): Long =
    PartialState.compact(spark, statePath, Seq("cat"), "n")
}
