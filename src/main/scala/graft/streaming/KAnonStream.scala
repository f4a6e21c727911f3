package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Anonymity

/** Streaming k-anonymity maintenance — the always-on face of the
  * `dq_k_anonymity` batch audit (is the arriving data drifting toward
  * re-identifiable quasi-identifier classes?): maintain the
  * equivalence-class size table of a streamed QI tuple and read the
  * full exposure report from state at any moment, without re-reading
  * the stream.
  *
  * Class sizes are plain additive integers, so exactly-once follows the
  * [[DriftStream]] recipe for non-idempotent counts: each micro-batch
  * writes ITS OWN partial (keys..., n) table to
  * `statePath/batch=<batchId>/` with overwrite — a replayed batch
  * rewrites the same directory and the total is unchanged. The
  * maintained sizes are the sum over partials; the report is
  * [[Anonymity.reportFromCounts]] — the IDENTICAL kernel the batch gate
  * runs, so streamed ≡ batch on any batching (machine-asserted in
  * KAnonStreamSpec).
  *
  * QI keys are rendered AS STRINGS in the partials: the rendering is
  * injective per column type, so the class partition — and therefore
  * every count the report aggregates — is unchanged, while the state
  * schema stays fixed for any key arity/type mix (one reader recipe,
  * no per-face schema plumbing). Caveat: for FLOATING-POINT keys the
  * render is finer than Spark's groupBy equality (which normalizes
  * -0.0 to 0.0 and NaNs to one NaN before grouping) — but raw float
  * equality is not a sane quasi-identifier anyway; band or round such
  * columns first (the dq_anon_ladder rungs show the construction),
  * which also makes the class partition meaningful.
  *
  * Scale: per batch one grouped count over the batch only, to
  * |classes-in-batch| rows; state grows one tiny parquet per batch
  * until [[compact]] folds the partials into a single
  * `batch=compacted-<hwm>` directory (call it every N-th batch —
  * unbounded directory growth is a file-listing scale-killer on an
  * always-on stream). The read face touches only state.
  */
object KAnonStream {

  /** Start-ready writer maintaining class sizes of the `keys` tuple. */
  def qiWriter(events: DataFrame, statePath: String, checkpoint: String,
               keys: Seq[String]): DataStreamWriter[Row] =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, statePath, keys)
      }

  /** One micro-batch (also the batch/backfill entry point): THIS
    * batch's class sizes to its own directory — replay overwrites,
    * never accumulates.
    */
  def applyBatch(batch: DataFrame, batchId: Long, statePath: String,
                 keys: Seq[String]): Unit = {
    if (batch.isEmpty) return
    Anonymity.qiCounts(
        batch.select(keys.map(k => col(k).cast("string").as(k)): _*), keys)
      .write.mode("overwrite").parquet(s"$statePath/batch=$batchId")
    ()
  }

  /** The maintained class-size table: per-tuple totals over all
    * partials.
    */
  def currentCounts(spark: SparkSession, statePath: String,
                    keys: Seq[String]): DataFrame =
    PartialState.summed(spark, statePath, keys, "n",
      spark.emptyDataFrame
        .select(keys.map(k => lit("").as(k)) :+ lit(0L).as("n"): _*)
        .limit(0))

  /** The full exposure report (n_groups, groups_below_k, rows_at_risk,
    * min_group_size) from the CURRENT state alone — the batch kernel
    * over streamed class sizes.
    */
  def report(spark: SparkSession, statePath: String, keys: Seq[String],
             k: Int = 5): DataFrame =
    Anonymity.reportFromCounts(currentCounts(spark, statePath, keys), k)

  /** Fold all class-size partials into one compacted directory —
    * read-equivalent before/after, replay of folded batches ignored
    * structurally ([[PartialState.compact]]). Returns the folded
    * high-water batch id.
    */
  def compact(spark: SparkSession, statePath: String,
              keys: Seq[String]): Long =
    PartialState.compact(spark, statePath, keys, "n")
}
