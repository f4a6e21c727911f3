package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Sketches

/** Streaming maintained-Bloom membership — the FIXED-SIZE face of the
  * incremental dedup monitor (is this arriving document probably
  * already in the lake?), completing the dedup-stream pair:
  * [[DupRateStream]] keeps the EXACT multiplicity ledger
  * (distinct-content-sized state, answers "how many times?"), this
  * face keeps an `mBits`-slot Bloom bitmap (state bounded by a pinned
  * constant FOREVER, answers "probably seen?" with zero false
  * negatives) — the streamed twin of the batch
  * [[Sketches.bloomPrunedNewRows]] prune posture.
  *
  * State layout: the bitmap rides the SAME per-batchId partial-count
  * recipe as every other sketch face — per-batch (bit, n) hit counts
  * to `statePath/batch=<batchId>/` with overwrite — and a bit is SET
  * iff its summed count > 0. Counts are additive, so replay rewrites
  * its own directory and the total (hence the bit set) is unchanged;
  * [[PartialState.compact]] folds partials with the identical
  * contract. Using hit counts rather than distinct bits keeps one
  * shared layout/reader/compactor across all five sketch faces at the
  * cost of a long per live bit — nothing at mBits ≤ 2^24.
  *
  * The probe reads ≤ mBits state rows (localCheckpointed, then a
  * broadcast join against the probe batch's exploded bit pairs), so
  * membership verdicts for any batch cost one bounded broadcast —
  * never a corpus join; that is the whole point of this face at
  * 100 TB. Both hash positions and therefore every verdict are
  * bit-identical in DuckDB ([[Sketches.bloomBitPositions]]), so the
  * probe sits under the driver's oracle, no-false-negatives is
  * machine-asserted in BloomStreamSpec, and the false-positive cost is
  * a downstream exact check (the bloomPrunedNewRows contract), never
  * correctness.
  */
object BloomStream {

  /** Default bitmap width: 4096 slots. Pinned tiny so the sf-scale
    * oracle query exercises real collisions/false positives; a
    * production deployment sizes mBits ≈ 1.44·k·n/ln2 as usual.
    */
  val DefaultBits = 4096

  private def bitsOf(textCol: Column, mBits: Int): Column =
    Sketches.bloomBitPositions(textCol, mBits)

  /** Start-ready writer maintaining the bit-hit counts of `textCol`. */
  def bitWriter(events: DataFrame, statePath: String, checkpoint: String,
                textCol: String, mBits: Int = DefaultBits)
  : DataStreamWriter[Row] =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, statePath, textCol, mBits)
      }

  /** One micro-batch (also the batch/backfill entry point): THIS
    * batch's bit-hit counts to its own directory — replay overwrites,
    * never accumulates.
    */
  def applyBatch(batch: DataFrame, batchId: Long, statePath: String,
                 textCol: String, mBits: Int = DefaultBits): Unit = {
    if (batch.isEmpty) return
    batch.select(explode(bitsOf(col(textCol), mBits)).as("bit"))
      .groupBy(col("bit"))
      .agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$statePath/batch=$batchId")
    ()
  }

  /** The maintained SET bits: every position whose summed hit count is
    * positive — ≤ mBits rows at any stream age.
    */
  def currentBits(spark: SparkSession, statePath: String): DataFrame =
    PartialState.summed(spark, statePath, Seq("bit"), "n",
      spark.emptyDataFrame
        .select(lit(0L).as("bit"), lit(0L).as("n")).limit(0))
      .where(col("n") > 0)
      .select(col("bit"))

  /** Membership verdicts for a probe batch from the CURRENT state
    * alone: (idCol, bloom_positive) — positive iff BOTH of the row's
    * bit positions are set. Zero false negatives by construction; a
    * positive means "pay the exact check", never "is a duplicate".
    */
  def probe(spark: SparkSession, statePath: String, probeDf: DataFrame,
            idCol: String, textCol: String,
            mBits: Int = DefaultBits): DataFrame = {
    // Materialized so the verdict cannot be torn by a concurrent
    // compact's GC between listing and action (PartialState contract).
    val set = currentBits(spark, statePath)
      .withColumn("_set", lit(1)).localCheckpoint()
    probeDf
      .select(col(idCol), explode(bitsOf(col(textCol), mBits)).as("bit"))
      .join(broadcast(set), Seq("bit"), "left")
      .groupBy(col(idCol))
      // count() skips nulls: 2 ⇔ both positions matched (a row whose
      // two hashes collide explodes to two identical bits and still
      // contributes 2 — correct, the one position IS set).
      .agg((count(col("_set")) === 2).as("bloom_positive"))
  }

  /** Fold all bit-count partials into one compacted directory —
    * read-equivalent before/after, replay of folded batches ignored
    * structurally ([[PartialState.compact]]). Returns the folded
    * high-water batch id.
    */
  def compact(spark: SparkSession, statePath: String): Long =
    PartialState.compact(spark, statePath, Seq("bit"), "n")
}
