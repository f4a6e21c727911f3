package graft.streaming

import org.apache.hadoop.fs.Path
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

  /** The bitmap width is part of the state's identity: positions
    * recorded mod 64 probed mod 4096 would silently read as false
    * negatives (both sides carry independent `mBits` defaults). The
    * first write stamps a zero-byte `.mbits-<m>` marker beside the
    * partials; every writer and reader thereafter must agree with it
    * LOUDLY (the CmsStream grid-geometry contract, for the dimension
    * the bit rows themselves cannot reveal).
    */
  private def checkWidth(spark: SparkSession, statePath: String,
                         mBits: Int, stamp: Boolean): Unit = {
    val root = new Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def markers(): List[Int] =
      if (!fs.exists(root)) Nil
      else fs.listStatus(root).iterator.map(_.getPath.getName)
        .filter(_.startsWith(".mbits-"))
        .flatMap(_.stripPrefix(".mbits-").toIntOption)
        .toList.sorted
    def validate(ms: List[Int]): Unit = ms match {
      case m :: Nil =>
        require(m == mBits, s"bloom bitmap width mismatch: state at " +
          s"$statePath was written with mBits=$m, caller passed $mBits")
      case Nil => // no state yet: nothing to validate against
      case many =>
        // Two concurrent FIRST writers with different widths each
        // stamped their own marker file — the state mixes widths and
        // no read of it is trustworthy. Loud, not listing-order luck.
        throw new IllegalStateException(
          s"bloom state at $statePath carries ${many.size} width " +
            s"markers (${many.mkString(", ")}): concurrent first " +
            "writers disagreed on mBits; the state is mixed-width " +
            "and must be rebuilt")
    }
    val seen = markers()
    if (seen.isEmpty && stamp) {
      fs.mkdirs(root)
      // createNewFile is the atomic variant: a same-width racer loses
      // the create benignly. A DIFFERENT-width racer creates a
      // different file name, so atomicity alone can't elect a winner —
      // the post-stamp re-list below is what catches that, loudly.
      fs.createNewFile(new Path(root, s".mbits-$mBits"))
      validate(markers())
    } else validate(seen)
  }

  /** Start-ready writer maintaining the bit-hit counts of `textCol`. */
  def bitWriter(events: DataFrame, statePath: String, checkpoint: String,
                textCol: String, mBits: Int = DefaultBits,
                compactEvery: Int = PartialState.DefaultCompactEvery)
  : DataStreamWriter[Row] =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        maintainBatch(batch, batchId, statePath, textCol, mBits,
          compactEvery)
      }

  /** The writer's per-batch maintenance — apply the batch, then fold
    * the partials on the cadence ([[PartialState.cadenceDue]]). The
    * `foreachBatch` body, named for spec replay.
    */
  def maintainBatch(batch: DataFrame, batchId: Long, statePath: String,
                    textCol: String, mBits: Int = DefaultBits,
                    compactEvery: Int = PartialState.DefaultCompactEvery)
  : Unit = {
    applyBatch(batch, batchId, statePath, textCol, mBits)
    if (PartialState.cadenceDue(batchId, compactEvery)) {
      compact(batch.sparkSession, statePath)
      ()
    }
  }

  /** One micro-batch (also the batch/backfill entry point): THIS
    * batch's bit-hit counts to its own directory — replay overwrites,
    * never accumulates.
    */
  def applyBatch(batch: DataFrame, batchId: Long, statePath: String,
                 textCol: String, mBits: Int = DefaultBits): Unit = {
    if (batch.isEmpty) return
    checkWidth(batch.sparkSession, statePath, mBits, stamp = true)
    // Null content is outside the monitor's domain on BOTH faces (a
    // null md5 would ride as a never-matchable null bit): filtered
    // here and in [[probe]], mirrored by the oracle's predicate.
    batch.where(col(textCol).isNotNull)
      .select(explode(bitsOf(col(textCol), mBits)).as("bit"))
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
    checkWidth(spark, statePath, mBits, stamp = false)
    // Materialized so the verdict cannot be torn by a concurrent
    // compact's GC between listing and action (PartialState contract).
    val set = currentBits(spark, statePath)
      .withColumn("_set", lit(1)).localCheckpoint()
    probeDf
      .where(col(textCol).isNotNull)
      .select(col(idCol), explode(bitsOf(col(textCol), mBits)).as("bit"))
      // DISTINCT candidate positions per id: positive iff EVERY one is
      // set. This keeps the zero-false-negative contract through the
      // inputs a dedup monitor actually sees — duplicate probe rows
      // for one id (2×2 exploded rows would defeat a fixed `== 2`
      // match count) and the h1 == h2 self-collision (one distinct
      // position, so the required count is 1, not 2). Duplicate ids
      // with DIFFERENT texts conservatively AND their verdicts.
      .distinct()
      .join(broadcast(set), Seq("bit"), "left")
      .groupBy(col(idCol))
      // count() skips nulls: all candidate positions matched.
      .agg((count(col("_set")) === count(lit(1))).as("bloom_positive"))
  }

  /** Fold all bit-count partials into one compacted directory —
    * read-equivalent before/after, replay of folded batches ignored
    * structurally ([[PartialState.compact]]). Returns the folded
    * high-water batch id.
    */
  def compact(spark: SparkSession, statePath: String): Long =
    PartialState.compact(spark, statePath, Seq("bit"), "n")
}
