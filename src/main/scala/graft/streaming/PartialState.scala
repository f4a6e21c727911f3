package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared reader AND compactor for the per-batchId partial-count state
  * layout every non-idempotent streamed sketch uses
  * (`statePath/batch=<batchId>/` holding additive (keys..., count)
  * rows — the [[DriftStream]] exactly-once recipe): the maintained
  * table is the per-key SUM over the live partials, or the caller's
  * zero-row frame when no state exists yet. One definition so the
  * CMS / histogram / category / Benford faces cannot drift on the
  * exists-check, the sum-merge, or the compaction contract.
  *
  * == Compaction (round 11) ==
  *
  * Left alone, the layout grows one tiny parquet directory PER
  * MICRO-BATCH forever — an always-on stream at a 1-minute trigger
  * accretes ~525k directories/year, and the read face dies of file
  * LISTING long before the data is large. [[compact]] folds every
  * live partial into a single `batch=compacted-<hwm>` directory, where
  * `hwm` is the highest numeric batch id folded in.
  *
  * Correctness is structural, enforced by the READER ([[summed]]),
  * which selects exactly: the compacted partial with the highest hwm
  * (if any) plus the numeric partials with id > hwm. Everything else —
  * numeric partials the compaction already folded, older compacted
  * partials, and a pre-compaction batch a recovering stream REPLAYS
  * after its counts were folded — is invisible to every read, so
  * replay cannot double-count and deleting folded directories is pure
  * garbage collection that correctness never waits on. Every crash
  * window is safe: before the rename the staging directory is
  * invisible (not `batch=`-prefixed); after it the folded partials are
  * ignored; a failed GC is retried by the next compact.
  *
  * Call [[compact]] from the stream's own maintenance point (e.g.
  * every N-th `foreachBatch`) or any quiesced moment — it must not
  * race a concurrent overwrite of a partial it is reading, the same
  * single-writer discipline the per-batch overwrite recipe already
  * requires. A batch id ABOVE the folded high-water mark written
  * concurrently is never selected for GC and survives untouched.
  *
  * Read-equivalence is a claim about state CONTENTS: any read STARTED
  * after any step of a compact sums to the same table. An IN-FLIGHT
  * read is different — a DataFrame from [[summed]] snapshots the
  * directory listing at build time and reads files at action time, so
  * a compact's GC landing in between fails that action loudly
  * (FileNotFoundException; re-reading fresh state succeeds). That is
  * the correct failure mode — `ignoreMissingFiles` would silently
  * return partial sums instead. A reader that must hold a result
  * across an unknown compaction point materializes it first
  * (`localCheckpoint()`/`collect()`, as the probe faces already do);
  * a deployment with external readers runs compact in their quiesced
  * windows, exactly like any other lake-table file rewrite.
  */
private[streaming] object PartialState {

  private val Prefix = "batch="
  private val CompactedPrefix = "batch=compacted-"

  private def fsOf(spark: SparkSession, statePath: String): (FileSystem, Path) = {
    val p = new Path(statePath)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** All `batch=` child directories of the state root (one listing —
    * the only listing any read performs).
    */
  private def batchDirs(fs: FileSystem, root: Path): Seq[Path] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith(Prefix))

  /** The reader's selection: (high-water mark, directories whose counts
    * are live) — the newest compacted partial plus numeric partials
    * above its hwm. hwm is -1 when nothing was ever compacted.
    */
  private def select(dirs: Seq[Path]): (Long, Seq[Path]) = {
    val compacted = dirs.flatMap { p =>
      val n = p.getName
      if (n.startsWith(CompactedPrefix))
        n.stripPrefix(CompactedPrefix).toLongOption.map(h => (h, p))
      else None
    }
    val hwm = if (compacted.isEmpty) -1L else compacted.map(_._1).max
    val newest = compacted.collect { case (h, p) if h == hwm => p }
    val live = dirs.filter(p =>
      p.getName.stripPrefix(Prefix).toLongOption.exists(_ > hwm))
    (hwm, newest ++ live)
  }

  /** The maintained table: per-key sums over the live partials. */
  def summed(spark: SparkSession, statePath: String, keyCols: Seq[String],
             cntCol: String, empty: => DataFrame): DataFrame = {
    val (fs, root) = fsOf(spark, statePath)
    val (_, dirs) = select(batchDirs(fs, root))
    if (dirs.isEmpty) empty
    else spark.read.parquet(dirs.map(_.toString): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(cntCol)).cast("long").as(cntCol))
  }

  /** Fold every live partial into one `batch=compacted-<hwm>` directory
    * and GC the rest. Idempotent (a re-run with no new batches only
    * retries GC) and read-equivalent at every step: [[summed]] returns
    * the identical table before, during, and after. Returns the new
    * high-water mark (-1 when no state exists).
    */
  def compact(spark: SparkSession, statePath: String, keyCols: Seq[String],
              cntCol: String): Long = {
    val (fs, root) = fsOf(spark, statePath)
    val all = batchDirs(fs, root)
    if (all.isEmpty) return -1L
    val (oldHwm, live) = select(all)
    val liveIds = live.flatMap(_.getName.stripPrefix(Prefix).toLongOption)
    val newHwm = (oldHwm +: liveIds).max
    val target = new Path(root, s"$CompactedPrefix$newHwm")
    if (liveIds.nonEmpty) {
      // Stage OUTSIDE the batch= namespace (invisible to the reader and
      // to select), then a single directory rename publishes the folded
      // partial; the just-folded sources become unselected in the same
      // instant. coalesce(1): these are ≤ thousands of rows by design
      // (9 digits / nb buckets / depth×width counters).
      val staging = new Path(root, s".compact-staging-$newHwm")
      spark.read.parquet(live.map(_.toString): _*)
        .groupBy(keyCols.map(col): _*)
        .agg(sum(col(cntCol)).cast("long").as(cntCol))
        .coalesce(1)
        .write.mode("overwrite").parquet(staging.toString)
      fs.delete(target, true) // only exists if a prior compact crashed mid-GC
      require(fs.rename(staging, target),
        s"compact: rename $staging -> $target failed")
    }
    // GC: every directory listed at entry whose counts the compacted
    // partial covers — numeric partials ≤ newHwm and older compacted
    // partials. Unparseable names are left alone (never read, never
    // deleted). Failures here are retried by the next compact; the
    // reader stopped selecting these the instant target existed.
    all.filter { p =>
      val n = p.getName
      n != target.getName && (
        n.stripPrefix(CompactedPrefix).toLongOption.exists(_ < newHwm) ||
        (!n.startsWith(CompactedPrefix) &&
          n.stripPrefix(Prefix).toLongOption.exists(_ <= newHwm)))
    }.foreach(fs.delete(_, true))
    // Staging directories from a compact that crashed pre-rename are
    // invisible to reads but worth sweeping.
    if (fs.exists(root)) fs.listStatus(root).toSeq
      .filter(_.isDirectory).map(_.getPath)
      .filter { p =>
        p.getName.startsWith(".compact-staging-") &&
          p.getName != s".compact-staging-$newHwm" }
      .foreach(fs.delete(_, true))
    newHwm
  }
}
