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
  * A compacted directory COUNTS only once its commit marker
  * (`statePath/.commit-<hwm>`, a zero-byte file) exists. Publication
  * is therefore write-the-fold THEN create-the-marker: creating one
  * file is atomic on every FileSystem including object stores, where
  * a directory "rename" is copy+delete and a crash mid-copy would
  * otherwise leave a half-written directory that READS as the newest
  * generation. A torn fold without its marker is invisible and simply
  * overwritten by the retry.
  *
  * Correctness is structural, enforced by the READER ([[summed]]),
  * which selects exactly: the COMMITTED compacted partial with the
  * highest hwm (if any) plus the numeric partials with id > hwm.
  * Everything else — numeric partials the compaction already folded,
  * older compacted generations, an uncommitted (torn) fold, and a
  * pre-compaction batch a recovering stream REPLAYS after its counts
  * were folded — is invisible to every read, so replay cannot
  * double-count and deleting folded directories is pure garbage
  * collection that correctness never waits on. Every crash window is
  * safe: before the marker the fold directory is ignored; after it the
  * folded partials are ignored; a failed GC is retried by the next
  * compact.
  *
  * Every face's stream WRITER invokes [[compact]] on its own cadence
  * (the `compactEvery` knob, default [[DefaultCompactEvery]], via
  * [[cadenceDue]] inside `foreachBatch` — round 12), so a deployment
  * cannot forget the fold; an explicit [[compact]] from any quiesced
  * moment remains valid for maintenance jobs. Either way it must not
  * race a concurrent overwrite of a partial it is reading — the same
  * single-writer discipline the per-batch overwrite recipe already
  * requires, and which `foreachBatch` provides by construction. A
  * batch id ABOVE the folded high-water mark written concurrently is
  * never selected for GC and survives untouched.
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
  *
  * == BEHAVIOR CHANGE (round 12) — writer-driven folding is ON by
  * default ==
  *
  * Before round 12, compaction only ran when a caller invoked
  * [[compact]] explicitly; now every face's stream writer folds every
  * [[DefaultCompactEvery]] batches on its own. A deployment whose
  * EXTERNAL readers relied on controlling compaction timing must pass
  * `compactEvery <= 0` to the writer (the explicit-maintenance
  * opt-out: writer-driven folding fully disabled, the pre-round-12
  * contract restored) — otherwise an in-flight external read that
  * straddles a fold's GC fails loudly as described above.
  */
private[streaming] object PartialState {

  /** Default writer-driven compaction cadence (micro-batches between
    * folds): small enough that the live-directory count any read
    * lists stays O(cadence) — the bound that keeps an always-on
    * stream's file listing flat forever — and large enough that the
    * fold (one read+rewrite of ≤ cadence tiny partials) amortizes to
    * noise against the per-batch write itself.
    */
  val DefaultCompactEvery = 64

  /** Writer-cadence predicate: fold after the batch whose id completes
    * a `compactEvery`-sized stride (ids 63, 127, … at the default) —
    * anchored at id 0, so the schedule is a pure function of the
    * checkpoint's batch ids and a restarted stream folds on the same
    * batches it would have the first time. Non-positive cadence
    * disables writer-driven folding (explicit-maintenance
    * deployments).
    */
  def cadenceDue(batchId: Long, compactEvery: Int): Boolean =
    compactEvery > 0 && batchId >= 0 && (batchId + 1) % compactEvery == 0

  private val Prefix = "batch="
  private val CompactedPrefix = "batch=compacted-"
  private val MarkerPrefix = ".commit-"

  private def fsOf(spark: SparkSession, statePath: String): (FileSystem, Path) = {
    val p = new Path(statePath)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** One listing of the state root — the only listing any read
    * performs: (batch directories, committed hwm marker values).
    */
  private def listing(fs: FileSystem, root: Path): (Seq[Path], Set[Long]) =
    if (!fs.exists(root)) (Seq.empty, Set.empty)
    else {
      val entries = fs.listStatus(root).toSeq
      val dirs = entries.filter(_.isDirectory).map(_.getPath)
        .filter(_.getName.startsWith(Prefix))
      val committed = entries.filter(!_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith(MarkerPrefix))
        .flatMap(_.stripPrefix(MarkerPrefix).toLongOption).toSet
      (dirs, committed)
    }

  /** The reader's selection: (high-water mark, directories whose counts
    * are live) — the newest COMMITTED compacted partial plus numeric
    * partials above its hwm. hwm is -1 when nothing was ever compacted
    * (or no fold has its marker yet).
    */
  private def select(dirs: Seq[Path], committed: Set[Long]): (Long, Seq[Path]) = {
    val compacted = dirs.flatMap { p =>
      val n = p.getName
      if (n.startsWith(CompactedPrefix))
        n.stripPrefix(CompactedPrefix).toLongOption
          .filter(committed).map(h => (h, p))
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
    val (dirs, committed) = listing(fs, root)
    val (_, live) = select(dirs, committed)
    if (live.isEmpty) empty
    else spark.read.parquet(live.map(_.toString): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(cntCol)).cast("long").as(cntCol))
  }

  /** Fold every live partial into one `batch=compacted-<hwm>` directory
    * (published by its atomic commit marker) and GC the rest.
    * Idempotent (a re-run with no new batches only retries GC) and
    * read-equivalent at every step: [[summed]] returns the identical
    * table before, during, and after. Returns the new high-water mark
    * (-1 when no state exists).
    */
  def compact(spark: SparkSession, statePath: String, keyCols: Seq[String],
              cntCol: String): Long = {
    val (fs, root) = fsOf(spark, statePath)
    val (dirs, committed) = listing(fs, root)
    if (dirs.isEmpty) return -1L
    val (oldHwm, live) = select(dirs, committed)
    val liveIds = live.flatMap(_.getName.stripPrefix(Prefix).toLongOption)
    val newHwm = (oldHwm +: liveIds).max
    val target = new Path(root, s"$CompactedPrefix$newHwm")
    if (liveIds.nonEmpty) {
      // Write the fold directly (mode overwrite also clears a torn
      // previous attempt — uncommitted, so never read), THEN publish it
      // with one atomic file create. coalesce(1): these are ≤ thousands
      // of rows by design (9 digits / nb buckets / depth×width
      // counters).
      spark.read.parquet(live.map(_.toString): _*)
        .groupBy(keyCols.map(col): _*)
        .agg(sum(col(cntCol)).cast("long").as(cntCol))
        .coalesce(1)
        .write.mode("overwrite").parquet(target.toString)
      fs.create(new Path(root, s"$MarkerPrefix$newHwm"), true).close()
    }
    // GC: every directory listed at entry whose counts the committed
    // fold covers — numeric partials ≤ newHwm and older compacted
    // generations (with their markers; dir first, so a crash in
    // between leaves only an orphan marker, swept below). Unparseable
    // names are left alone (never read, never deleted). Failures here
    // are retried by the next compact; the reader stopped selecting
    // these the instant the marker existed.
    dirs.filter { p =>
      val n = p.getName
      n != target.getName && (
        n.stripPrefix(CompactedPrefix).toLongOption.exists(_ < newHwm) ||
        (!n.startsWith(CompactedPrefix) &&
          n.stripPrefix(Prefix).toLongOption.exists(_ <= newHwm)))
    }.foreach { p =>
      fs.delete(p, true)
      p.getName.stripPrefix(CompactedPrefix).toLongOption.foreach(h =>
        fs.delete(new Path(root, s"$MarkerPrefix$h"), false))
    }
    // Orphan markers (a GC that crashed between dir and marker, or a
    // marker whose generation was superseded) are invisible to reads
    // but worth sweeping.
    (committed - newHwm).filter(_ < newHwm).foreach(h =>
      fs.delete(new Path(root, s"$MarkerPrefix$h"), false))
    newHwm
  }
}
