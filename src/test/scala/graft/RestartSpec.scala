package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{BloomStream, KAnonStream, KmvStream, PartialState}
import graft.operators.Anonymity

/** REAL checkpoint-restart recovery of a streamed face (round 13).
  *
  * Every other streaming spec either replays `maintainBatch` by hand
  * or runs one MemoryStream query to completion; none ever KILLS a
  * query and resumes it from its checkpoint. This spec does, twice
  * over in one scenario:
  *
  *  1. a CLEAN stop/restart — the resumed query must continue batch
  *     ids where the checkpoint left off, so the fold cadence
  *     (anchored at batch id 0, [[PartialState.cadenceDue]]) fires on
  *     the same global schedule it would have without the restart,
  *     NOT `compactEvery` batches after the restart; and
  *  2. a CRASH-WINDOW restart — the checkpoint's offset log has
  *     batch N but its commit log does not (the window between the
  *     sink's foreachBatch work and Spark writing `commits/N`; forged
  *     here by deleting that one file), so the restarted query
  *     REPLAYS batch N with its original data. The per-batch
  *     overwrite recipe must absorb the replay with no double count.
  *
  * Done-criterion from the r12 verdict: state ≡ the one-shot batch
  * kernel after restart, and the cadence resumed on schedule.
  */
class RestartSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val keys = Seq("event_type", "user_id")
  private def t(min: Int): Timestamp = new Timestamp(min * 60000L)

  // Eight 25-row micro-batches with overlapping QI classes, so replay
  // double-counting would visibly inflate class sizes.
  private def slice(b: Int): Seq[Ev] =
    (0 until 25).map { j =>
      val i = b * 25 + j
      Ev(i.toLong, t(i % 50), (i % 5).toLong, s"t${i % 3}", i.toDouble,
        "{}")
    }

  private type Rep = (Long, Long, Long, Long)

  private def stateDirs(st: String): Seq[String] =
    new java.io.File(st).listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq.sorted

  test("k-anon face: clean restart + crash-window replay, cadence on schedule") {
    val dir = s"${sys.props("java.io.tmpdir")}/restart_${System.nanoTime()}"
    val (st, chk) = (s"$dir/state", s"$dir/chk")
    val compactEvery = 4 // folds complete at batch ids 3, 7, ...
    val input = MemoryStream[Ev](spark)
    def start() =
      KAnonStream.qiWriter(input.toDF(), st, chk, keys, compactEvery)
        .start()

    // ---- Run 1: batches 0..5, then a clean stop. ----
    val q1 = start()
    try {
      (0 to 5).foreach { b =>
        input.addData(slice(b))
        q1.processAllAvailable()
      }
    } finally q1.stop()
    // The writer folded at id 3 (cadenceDue) and batches 4, 5 sit
    // above the fold — the state we must recover from.
    assert(stateDirs(st) === Seq("batch=4", "batch=5",
      "batch=compacted-3"))

    // ---- Forge the crash window: offsets/5 exists, commits/5 gone,
    // so the restarted query reprocesses batch 5 from its recorded
    // offsets before taking new data. ----
    val commit5 = new java.io.File(s"$chk/commits/5")
    assert(commit5.isFile, s"expected commit marker at $commit5")
    assert(commit5.delete())
    // The local ChecksumFs keeps a .crc sidecar per file; a real crash
    // loses both, so the forgery must too (a stale sidecar would fail
    // the restarted query's own commit rewrite).
    new java.io.File(s"$chk/commits/.5.crc").delete()
    val afterCrash = KAnonStream.report(spark, st, keys)
      .as[Rep].collect().toSeq

    // ---- Run 2: restart from the SAME checkpoint. ----
    val q2 = start()
    try {
      // First wave: Spark replays batch 5 (same 25 rows), then runs
      // the new data as batch 6.
      input.addData(slice(6))
      q2.processAllAvailable()
      // The replay overwrote batch=5 in place: totals over batches
      // 0..5 are exactly the pre-crash state, plus batch 6's counts.
      val replayed = KAnonStream.currentCounts(spark, st, keys)
        .agg(org.apache.spark.sql.functions.sum("n")).as[Long].head()
      assert(replayed === 7 * 25L, "replayed batch must not double-count")
      assert(stateDirs(st).contains("batch=compacted-3"),
        "restart must resume from the folded generation, not refold early")
      // Second wave: batch 7 — cadenceDue(7, 4) must fire even though
      // only TWO batches ran since the restart: the schedule is a pure
      // function of the checkpoint's batch ids, not of process lifetime.
      input.addData(slice(7))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(stateDirs(st) === Seq("batch=compacted-7"),
      "fold cadence must resume on the checkpoint's global schedule")

    // ---- The recovered, replayed, refolded state is the batch kernel. ----
    val streamed = KAnonStream.report(spark, st, keys)
      .as[Rep].collect().toSeq
    val oneShot = Anonymity.reportFromCounts(
        Anonymity.qiCounts((0 to 7).flatMap(slice).toDF(), keys))
      .as[Rep].collect().toSeq
    assert(streamed === oneShot)
    // And the crash-window state itself was already kernel-exact for
    // batches 0..5 (the sink work of batch 5 had landed; only the
    // commit marker was lost).
    val oneShot05 = Anonymity.reportFromCounts(
        Anonymity.qiCounts((0 to 5).flatMap(slice).toDF(), keys))
      .as[Rep].collect().toSeq
    assert(afterCrash === oneShot05)
  }

  // ---- Second streamed-face family (round 14): BloomStream carries a
  // DIFFERENT state shape — a fixed-width bitmap as (bit, n) hit-count
  // partials plus the `.mbits-<m>` width marker — so its recovery
  // contract is asserted independently: the maintained filter after a
  // clean restart AND a crash-window replay must equal the one-shot
  // batch filter bit-for-bit, with the fold cadence on the
  // checkpoint's global schedule and the width marker surviving both
  // the restart and the fold.

  /** Batch `b` as text rows. `doc_<id % 60>` overlaps across batches,
    * so a double-counted replay would inflate hit counts visibly while
    * leaving some bits shared between batches — the shape that catches
    * both replay bugs and fold bugs.
    */
  private def texts(b: Int): Seq[String] =
    (0 until 25).map(j => s"doc_${(b * 25 + j) % 60}")

  test("bloom face: clean restart + crash-window replay, bitmap bit-exact") {
    val dir = s"${sys.props("java.io.tmpdir")}/restartb_${System.nanoTime()}"
    val (st, chk) = (s"$dir/state", s"$dir/chk")
    val mBits = 512 // small enough for real collisions in 200 rows
    val compactEvery = 4
    val input = MemoryStream[String](spark)
    def start() =
      BloomStream.bitWriter(input.toDF().toDF("txt"), st, chk, "txt",
        mBits, compactEvery).start()

    // ---- Run 1: batches 0..5, clean stop. ----
    val q1 = start()
    try {
      (0 to 5).foreach { b =>
        input.addData(texts(b))
        q1.processAllAvailable()
      }
    } finally q1.stop()
    assert(stateDirs(st) === Seq("batch=4", "batch=5",
      "batch=compacted-3"))
    assert(new java.io.File(st, s".mbits-$mBits").isFile)

    // ---- Forge the crash window on batch 5 (commit marker + its
    // ChecksumFs sidecar), exactly as the k-anon scenario. ----
    val commit5 = new java.io.File(s"$chk/commits/5")
    assert(commit5.isFile && commit5.delete())
    new java.io.File(s"$chk/commits/.5.crc").delete()

    // ---- Run 2: replay batch 5, take batch 6, then batch 7 so the
    // cadence (due at global id 7) must fire two batches after the
    // restart. ----
    val q2 = start()
    try {
      input.addData(texts(6))
      q2.processAllAvailable()
      // Hit counts are the replay detector the SET bits can't be (a
      // double-counted bit is still just "set"): every row explodes to
      // exactly 2 positions, so totals are 2 rows-per-batch exact.
      val hits = spark.read
        .parquet(stateDirs(st).map(d => s"$st/$d"): _*)
        .agg(org.apache.spark.sql.functions.sum("n")).as[Long].head()
      assert(hits === 2L * 7 * 25, "replayed batch must not double-count")
      assert(stateDirs(st).contains("batch=compacted-3"),
        "restart must resume from the folded generation")
      input.addData(texts(7))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(stateDirs(st) === Seq("batch=compacted-7"),
      "fold cadence must resume on the checkpoint's global schedule")
    assert(new java.io.File(st, s".mbits-$mBits").isFile,
      "width marker must survive restart and fold")

    // ---- The recovered bitmap IS the one-shot batch bitmap. ----
    val oneShotSt = s"$dir/oneshot"
    BloomStream.applyBatch((0 to 7).flatMap(texts).toDF("txt"), 0L,
      oneShotSt, "txt", mBits)
    val streamedBits = BloomStream.currentBits(spark, st)
      .as[Long].collect().sorted.toSeq
    val oneShotBits = BloomStream.currentBits(spark, oneShotSt)
      .as[Long].collect().sorted.toSeq
    assert(streamedBits === oneShotBits)
    assert(streamedBits.nonEmpty && streamedBits.size < 2 * 200,
      "collisions expected at mBits=512 over 60 distinct docs")
    // And probe verdicts from the recovered state: every seen doc is
    // positive (zero false negatives through restart + replay).
    val probe = BloomStream.probe(spark, st,
      (0 to 7).flatMap(texts).distinct.toDF("txt"), "txt", "txt", mBits)
    assert(probe.where(org.apache.spark.sql.functions
      .not(org.apache.spark.sql.functions.col("bloom_positive")))
      .count() === 0L)
  }

  // ---- Third streamed-face family (round 15): KmvStream's state is a
  // THIRD distinct shape — one whole-table min-k sketch, atomically
  // write-then-swapped per batch, with NO per-batch partials and NO
  // fold cadence — so its recovery rests on a different mechanism
  // entirely: the merge's idempotent ALGEBRA (set-union then truncate
  // at the k-th order statistic) absorbs the crash-window replay,
  // rather than an overwrite of a batch-keyed directory. Asserted with
  // the same scenario: clean stop, forged crash window (commit marker
  // + ChecksumFs sidecar), then streamed state ≡ the one-shot batch
  // sketch HASH-FOR-HASH and the pairwise read face agrees.

  /** Batch `b`: "view" events for an overlapping user range plus
    * "click" events for a subrange. Re-seen users across batches make
    * a non-idempotent merge visibly wrong, and the second key gives
    * the pairwise face something to intersect.
    */
  private def kmvEvs(b: Int): Seq[Ev] =
    (b * 15 + 1 to b * 15 + 40).map(u =>
      Ev(u.toLong * 7919, t(u % 50), u.toLong, "view", 0, "{}")) ++
      (b * 15 + 10 to b * 15 + 25).map(u =>
        Ev(u.toLong * 6271, t(u % 50), u.toLong, "click", 0, "{}"))

  test("kmv face: clean restart + crash-window replay, sketch hash-for-hash") {
    val dir = s"${sys.props("java.io.tmpdir")}/restartk_${System.nanoTime()}"
    val (st, chk) = (s"$dir/state", s"$dir/chk")
    val k = 16 // far fewer than the distinct users, so truncation is real
    val input = MemoryStream[Ev](spark)
    def start() =
      KmvStream.sketchWriter(input.toDF(), st, chk, "event_type",
        "user_id", k).start()

    def stateSet(path: String): Set[(String, String)] =
      spark.read.parquet(path).as[(String, String)].collect().toSet
    def oneShot(path: String, bs: Range): Set[(String, String)] = {
      KmvStream.applyBatch(bs.flatMap(kmvEvs).toDF(), path,
        "event_type", "user_id", k)
      stateSet(path)
    }

    // ---- Run 1: batches 0..5, clean stop. ----
    val q1 = start()
    try {
      (0 to 5).foreach { b =>
        input.addData(kmvEvs(b)); q1.processAllAvailable()
      }
    } finally q1.stop()

    // ---- Forge the crash window on batch 5 (commit marker + its
    // ChecksumFs sidecar), exactly as the other two families. ----
    val commit5 = new java.io.File(s"$chk/commits/5")
    assert(commit5.isFile && commit5.delete())
    new java.io.File(s"$chk/commits/.5.crc").delete()
    // The sink work of batch 5 had landed (the swap is atomic); the
    // crash lost only the commit marker, so the surviving state is
    // already the 0..5 kernel.
    assert(stateSet(st) === oneShot(s"$dir/oneshot05", 0 to 5))

    // ---- Run 2: restart replays batch 5 (a no-op by min-k algebra),
    // then takes batches 6 and 7. ----
    val q2 = start()
    try {
      input.addData(kmvEvs(6)); q2.processAllAvailable()
      input.addData(kmvEvs(7)); q2.processAllAvailable()
    } finally q2.stop()

    // ---- The recovered, replayed sketch IS the one-shot sketch. ----
    val streamed = stateSet(st)
    assert(streamed === oneShot(s"$dir/oneshot07", 0 to 7))
    assert(streamed.count(_._1 == "view") === k,
      "view sketch must hold exactly k hashes — the merge re-minimized")
    // And the state-only read face from the recovered sketch equals
    // the face from the one-shot sketch (same state in, same
    // estimates out — recovery is invisible to readers).
    val est = KmvStream.pairwiseEstimates(spark, st, k)
      .as[(String, String, Long, Long, Double)].collect().toSeq.sorted
    val estOne = KmvStream
      .pairwiseEstimates(spark, s"$dir/oneshot07", k)
      .as[(String, String, Long, Long, Double)].collect().toSeq.sorted
    assert(est === estOne && est.nonEmpty)
  }
}
