package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.KAnonStream
import graft.operators.Anonymity

/** Streamed k-anonymity maintenance: the streamed exposure report must
  * equal the batch `dq_k_anonymity` kernel on any batching (class sizes
  * are additive), and replay must be idempotent via the per-batch
  * partial directories.
  */
class KAnonStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val keys = Seq("event_type", "user_id")

  private def t(min: Int): Timestamp = new Timestamp(min * 60000L)

  // A QI tuple (event_type, user_id) with deliberately skewed class
  // sizes: some classes far above k=5, some singletons below it.
  private def evs(n: Int): Seq[Ev] =
    (0 until n).map { i =>
      val typ = if (i % 11 == 0) s"rare_$i" else s"t${i % 3}"
      Ev(i.toLong, t(i % 50), (i % 7).toLong, typ, i.toDouble, "{}")
    }
  private val all = evs(400)

  private type Rep = (Long, Long, Long, Long)

  test("streamed report equals the batch kernel on any batching") {
    val dir = s"${sys.props("java.io.tmpdir")}/kanon_${System.nanoTime()}"
    val input = MemoryStream[Ev](spark)
    val q = KAnonStream.qiWriter(input.toDF(), s"$dir/state",
      s"$dir/chk", keys).start()
    try {
      input.addData(all.take(130))
      q.processAllAvailable()
      input.addData(all.slice(130, 290))
      q.processAllAvailable()
      input.addData(all.drop(290))
      q.processAllAvailable()
      val streamed = KAnonStream.report(spark, s"$dir/state", keys)
        .as[Rep].collect().toSeq
      val oneShot = Anonymity.reportFromCounts(
          Anonymity.qiCounts(all.toDF(), keys))
        .as[Rep].collect().toSeq
      assert(streamed === oneShot)
      // The fixture plants both exposed singletons and safe classes.
      val (nGroups, below, atRisk, minSize) = streamed.head
      assert(below > 0 && below < nGroups)
      assert(atRisk > 0 && minSize === 1L)
    } finally q.stop()
  }

  test("report before any batch is the explicit zero-exposure row") {
    val st = s"${sys.props("java.io.tmpdir")}/kanon_e_${System.nanoTime()}/state"
    val r = KAnonStream.report(spark, st, keys).collect()(0)
    assert(r.getLong(0) === 0L) // n_groups
    assert(r.getLong(1) === 0L) // groups_below_k — 0, not a null a
    assert(r.getLong(2) === 0L) // rows_at_risk     downstream gate eats
    assert(r.isNullAt(3))       // min_group_size: "no groups"
  }

  test("replaying a batch id leaves the counts unchanged; new id adds") {
    val dir = s"${sys.props("java.io.tmpdir")}/kanon_rp_${System.nanoTime()}"
    val batch = all.take(90).toDF()
    KAnonStream.applyBatch(batch, 5L, s"$dir/state", keys)
    val first = KAnonStream.currentCounts(spark, s"$dir/state", keys)
      .as[(String, String, Long)].collect()
      .map { case (a, b, n) => ((a, b), n) }.toMap
    KAnonStream.applyBatch(batch, 5L, s"$dir/state", keys)
    val second = KAnonStream.currentCounts(spark, s"$dir/state", keys)
      .as[(String, String, Long)].collect()
      .map { case (a, b, n) => ((a, b), n) }.toMap
    assert(first === second)
    KAnonStream.applyBatch(batch, 6L, s"$dir/state", keys)
    val third = KAnonStream.currentCounts(spark, s"$dir/state", keys)
      .as[(String, String, Long)].collect()
      .map { case (a, b, n) => ((a, b), n) }.toMap
    assert(third.values.sum === 2 * first.values.sum)
  }

  test("compaction: report unchanged, folded replay ignored, dirs bounded") {
    val dir = s"${sys.props("java.io.tmpdir")}/kanon_cp_${System.nanoTime()}"
    val st = s"$dir/state"
    def dirs: Seq[String] = new java.io.File(st).listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq.sorted
    def rep: Seq[Rep] =
      KAnonStream.report(spark, st, keys).as[Rep].collect().toSeq
    KAnonStream.applyBatch(all.take(130).toDF(), 0L, st, keys)
    KAnonStream.applyBatch(all.slice(130, 290).toDF(), 1L, st, keys)
    KAnonStream.applyBatch(all.drop(290).toDF(), 2L, st, keys)
    val before = rep
    assert(KAnonStream.compact(spark, st, keys) === 2L)
    // Read-equivalent, and the per-micro-batch directory growth is gone.
    assert(rep === before)
    assert(dirs === Seq("batch=compacted-2"))
    // A recovering stream REPLAYS a folded batch: the reader must ignore
    // it structurally (id ≤ hwm) — no double count.
    KAnonStream.applyBatch(all.take(130).toDF(), 1L, st, keys)
    assert(rep === before)
    // A genuinely new batch still accumulates, and the next compact
    // folds it AND sweeps the stray replay directory.
    KAnonStream.applyBatch(all.take(130).toDF(), 3L, st, keys)
    val grown = KAnonStream.currentCounts(spark, st, keys)
      .agg(org.apache.spark.sql.functions.sum("n")).as[Long].head()
    assert(grown === 530L)
    assert(KAnonStream.compact(spark, st, keys) === 3L)
    assert(dirs === Seq("batch=compacted-3"))
  }

  test("double-typed QI agrees with the batch kernel (-0.0, 0.0, NaN)") {
    // The round-12 contract: float/double QIs are normalized to
    // groupBy equality BEFORE the string render, so a class the batch
    // gate counts as ONE can never split across partials. The fixture
    // plants the two historic splitters — -0.0 vs 0.0 and NaN — in
    // DIFFERENT batches, where an un-normalized render ("-0.0" ≠
    // "0.0") would manufacture extra classes.
    val dir = s"${sys.props("java.io.tmpdir")}/kanon_dq_${System.nanoTime()}"
    val st = s"$dir/state"
    val dkeys = Seq("score", "band")
    val b0 = Seq[(java.lang.Double, String)]((0.0, "a"), (1.25, "a"),
      (Double.NaN, "b"), (2.5, "b"), (null, "b")).toDF("score", "band")
    val b1 = Seq[(java.lang.Double, String)]((-0.0, "a"), (1.25, "a"),
      (Double.NaN, "b"), (-0.0, "a"), (null, "b")).toDF("score", "band")
    KAnonStream.applyBatch(b0, 0L, st, dkeys)
    KAnonStream.applyBatch(b1, 1L, st, dkeys)
    val streamed = KAnonStream.report(spark, st, dkeys, k = 3)
      .as[Rep].collect().toSeq
    val oneShot = Anonymity.reportFromCounts(
        Anonymity.qiCounts(b0.unionAll(b1), dkeys), k = 3)
      .as[Rep].collect().toSeq
    assert(streamed === oneShot)
    // And the partition itself: (0.0, a) spans both batches as ONE
    // class of 3 (0.0 + two -0.0), NaN is one class of 2, null one
    // class of 2 — 5 classes total, not the 7 a raw render would make.
    val counts = KAnonStream.currentCounts(spark, st, dkeys)
      .as[(String, String, Long)].collect()
      .map { case (s, b, n) => ((s, b), n) }.toMap
    assert(counts.size === 5)
    assert(counts(("0.0", "a")) === 3L)
    assert(counts(("NaN", "b")) === 2L)
    assert(counts((null, "b")) === 2L)
    assert(counts(("1.25", "a")) === 2L)
    assert(counts(("2.5", "b")) === 1L)
    // The first float-QI write stamped the render-format marker; the
    // format is part of the state's identity from then on.
    assert(new java.io.File(st,
      s".qifmt-${KAnonStream.QiFormatVersion}").isFile)
  }

  test("float-QI partials without a format marker fail loudly") {
    // A state directory written by the pre-round-12 code (raw float
    // render) has partials but no .qifmt marker; resuming a
    // float/double-QI stream over it could split classes ("-0.0" vs
    // "0.0" partials summed with normalized ones) — so the writer
    // must refuse, not guess.
    val dir = s"${sys.props("java.io.tmpdir")}/kanon_v1_${System.nanoTime()}"
    val st = s"$dir/state"
    val dkeys = Seq("score", "band")
    val b = Seq[(java.lang.Double, String)]((1.0, "a"), (2.0, "b"))
      .toDF("score", "band")
    KAnonStream.applyBatch(b, 0L, st, dkeys)
    // Simulate legacy state: strip the marker the round-13 code stamped.
    val marker = new java.io.File(st,
      s".qifmt-${KAnonStream.QiFormatVersion}")
    assert(marker.delete())
    val e = intercept[IllegalStateException] {
      KAnonStream.applyBatch(b, 1L, st, dkeys)
    }
    assert(e.getMessage.contains("NO render-format marker"))
    // A marker from a FUTURE/different format version is equally loud.
    assert(new java.io.File(st, ".qifmt-99").createNewFile())
    val e2 = intercept[IllegalArgumentException] {
      KAnonStream.applyBatch(b, 1L, st, dkeys)
    }
    assert(e2.getMessage.contains("format v99"))
  }

  test("stampQiFormat acknowledges an unstamped normalized state; refuses stamped ones") {
    // Round-14 advisor path: a state written by the v2 renderer but
    // BEFORE markers existed is valid — the operator who knows that
    // lineage can acknowledge it once instead of rebuilding.
    val dir = s"${sys.props("java.io.tmpdir")}/kanon_ack_${System.nanoTime()}"
    val st = s"$dir/state"
    val dkeys = Seq("score", "band")
    val b = Seq[(java.lang.Double, String)]((1.0, "a"), (2.0, "b"))
      .toDF("score", "band")
    KAnonStream.applyBatch(b, 0L, st, dkeys)
    assert(new java.io.File(st,
      s".qifmt-${KAnonStream.QiFormatVersion}").delete())
    // Unstamped + partials: refused, and the message points at the
    // acknowledgment path rather than claiming the state is v1.
    val e = intercept[IllegalStateException] {
      KAnonStream.applyBatch(b, 1L, st, dkeys)
    }
    assert(e.getMessage.contains("unknown"))
    assert(e.getMessage.contains("stampQiFormat"))
    // Acknowledge → the marker is back and the stream resumes.
    KAnonStream.stampQiFormat(spark, st)
    assert(new java.io.File(st,
      s".qifmt-${KAnonStream.QiFormatVersion}").isFile)
    KAnonStream.applyBatch(b, 1L, st, dkeys)
    val total = KAnonStream.currentCounts(spark, st, dkeys)
      .agg(org.apache.spark.sql.functions.sum("n"))
      .as[Long].head()
    assert(total === 4L)
    // An already-stamped state needs no acknowledgment — and stamping
    // over a DIFFERENT version would forge compatibility, so any
    // existing marker is a loud refusal.
    val e2 = intercept[IllegalArgumentException] {
      KAnonStream.stampQiFormat(spark, st)
    }
    assert(e2.getMessage.contains("already carries"))
  }

  test("format validation is cached per writer run, not per batch") {
    // Round-14 advisor: the marker can only legitimately change
    // between runs, so a run-scoped gate lists the state root once.
    // Observable semantics: with a SHARED gate (one run), deleting the
    // marker after the first batch goes unnoticed; a FRESH gate (a
    // restart, or a direct applyBatch call) re-validates and refuses.
    val dir = s"${sys.props("java.io.tmpdir")}/kanon_gate_${System.nanoTime()}"
    val st = s"$dir/state"
    val dkeys = Seq("score", "band")
    val b = Seq[(java.lang.Double, String)]((1.0, "a"), (2.0, "b"))
      .toDF("score", "band")
    val gate = new KAnonStream.QiFormatGate
    KAnonStream.applyBatch(b, 0L, st, dkeys, gate)
    assert(new java.io.File(st,
      s".qifmt-${KAnonStream.QiFormatVersion}").delete())
    // Same run (same gate): cached validation, batch lands.
    KAnonStream.applyBatch(b, 1L, st, dkeys, gate)
    // New run (fresh gate): re-validates, sees the partials unstamped.
    intercept[IllegalStateException] {
      KAnonStream.applyBatch(b, 2L, st, dkeys)
    }
  }

  test("a writer reused across stop()/start() re-validates per run") {
    // Round-15 advisor: the gate caches per QUERY RUN (keyed on the
    // `sql.streaming.runId` local property), not per writer object —
    // restarting the SAME writer must re-list the state root, not
    // trust the previous run's check.
    val dir = s"${sys.props("java.io.tmpdir")}/kanon_rerun_${System.nanoTime()}"
    val (st, chk) = (s"$dir/state", s"$dir/chk")
    val dkeys = Seq("score", "band")
    val input = MemoryStream[(Double, String)](spark)
    val writer = KAnonStream.qiWriter(
      input.toDF().toDF("score", "band"), st, chk, dkeys)
    val q1 = writer.start()
    try {
      input.addData((1.0, "a"), (2.0, "b"))
      q1.processAllAvailable()
    } finally q1.stop()
    // Between runs the marker disappears (say, a state restore that
    // dropped dotfiles). The partials are now unstamped — the reused
    // writer's SECOND run must notice and refuse, exactly as a fresh
    // writer would.
    assert(new java.io.File(st,
      s".qifmt-${KAnonStream.QiFormatVersion}").delete())
    val q2 = writer.start()
    try {
      input.addData((3.0, "c"))
      val e = intercept[Throwable](q2.processAllAvailable())
      val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
      assert(msgs.contains("NO render-format marker"),
        s"restarted run must re-validate; got: $msgs")
    } finally q2.stop()
  }

  test("integer/string QI tuples are format-invariant: no marker stamped") {
    // v1 and v2 render non-float types identically, so stamping would
    // only manufacture false upgrade failures for unaffected states.
    val dir = s"${sys.props("java.io.tmpdir")}/kanon_iv_${System.nanoTime()}"
    val st = s"$dir/state"
    KAnonStream.applyBatch(all.take(50).toDF(), 0L, st, keys)
    assert(!new java.io.File(st).listFiles()
      .exists(_.getName.startsWith(".qifmt-")))
  }
}
