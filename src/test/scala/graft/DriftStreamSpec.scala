package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.DriftStream
import graft.operators.{Drift, Histogram}

/** Streamed histogram maintenance + TVD drift verdicts: batching
  * invariance, replay idempotence via per-batch partial directories
  * (counts are NOT idempotent algebra — the design point), and the
  * drift verdict matching the batch gate on identical data.
  */
class DriftStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(min: Int): Timestamp = new Timestamp(min * 60000L)

  private def evs(vals: Seq[Long]): Seq[Ev] =
    vals.zipWithIndex.map { case (v, i) =>
      Ev(i.toLong, t(i % 50), v, "view", v.toDouble, "{}")
    }

  test("streamed histogram equals the one-shot batch histogram") {
    val dir = s"${sys.props("java.io.tmpdir")}/drift_spec_${System.nanoTime()}"
    val vals = (1L to 500L).map(v => (v * 37) % 1000)
    val input = MemoryStream[Ev](spark)
    val q = DriftStream.histogramWriter(input.toDF(), s"$dir/state",
      s"$dir/chk", "user_id", lo = 0L, hi = 999L, nb = 8).start()
    try {
      input.addData(evs(vals.take(200)))
      q.processAllAvailable()
      input.addData(evs(vals.drop(200)))
      q.processAllAvailable()
      val streamed = DriftStream.currentHistogram(spark, s"$dir/state")
        .as[(Long, Long)].collect().toMap
      val oneShot = vals.toDF("v")
        .groupBy(Histogram.bucketOf($"v", lit(0L), lit(999L), 8).as("cat"))
        .agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
      assert(streamed === oneShot)
      assert(streamed.values.sum === 500L)
    } finally q.stop()
  }

  test("replaying a batch id leaves the totals unchanged") {
    val dir = s"${sys.props("java.io.tmpdir")}/drift_rp_${System.nanoTime()}"
    val batch = evs((1L to 100L).map(_ % 40)).toDF()
    DriftStream.applyBatch(batch, 7L, s"$dir/state", "user_id", 0L, 99L, 4)
    val first = DriftStream.currentHistogram(spark, s"$dir/state")
      .as[(Long, Long)].collect().toMap
    DriftStream.applyBatch(batch, 7L, s"$dir/state", "user_id", 0L, 99L, 4)
    val second = DriftStream.currentHistogram(spark, s"$dir/state")
      .as[(Long, Long)].collect().toMap
    assert(first === second)
    // A NEW batch id does accumulate.
    DriftStream.applyBatch(batch, 8L, s"$dir/state", "user_id", 0L, 99L, 4)
    val third = DriftStream.currentHistogram(spark, s"$dir/state")
      .as[(Long, Long)].collect().toMap
    assert(third.values.sum === 2 * first.values.sum)
  }

  test("categorical χ² attribution from streamed counts matches the batch kernel") {
    val dir = s"${sys.props("java.io.tmpdir")}/drift_x2_${System.nanoTime()}"
    // Categorical stream (event_type carries the category) maintained in
    // two batches vs a skewed reference distribution.
    def cat(i: Long): String = Seq("en", "de", "fr", "es")((i % 4).toInt)
    def catEvs(is: Seq[Long]): Seq[Ev] = is.map(i =>
      Ev(i, t((i % 50).toInt), i, cat(i), 0.0, "{}"))
    val now = (1L to 240L)
    DriftStream.applyCategoryBatch(catEvs(now.take(100)).toDF(), 0L,
      s"$dir/state", "event_type")
    DriftStream.applyCategoryBatch(catEvs(now.drop(100)).toDF(), 1L,
      s"$dir/state", "event_type")
    val ref = (1L to 300L).map(i => cat(i * i)).toDF("c")
      .groupBy($"c".as("cat")).agg(count(lit(1)).as("n"))
    val streamed = DriftStream
      .chisqAgainstReference(spark, s"$dir/state", ref)
      .as[(String, Long, Long, Double)].collect().toSeq
    val oneShot = Drift.chisqFromCounts(
        now.map(cat).toDF("c").groupBy($"c".as("cat"))
          .agg(count(lit(1)).as("n")), ref)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(streamed === oneShot)
    // n_a totals are the stream's row count; contribs are finite, ≥ 0.
    assert(streamed.map(_._2).sum === 240L)
    streamed.foreach { case (_, _, _, c) =>
      assert(c >= 0.0 && !c.isNaN && !c.isInfinite)
    }
    // Replaying a category batch id leaves the counts unchanged.
    val before = DriftStream.currentCategories(spark, s"$dir/state")
      .as[(String, Long)].collect().toMap
    DriftStream.applyCategoryBatch(catEvs(now.drop(100)).toDF(), 1L,
      s"$dir/state", "event_type")
    val after = DriftStream.currentCategories(spark, s"$dir/state")
      .as[(String, Long)].collect().toMap
    assert(before === after)
  }

  test("drift verdict against a reference matches the batch TVD gate") {
    val dir = s"${sys.props("java.io.tmpdir")}/drift_tvd_${System.nanoTime()}"
    val now = (1L to 300L).map(v => v % 200)       // shifted low
    val ref = (1L to 300L).map(v => 799 - (v % 200)) // shifted high
    DriftStream.applyBatch(evs(now).toDF(), 0L, s"$dir/state",
      "user_id", 0L, 799L, 8)
    val refCounts = ref.toDF("v")
      .groupBy(Histogram.bucketOf($"v", lit(0L), lit(799L), 8).as("cat"))
      .agg(count(lit(1)).as("n"))
    val streamedVerdict = DriftStream
      .tvdAgainstReference(spark, s"$dir/state", refCounts)
      .select($"tvd").as[Double].head()
    val batchVerdict = Drift.numericTvd(now.toDF("v"), ref.toDF("v"),
        "v", 0L, 799L, 8)
      .select($"tvd").as[Double].head()
    assert(streamedVerdict === batchVerdict)
    assert(streamedVerdict === 1.0) // fully disjoint bucket mass
  }

  test("categorical TVD face: matches batch kernel, string-safe on empty state") {
    val dir = s"${sys.props("java.io.tmpdir")}/drift_ctvd_${System.nanoTime()}"
    def cat(i: Long): String = Seq("en", "de", "fr", "es")((i % 4).toInt)
    def catEvs(is: Seq[Long]): Seq[Ev] = is.map(i =>
      Ev(i, t((i % 50).toInt), i, cat(i), 0.0, "{}"))
    val now = (1L to 240L)
    DriftStream.applyCategoryBatch(catEvs(now.take(100)).toDF(), 0L,
      s"$dir/state", "event_type")
    DriftStream.applyCategoryBatch(catEvs(now.drop(100)).toDF(), 1L,
      s"$dir/state", "event_type")
    val ref = (1L to 300L).map(i => cat(i * i)).toDF("c")
      .groupBy($"c".as("cat")).agg(count(lit(1)).as("n"))
    val streamed = DriftStream
      .tvdCategoriesAgainstReference(spark, s"$dir/state", ref)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    val oneShot = Drift.totalVariationFromCounts(
        now.map(cat).toDF("c").groupBy($"c".as("cat"))
          .agg(count(lit(1)).as("n")), ref)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(streamed === oneShot)
    assert(streamed.head._1 === 240L)
    // NEVER-STARTED categorical stream: the face's empty-state fallback
    // must type cat as STRING so the full-outer join against a string
    // reference is not type-coerced — the reference's categories survive
    // intact (n_b, n_categories readable as "no data vs a 300-row
    // reference"); the TVD itself is honestly degenerate there (every
    // cross-multiplied term carries the zero total → NULL via
    // try_divide; a plain ANSI `/` would throw DIVIDE_BY_ZERO and kill
    // the read — the regression this test pins).
    val empty = DriftStream.tvdCategoriesAgainstReference(spark,
        s"$dir/never_started", ref)
      .as[(Long, Long, Long, Long, Option[Double])].head()
    assert(empty._1 === 0L)      // n_a: no stream data
    assert(empty._2 === 300L)    // n_b: the reference intact, not coerced
    assert(empty._3 === 2L)      // both reference cats present (squares
                                 // mod 4 ∈ {0,1} → "en"/"de" only)
    assert(empty._5.isEmpty)     // degenerate verdict: NULL, not a crash
  }

  test("compaction: χ² report unchanged, folded replay ignored, dirs bounded") {
    val dir = s"${sys.props("java.io.tmpdir")}/drift_cp_${System.nanoTime()}"
    val st = s"$dir/state"
    def dirs: Seq[String] = new java.io.File(st).listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq.sorted
    def cat(i: Long): String = Seq("en", "de", "fr", "es")((i % 4).toInt)
    def catEvs(is: Seq[Long]): Seq[Ev] = is.map(i =>
      Ev(i, t((i % 50).toInt), i, cat(i), 0.0, "{}"))
    val now = (1L to 240L)
    val ref = (1L to 300L).map(i => cat(i * i)).toDF("c")
      .groupBy($"c".as("cat")).agg(count(lit(1)).as("n"))
    def rep: Set[(String, Long, Long, Double)] = DriftStream
      .chisqAgainstReference(spark, st, ref)
      .as[(String, Long, Long, Double)].collect().toSet
    DriftStream.applyCategoryBatch(catEvs(now.take(100)).toDF(), 0L,
      st, "event_type")
    DriftStream.applyCategoryBatch(catEvs(now.drop(100)).toDF(), 1L,
      st, "event_type")
    val before = rep
    assert(DriftStream.compact(spark, st) === 1L)
    // The χ² attribution over compacted state is the same report —
    // and the per-micro-batch directory growth is gone.
    assert(rep === before)
    assert(dirs === Seq("batch=compacted-1"))
    // A recovering stream REPLAYS a folded batch: ignored structurally.
    DriftStream.applyCategoryBatch(catEvs(now.take(100)).toDF(), 0L,
      st, "event_type")
    assert(rep === before)
    // New batches accumulate; the next compact folds them and sweeps
    // the stray replay directory.
    DriftStream.applyCategoryBatch(catEvs(now.take(100)).toDF(), 2L,
      st, "event_type")
    val grown = DriftStream.currentCategories(spark, st)
      .as[(String, Long)].collect().toMap
    assert(grown.values.sum === 340L)
    assert(DriftStream.compact(spark, st) === 2L)
    assert(dirs === Seq("batch=compacted-2"))
    assert(DriftStream.currentCategories(spark, st)
      .as[(String, Long)].collect().toMap === grown)
  }
}
