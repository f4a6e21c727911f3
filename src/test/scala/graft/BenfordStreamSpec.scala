package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.BenfordStream
import graft.operators.Benford

/** Streamed Benford first-digit maintenance: the streamed report must
  * equal the batch `dq_benford` kernel digit-for-digit on any batching
  * (digit counts are additive), and replay must be idempotent via the
  * per-batch partial directories.
  */
class BenfordStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(min: Int): Timestamp = new Timestamp(min * 60000L)

  // Amounts spread over several orders of magnitude so every first
  // digit occurs (value carries the audited amount).
  private def evs(amounts: Seq[Double]): Seq[Ev] =
    amounts.zipWithIndex.map { case (a, i) =>
      Ev(i.toLong, t(i % 50), i.toLong % 7, "order", a, "{}")
    }
  private val amounts: Seq[Double] =
    (1 to 400).map(i => ((i * 37) % 900 + 100) * math.pow(10, i % 3) / 7.0)

  test("streamed report equals the batch Benford kernel on any batching") {
    val dir = s"${sys.props("java.io.tmpdir")}/benford_${System.nanoTime()}"
    val input = MemoryStream[Ev](spark)
    val q = BenfordStream.digitWriter(input.toDF(), s"$dir/state",
      s"$dir/chk", "value").start()
    try {
      input.addData(evs(amounts.take(130)))
      q.processAllAvailable()
      input.addData(evs(amounts.slice(130, 290)))
      q.processAllAvailable()
      input.addData(evs(amounts.drop(290)))
      q.processAllAvailable()
      val streamed = BenfordStream.report(spark, s"$dir/state")
        .as[(String, Long, Double, Double, Double)].collect().toSeq
      val oneShot = Benford.reportFromCounts(
          Benford.firstDigitCounts(amounts.toDF("value"), "value"))
        .as[(String, Long, Double, Double, Double)].collect().toSeq
      assert(streamed === oneShot)
      assert(streamed.map(_._2).sum === 400L)
      // Every digit's expected share is the pinned literal.
      val exp = Benford.expected.toMap
      streamed.foreach { case (d, _, _, e, _) =>
        assert(e === exp(d).toDouble)
      }
    } finally q.stop()
  }

  test("out-of-domain values are excluded from numerator AND denominator") {
    // Negative amounts, values < 1 (leading digit 0), decimal(12,2)
    // overflows (≥ 10^10), and nulls are all outside the Benford
    // domain. Counting them in the total while the expectation join
    // drops their digit group would deflate every share — the silent
    // false-alarm mode the domain filter closes.
    val inDomain = Seq(123.45, 234.5, 345.0, 456.7, 567.8, 678.9, 789.0,
      891.2, 912.3)
    val outOfDomain = Seq(-512.0, 0.37, 0.0, 2.0e10)
    val rep = Benford.reportFromCounts(
        Benford.firstDigitCounts(
          (inDomain ++ outOfDomain).toDF("value"), "value"))
      .as[(String, Long, Double, Double, Double)].collect()
    assert(rep.map(_._2).sum === inDomain.size.toLong)
    // With exactly one value per digit 1-9, every share is 1/9 —
    // i.e. the out-of-domain rows did not inflate the denominator.
    rep.foreach { case (_, n, share, _, _) =>
      assert(n === 1L)
      assert(math.abs(share - 1.0 / 9) < 1e-12)
    }
  }

  test("replaying a batch id leaves the counts unchanged; new id adds") {
    val dir = s"${sys.props("java.io.tmpdir")}/benford_rp_${System.nanoTime()}"
    val batch = evs(amounts.take(90)).toDF()
    BenfordStream.applyBatch(batch, 5L, s"$dir/state", "value")
    val first = BenfordStream.currentCounts(spark, s"$dir/state")
      .as[(String, Long)].collect().toMap
    BenfordStream.applyBatch(batch, 5L, s"$dir/state", "value")
    val second = BenfordStream.currentCounts(spark, s"$dir/state")
      .as[(String, Long)].collect().toMap
    assert(first === second)
    BenfordStream.applyBatch(batch, 6L, s"$dir/state", "value")
    val third = BenfordStream.currentCounts(spark, s"$dir/state")
      .as[(String, Long)].collect().toMap
    assert(third.values.sum === 2 * first.values.sum)
  }

  test("compaction: report unchanged, folded replay ignored, dirs bounded") {
    val dir = s"${sys.props("java.io.tmpdir")}/benford_cp_${System.nanoTime()}"
    val st = s"$dir/state"
    def dirs: Seq[String] = new java.io.File(st).listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq.sorted
    def rep: Set[(String, Long, Double, Double, Double)] =
      BenfordStream.report(spark, st)
        .as[(String, Long, Double, Double, Double)].collect().toSet
    BenfordStream.applyBatch(evs(amounts.take(130)).toDF(), 0L, st, "value")
    BenfordStream.applyBatch(evs(amounts.slice(130, 290)).toDF(), 1L, st, "value")
    BenfordStream.applyBatch(evs(amounts.drop(290)).toDF(), 2L, st, "value")
    val before = rep
    assert(BenfordStream.compact(spark, st) === 2L)
    // Read-equivalent, and the per-micro-batch directory growth is gone.
    assert(rep === before)
    assert(dirs === Seq("batch=compacted-2"))
    // A recovering stream REPLAYS a folded batch: the reader must ignore
    // it structurally (id ≤ hwm) — no double count.
    BenfordStream.applyBatch(evs(amounts.take(130)).toDF(), 1L, st, "value")
    assert(rep === before)
    // A genuinely new batch still accumulates, and the next compact
    // folds it AND sweeps the stray replay directory.
    BenfordStream.applyBatch(evs(amounts.take(130)).toDF(), 3L, st, "value")
    val grown = BenfordStream.currentCounts(spark, st)
      .as[(String, Long)].collect().toMap
    assert(grown.values.sum === 530L)
    assert(BenfordStream.compact(spark, st) === 3L)
    assert(dirs === Seq("batch=compacted-3"))
    assert(BenfordStream.currentCounts(spark, st)
      .as[(String, Long)].collect().toMap === grown)
  }
}
