package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.DupRateStream
import graft.operators.Dedup

/** Streamed corpus dup-rate monitoring: the streamed freshness report
  * must equal the batch `t_dup_rate` kernel on any batching (hash
  * counts are additive), and replay must be idempotent via the
  * per-batch partial directories.
  */
class DupRateStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(min: Int): Timestamp = new Timestamp(min * 60000L)

  // A corpus with planted exact duplicates ACROSS the batch boundaries
  // (every 5th doc repeats one of 4 templates), so the streamed counts
  // must merge multiplicities between micro-batches, not within one.
  private def mkDocs(n: Int): Seq[Doc] =
    (0 until n).map { i =>
      val text = if (i % 5 == 0) s"template body number ${i % 20}"
        else s"unique body $i with its own words"
      Doc(i.toLong, text, "en", "crawl", t(i % 50))
    }
  private val all = mkDocs(400)

  private type Rep = (Long, Long, Long, Double)

  test("streamed report equals the batch kernel on any batching") {
    val dir = s"${sys.props("java.io.tmpdir")}/duprate_${System.nanoTime()}"
    val input = MemoryStream[Doc](spark)
    val q = DupRateStream.hashWriter(input.toDF(), s"$dir/state",
      s"$dir/chk", "text").start()
    try {
      input.addData(all.take(130))
      q.processAllAvailable()
      input.addData(all.slice(130, 290))
      q.processAllAvailable()
      input.addData(all.drop(290))
      q.processAllAvailable()
      val streamed = DupRateStream.report(spark, s"$dir/state")
        .as[Rep].collect().toSeq
      val oneShot = Dedup.dupRateFromCounts(
          Dedup.contentHashCounts(all.toDF(), "text"))
        .as[Rep].collect().toSeq
      assert(streamed === oneShot)
      // 400 docs: 80 template occurrences over 4 templates (i ≡ 0 mod 5
      // ⇒ i mod 20 ∈ {0,5,10,15}) + 320 uniques → 324 distinct, 76 dups.
      assert(streamed.head === ((400L, 324L, 76L, 0.19d)))
    } finally q.stop()
  }

  test("report before any batch is the explicit empty-corpus row") {
    val st = s"${sys.props("java.io.tmpdir")}/duprate_e_${System.nanoTime()}/state"
    val r = DupRateStream.report(spark, st).collect()(0)
    assert(r.getLong(0) === 0L) // n_docs
    assert(r.getLong(1) === 0L) // n_distinct
    assert(r.getLong(2) === 0L) // dup_docs
    assert(r.isNullAt(3))       // dup_rate: 0/0 has no answer
  }

  test("replaying a batch id leaves the counts unchanged; new id adds") {
    val dir = s"${sys.props("java.io.tmpdir")}/duprate_rp_${System.nanoTime()}"
    val batch = all.take(90).toDF()
    DupRateStream.applyBatch(batch, 5L, s"$dir/state", "text")
    val first = DupRateStream.currentCounts(spark, s"$dir/state")
      .as[(String, Long)].collect().toMap
    DupRateStream.applyBatch(batch, 5L, s"$dir/state", "text")
    val second = DupRateStream.currentCounts(spark, s"$dir/state")
      .as[(String, Long)].collect().toMap
    assert(first === second)
    DupRateStream.applyBatch(batch, 6L, s"$dir/state", "text")
    val third = DupRateStream.currentCounts(spark, s"$dir/state")
      .as[(String, Long)].collect().toMap
    assert(third.values.sum === 2 * first.values.sum)
  }

  test("compaction: report unchanged, folded replay ignored, dirs bounded") {
    val dir = s"${sys.props("java.io.tmpdir")}/duprate_cp_${System.nanoTime()}"
    val st = s"$dir/state"
    def dirs: Seq[String] = new java.io.File(st).listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq.sorted
    def rep: Seq[Rep] =
      DupRateStream.report(spark, st).as[Rep].collect().toSeq
    DupRateStream.applyBatch(all.take(130).toDF(), 0L, st, "text")
    DupRateStream.applyBatch(all.slice(130, 290).toDF(), 1L, st, "text")
    DupRateStream.applyBatch(all.drop(290).toDF(), 2L, st, "text")
    val before = rep
    assert(DupRateStream.compact(spark, st) === 2L)
    // Read-equivalent, and the per-micro-batch directory growth is gone.
    assert(rep === before)
    assert(dirs === Seq("batch=compacted-2"))
    // A recovering stream REPLAYS a folded batch: the reader must ignore
    // it structurally (id ≤ hwm) — no double count.
    DupRateStream.applyBatch(all.take(130).toDF(), 1L, st, "text")
    assert(rep === before)
    // A genuinely new batch still accumulates, and the next compact
    // folds it AND sweeps the stray replay directory.
    DupRateStream.applyBatch(all.take(130).toDF(), 3L, st, "text")
    val grown = DupRateStream.currentCounts(spark, st)
      .agg(org.apache.spark.sql.functions.sum("n")).as[Long].head()
    assert(grown === 530L)
    assert(DupRateStream.compact(spark, st) === 3L)
    assert(dirs === Seq("batch=compacted-3"))
  }
}
