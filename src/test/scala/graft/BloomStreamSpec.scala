package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.BloomStream

/** Streamed maintained-Bloom membership: zero false negatives, verdicts
  * batching-invariant (a bit is set iff its summed hit count is
  * positive, and sums are batching-invariant), state bounded by the
  * pinned bitmap width forever, replay idempotent via the per-batch
  * partial directories.
  */
class BloomStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(min: Int): Timestamp = new Timestamp(min * 60000L)

  private def mkDocs(ids: Range): Seq[Doc] =
    ids.map(i => Doc(i.toLong, s"document body $i", "en", "crawl", t(i % 50)))

  private def verdicts(st: String, probe: Seq[Doc]): Map[Long, Boolean] =
    BloomStream.probe(spark, st, probe.toDF(), "doc_id", "text")
      .as[(Long, Boolean)].collect().toMap

  test("no false negatives, and verdicts are batching-invariant") {
    val base = s"${sys.props("java.io.tmpdir")}/bloom_${System.nanoTime()}"
    val seen = mkDocs(0 until 300)
    val fresh = mkDocs(300 until 400)
    // Two-batch streamed state vs a one-shot state over the same docs.
    val input = MemoryStream[Doc](spark)
    val q = BloomStream.bitWriter(input.toDF(), s"$base/split/state",
      s"$base/split/chk", "text").start()
    try {
      input.addData(seen.take(140))
      q.processAllAvailable()
      input.addData(seen.drop(140))
      q.processAllAvailable()
    } finally q.stop()
    BloomStream.applyBatch(seen.toDF(), 0L, s"$base/one/state", "text")
    val probe = seen ++ fresh
    val split = verdicts(s"$base/split/state", probe)
    val one = verdicts(s"$base/one/state", probe)
    assert(split === one)
    // Every seen doc MUST probe positive — the Bloom contract.
    seen.foreach(d => assert(split(d.doc_id),
      s"false negative for seen doc ${d.doc_id}"))
    // At 600 hits on 4096 slots some fresh docs must read negative
    // (the filter is doing work), and any positives are future exact
    // checks, not correctness errors.
    assert(fresh.count(d => !split(d.doc_id)) > 0)
  }

  test("state row count is bounded by the bitmap width at any volume") {
    val st = s"${sys.props("java.io.tmpdir")}/bloom_cap_${System.nanoTime()}/state"
    // 64 slots, 3 batches x 400 docs = 2400 hashes >> 64: saturation.
    (0 until 3).foreach(i =>
      BloomStream.applyBatch(mkDocs(i * 400 until (i + 1) * 400).toDF(),
        i.toLong, st, "text", mBits = 64))
    val bits = BloomStream.currentBits(spark, st).as[Long].collect()
    assert(bits.length <= 64)
    assert(bits.forall(b => b >= 0 && b < 64))
    // Saturated filter: everything probes positive — the documented
    // graceful degradation to "always pay the exact check".
    val v = BloomStream.probe(spark, st, mkDocs(9000 until 9010).toDF(),
      "doc_id", "text", mBits = 64).as[(Long, Boolean)].collect()
    assert(v.length === 10 && v.forall(_._2))
  }

  test("replaying a batch id leaves the bit counts unchanged; new id adds") {
    val st = s"${sys.props("java.io.tmpdir")}/bloom_rp_${System.nanoTime()}/state"
    val batch = mkDocs(0 until 90).toDF()
    // Raw summed hit counts over the partial directories (no compaction
    // in this test, so every directory is live): replay must leave the
    // SUMS unchanged, not merely the set-bit membership.
    def counts: Map[Long, Long] =
      spark.read.parquet(new java.io.File(st).listFiles()
          .filter(_.isDirectory).map(_.getPath).toIndexedSeq: _*)
        .groupBy("bit").agg(org.apache.spark.sql.functions.sum("n").as("n"))
        .as[(Long, Long)].collect().toMap
    BloomStream.applyBatch(batch, 5L, st, "text")
    val first = counts
    BloomStream.applyBatch(batch, 5L, st, "text")
    assert(counts === first)
    assert(first.values.sum === 180L) // 90 docs x 2 positions, once
    // A disjoint new batch ADDS hits and can never clear a set bit.
    BloomStream.applyBatch(mkDocs(90 until 180).toDF(), 6L, st, "text")
    val grown = counts
    assert(grown.values.sum === 360L)
    assert(first.keySet.subsetOf(grown.keySet))
  }

  test("duplicate probe rows, null text, and width mismatch are all handled") {
    val st = s"${sys.props("java.io.tmpdir")}/bloom_ct_${System.nanoTime()}/state"
    BloomStream.applyBatch(mkDocs(0 until 50).toDF(), 0L, st, "text")
    // Duplicate probe rows for one id (2x2 exploded positions) must not
    // defeat the all-positions-matched test: doc 7 was seen → positive.
    val dup = (mkDocs(7 to 7) ++ mkDocs(7 to 7)).toDF()
    assert(verdicts(st, mkDocs(7 to 7)) === Map(7L -> true))
    assert(BloomStream.probe(spark, st, dup, "doc_id", "text")
      .as[(Long, Boolean)].collect().toSeq === Seq((7L, true)))
    // Null content is outside the monitor's domain: excluded from the
    // verdict set rather than riding as a never-matchable null bit.
    val withNull = mkDocs(8 to 8) :+ Doc(99L, null, "en", "crawl", t(0))
    val v = BloomStream.probe(spark, st, withNull.toDF(), "doc_id", "text")
      .as[(Long, Boolean)].collect().toMap
    assert(v === Map(8L -> true))
    // Width mismatch is LOUD on both faces — positions recorded mod
    // 4096 must never be probed (or extended) mod 64 silently.
    val e = intercept[IllegalArgumentException] {
      BloomStream.probe(spark, st, mkDocs(0 until 5).toDF(),
        "doc_id", "text", mBits = 64)
    }
    assert(e.getMessage.contains("width mismatch"))
    intercept[IllegalArgumentException] {
      BloomStream.applyBatch(mkDocs(0 until 5).toDF(), 1L, st,
        "text", mBits = 64)
    }
  }

  test("compaction: verdicts unchanged, folded replay ignored, dirs bounded") {
    val st = s"${sys.props("java.io.tmpdir")}/bloom_cp_${System.nanoTime()}/state"
    def dirs: Seq[String] = new java.io.File(st).listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq.sorted
    val probe = mkDocs(0 until 400)
    BloomStream.applyBatch(mkDocs(0 until 130).toDF(), 0L, st, "text")
    BloomStream.applyBatch(mkDocs(130 until 300).toDF(), 1L, st, "text")
    val before = verdicts(st, probe)
    assert(BloomStream.compact(spark, st) === 1L)
    assert(verdicts(st, probe) === before)
    assert(dirs === Seq("batch=compacted-1"))
    // A recovering stream replays a folded batch: ignored structurally.
    BloomStream.applyBatch(mkDocs(0 until 130).toDF(), 1L, st, "text")
    assert(verdicts(st, probe) === before)
    // New data still lands and flips its probes positive.
    BloomStream.applyBatch(mkDocs(300 until 400).toDF(), 2L, st, "text")
    val after = verdicts(st, probe)
    (300 until 400).foreach(i => assert(after(i.toLong)))
    assert(BloomStream.compact(spark, st) === 2L)
    assert(dirs === Seq("batch=compacted-2"))
    assert(verdicts(st, probe) === after)
  }
}
