package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.CdcStream

case class Chg(op: String, k: Long, name: String, bal: Long, seq: Long)

/** CDC type-1 mirror via foreachBatch MERGE: in-batch log compaction,
  * cross-batch upsert/delete, delete-of-absent-key skipped, and replay
  * idempotence (the exactly-once contract).
  */
class CdcStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val attrs = Seq("name", "bal")

  private def mirror(path: String): Map[Long, (String, Long)] =
    spark.read.parquet(path).as[(Long, String, Long)]
      .collect().map { case (k, n, b) => k -> (n, b) }.toMap

  test("stream of changes maintains the latest-state mirror") {
    val dir = s"${sys.props("java.io.tmpdir")}/cdc_spec_${System.nanoTime()}"
    val input = MemoryStream[Chg](spark)
    val q = CdcStream.mergeWriter(input.toDF(), s"$dir/mirror",
      s"$dir/chk", "k", attrs, "seq").start()
    try {
      // Batch 1: two inserts; key 1 updated twice IN batch (compaction
      // must keep seq 3); delete of never-seen key 9 must be skipped.
      input.addData(Seq(
        Chg("U", 1L, "a", 10L, 1), Chg("U", 2L, "b", 20L, 2),
        Chg("U", 1L, "a2", 11L, 3), Chg("D", 9L, "", 0L, 4)))
      q.processAllAvailable()
      assert(mirror(s"$dir/mirror") ==
        Map(1L -> ("a2", 11L), 2L -> ("b", 20L)))

      // Batch 2: update key 2, delete key 1, insert key 3.
      input.addData(Seq(
        Chg("U", 2L, "b2", 21L, 5), Chg("D", 1L, "", 0L, 6),
        Chg("U", 3L, "c", 30L, 7)))
      q.processAllAvailable()
      assert(mirror(s"$dir/mirror") ==
        Map(2L -> ("b2", 21L), 3L -> ("c", 30L)))
    } finally q.stop()
  }

  test("replaying an applied batch is a no-op (recovery idempotence)") {
    val dir = s"${sys.props("java.io.tmpdir")}/cdc_replay_${System.nanoTime()}"
    val batch = Seq(
      Chg("U", 1L, "a", 10L, 1), Chg("D", 2L, "", 0L, 2),
      Chg("U", 3L, "c", 30L, 3)).toDF()
    CdcStream.applyBatch(batch, s"$dir/m", "k", attrs, "seq")
    val first = mirror(s"$dir/m")
    CdcStream.applyBatch(batch, s"$dir/m", "k", attrs, "seq")
    assert(mirror(s"$dir/m") == first)
    assert(first == Map(1L -> ("a", 10L), 3L -> ("c", 30L)))
  }

  test("delete arriving after its own insert within one batch wins") {
    val dir = s"${sys.props("java.io.tmpdir")}/cdc_dw_${System.nanoTime()}"
    val batch = Seq(
      Chg("U", 1L, "a", 10L, 1), Chg("D", 1L, "", 0L, 2)).toDF()
    CdcStream.applyBatch(batch, s"$dir/m", "k", attrs, "seq")
    assert(mirror(s"$dir/m").isEmpty)
  }

  test("crash between swap renames never loses the mirror") {
    // Simulate every crash window of the rename-aside swap and replay:
    // prior state must survive — a replayed batch must NEVER rebuild
    // from the empty prototype (the r4 ADVICE defect in the old
    // delete-then-rename swap).
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val b1 = Seq(Chg("U", 1L, "a", 10L, 1), Chg("U", 2L, "b", 20L, 2))
    val b2 = Seq(Chg("U", 2L, "b2", 21L, 3), Chg("U", 3L, "c", 30L, 4))
    val after2 =
      Map(1L -> ("a", 10L), 2L -> ("b2", 21L), 3L -> ("c", 30L))

    // Crash A: new mirror fully written to .tmp, old mirror renamed
    // aside, promotion rename never happened → path absent, tmp+old
    // present. Replay must finish the swap, then apply idempotently.
    val dA = s"${sys.props("java.io.tmpdir")}/cdc_cr_a_${System.nanoTime()}"
    CdcStream.applyBatch(b1.toDF(), s"$dA/m", "k", attrs, "seq")
    CdcStream.applyBatch(b2.toDF(), s"$dA/m", "k", attrs, "seq")
    fs.rename(p(s"$dA/m"), p(s"$dA/m.tmp"))     // un-promote
    CdcStream.applyBatch(b2.toDF(), s"$dA/m", "k", attrs, "seq")
    assert(mirror(s"$dA/m") == after2)

    // Crash B: promotion done but the aside copy never deleted →
    // path + stale .old present. Replay must drop the leftover and
    // stay idempotent.
    val dB = s"${sys.props("java.io.tmpdir")}/cdc_cr_b_${System.nanoTime()}"
    CdcStream.applyBatch(b1.toDF(), s"$dB/m", "k", attrs, "seq")
    fs.mkdirs(p(s"$dB/m.old"))
    CdcStream.applyBatch(b2.toDF(), s"$dB/m", "k", attrs, "seq")
    assert(mirror(s"$dB/m") == after2)
    assert(!fs.exists(p(s"$dB/m.old")) && !fs.exists(p(s"$dB/m.tmp")))

    // Crash C: crash after rename-aside with tmp ALSO gone would mean
    // only .old holds state — recovery must restore it before reading.
    val dC = s"${sys.props("java.io.tmpdir")}/cdc_cr_c_${System.nanoTime()}"
    CdcStream.applyBatch(b1.toDF(), s"$dC/m", "k", attrs, "seq")
    fs.rename(p(s"$dC/m"), p(s"$dC/m.old"))
    CdcStream.applyBatch(b2.toDF(), s"$dC/m", "k", attrs, "seq")
    assert(mirror(s"$dC/m") == after2)
  }
}
