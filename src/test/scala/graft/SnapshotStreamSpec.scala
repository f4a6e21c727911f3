package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Snapshots
import graft.streaming.SnapshotStream

/** Streaming snapshot publication: each micro-batch becomes one
  * time-travelable version, replayed batches are no-ops (the manifest
  * doubles as the commit log), and versions read consistently while the
  * stream keeps appending.
  */
class SnapshotStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").as[Long].collect().toSet

  test("each micro-batch publishes one version; history stays readable") {
    val dir = s"${sys.props("java.io.tmpdir")}/snapstream_${System.nanoTime()}"
    val input = MemoryStream[Long](spark)
    val q = SnapshotStream.snapshotWriter(input.toDF().toDF("id"),
      s"$dir/tbl", s"$dir/chk").start()
    try {
      input.addData(1L, 2L)
      q.processAllAvailable()
      input.addData(3L)
      q.processAllAvailable()
      assert(Snapshots.latestVersion(spark, s"$dir/tbl") == 2)
      assert(ids(Snapshots.readAsOf(spark, s"$dir/tbl", 1)) == Set(1L, 2L))
      assert(ids(Snapshots.readAsOf(spark, s"$dir/tbl", 2)) ==
        Set(1L, 2L, 3L))
      assert(ids(Snapshots.readLatest(spark, s"$dir/tbl")) ==
        Set(1L, 2L, 3L))
    } finally q.stop()
  }

  test("replaying an applied batchId is a no-op (recovery idempotence)") {
    val dir = s"${sys.props("java.io.tmpdir")}/snapreplay_${System.nanoTime()}"
    val b1 = Seq(1L, 2L).toDF("id")
    assert(SnapshotStream.applyBatch(b1, s"$dir/tbl", batchId = 0) == 1)
    assert(SnapshotStream.applyBatch(b1, s"$dir/tbl", batchId = 0) == 0)
    assert(Snapshots.latestVersion(spark, s"$dir/tbl") == 1)
    assert(ids(Snapshots.readLatest(spark, s"$dir/tbl")) == Set(1L, 2L))
    // A NEW batch still publishes after the replayed one.
    assert(SnapshotStream.applyBatch(Seq(3L).toDF("id"),
      s"$dir/tbl", batchId = 1) == 2)
    assert(ids(Snapshots.readLatest(spark, s"$dir/tbl")) ==
      Set(1L, 2L, 3L))
  }

  test("crash between data write and manifest publish recovers to one copy") {
    val dir = s"${sys.props("java.io.tmpdir")}/snapcrash_${System.nanoTime()}"
    // Simulate the torn state: the batch's data directory exists but no
    // manifest references it (crash after the parquet write).
    Seq(1L, 2L).toDF("id").write.parquet(s"$dir/tbl/data/bid-0")
    assert(Snapshots.latestVersion(spark, s"$dir/tbl") == 0)
    // The replay overwrites the orphan directory and publishes ONCE.
    assert(SnapshotStream.applyBatch(Seq(1L, 2L).toDF("id"),
      s"$dir/tbl", batchId = 0) == 1)
    assert(ids(Snapshots.readAsOf(spark, s"$dir/tbl", 1)) == Set(1L, 2L))
    assert(Snapshots.readAsOf(spark, s"$dir/tbl", 1).count() == 2)
  }

  test("empty batches publish nothing") {
    val dir = s"${sys.props("java.io.tmpdir")}/snapempty_${System.nanoTime()}"
    assert(SnapshotStream.applyBatch(Seq.empty[Long].toDF("id"),
      s"$dir/tbl", batchId = 0) == 0)
    assert(Snapshots.latestVersion(spark, s"$dir/tbl") == 0)
  }
}
