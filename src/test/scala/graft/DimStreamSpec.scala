package graft

import java.sql.Date
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scd2
import graft.streaming.DimStream

case class DimSnap(k: String, seg: String, as_of: String)

/** foreachBatch SCD2 maintenance: the streamed version table must equal
  * the batch-applied snapshot chain, survive multi-date batches, and be
  * idempotent under batch replay (the recovery contract).
  */
class DimStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val key = Seq("k")
  private val attrs = Seq("seg")

  private def readDim(path: String) =
    spark.read.parquet(path)
      .as[(String, String, Date, Option[Date])].collect()
      .map { case (k, s, f, t) => (k, s, f.toString, t.map(_.toString)) }
      .toSet

  test("streamed version table equals the batch-applied chain") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_dimstream").toString
    val dimPath = s"$base/dim"
    val input = MemoryStream[DimSnap](spark)
    val q = DimStream.scd2Writer(input.toDF(), dimPath, s"$base/ckp",
      key, attrs, "as_of").start()
    try {
      input.addData(Seq(DimSnap("k1", "a", "2020-01-01"),
        DimSnap("k2", "x", "2020-01-01")))
      q.processAllAvailable()
      // one micro-batch carrying TWO snapshot dates: applied in order
      input.addData(Seq(
        DimSnap("k1", "b", "2021-01-01"), DimSnap("k2", "x", "2021-01-01"),
        DimSnap("k1", "c", "2022-01-01"), DimSnap("k2", "x", "2022-01-01"),
        DimSnap("k3", "n", "2022-01-01")))
      q.processAllAvailable()

      val batchChain = Scd2.applySnapshot(
        Scd2.applySnapshot(
          Scd2.init(Seq(("k1", "a"), ("k2", "x")).toDF("k", "seg"),
            key, attrs, lit("2020-01-01")),
          Seq(("k1", "b"), ("k2", "x")).toDF("k", "seg"),
          key, attrs, lit("2021-01-01")),
        Seq(("k1", "c"), ("k2", "x"), ("k3", "n")).toDF("k", "seg"),
        key, attrs, lit("2022-01-01"))
        .as[(String, String, Date, Option[Date])].collect()
        .map { case (k, s, f, t) => (k, s, f.toString, t.map(_.toString)) }
        .toSet

      assert(readDim(dimPath) == batchChain)
      assert(batchChain.count(_._4.isEmpty) == 3) // one open row per key
    } finally q.stop()
  }

  test("batch replay is a no-op (recovery idempotence)") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_dimreplay").toString
    val dimPath = s"$base/dim"
    val b1 = Seq(DimSnap("k1", "a", "2020-01-01")).toDF()
    val b2 = Seq(DimSnap("k1", "b", "2021-01-01")).toDF()
    DimStream.applyBatch(b1, dimPath, key, attrs, "as_of")
    DimStream.applyBatch(b2, dimPath, key, attrs, "as_of")
    val once = readDim(dimPath)
    // a crash between dim write and checkpoint commit re-delivers b2
    DimStream.applyBatch(b2, dimPath, key, attrs, "as_of")
    assert(readDim(dimPath) == once,
      "replaying an applied batch must not change the version table")
  }
}
