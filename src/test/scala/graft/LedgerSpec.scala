package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The partition ledger: new partitions surface once, processing marks
  * are durable, and re-runs are idempotent (empty work list).
  */
class LedgerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("only unprocessed partitions surface; marking is idempotent") {
    val base = s"${sys.props("java.io.tmpdir")}/ledger_${System.nanoTime()}"
    val data = s"$base/events"
    val ledger = s"$base/ledger.txt"
    def land(day: String): Unit =
      Seq((1L, day)).toDF("id", "day")
        .write.mode("overwrite").parquet(s"$data/day=$day")

    land("2026-01-01"); land("2026-01-02")
    assert(Tables.unprocessedPartitions(spark, data, ledger) ==
      Seq("day=2026-01-01", "day=2026-01-02"))

    Tables.markProcessed(spark, ledger,
      Seq("day=2026-01-01", "day=2026-01-02"))
    assert(Tables.unprocessedPartitions(spark, data, ledger).isEmpty)

    land("2026-01-03")
    assert(Tables.unprocessedPartitions(spark, data, ledger) ==
      Seq("day=2026-01-03"))
    // Replaying the mark (recovery) changes nothing.
    Tables.markProcessed(spark, ledger, Seq("day=2026-01-03"))
    Tables.markProcessed(spark, ledger, Seq("day=2026-01-03"))
    assert(Tables.unprocessedPartitions(spark, data, ledger).isEmpty)
  }

  test("missing data dir and missing ledger are both empty-safe") {
    val base = s"${sys.props("java.io.tmpdir")}/ledger0_${System.nanoTime()}"
    assert(Tables.unprocessedPartitions(spark, s"$base/none",
      s"$base/l.txt").isEmpty)
  }
}
