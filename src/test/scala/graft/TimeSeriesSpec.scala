package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TimeSeries

/** Gap fill: planted mid-span hole, span boundaries, per-key grids. */
class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("planted hole zero-fills; span covers min..max hour for every key") {
    val df = Seq(
      ("a", ts("2026-01-01 10:05:00")),
      ("a", ts("2026-01-01 10:55:00")),
      ("a", ts("2026-01-01 13:00:00")), // hole at 11:00 and 12:00
      ("b", ts("2026-01-01 11:30:00"))  // b absent at 10, 12, 13
    ).toDF("k", "t")
    val out = TimeSeries.gapFillHourly(df, "k", "t")
      .as[(String, Timestamp, Long)].collect()
      .map { case (k, b, n) => (k, b.toString.substring(11, 13), n) }
      .sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      ("a", "10", 2L), ("a", "11", 0L), ("a", "12", 0L), ("a", "13", 1L),
      ("b", "10", 0L), ("b", "11", 1L), ("b", "12", 0L), ("b", "13", 0L)))
  }
}
