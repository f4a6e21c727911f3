package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin

/** RangeJoin semantics on enumerable frames: inclusive start, exclusive
  * end, overlapping intervals multiply-match, bucket boundaries don't
  * drop or duplicate pairs.
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("rangeJoin matches [start, end) per key across bucket boundaries") {
    val left = Seq(
      (1L, "k1", t("2024-01-01 00:00:00")), // == start → included
      (2L, "k1", t("2024-01-02 23:59:59")), // inside, later bucket
      (3L, "k1", t("2024-01-03 00:00:00")), // == end → excluded
      (4L, "k2", t("2024-01-01 12:00:00")), // right key mismatch
      (5L, "k1", t("2024-01-01 18:00:00"))  // inside BOTH overlapping ivals
    ).toDF("lid", "k", "ts")
    val right = Seq(
      ("k1", 10L, t("2024-01-01 00:00:00"), t("2024-01-03 00:00:00")),
      ("k1", 11L, t("2024-01-01 12:00:00"), t("2024-01-01 20:00:00")),
      ("k3", 12L, t("2024-01-01 00:00:00"), t("2024-01-09 00:00:00"))
    ).toDF("k", "rid", "s", "e")
    val got = RangeJoin.rangeJoin(left, right, Seq("k"), "ts", "s", "e",
        bucketMicros = 86400L * 1000000L)
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L), (2L, 10L), (5L, 10L), (5L, 11L)))
  }

  test("rangeJoin emits each matching pair exactly once (no bucket dups)") {
    // A 5-bucket-wide interval must still match a left row once.
    val left = Seq((1L, "k", t("2024-01-03 12:00:00"))).toDF("lid", "k", "ts")
    val right = Seq(("k", 9L, t("2024-01-01 00:00:00"),
      t("2024-01-06 00:00:00"))).toDF("k", "rid", "s", "e")
    val out = RangeJoin.rangeJoin(left, right, Seq("k"), "ts", "s", "e",
      bucketMicros = 86400L * 1000000L)
    assert(out.count() === 1)
  }
}
