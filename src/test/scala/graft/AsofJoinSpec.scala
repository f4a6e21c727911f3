package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsofJoin

/** AsofJoin semantics on enumerable frames: most-recent-prior match,
  * inclusive at equal timestamps, null when nothing precedes, keys
  * independent.
  */
class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("asofJoin picks the latest right row at or before each left time") {
    val left = Seq(
      (1L, "u1", t("2024-01-01 10:00:00")),
      (2L, "u1", t("2024-01-01 12:00:00")),
      (3L, "u1", t("2024-01-01 09:00:00")), // before any right row → null
      (4L, "u2", t("2024-01-01 11:00:00")), // u2: only the 11:00 tie
      (5L, "u3", t("2024-01-01 23:00:00"))  // u3 has no right rows at all
    ).toDF("lid", "k", "lt")
    val right = Seq(
      ("u1", t("2024-01-01 09:30:00"), 100L),
      ("u1", t("2024-01-01 11:59:59"), 101L),
      ("u1", t("2024-01-01 12:00:01"), 102L), // after left 2 → never picked
      ("u2", t("2024-01-01 11:00:00"), 200L)  // equal ts → inclusive match
    ).toDF("k", "rt", "rid")
    val got = AsofJoin.asofJoin(left, right, Seq("k"), "lt", "rt", Seq("rid"))
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
    assert(got === Map(
      1L -> Some(100L), 2L -> Some(101L), 3L -> None,
      4L -> Some(200L), 5L -> None))
  }

  test("asofJoin preserves every left row and all left columns") {
    val left = Seq((1L, "u1", t("2024-01-01 10:00:00"), "x"))
      .toDF("lid", "k", "lt", "extra")
    val right = Seq(("u1", t("2024-01-01 09:00:00"), 7L, "p"))
      .toDF("k", "rt", "rid", "rp")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "lt", "rt",
      Seq("rid", "rp"))
    assert(out.columns.toSeq === Seq("lid", "k", "lt", "extra", "rid", "rp"))
    assert(out.count() === 1)
    val r = out.collect()(0)
    assert(r.getAs[String]("extra") === "x" && r.getAs[Long]("rid") === 7L
      && r.getAs[String]("rp") === "p")
  }
}
