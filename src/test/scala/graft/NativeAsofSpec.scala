package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsofJoin
import graft.plans.NativeAsof

/** The native whole-operator as-of join (custom LogicalPlan + Strategy +
  * merge SparkPlan) must agree row-for-row with the composed
  * union–carry-forward operator on every case the contract covers.
  */
class NativeAsofSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  private def trades = Seq(
    (1L, ts(10), "t1"), (1L, ts(20), "t2"), (1L, ts(30), "t3"),
    (2L, ts(15), "t4"), (3L, ts(5), "t5"))
    .toDF("k", "t", "trade")

  private def quotes = Seq(
    (1L, ts(8), 100L), (1L, ts(20), 105L), (1L, ts(25), 110L),
    (2L, ts(16), 200L), (4L, ts(1), 400L))
    .toDF("k", "qt", "px")

  test("hand-computed: latest prior quote, inclusive ties, null when none") {
    val out = NativeAsof.asofJoin(trades, quotes, "k", "t", "qt",
        Seq("px"))
      .orderBy($"k", $"t")
      .select($"trade", $"px").as[(String, Option[Long])]
      .collect().toSeq
    assert(out == Seq(
      ("t1", Some(100L)),   // 8 <= 10
      ("t2", Some(105L)),   // tie at 20 matches (inclusive)
      ("t3", Some(110L)),
      ("t4", None),         // quote at 16 is AFTER the trade at 15
      ("t5", None)))        // key 3 has no quotes at all
  }

  test("native ≡ composed on the synthetic event log (full row set)") {
    val e = graft.sources.Tables
      .load(spark, "/root/testdata/sf0.001", "events")
      .where($"ts".isNotNull)
    val left = e.where($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val right = e.where($"event_type" === "purchase")
      .select($"user_id", $"ts".as("pt"), $"value")
      .groupBy($"user_id", $"pt")
      .agg(max($"value").as("pv"))
    val composed = AsofJoin.asofJoin(left, right, Seq("user_id"),
        "ts", "pt", Seq("pv"))
      .select($"event_id", $"pv")
    val native = NativeAsof.asofJoin(left, right, "user_id", "ts", "pt",
        Seq("pv"))
      .select($"event_id", $"pv")
    assert(native.count() == left.count())
    assert(native.exceptAll(composed).isEmpty &&
      composed.exceptAll(native).isEmpty,
      "native and composed as-of joins disagree")
  }

  test("the physical plan is the custom merge exec with sorted children") {
    val out = NativeAsof.asofJoin(trades, quotes, "k", "t", "qt",
      Seq("px"))
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("AsofJoin "), s"strategy did not fire:\n$p")
    assert(p.contains("Exchange hashpartitioning"),
      s"children not hash-clustered:\n$p")
    assert("Sort \\[".r.findAllIn(p).size >= 2,
      s"children not sorted by (key, time):\n$p")
  }

  test("empty right side yields all-null payload") {
    val out = NativeAsof.asofJoin(trades, quotes.where($"px" < 0),
      "k", "t", "qt", Seq("px"))
    assert(out.count() == 5)
    assert(out.where($"px".isNotNull).count() == 0)
  }

  test("string keys merge correctly across partitions") {
    val l = Seq(("a", ts(10), 1L), ("b", ts(10), 2L), ("c", ts(10), 3L))
      .toDF("k", "t", "id")
    val r = Seq(("a", ts(5), 11L), ("c", ts(9), 33L), ("c", ts(11), 34L))
      .toDF("k", "qt", "v")
    val out = NativeAsof.asofJoin(l, r, "k", "t", "qt", Seq("v"))
      .orderBy($"k").select($"id", $"v").as[(Long, Option[Long])]
      .collect().toSeq
    assert(out == Seq((1L, Some(11L)), (2L, None), (3L, Some(33L))))
  }
}
