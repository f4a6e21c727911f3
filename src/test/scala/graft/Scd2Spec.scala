package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scd2

/** SCD2 invariants under chained snapshot applies: intervals per key
  * never overlap, exactly one open row per seen key, and the version an
  * as-of probe resolves matches the snapshot that was live at that date.
  */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val key = Seq("k")
  private val attrs = Seq("seg")

  // Three yearly snapshots: k1 changes every year, k2 never changes,
  // k3 appears in year 2, k4 disappears after year 1 (no-delete: stays
  // open), k5 changes then reverts to its original value.
  private def dim = {
    val s1 = Seq(("k1", "a"), ("k2", "x"), ("k4", "q"), ("k5", "m"))
      .toDF("k", "seg")
    val s2 = Seq(("k1", "b"), ("k2", "x"), ("k3", "n"), ("k5", "mm"))
      .toDF("k", "seg")
    val s3 = Seq(("k1", "c"), ("k2", "x"), ("k3", "n"), ("k5", "m"))
      .toDF("k", "seg")
    Scd2.applySnapshot(
      Scd2.applySnapshot(
        Scd2.init(s1, key, attrs, lit("2020-01-01")),
        s2, key, attrs, lit("2021-01-01")),
      s3, key, attrs, lit("2022-01-01"))
  }

  test("exactly one open row per key; intervals partition the timeline") {
    val rows = dim.as[(String, String, Date, Option[Date])].collect()
    val byKey = rows.groupBy(_._1)
    assert(byKey.keySet == Set("k1", "k2", "k3", "k4", "k5"))
    for ((k, vs) <- byKey) {
      assert(vs.count(_._4.isEmpty) == 1, s"$k must have one open row")
      // sorted by valid_from, each close date equals the next open date
      val sorted = vs.sortBy(_._3.toString)
      sorted.sliding(2).foreach {
        case Array(prev, next) =>
          assert(prev._4.contains(next._3),
            s"$k: ${prev._4} must close exactly where ${next._3} opens")
        case _ => ()
      }
      assert(sorted.last._4.isEmpty, s"$k: last version must be open")
    }
  }

  test("version counts follow the change histories") {
    val n = dim.groupBy($"k").count().as[(String, Long)].collect().toMap
    assert(n("k1") == 3) // changed twice
    assert(n("k2") == 1) // never changed
    assert(n("k3") == 1) // appeared once, unchanged after
    assert(n("k4") == 1) // absent from later snapshots: still open
    assert(n("k5") == 3) // changed and reverted: revert is a NEW version
  }

  test("as-of probes resolve the snapshot that was live") {
    def at(date: String): Map[String, String] =
      Scd2.asOfVersion(dim, lit(date).cast("date"))
        .select($"k", $"seg").as[(String, String)].collect().toMap
    assert(at("2020-06-01") ==
      Map("k1" -> "a", "k2" -> "x", "k4" -> "q", "k5" -> "m"))
    assert(at("2021-06-01") ==
      Map("k1" -> "b", "k2" -> "x", "k3" -> "n", "k4" -> "q", "k5" -> "mm"))
    assert(at("2022-06-01") ==
      Map("k1" -> "c", "k2" -> "x", "k3" -> "n", "k4" -> "q", "k5" -> "m"))
    // before the first load: nothing exists
    assert(at("2019-06-01").isEmpty)
  }

  test("apply is deterministic and idempotent for an unchanged snapshot") {
    val s = Seq(("k1", "a")).toDF("k", "seg")
    val d1 = Scd2.init(s, key, attrs, lit("2020-01-01"))
    val reapplied = Scd2.applySnapshot(d1, s, key, attrs, lit("2021-01-01"))
    // same snapshot again: no new versions, the open row keeps its
    // ORIGINAL valid_from
    assert(reapplied.count() == 1)
    assert(reapplied.select($"valid_from").as[Date].head().toString ==
      "2020-01-01")
  }
}
