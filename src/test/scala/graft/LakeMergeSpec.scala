package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.LakeMerge

/** MERGE INTO semantics on hand-built frames: matched-update,
  * matched-delete, source-only insert, target-only keep, NULL delete
  * condition, and unlisted-column defaults.
  */
class LakeMergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
    .toDF("k", "name", "v")

  test("update, delete, insert, and keep in one merge") {
    val source = Seq(
      (2L, 99L, false), // matched → update v
      (3L, 0L, true),   // matched → delete
      (9L, 77L, false)) // not matched → insert
      .toDF("k", "new_v", "del")
    val out = LakeMerge.mergeInto(target, source, "k",
      whenMatchedUpdate = Map("v" -> col("s.new_v")),
      whenMatchedDelete = col("s.del"),
      whenNotMatchedInsert = Map("k" -> col("s.k"), "v" -> col("s.new_v")))
      .orderBy("k").as[(Long, String, Long)].collect().toSeq
      .map { case (k, n, v) => (k, Option(n), v) }
    assert(out == Seq(
      (1L, Some("a"), 10L),  // untouched target row
      (2L, Some("b"), 99L),  // updated; unlisted `name` kept
      (4L, Some("d"), 40L),  // untouched
      (9L, None, 77L)))      // inserted; unlisted `name` → NULL
  }

  test("NULL delete condition means keep, not drop") {
    val source = Seq((2L, 99L, Option.empty[Boolean]))
      .toDF("k", "new_v", "del")
    val out = LakeMerge.mergeInto(target, source, "k",
      whenMatchedUpdate = Map("v" -> col("s.new_v")),
      whenMatchedDelete = col("s.del"))
      .orderBy("k").as[(Long, String, Long)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L, 4L))
    assert(out.find(_._1 == 2L).get._3 == 99L)
  }

  test("merge matches the executable map-based spec on random change-sets") {
    // Deterministic pseudo-random cases; the spec is a Scala Map fold.
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 25) {
      val tgtRows = (1 to rnd.nextInt(20))
        .map(_ => rnd.nextInt(15).toLong).distinct
        .map(k => k -> rnd.nextInt(100).toLong)
      // unique keys per side (the MERGE precondition)
      val srcRows = (1 to rnd.nextInt(15))
        .map(_ => rnd.nextInt(20).toLong).distinct
        .map(k => (k, rnd.nextInt(100).toLong, rnd.nextBoolean()))
      val expected = srcRows.foldLeft(tgtRows.toMap) {
        case (m, (k, v, del)) =>
          if (del) { if (m.contains(k)) m - k else m }
          else m.updated(k, v)
      }
      val out = LakeMerge.mergeInto(
        tgtRows.map { case (k, v) => (k, v) }.toDF("k", "v"),
        srcRows.toDF("k", "new_v", "del"), "k",
        whenMatchedUpdate = Map("v" -> col("s.new_v")),
        whenMatchedDelete = col("s.del"),
        whenNotMatchedInsert =
          Map("k" -> col("s.k"), "v" -> col("s.new_v")),
        whenNotMatchedInsertCond = !col("s.del"))
        .as[(Long, Long)].collect().toMap
      assert(out == expected,
        s"tgt=$tgtRows src=$srcRows")
    }
  }

  test("empty source is the identity merge") {
    val source = Seq.empty[(Long, Long, Boolean)]
      .toDF("k", "new_v", "del")
    val out = LakeMerge.mergeInto(target, source, "k",
      whenMatchedUpdate = Map("v" -> col("s.new_v")),
      whenMatchedDelete = col("s.del"))
      .orderBy("k").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "a", 10L), (2L, "b", 20L),
      (3L, "c", 30L), (4L, "d", 40L)))
  }
}
