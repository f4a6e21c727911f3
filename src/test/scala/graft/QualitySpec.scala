package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Quality

/** Constraint suite on planted violations: exact counts, FK orphans,
  * pass flags, and the one-scan-per-table fusion claim.
  */
class QualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame = Seq(
    (1L, Option("a"), 10.0), (1L, Option("b"), 20.0),
    (2L, None, -5.0), (3L, Option("c"), 200.0))
    .toDF("k", "name", "v")

  test("fused rules count planted violations exactly") {
    val out = Quality.check(frame, Seq(
      "k_unique" -> Quality.uniqueViolations(col("k")),
      "name_not_null" -> Quality.nullViolations(col("name")),
      "v_in_0_100" -> Quality.rangeViolations(col("v"), lit(0), lit(100))))
      .as[(String, Long)].collect().toMap
    assert(out == Map(
      "k_unique" -> 1L,       // key 1 appears twice
      "name_not_null" -> 1L,  // row k=2
      "v_in_0_100" -> 2L))    // -5 and 200
  }

  test("all single-table rules share ONE scan") {
    val p = Quality.check(frame, Seq(
      "a" -> Quality.uniqueViolations(col("k")),
      "b" -> Quality.nullViolations(col("name")),
      "c" -> Quality.rangeViolations(col("v"), lit(0), lit(100))))
      .queryExecution.executedPlan.toString
    assert("LocalTableScan".r.findAllIn(p).size == 1,
      s"rules did not fuse into one pass:\n$p")
  }

  test("FK violations are orphaned child rows only; NULL fk is exempt") {
    val child = Seq(Option(1L), Option(1L), Option(9L), None).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val out = Quality.fkViolations("fk", child, "fk", parent, "pk")
      .as[(String, Long)].collect().head
    assert(out == ("fk", 1L)) // only fk=9
  }

  test("report flags pass exactly when violations are zero") {
    val rep = Quality.report(
      Quality.check(frame, Seq(
        "k_unique" -> Quality.uniqueViolations(col("k")))),
      Quality.fkViolations("fk_ok", frame, "k", frame, "k"))
      .as[(String, Long, Boolean)].collect().toSeq
    assert(rep == Seq(("fk_ok", 0L, true), ("k_unique", 1L, false)))
  }
}
