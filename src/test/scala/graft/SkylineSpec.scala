package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skyline

class SkylineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Brute-force dominance reference: a point survives iff nothing is ≤
    * on both dims and < on at least one.
    */
  private def brute(pts: Seq[(Long, Int, Double)]): Set[(Long, Int, Double)] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, qx, qy) =>
        qx <= x && qy <= y && (qx < x || qy < y)
      }
    }.toSet

  test("matches brute-force dominance on a seeded random cloud") {
    val rnd = new scala.util.Random(42)
    val pts = (1L to 400L).map(i =>
      (i, rnd.nextInt(30), (rnd.nextInt(500) * 7).toDouble))
    val out = Skyline.paretoMin2d(pts.toDF("id", "x", "y"), "x", "y")
      .as[(Long, Int, Double)].collect().toSet
    assert(out === brute(pts))
  }

  test("duplicate frontier points all survive; nulls are excluded") {
    val pts = Seq(
      (1L, Some(1), Some(5.0)),  // frontier
      (2L, Some(1), Some(5.0)),  // exact duplicate — also frontier
      (3L, Some(2), Some(5.0)),  // dominated by (1,5): bigger x, equal y
      (4L, Some(2), Some(3.0)),  // frontier (cheaper than any smaller x)
      (5L, Some(3), Some(3.0)),  // dominated by (2,3)
      (6L, None, Some(1.0)),     // null dim — excluded
      (7L, Some(0), None)        // null dim — excluded
    ).toDF("id", "x", "y")
    val ids = Skyline.paretoMin2d(pts, "x", "y")
      .select($"id").as[Long].collect().toSet
    assert(ids === Set(1L, 2L, 4L))
  }

  test("single-partition and many-partition layouts agree") {
    val rnd = new scala.util.Random(7)
    val pts = (1L to 300L).map(i =>
      (i, rnd.nextInt(8), rnd.nextInt(50).toDouble))
    val df = pts.toDF("id", "x", "y")
    val one = Skyline.paretoMin2d(df, "x", "y", numPartitions = 1)
      .select($"id").as[Long].collect().toSet
    val many = Skyline.paretoMin2d(df.repartition(13), "x", "y",
        numPartitions = 13)
      .select($"id").as[Long].collect().toSet
    assert(one === many)
    assert(one === brute(pts).map(_._1))
  }
}
