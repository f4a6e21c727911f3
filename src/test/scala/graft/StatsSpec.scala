package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Stats

class StatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def toDf(rows: Seq[(String, Long, Long)]) =
    rows.toDF("g", "x", "cents")
      .selectExpr("g", "x", "CAST(cents AS DECIMAL(12,2)) / 100 AS y")
      .selectExpr("g", "x", "CAST(y AS DECIMAL(12,2)) AS y")

  test("perfect line recovers exact slope, intercept, and r = 1") {
    // y = 2.00·x + 5.00 (in currency): cents = 200x + 500.
    val rows = (1L to 50L).map(x => ("g", x, 200 * x + 500))
    val out = Stats.corrOls(toDf(rows), Seq("g"), "x", "y")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .head()
    assert(out._2 === 50L)
    // √·√ reassociation can leave the last ulp off a mathematical ±1.
    assert(out._3.exists(r => math.abs(r - 1.0) < 1e-12))
    assert(out._4 === Some(200.0))          // slope in cents per x
    assert(out._5 === Some(5.0))            // intercept in currency
  }

  test("anti-correlated line gives r = -1 and negative slope") {
    val rows = (1L to 30L).map(x => ("g", x, 10000 - 100 * x))
    val out = Stats.corrOls(toDf(rows), Seq("g"), "x", "y")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .head()
    assert(out._3.exists(r => math.abs(r + 1.0) < 1e-12))
    assert(out._4 === Some(-100.0))
  }

  test("matches a driver-side exact-rational reference on noisy data") {
    val rnd = new scala.util.Random(89)
    val rows = (1L to 200L).map(x =>
      ("g", x, 150 * x + 1000 + rnd.nextInt(500)))
    val out = Stats.corrOls(toDf(rows), Seq("g"), "x", "y")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .head()
    val n = BigInt(rows.size)
    val sx = rows.map(r => BigInt(r._2)).sum
    val sy = rows.map(r => BigInt(r._3)).sum
    val sxy = rows.map(r => BigInt(r._2) * BigInt(r._3)).sum
    val sxx = rows.map(r => BigInt(r._2) * BigInt(r._2)).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    assert(out._4 === Some(slope))
    assert(out._3.exists(r => r > 0.9 && r < 1.0))
  }

  test("degenerate groups (constant x or y) return nulls, not NaN") {
    val rows = Seq(("cx", 5L, 100L), ("cx", 5L, 200L),
      ("cy", 1L, 300L), ("cy", 2L, 300L))
    val out = Stats.corrOls(toDf(rows), Seq("g"), "x", "y")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => (r._1, (r._3, r._4, r._5))).toMap
    assert(out("cx") === ((None, None, None)))        // zero x-variance
    assert(out("cy")._1 === None)                     // r undefined
    assert(out("cy")._2 === Some(0.0))                // flat slope is real
  }
}
