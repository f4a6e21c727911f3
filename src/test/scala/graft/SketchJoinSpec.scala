package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches

class SketchJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-computed join size; collision-free grid is exact") {
    val a = Seq("x", "x", "y").toDF("k")
    val b = Seq("x", "y", "y", "z").toDF("k")
    // exact = f_a(x)·f_b(x) + f_a(y)·f_b(y) = 2·1 + 1·2 = 4; with 256
    // buckets and 3 keys no bucket collides, so the sketch is exact.
    val row = Sketches.cmsJoinSize(a, "k", b, "k")
      .as[(Long, Long, Long)].head()
    assert(row === ((4L, 4L, 0L)))
  }

  test("self-join size is sum of squared frequencies") {
    val a = Seq("x", "x", "y").toDF("k")
    val row = Sketches.cmsJoinSize(a, "k", a, "k")
      .as[(Long, Long, Long)].head()
    assert(row._1 === 5L && row._2 >= 5L)
  }

  test("estimate never underestimates, even with forced collisions") {
    val rnd = new scala.util.Random(5)
    val a = Seq.fill(300)(s"a${rnd.nextInt(40)}").toDF("k")
    val b = Seq.fill(300)(s"a${rnd.nextInt(60)}").toDF("k")
    // prefixLen=1 → only 16 buckets for 40–60 keys: collisions certain.
    val row = Sketches.cmsJoinSize(a, "k", b, "k", depth = 3, prefixLen = 1)
      .as[(Long, Long, Long)].head()
    assert(row._3 >= 0L && row._2 >= row._1 && row._3 > 0L)
  }

  test("disjoint key sets: exact 0, estimate still non-negative") {
    val a = Seq("x", "y").toDF("k")
    val b = Seq("p", "q").toDF("k")
    val row = Sketches.cmsJoinSize(a, "k", b, "k")
      .as[(Long, Long, Long)].head()
    assert(row._1 === 0L && row._2 >= 0L)
  }

  test("kmv overlap is exact when k covers the whole union") {
    // A = {1..10}, B = {6..15}: |∩| = 5, |∪| = 15, J = 1/3. With k ≥ 15
    // every sketch is the full hash set, so the estimate IS the truth.
    val df = ((1 to 10).map(("A", _)) ++ (6 to 15).map(("B", _)))
      .toDF("g", "v")
    val r = Sketches.kmvPairwiseOverlap(df, "g", "v", k = 64)
      .select("ga", "gb", "m", "k_used", "jaccard_est", "n_inter",
        "n_union", "jaccard_exact")
      .as[(String, String, Long, Long, Double, Long, Long, Double)]
      .head()
    assert(r._1 === "A" && r._2 === "B")
    assert(r._3 === 5L && r._4 === 15L)
    assert(r._6 === 5L && r._7 === 15L)
    assert(r._5 === r._8 && math.abs(r._5 - 1.0 / 3.0) < 1e-12)
  }

  test("kmv with truncating k keeps the estimate inside [0,1] and k_used = k") {
    val df = ((1 to 300).map(("A", _)) ++ (150 to 450).map(("B", _)))
      .toDF("g", "v")
    val r = Sketches.kmvPairwiseOverlap(df, "g", "v", k = 32)
      .select("k_used", "m", "jaccard_est")
      .as[(Long, Long, Double)].head()
    assert(r._1 === 32L && r._2 >= 0L && r._2 <= 32L)
    assert(r._3 >= 0.0 && r._3 <= 1.0)
  }

  test("kmv overlap of disjoint groups estimates zero") {
    val df = ((1 to 50).map(("A", _)) ++ (100 to 150).map(("B", _)))
      .toDF("g", "v")
    val r = Sketches.kmvPairwiseOverlap(df, "g", "v", k = 16)
      .select("m", "n_inter").as[(Long, Long)].head()
    assert(r._1 === 0L && r._2 === 0L)
  }
}
