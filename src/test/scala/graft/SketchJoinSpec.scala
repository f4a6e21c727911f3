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
}
