package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Drift, Histogram}

class HistogramDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("equi-width buckets: edges tile the range, counts are exact") {
    // [0, 9] in 4 buckets: ceil edges 0|3|5|8|10, counts 3/2/3/2.
    val df = (0L to 9L).toDF("v")
    val h = Histogram.equiWidth(df, "v", 0L, 9L, 4)
      .orderBy($"bucket").as[(Long, Long, Long, Long)].collect().toSeq
    assert(h.map(_._1) === Seq(0L, 1L, 2L, 3L))
    // Edges tile [0, 10) without gaps: each edge_hi = next edge_lo.
    assert(h.sliding(2).forall { case Seq(a, b) => a._3 === b._2 })
    assert(h.head._2 === 0L && h.last._3 === 10L)
    // Every value lands in the bucket whose [edge_lo, edge_hi) holds it.
    assert(h.map(_._4).sum === 10L)
    h.foreach { case (_, lo, hi, n) => assert(n === (lo until hi).size) }
  }

  test("empty buckets are emitted; out-of-range clamps to edge buckets") {
    val df = Seq(-5L, 0L, 0L, 99L).toDF("v")
    val h = Histogram.equiWidth(df, "v", 0L, 9L, 5)
      .orderBy($"bucket").as[(Long, Long, Long, Long)].collect().toSeq
    assert(h.map(_._4) === Seq(3L, 0L, 0L, 0L, 1L)) // -5,0,0 → b0; 99 → b4
  }

  test("auto bounds match pinned bounds at the data's min/max") {
    val rnd = new scala.util.Random(3)
    val vs = Seq.fill(500)(rnd.nextInt(1000).toLong)
    val df = vs.toDF("v")
    val auto = Histogram.equiWidthAuto(df, "v", 8)
      .orderBy($"bucket").collect().toSeq
    val pinned = Histogram.equiWidth(df, "v", vs.min, vs.max, 8)
      .orderBy($"bucket").collect().toSeq
    assert(auto === pinned)
  }

  test("TVD: identical distributions → 0; disjoint categories → 1") {
    val a = Seq("x", "x", "y").toDF("c")
    val same = Drift.totalVariation(a, Seq("x", "x", "x", "x", "y", "y")
      .toDF("c"), "c").select($"tvd").as[Double].head()
    assert(same === 0.0)
    val disj = Drift.totalVariation(a, Seq("z", "w").toDF("c"), "c")
      .select($"tvd").as[Double].head()
    assert(disj === 1.0)
  }

  test("TVD hand-computed value and one-sided categories") {
    // a: x2 y1 z1 (n=4); b: x1 y3 (n=4).
    // |2-1|+|1-3|+|1-0| = 4 quarters → tvd = 4/(2·4) = 0.5 exactly.
    val a = Seq("x", "x", "y", "z").toDF("c")
    val b = Seq("x", "y", "y", "y").toDF("c")
    val row = Drift.totalVariation(a, b, "c")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(row === ((4L, 4L, 3L, 3L, 0.5)))
    val detail = Drift.categoricalDrift(a, b, "c")
      .orderBy($"cat").select($"cat", $"n_a", $"n_b")
      .as[(String, Long, Long)].collect().toSeq
    assert(detail === Seq(("x", 2L, 1L), ("y", 1L, 3L), ("z", 1L, 0L)))
  }

  test("embedding centroid drift: identical slices → 1; opposite → −1") {
    val vs = Seq(
      (1L, Seq(0.5, 0.25, -0.125)),
      (2L, Seq(0.25, 0.5, 0.125))).toDF("id", "v")
    // √x·√x ≠ x in the last ulp, so the self-cosine is 1 within 1e−12
    // (the ORACLE runs the identical float ops — parity is exact even
    // though the mathematical identity isn't).
    val same = Drift.embeddingCentroidDrift(vs, vs, "v")
      .select($"centroid_cosine").as[Double].head()
    assert(math.abs(same - 1.0) < 1e-12)
    val neg = vs.select($"id",
      transform($"v", x => -x).as("v"))
    val opp = Drift.embeddingCentroidDrift(vs, neg, "v")
      .select($"centroid_cosine").as[Double].head()
    assert(math.abs(opp + 1.0) < 1e-12)
  }

  test("embedding centroid drift: orthogonal centroids → 0, counts ride") {
    val a = Seq((1L, Seq(0.5, 0.0)), (2L, Seq(0.25, 0.0))).toDF("id", "v")
    val b = Seq((3L, Seq(0.0, 0.5))).toDF("id", "v")
    val row = Drift.embeddingCentroidDrift(a, b, "v")
      .as[(Long, Long, Double)].head()
    assert(row === ((2L, 1L, 0.0)))
  }

  test("numeric TVD equals categorical TVD over the shared bucket grid") {
    val a = (0L to 99L).toDF("v")
    val b = (50L to 149L).toDF("v")
    val viaNum = Drift.numericTvd(a, b, "v", 0L, 149L, 3)
      .select($"tvd").as[Double].head()
    def bk(df: org.apache.spark.sql.DataFrame) =
      df.select(Histogram.bucketOf($"v", lit(0L), lit(149L), 3).as("c"))
    val viaCat = Drift.totalVariation(bk(a), bk(b), "c")
      .select($"tvd").as[Double].head()
    assert(viaNum === viaCat && viaNum > 0.0)
  }
}
