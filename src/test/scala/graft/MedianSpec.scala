package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Median

class MedianSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference: sort the group, average the two middle cent values. */
  private def ref(cents: Seq[Long]): Double = {
    val s = cents.sorted
    val n = s.length
    (s((n - 1) / 2) + s(n / 2)) / 200.0
  }

  private def toDf(rows: Seq[(String, Long)]) =
    rows.toDF("g", "cents")
      .selectExpr("g", "CAST(cents AS DECIMAL(12,2)) / 100 AS v")
      .selectExpr("g", "CAST(v AS DECIMAL(12,2)) AS v")

  test("matches the sorted reference on random odd/even/dup groups") {
    val rnd = new scala.util.Random(31)
    val rows = for {
      g <- Seq("a", "b", "c", "d")
      i <- 1 to (50 + g.hashCode.abs % 7) // odd and even sizes
    } yield (g, rnd.nextInt(2000).toLong) // duplicates certain
    val out = Median.groupMedianCents(toDf(rows), Seq("g"), "v")
      .as[(String, Double)].collect().toMap
    val expect = rows.groupBy(_._1).map { case (g, rs) =>
      g -> ref(rs.map(_._2))
    }
    assert(out === expect)
  }

  test("single-element, two-element, and all-equal groups") {
    val rows = Seq(
      ("one", 501L),
      ("two", 100L), ("two", 200L),
      ("same", 7L), ("same", 7L), ("same", 7L))
    val out = Median.groupMedianCents(toDf(rows), Seq("g"), "v")
      .as[(String, Double)].collect().toMap
    assert(out === Map("one" -> 5.01, "two" -> 1.5, "same" -> 0.07))
  }

  test("bucket count does not change the answer (1 bucket ≡ full scan)") {
    val rnd = new scala.util.Random(41)
    val rows = (1 to 301).map(i => ("g", rnd.nextInt(100000).toLong))
    val one = Median.groupMedianCents(toDf(rows), Seq("g"), "v",
      nBuckets = 1).as[(String, Double)].head()
    val many = Median.groupMedianCents(toDf(rows), Seq("g"), "v",
      nBuckets = 4096).as[(String, Double)].head()
    assert(one === many && one._2 === ref(rows.map(_._2)))
  }

  test("decile ladder matches the sorted-reference order statistics") {
    val rnd = new scala.util.Random(53)
    val rows = for {
      g <- Seq("p", "q"); _ <- 1 to (200 + g.length)
    } yield (g, rnd.nextInt(50000).toLong)
    val out = Median.groupQuantilesCents(toDf(rows), Seq("g"), "v")
      .as[(String, Long, Double)].collect()
      .map { case (g, p, v) => ((g, p), v) }.toMap
    val expect = (for {
      (g, rs) <- rows.groupBy(_._1)
      s = rs.map(_._2).sorted
      p <- (1 to 9).map(_ * 10)
    } yield ((g, p.toLong),
      s(((p * s.length + 99) / 100).max(1) - 1) / 100.0)).toMap
    assert(out === expect)
  }

  test("tiny groups clamp every requested rank to a real element") {
    val rows = Seq(("t", 100L), ("t", 300L))
    val out = Median.groupQuantilesCents(toDf(rows), Seq("g"), "v",
        percents = Seq(10, 50, 100))
      .as[(String, Long, Double)].collect().toSet
    // n=2: p10 → rank max(1,1)=1 → 1.0; p50 → rank 1 → 1.0;
    // p100 → rank 2 → 3.0.
    assert(out === Set(("t", 10L, 1.0), ("t", 50L, 1.0),
      ("t", 100L, 3.0)))
  }

  test("approx median bounds the lower-median statistic by width/2") {
    val rnd = new scala.util.Random(71)
    val rows = for {
      g <- Seq("x", "y"); _ <- 1 to 500
    } yield (g, rnd.nextInt(100000).toLong)
    // Reference: the rank-⌈n/2⌉ order statistic (what the estimator
    // provably brackets — NOT the even-n averaged median, whose two
    // middle values can sit buckets apart in sparse data).
    val p50 = rows.groupBy(_._1).map { case (g, rs) =>
      val s = rs.map(_._2).sorted
      g -> s((s.length + 1) / 2 - 1) / 100.0
    }
    def run(nb: Int) = Median
      .approxMedianCents(toDf(rows), Seq("g"), "v", nBuckets = nb)
      .as[(String, Double, Double)].collect()
      .map { case (g, a, w) => (g, (a, w)) }.toMap
    val coarse = run(64)
    coarse.foreach { case (g, (a, w)) =>
      assert(math.abs(a - p50(g)) <= w / 2 + 0.005,
        s"$g: |$a - ${p50(g)}| > ${w / 2}")
    }
    val fine = run(4096)
    fine.foreach { case (g, (a, w)) =>
      assert(math.abs(a - p50(g)) <= w / 2 + 0.005)
      assert(w <= coarse(g)._2) // finer grid, tighter bound
    }
  }

  test("weighted median equals the median of the weight-expanded rows") {
    val rnd = new scala.util.Random(83)
    val rows = (1 to 120).map(i =>
      ("g", rnd.nextInt(5000).toLong, 1L + rnd.nextInt(9)))
    val df = rows.toDF("g", "cents", "wt")
      .selectExpr("g", "CAST(cents AS DECIMAL(12,2)) / 100 AS v", "wt")
      .selectExpr("g", "CAST(v AS DECIMAL(12,2)) AS v", "wt")
    val out = Median.groupWeightedMedianCents(df, Seq("g"), "v",
        org.apache.spark.sql.functions.col("wt"))
      .as[(String, Double)].head()._2
    val expanded = rows.flatMap { case (_, c, w) => Seq.fill(w.toInt)(c) }
    assert(out === ref(expanded))
    // Zero-weight rows are invisible.
    val withZeros = (rows ++ Seq(("g", 0L, 0L), ("g", 999999L, 0L)))
      .toDF("g", "cents", "wt")
      .selectExpr("g", "CAST(cents AS DECIMAL(12,2)) / 100 AS v", "wt")
      .selectExpr("g", "CAST(v AS DECIMAL(12,2)) AS v", "wt")
    val out2 = Median.groupWeightedMedianCents(withZeros, Seq("g"), "v",
        org.apache.spark.sql.functions.col("wt"))
      .as[(String, Double)].head()._2
    assert(out2 === out)
  }

  test("both middle ranks inside one tied value run") {
    // Sorted cents: 1, 5, 5, 9 → middles (5+5)/200.
    val rows = Seq(("g", 5L), ("g", 1L), ("g", 9L), ("g", 5L))
    val out = Median.groupMedianCents(toDf(rows), Seq("g"), "v")
      .as[(String, Double)].head()
    assert(out === (("g", 0.05)))
  }
}
