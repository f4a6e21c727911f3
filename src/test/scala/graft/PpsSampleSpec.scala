package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling

class PpsSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("expected size tracks targetK; heavier rows are likelier") {
    // 500 rows, weights 1..500: W = 125250, targetK = 60.
    val df = (1L to 500L).map(i => (i, i)).toDF("id", "w")
    val kept = Sampling.ppsSample(df, "id", $"w", targetK = 60L)
      .select($"id").as[Long].collect().toSet
    // Expected ~60; the hash is uniform so allow a wide band.
    assert(kept.size > 30 && kept.size < 100, s"got ${kept.size}")
    // Heavy rows keep more often: compare keep rates of top vs bottom
    // weight quartile.
    val hi = (376L to 500L).count(kept)
    val lo = (1L to 125L).count(kept)
    assert(hi > lo)
  }

  test("deterministic across runs; zero weights never sampled") {
    val df = (1L to 200L).map(i => (i, if (i % 7 == 0) 0L else i))
      .toDF("id", "w")
    val a = Sampling.ppsSample(df, "id", $"w", 40L)
      .select($"id").as[Long].collect().toSet
    val b = Sampling.ppsSample(df, "id", $"w", 40L)
      .select($"id").as[Long].collect().toSet
    assert(a === b)
    assert(a.forall(_ % 7 != 0))
  }

  test("targetK beyond total keeps every positive-weight row") {
    val df = (1L to 50L).map(i => (i, 1L)).toDF("id", "w")
    val kept = Sampling.ppsSample(df, "id", $"w", targetK = 1000L)
      .count()
    assert(kept === 50L) // threshold clamps past the hash space
  }
}
