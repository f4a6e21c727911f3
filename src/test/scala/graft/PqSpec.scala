package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Pq, Similarity}

class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Planted blobs: 3 well-separated unit directions in 8-dim, small
    * deterministic jitter per vector.
    */
  private def blobs: Seq[(Long, Seq[Double])] = {
    val dirs = Seq(
      Seq(1.0, 0, 0, 0, 1.0, 0, 0, 0),
      Seq(0, 1.0, 0, 0, 0, 1.0, 0, 0),
      Seq(0, 0, 1.0, 0, 0, 0, 1.0, 0))
    (0L until 60L).map { i =>
      val d = dirs((i % 3).toInt)
      val v = d.zipWithIndex.map { case (x, j) =>
        x + 0.05 * (((i * 7 + j * 3) % 11) - 5) / 11.0
      }
      (i, v)
    }
  }

  test("codebook shapes and determinism across calls") {
    val df = blobs.toDF("vec_id", "embedding")
    val a = Pq.codebooks(df, "embedding", dim = 8, m = 2, k = 4,
      iters = 2, seed = 3L)
    val b = Pq.codebooks(df, "embedding", dim = 8, m = 2, k = 4,
      iters = 2, seed = 3L)
    assert(a.length === 2 && a.forall(_.length === 4) &&
      a.forall(_.forall(_.length === 4)))
    assert(a.map(_.map(_.toSeq).toSeq).toSeq ===
      b.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("encode emits one in-range code per subspace, no shuffle columns") {
    val df = blobs.toDF("vec_id", "embedding")
    val cbs = Pq.codebooks(df, "embedding", 8, 2, 4, 2, 3L)
    val enc = Pq.encode(df, "vec_id", "embedding", cbs)
    assert(enc.columns.toSeq === Seq("vec_id", "code0", "code1"))
    val codes = enc.select($"code0", $"code1").as[(Int, Int)].collect()
    assert(codes.forall { case (a, b) =>
      a >= 0 && a < 4 && b >= 0 && b < 4 })
    assert(codes.distinct.length > 1) // code tuples actually vary
  }

  test("ADC top-k recovers the planted blob structure") {
    val df = blobs.toDF("vec_id", "embedding")
    val cbs = Pq.codebooks(df, "embedding", 8, 2, 4, 2, 3L)
    val top = Pq.adcTopK(df, df.where($"vec_id" < 3), "vec_id",
        "embedding", cbs, k = 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect()
    // Every retrieved neighbor shares the query's blob (ids mod 3).
    assert(top.nonEmpty)
    assert(top.forall { case (q, n) => q % 3 === n % 3 })
  }

  test("IVF-PQ: cell-pruned results are a subset of unpruned ADC order") {
    val df = blobs.toDF("vec_id", "embedding")
    val cells = Similarity.kmeansCentroids(df, "embedding", 8, 3, 2, 17L)
    val cbs = Pq.codebooks(df, "embedding", 8, 2, 4, 2, 3L)
    val q = df.where($"vec_id" < 3)
    val pruned = Pq.ivfAdcTopK(df, q, "vec_id", "embedding", cells, cbs, 5)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    // Every pruned hit must appear in the same query's unpruned ADC
    // candidates with at-least-as-good rank universe (subset check).
    val full = Pq.adcTopK(df, q, "vec_id", "embedding", cbs, 60)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    assert(pruned.nonEmpty && pruned.subsetOf(full))
    // And the planted structure still comes back through the composition.
    assert(pruned.forall { case (qid, nid) => qid % 3 === nid % 3 })
  }

  test("ADC ranking matches brute force when candidates sit ON centroids") {
    // Candidates constructed as concatenations of trained codebook rows:
    // the quantization error is zero, so ADC = exact dot product and the
    // PQ ranking must equal the brute-force dot ranking.
    val train = blobs.toDF("vec_id", "embedding")
    val cbs = Pq.codebooks(train, "embedding", 8, 2, 4, 2, 3L)
    val cands = (for {
      c0 <- 0 until 4; c1 <- 0 until 4
    } yield ((c0 * 4 + c1).toLong + 100L,
      (cbs(0)(c0) ++ cbs(1)(c1)).toSeq)).toSeq
    val q = Seq((0L, blobs.head._2)).toDF("vec_id", "embedding")
    val cdf = cands.toDF("vec_id", "embedding")
    val pq = Pq.adcTopK(cdf, q, "vec_id", "embedding", cbs, k = 8)
      .select($"n_id", $"rank").as[(Long, Long)].collect().toSeq.sortBy(_._2)
    val brute = Similarity.bruteForceTopK(cdf, q, "vec_id", "embedding",
        k = 8, scorer = (a, b) => Similarity.dot(
          a.cast("array<double>"), b.cast("array<double>")))
      .select($"n_id", $"rank").as[(Long, Long)].collect().toSeq.sortBy(_._2)
    assert(pq === brute)
  }
}
