package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Trained IVF coarse quantizer (spherical Lloyd k-means). The synthetic
  * `embeddings` corpus is isotropic noise, so these tests plant REAL
  * cluster structure and assert training recovers it.
  */
class KmeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 3 unit-vector blobs in 8-d: axis-aligned anchors with a small
    * deterministic per-point perturbation on a second axis.
    */
  private def blobs = {
    val pts = for {
      c <- 0 until 3
      i <- 0 until 40
    } yield {
      val v = Array.fill(8)(0.0f)
      v(c) = 1.0f
      v((c + 3) % 8) = 0.12f * ((i % 5) - 2) // ±0.24 wobble
      (c * 40L + i, v.toSeq, c)
    }
    pts.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  test("lloyd iterations recover planted blobs with perfect purity") {
    val df = blobs
    val cents = Similarity.kmeansCentroids(df, "embedding",
      dim = 8, k = 3, iters = 4, seed = 11L)
    val purity = df
      .withColumn("cell", Similarity.centroidCell(col("embedding"), cents))
      .groupBy("cell", "label").count()
      .groupBy("cell").agg(max("count").as("mx"), sum("count").as("n"))
      .agg((sum("mx") / sum("n")).as("p")).as[Double].collect().head
    assert(purity == 1.0, s"expected pure cells, got purity=$purity")
  }

  test("trained cells make cell-pruned top-k exact on clustered data") {
    val df = blobs
    val cents = Similarity.kmeansCentroids(df, "embedding",
      dim = 8, k = 3, iters = 4, seed = 11L)
    val v = df.withColumn("cell",
      Similarity.centroidCell(col("embedding"), cents))
    val q = v.where(col("vec_id").isin(0L, 45L, 90L))
    val brute = Similarity.bruteForceTopK(df, q.drop("cell"),
      "vec_id", "embedding", k = 5).select($"q_id", $"n_id")
    val pruned = Similarity.partitionedTopK(v, q,
      "vec_id", "embedding", "cell", k = 5)
      .select($"q_id", $"n_id", lit(1L).as("hit"))
    val recall = brute.join(pruned, Seq("q_id", "n_id"), "left")
      .agg((sum(coalesce($"hit", lit(0L))) / count(lit(1))).as("r"))
      .as[Double].collect().head
    assert(recall == 1.0, s"expected exact recall on pure blobs, got $recall")
  }

  test("training is deterministic across runs and centroids are unit-norm") {
    val df = blobs
    val a = Similarity.kmeansCentroids(df, "embedding", 8, 3, 3, 11L)
    val b = Similarity.kmeansCentroids(df, "embedding", 8, 3, 3, 11L)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    a.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"centroid norm $n")
    }
  }
}
