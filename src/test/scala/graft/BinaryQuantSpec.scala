package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Binary-quantization two-tier top-k ([[Similarity.binaryQuantTopK]]):
  * the identity-plane sign code, the Hamming funnel, and the exact
  * rerank contract against brute force.
  */
class BinaryQuantSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic mixed-sign vectors in 8-dim (floats, like the
    * embeddings column): values spread around zero so sign codes vary.
    */
  private def vecs: Seq[(Long, Seq[Float])] =
    (0L until 40L).map { i =>
      val v = (0 until 8).map { j =>
        ((((i * 13 + j * 7) % 19) - 9).toFloat / 9.0f)
      }
      (i, v)
    }

  test("identity-plane code IS the per-dimension sign string") {
    val df = vecs.toDF("vec_id", "embedding")
    val planes = Similarity.signBitPlanes(8)
    val got = df.select($"vec_id",
        Similarity.projectionBucket($"embedding", planes).as("code"))
      .as[(Long, String)].collect().toMap
    vecs.foreach { case (id, v) =>
      val want = v.map(x => if (x >= 0f) '1' else '0').mkString
      assert(got(id) === want, s"vec $id")
    }
  }

  test("with cTop covering the corpus, BQ rerank equals brute force") {
    val df = vecs.toDF("vec_id", "embedding")
    val q = df.where($"vec_id" < 3)
    val brute = Similarity.bruteForceTopK(df, q, "vec_id", "embedding",
        k = 5).select($"q_id", $"n_id", $"cos", $"rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    val bq = Similarity.binaryQuantTopK(df, q, "vec_id", "embedding",
        dim = 8, cTop = 40, k = 5)
      .select($"q_id", $"n_id", $"cos", $"rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(bq === brute)
  }

  test("persisted code table reproduces the inline funnel exactly") {
    // The serving-node path: codes staged once (here a parquet round-trip
    // through the test scratch, as the registered sim_topk_bq_persist
    // query does), then queried — must equal the inline form bit-for-bit.
    val df = vecs.toDF("vec_id", "embedding")
    val q = df.where($"vec_id" < 3)
    val planes = Similarity.signBitPlanes(8)
    val idx = java.nio.file.Files
      .createTempDirectory("bq_codes").toString
    df.select($"vec_id".as("n_id"),
        Similarity.projectionBucket($"embedding", planes).as("n_code"))
      .write.mode("overwrite").parquet(idx)
    val inline = Similarity.binaryQuantTopK(df, q, "vec_id", "embedding",
        dim = 8, cTop = 10, k = 5)
      .select($"q_id", $"n_id", $"ham", $"cos", $"rank")
      .as[(Long, Long, Long, Double, Long)].collect().toSet
    val persisted = Similarity.binaryQuantTopKFromCodes(df,
        spark.read.parquet(idx), q, "vec_id", "embedding",
        dim = 8, cTop = 10, k = 5)
      .select($"q_id", $"n_id", $"ham", $"cos", $"rank")
      .as[(Long, Long, Long, Double, Long)].collect().toSet
    assert(persisted === inline)
  }

  test("funnel bounds hold and ham is consistent with the codes") {
    val df = vecs.toDF("vec_id", "embedding")
    val q = df.where($"vec_id" < 3)
    val out = Similarity.binaryQuantTopK(df, q, "vec_id", "embedding",
        dim = 8, cTop = 10, k = 5)
      .select($"q_id", $"n_id", $"ham", $"rank")
      .as[(Long, Long, Long, Long)].collect()
    // k rows per query, ranks 1..k, no self-matches.
    assert(out.groupBy(_._1).forall { case (_, rows) =>
      rows.length == 5 && rows.map(_._4).sorted.toSeq == (1L to 5L)
    })
    assert(out.forall { case (qi, ni, _, _) => qi != ni })
    // ham matches a driver-side recount from the sign codes.
    val codes = vecs.map { case (id, v) =>
      id -> v.map(x => if (x >= 0f) '1' else '0').mkString
    }.toMap
    assert(out.forall { case (qi, ni, ham, _) =>
      codes(qi).zip(codes(ni)).count { case (a, b) => a != b } == ham
    })
  }

  test("IVF×BQ with 2 centroids probed 2-wide equals the plain BQ funnel") {
    // With k_cells = 2 and a 2-cell probe, every query sees the whole
    // corpus — the composed path must reproduce binaryQuantTopK exactly
    // (same funnel, same rerank, pair-uniqueness intact).
    val df = vecs.toDF("vec_id", "embedding")
    val q = df.where($"vec_id" < 3)
    val cents = Similarity.ivfCentroids(dim = 8, k = 2, seed = 5L)
    val plain = Similarity.binaryQuantTopK(df, q, "vec_id", "embedding",
        dim = 8, cTop = 10, k = 5)
      .select($"q_id", $"n_id", $"ham", $"cos", $"rank")
      .as[(Long, Long, Long, Double, Long)].collect().toSet
    val composed = Similarity.ivfBinaryQuantTopK(df, q, "vec_id",
        "embedding", cents, dim = 8, cTop = 10, k = 5)
      .select($"q_id", $"n_id", $"ham", $"cos", $"rank")
      .as[(Long, Long, Long, Double, Long)].collect().toSet
    assert(composed === plain)
  }

  test("IVF×BQ candidates stay within the probed cells") {
    val df = vecs.toDF("vec_id", "embedding")
    val q = df.where($"vec_id" < 3)
    val cents = Similarity.ivfCentroids(dim = 8, k = 4, seed = 5L)
    val cellOf = df.select($"vec_id",
        Similarity.centroidCell($"embedding", cents).as("cell"))
      .as[(Long, Int)].collect().toMap
    val probesOf = q.select($"vec_id",
        Similarity.ivfProbeCells($"embedding", cents).as("cells"))
      .as[(Long, Seq[Int])].collect().toMap
    val out = Similarity.ivfBinaryQuantTopK(df, q, "vec_id", "embedding",
        cents, dim = 8, cTop = 10, k = 5)
      .select($"q_id", $"n_id", $"rank")
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (qi, ni, _) =>
      qi != ni && probesOf(qi).contains(cellOf(ni))
    })
    // Probe cells are distinct, so no (q, n) pair can double up.
    assert(probesOf.values.forall(cs => cs.distinct.length == cs.length))
    assert(out.groupBy(r => (r._1, r._2)).values.forall(_.length == 1))
  }
}
