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
}
