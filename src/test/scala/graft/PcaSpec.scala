package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pca

/** Jacobi eigensolver + distributed covariance: known-answer matrices,
  * orthonormality, and agreement between the distributed Gram aggregate
  * and a driver-side computation on a small fixture.
  */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("jacobi recovers a known 2x2 eigensystem") {
    // [[2,1],[1,2]] has eigenvalues 3 (vec [1,1]/√2) and 1 ([-1,1]/√2).
    val (evals, evecs) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(evals(0) - 3.0) < 1e-12)
    assert(math.abs(evals(1) - 1.0) < 1e-12)
    val s = 1 / math.sqrt(2)
    assert(evecs(0).zip(Array(s, s)).forall { case (a, b) =>
      math.abs(a - b) < 1e-12 })
  }

  test("jacobi eigenvectors are orthonormal and reconstruct the matrix") {
    // Deterministic non-trivial symmetric 5x5.
    val d = 5
    val m = Array.tabulate(d, d)((i, j) =>
      1.0 / (1 + i + j) + (if (i == j) 2.0 else 0.0))
    val (evals, evecs) = Pca.jacobiEigen(m)
    for (a <- 0 until d; b <- 0 until d) {
      val dot = (0 until d).map(k => evecs(a)(k) * evecs(b)(k)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9,
        s"evec $a · evec $b = $dot")
      val rec = (0 until d).map(k => evals(k) * evecs(k)(a) * evecs(k)(b)).sum
      assert(math.abs(rec - m(a)(b)) < 1e-9, s"reconstruct ($a,$b)")
    }
    assert(evals.sliding(2).forall(p => p(0) >= p(1)), "descending")
  }

  test("distributed covariance matches the driver computation") {
    val vecs = Seq(
      Array(1.0f, 2.0f, 0.0f), Array(2.0f, 1.0f, 1.0f),
      Array(0.0f, 0.0f, 2.0f), Array(1.0f, 1.0f, 1.0f))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "vec")
    val cov = Pca.covariance(df, "id", "vec", 3)
    val n = vecs.length.toDouble
    for (i <- 0 until 3; j <- 0 until 3) {
      val mi = vecs.map(_(i).toDouble).sum / n
      val mj = vecs.map(_(j).toDouble).sum / n
      val expected = vecs.map(v => v(i) * v(j).toDouble).sum / n - mi * mj
      assert(math.abs(cov(i)(j) - expected) < 1e-12, s"cov($i,$j)")
    }
  }
}
