package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the dimensionality-reduction
  * step of a vector pipeline (visualization, cheap pre-filtering before
  * exact cosine, whitening rotations).
  *
  * Scale split: the DATA-sized work is one aggregate building the d×d
  * Gram/covariance sums (map-side combinable — the shuffle carries
  * |partitions| × d(d+1)/2 partial rows, never the vectors); the
  * EIGEN-decomposition runs on the driver over the collected d×d matrix
  * (d = 64 here ⇒ 2,080 doubles — the same collect-tiny-bounds posture as
  * the decile/quantile operators). Projection back over the corpus is a
  * per-row dot product with the components as plan literals, exactly like
  * the IVF centroids. For d in the thousands, swap the pair-explode for
  * per-partition Gram accumulation (mapPartitions BLAS) — the driver
  * eigensolve and literal projection stay unchanged.
  */
object Pca {

  /** Upper-triangle covariance sums via pair-explode: one row per
    * (i ≤ j) dim pair per vector, aggregated with map-side combine.
    * Returns the dense symmetric covariance matrix (divided by n).
    * `idCol` keys the self-join (a caller-provided stable id — a
    * generated monotonically_increasing_id would not be guaranteed
    * consistent across the two join branches).
    */
  def covariance(df: DataFrame, idCol: String, vecCol: String, d: Int)
      : Array[Array[Double]] = {
    // n rides in the aggregate itself (count per cell), no 2nd pass.
    val pairs = df
      .select(col(idCol).as("_rid"),
        col(vecCol).cast("array<double>").as("_v"))
      .select(col("_rid"), posexplode(col("_v"))).toDF("_rid", "i", "xi")
    val sums = pairs.as("a").join(pairs.as("b"),
        col("a._rid") === col("b._rid") && col("a.i") <= col("b.i"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum(col("a.xi") * col("b.xi")).as("sxy"),
        sum(col("a.xi")).as("sx"), sum(col("b.xi")).as("sy"),
        count(lit(1)).as("n"))
      .collect()
    val cov = Array.ofDim[Double](d, d)
    sums.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val n = r.getLong(5).toDouble
      val c = r.getDouble(2) / n - (r.getDouble(3) / n) * (r.getDouble(4) / n)
      cov(i)(j) = c; cov(j)(i) = c
    }
    cov
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix — deterministic
    * fixed sweep order, driver-side, O(d³) per sweep (d ≤ a few hundred).
    * Returns (eigenvalues, eigenvectors) sorted by descending eigenvalue;
    * each eigenvector's sign is normalized (first nonzero component > 0)
    * so components are reproducible.
    */
  def jacobiEigen(m: Array[Array[Double]], sweeps: Int = 30)
      : (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 0 until sweeps; p <- 0 until d - 1; q <- p + 1 until d) {
      val apq = a(p)(q)
      if (math.abs(apq) > 1e-12) {
        val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
        val t = math.signum(theta) /
          (math.abs(theta) + math.sqrt(theta * theta + 1)) match {
            case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1))
            case tt => tt
          }
        val c = 1 / math.sqrt(t * t + 1)
        val s = t * c
        for (k <- 0 until d) {
          val akp = a(k)(p); val akq = a(k)(q)
          a(k)(p) = c * akp - s * akq
          a(k)(q) = s * akp + c * akq
        }
        for (k <- 0 until d) {
          val apk = a(p)(k); val aqk = a(q)(k)
          a(p)(k) = c * apk - s * aqk
          a(q)(k) = s * apk + c * aqk
        }
        for (k <- 0 until d) {
          val vkp = v(k)(p); val vkq = v(k)(q)
          v(k)(p) = c * vkp - s * vkq
          v(k)(q) = s * vkp + c * vkq
        }
      }
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = order.map { i =>
      val col = Array.tabulate(d)(k => v(k)(i))
      val firstNz = col.indexWhere(x => math.abs(x) > 1e-12)
      if (firstNz >= 0 && col(firstNz) < 0) col.map(-_) else col
    }.toArray
    (evals, evecs)
  }

  /** Projection of a vector column onto a literal component (dot). */
  def project(vec: Column, component: Array[Double]): Column = {
    val v = vec.cast("array<double>")
    aggregate(zip_with(v, array(component.map(lit).toIndexedSeq: _*),
      (a, b) => a * b), lit(0.0), (acc, x) => acc + x)
  }
}
