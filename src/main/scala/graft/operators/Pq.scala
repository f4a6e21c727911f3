package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ — Jégou/Douze/Schmid family): compress each
  * d-dim embedding to `m` small codes by splitting it into m subvectors
  * and quantizing each against its OWN k-centroid codebook. With m=4,
  * k=8 a 64-float vector becomes 4 tiny ints (~3 bits each) — the
  * memory step that makes billion-vector ANN fit at all.
  *
  * Query time is ASYMMETRIC distance (ADC): the query stays full
  * precision; each candidate's approximate dot product is the sum over
  * subspaces of dot(query-subvector, codebook[code]) — m lookups into
  * literal tables, never a touch of the original vector.
  *
  * Scale shape: training is per-subspace k-means on a sample (driver
  * holds only m·k·(d/m) = k·d doubles — plan literals, like every other
  * index here); encoding is ONE linear map-side pass (the codes ride a
  * projection, no shuffle); ADC scoring is candidates × queries with
  * broadcast queries and a per-query top-k — identical plan posture to
  * [[Similarity.bruteForceTopK]] but each candidate row carries m ints
  * instead of d floats, so the scan is ~(4·m)/(4·d) the bytes. Compose
  * with the trained-IVF cells for the standard IVF-PQ layout.
  *
  * Determinism: codebooks come from [[Similarity.kmeansCentroids]]
  * (exact decimal means, seeded init), code assignment is max-dot with
  * lowest-cell tie-break, and the ADC sum folds subspaces in index
  * order — all replayable in oracle SQL from the raw parquet.
  */
object Pq {

  /** Train the m codebooks: subspace mi gets seed+mi over the sliced
    * column. Returns codebooks(mi)(cell)(component).
    */
  def codebooks(df: DataFrame, vecCol: String, dim: Int, m: Int, k: Int,
                iters: Int, seed: Long): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val sub = dim / m
    (0 until m).map { mi =>
      val sliced = df.select(slice(col(vecCol).cast("array<double>"),
        mi * sub + 1, sub).as("_sv"))
      Similarity.kmeansCentroids(sliced, "_sv", sub, k, iters, seed + mi)
    }.toArray
  }

  /** Per-subspace code columns (max-dot cell of the sliced vector). */
  def codeCols(vec: Column, cbs: Array[Array[Array[Double]]]): Seq[Column] = {
    val sub = cbs(0)(0).length
    cbs.zipWithIndex.map { case (cb, mi) =>
      Similarity.centroidCell(
        slice(vec.cast("array<double>"), mi * sub + 1, sub), cb)
        .as(s"code$mi")
    }.toSeq
  }

  /** The encoded table: (id, code0..code{m−1}) — the entire stored
    * index; original vectors are no longer needed at query time.
    */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             cbs: Array[Array[Array[Double]]]): DataFrame =
    df.select(col(idCol) +: codeCols(col(vecCol), cbs): _*)

  /** IVF-PQ: the standard billion-scale ANN layout. Candidates carry a
    * coarse Voronoi cell (trained 64-dim centroids) plus their m PQ
    * codes; a query scans ONLY its own cell's posting list, ranked by
    * ADC. At 100 TB the index table is (id, cell, m codes) —
    * cell-partitioned parquet a query reads one partition of, with the
    * original vectors nowhere in the hot path.
    */
  def ivfAdcTopK(candidates: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, cells: Array[Array[Double]],
                 cbs: Array[Array[Array[Double]]], k: Int): DataFrame =
    ivfAdcTopKFromIndex(
      candidates.select(
        col(idCol).as("n_id") +:
          Similarity.centroidCell(col(vecCol), cells).as("cell") +:
          codeCols(col(vecCol), cbs): _*),
      queries, idCol, vecCol, cells, cbs, k)

  /** The query path against a PERSISTED index table (n_id, cell,
    * code0..m−1) — original candidate vectors appear NOWHERE: the
    * reloaded index plus the (tiny, literal) quantizers serve every
    * query. This is PQ's whole production promise: the 16×-smaller
    * table is all a serving node ever reads.
    */
  def ivfAdcTopKFromIndex(index: DataFrame, queries: DataFrame,
                          idCol: String, vecCol: String,
                          cells: Array[Array[Double]],
                          cbs: Array[Array[Array[Double]]],
                          k: Int): DataFrame = {
    val sub = cbs(0)(0).length
    val q = queries.select(col(idCol).as("q_id"),
      Similarity.centroidCell(col(vecCol), cells).as("cell"),
      col(vecCol).cast("array<double>").as("q_vec"))
    val adc = cbs.zipWithIndex.map { case (cb, mi) =>
      Similarity.dot(
        slice(col("q_vec"), mi * sub + 1, sub),
        element_at(typedLit(cb.map(_.toSeq).toSeq), col(s"code$mi") + 1))
    }.reduce(_ + _)
    val scored = index.join(broadcast(q), Seq("cell"))
      .where(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), round(adc, 6).as("adc"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("adc").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** ADC top-k: approximate dot(query, candidate) = Σ_mi
    * dot(q[subspace mi], codebook_mi[code_mi]), rounded to 6 decimals
    * BEFORE ranking (the cross-engine ordering contract), ties by id.
    */
  def adcTopK(candidates: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, cbs: Array[Array[Array[Double]]],
              k: Int): DataFrame = {
    val sub = cbs(0)(0).length
    val enc = encode(candidates, idCol, vecCol, cbs)
      .withColumnRenamed(idCol, "n_id")
    val q = queries.select(col(idCol).as("q_id"),
      col(vecCol).cast("array<double>").as("q_vec"))
    val adc = cbs.zipWithIndex.map { case (cb, mi) =>
      Similarity.dot(
        slice(col("q_vec"), mi * sub + 1, sub),
        element_at(typedLit(cb.map(_.toSeq).toSeq), col(s"code$mi") + 1))
    }.reduce(_ + _)
    val scored = enc.crossJoin(broadcast(q))
      .where(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), round(adc, 6).as("adc"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("adc").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }
}
