package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two tiers, mirroring how ANN is actually deployed:
  *  - brute-force cosine top-k: the exact baseline. The query set is
  *    broadcast (it is small by definition), so the "cross join" is a
  *    map-side nested loop over the candidate scan — linear in corpus
  *    size, no shuffle of the big side; the only exchange is the final
  *    per-query top-k aggregation.
  *  - partitioned (IVF-style) top-k: candidates are pruned to the query's
  *    cluster/bucket before scoring — the join on the cluster id replaces
  *    the full scan, which is the step that makes 100 TB tractable.
  *
  * Dot products fold sequentially over the array (`aggregate`), in
  * ascending index order, after a single cast to double — deterministic
  * and reproducible by the oracle.
  */
object Similarity {

  /** Sequential-fold dot product of two double-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two `array<float>` columns (cast once). */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  /** Maximal-marginal-relevance re-ranking (Carbonell–Goldstein): from a
    * TOP-K CANDIDATE set (already retrieved — ≤ tens of rows by
    * contract), greedily pick `k` items maximizing
    * `lambda·rel − mu·max_{s∈selected} sim(item, s)` — the diversity
    * re-rank a RAG stack runs after ANN retrieval so near-duplicate
    * passages don't crowd the context window.
    *
    * `mu` is an EXPLICIT literal rather than 1−lambda: 1−0.7 in IEEE
    * doubles is 0.30000000000000004 while an oracle writing `0.3` parses
    * a different constant — the same both-engines-share-the-literal
    * discipline as the Benford table. Pairwise candidate cosines are
    * computed distributedly (k² rows, 6-dp rounded like every sim_*
    * score); only the ≤k² score matrix ever reaches the driver — the
    * tiny-bounds collect posture (BPE best-pair, k-means centroids).
    * Ties break on the lower id at every pick.
    * @return (rank 1..k, n_id, rel)
    */
  def mmrRerank(cands: DataFrame, idCol: String, vecCol: String,
                relCol: String, k: Int, lambda: Double, mu: Double)
      : DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val spark = cands.sparkSession
    import spark.implicits._
    val c = cands.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("v"), col(relCol).cast("double").as("rel"))
    val sims = c.as("a").join(c.as("b"), col("a.id") =!= col("b.id"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        round(cosine(col("a.v"), col("b.v")), 6).as("sim"))
      .as[(Long, Long, Double)].collect()
      .map { case (i, j, s0) => (i, j) -> s0 }.toMap
    val rels = c.select(col("id"), col("rel")).as[(Long, Double)]
      .collect().toMap
    var selected = Vector.empty[Long]
    while (selected.size < math.min(k, rels.size)) {
      val best = rels.keysIterator.filterNot(selected.contains)
        .map { id =>
          val pen = if (selected.isEmpty) 0.0
                    else selected.iterator.map(s => sims((id, s))).max
          (-(lambda * rels(id) - mu * pen), id)
        }.min
      selected :+= best._2
    }
    selected.zipWithIndex
      .map { case (id, ix) => (ix + 1L, id, rels(id)) }
      .toDF("rank", "n_id", "rel")
  }

  /** Exact brute-force cosine top-k: for every query row, the k most
    * similar candidate rows (self-matches excluded). `queries` must be
    * small — it is broadcast.
    *
    * Output: (q_id, n_id, cos, rank), rank 1..k per query, ties broken by
    * candidate id. `cos` is rounded to 6 decimals BEFORE ranking so the
    * ordering itself is reproducible across engines.
    */
  def bruteForceTopK(candidates: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     scorer: (Column, Column) => Column = cosine): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val c = candidates.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        round(scorer(col("q_vec"), col("n_vec")), 6).as("cos"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Deterministic random-projection hyperplanes for sign-bit LSH: `nBits`
    * gaussian vectors of `dim` components from a seeded java.util.Random
    * (spec-fixed LCG + Marsaglia polar — identical on any JVM, and the
    * constants embed in oracle SQL for cross-engine replay).
    */
  def lshPlanes(dim: Int, nBits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit random-projection LSH bucket of an embedding: bit i is
    * whether dot(vec, plane_i) ≥ 0. A per-row projection (the planes are
    * plan literals) — the bucket computation itself never shuffles. With
    * `nBits` bits, expected bucket width is N / 2^nBits: the knob that
    * bounds Σ|bucket|² for [[partitionedTopK]] / [[cosineNearDupPairs]].
    */
  def projectionBucket(vec: Column, planes: Array[Array[Double]]): Column =
    graft.functions.NativeFunctions.projectionBits(vec, planes)

  /** Deterministic IVF "coarse quantizer" centroids: seeded gaussian
    * vectors (same spec-fixed generator as [[lshPlanes]]). A production
    * deployment would train these with k-means over a sample; seeded
    * random centroids keep the cell assignment replayable in oracle SQL
    * while exercising the identical plan shape.
    */
  def ivfCentroids(dim: Int, k: Int, seed: Long): Array[Array[Double]] =
    lshPlanes(dim, k, seed)

  /** IVF cell id: index of the centroid with the highest dot product
    * (ties → lowest index — the same first-match rule the oracle's
    * row_number replay uses). Per-row projection over literal centroids:
    * computing the cell never shuffles, exactly like [[projectionBucket]].
    *
    * Native codegen expression ([[graft.functions.CentroidCell]]) since
    * r7: the declarative greatest/CASE-over-HOF form evaluated every
    * dot product ~3× through interpreted lambdas and made assignment the
    * entire cost of the trained-quantizer family (VERDICT r6). Same
    * arithmetic (sequential double fold, float widened per element), so
    * results are bit-identical.
    */
  def centroidCell(vec: Column, centroids: Array[Array[Double]]): Column =
    graft.functions.NativeFunctions.centroidCell(vec, centroids)

  /** IVF multi-probe cell set: the query's nearest centroid cell plus the
    * runner-up — the recall knob on the Voronoi path, mirroring what
    * [[probeBuckets]] does for sign-bit LSH. A Voronoi boundary is exactly
    * where a true neighbor lands in the adjacent cell; probing the
    * 2nd-nearest cell recovers those misses without re-assigning the
    * stored corpus. Per-row projection over literal centroids, like
    * [[centroidCell]].
    */
  def ivfProbeCells(vec: Column, centroids: Array[Array[Double]]): Column =
    graft.functions.NativeFunctions.centroidProbeCells(vec, centroids)

  /** Embedding-cosine near-duplicate pairs: all (a, b) with
    * cosine ≥ threshold, compared only WITHIN a blocking column (cluster
    * id / LSH bucket) — never all-pairs. The self-join shuffles both sides
    * on the block key once; each block's pair enumeration is local to its
    * partition, so cost is Σ |block|² rather than N². At 100 TB the block
    * key is a coarse quantization (e.g. sign-bits of a random projection),
    * exactly the IVF/LSH recipe; recall is tuned by probing neighboring
    * blocks, not by widening to a full cross join.
    *
    * `cos` is rounded to 6 decimals BEFORE thresholding so the kept set is
    * reproducible across engines.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         blockCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(blockCol), col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(blockCol), col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, Seq(blockCol))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("va"), col("vb")), 6).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Multi-probe bucket set for sign-bit LSH: the query's own bucket plus
    * every bucket at Hamming distance 1 (one flipped bit) — the standard
    * recall/cost knob: probing `nBits + 1` of the `2^nBits` buckets
    * recovers neighbors that fell just across one hyperplane.
    */
  def probeBuckets(bucket: Column, nBits: Int): Column = {
    val flips = (1 to nBits).map { i =>
      concat(
        substring(bucket, 1, i - 1),
        when(substring(bucket, i, 1) === "1", lit("0")).otherwise(lit("1")),
        substring(bucket, i + 1, nBits - i))
    }
    array((bucket +: flips).toIndexedSeq: _*)
  }

  /** LSH top-k with 1-bit multi-probe: the (small, broadcast) query side
    * explodes to its probe buckets, candidates join on their single home
    * bucket — buckets partition the corpus, so each (query, candidate)
    * pair arises at most once and needs no dedup before ranking. Same
    * shuffle shape as [[partitionedTopK]], ×(nBits+1) broadcast rows.
    */
  def multiProbeTopK(candidates: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, bucketCol: String,
                     nBits: Int, k: Int): DataFrame = {
    // Per-row norms before the join, as in [[partitionedTopK]].
    val q = queries.select(col(idCol).as("q_id"),
      col(vecCol).cast("array<double>").as("q_vec"),
      explode(probeBuckets(col(bucketCol), nBits)).as(bucketCol))
      .withColumn("q_norm", norm(col("q_vec")))
    val c = candidates.select(col(idCol).as("n_id"),
      col(vecCol).cast("array<double>").as("n_vec"), col(bucketCol))
      .withColumn("n_norm", norm(col("n_vec")))
    val scored = c.join(broadcast(q), Seq(bucketCol))
      .where(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        round(dot(col("q_vec"), col("n_vec")) /
          (col("q_norm") * col("n_norm")), 6).as("cos"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** IVF-style pruned top-k: score only candidates sharing the query's
    * partition (cluster id / LSH bucket). The equi-join on the partition
    * column is the pruning step — at scale it turns a full corpus scan
    * per query into a bucket scan per query.
    */
  def partitionedTopK(candidates: DataFrame, queries: DataFrame,
                      idCol: String, vecCol: String, partCol: String,
                      k: Int): DataFrame = {
    // Norms are computed ONCE per row in the projections, not per
    // candidate pair: a corpus row's norm would otherwise be re-folded
    // for every query sharing its bucket. Same expression tree as the
    // fused `cosine` (sqrt of the self-dot), so results are bit-identical.
    val q = queries.select(col(idCol).as("q_id"),
      col(vecCol).cast("array<double>").as("q_vec"), col(partCol))
      .withColumn("q_norm", norm(col("q_vec")))
    val c = candidates.select(col(idCol).as("n_id"),
      col(vecCol).cast("array<double>").as("n_vec"), col(partCol))
      .withColumn("n_norm", norm(col("n_vec")))
    val scored = c.join(broadcast(q), Seq(partCol))
      .where(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        round(dot(col("q_vec"), col("n_vec")) /
          (col("q_norm") * col("n_norm")), 6).as("cos"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Identity "hyperplanes" for 1-bit-per-dimension binary quantization:
    * plane i is the i-th basis vector, so [[projectionBucket]]'s sign-bit
    * code over them is exactly the per-dimension sign bits of the vector —
    * the BQ code — computed by the SAME native codegen expression the LSH
    * bucket uses (one fused pass, no per-dim interpreted lambdas).
    */
  def signBitPlanes(dim: Int): Array[Array[Double]] =
    Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)

  /** BINARY-QUANTIZATION two-tier top-k: tier 1 ranks the corpus by
    * Hamming distance between 1-bit-per-dimension sign codes (the 32×
    * memory-compressed representation a production vector store keeps
    * resident — for 64-dim floats, 64 bits vs 256 bytes); tier 2 fetches
    * ONLY the `cTop` Hamming survivors' float vectors and re-ranks them
    * by exact cosine. The plan mirrors the deployment: the code tier
    * scans codes + ids alone (vectors never enter the scored scan or the
    * per-query window), then the candidate id list — Q·cTop rows, small
    * by construction — broadcasts back against the corpus for the vector
    * fetch, so full vectors are read for candidates only. Sign-bit
    * Hamming approximates angular distance (the [[projectionBucket]]
    * hyperplane argument, with one plane per axis), so recall at
    * cTop ≫ k is high while the scan cost per row drops to a 64-bit
    * code compare ([[graft.functions.HammingDistance]], codegen'd).
    *
    * `ham` rides along in the output (the code-tier distance of each
    * survivor); ranking ties break on candidate id at both tiers, and
    * `cos` is rounded to 6 decimals BEFORE ranking, as everywhere.
    */
  def binaryQuantTopK(candidates: DataFrame, queries: DataFrame,
                      idCol: String, vecCol: String, dim: Int,
                      cTop: Int, k: Int): DataFrame = {
    val planes = signBitPlanes(dim)
    val cc = candidates.select(col(idCol).as("n_id"),
      projectionBucket(col(vecCol), planes).as("n_code"))
    binaryQuantTopKFromCodes(candidates, cc, queries, idCol, vecCol, dim,
      cTop, k)
  }

  /** [[binaryQuantTopK]] with the corpus code table supplied instead of
    * recomputed — the PERSISTED-INDEX query path: `codes` (n_id, n_code)
    * is the 1-bit/dim tier a serving node keeps resident (typically a
    * parquet lake artifact built once by an indexing job), so a query
    * encodes only ITS OWN vectors and never re-scans the corpus floats
    * until the tier-2 fetch. Must return exactly what the inline form
    * returns over the same corpus — the two share their oracle.
    */
  def binaryQuantTopKFromCodes(candidates: DataFrame, codes: DataFrame,
                               queries: DataFrame, idCol: String,
                               vecCol: String, dim: Int,
                               cTop: Int, k: Int): DataFrame = {
    val planes = signBitPlanes(dim)
    val qc = queries.select(col(idCol).as("q_id"),
      projectionBucket(col(vecCol), planes).as("q_code"))
    val cc = codes.select(col("n_id"), col("n_code"))
    val ham = cc.crossJoin(broadcast(qc))
      .where(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        graft.functions.NativeFunctions
          .hammingDist(col("q_code"), col("n_code")).as("ham"))
    val wH = Window.partitionBy(col("q_id"))
      .orderBy(col("ham"), col("n_id"))
    val cand = ham.withColumn("crank", row_number().over(wH))
      .where(col("crank") <= cTop)
      .select(col("q_id"), col("n_id"), col("ham"))
    bqExactRerank(candidates, queries, idCol, vecCol, cand, k)
  }

  /** Tier-2 exact-cosine rerank shared by the binary-quantization
    * funnels: fetch float vectors for the tier-1 survivors in `cand`
    * (q_id, n_id, ham) ONLY — the candidate list broadcasts back against
    * the corpus, so full vectors are read for candidates alone — then
    * rank by exact cosine (rounded to 6 decimals BEFORE ranking, ties on
    * candidate id). Norms staged per row, as in [[partitionedTopK]].
    */
  private def bqExactRerank(candidates: DataFrame, queries: DataFrame,
                            idCol: String, vecCol: String,
                            cand: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"),
      col(vecCol).cast("array<double>").as("q_vec"))
      .withColumn("q_norm", norm(col("q_vec")))
    val c = candidates.select(col(idCol).as("n_id"),
      col(vecCol).cast("array<double>").as("n_vec"))
      .withColumn("n_norm", norm(col("n_vec")))
    val rer = c.join(broadcast(cand), Seq("n_id"))
      .join(broadcast(q), Seq("q_id"))
      .select(col("q_id"), col("n_id"), col("ham"),
        round(dot(col("q_vec"), col("n_vec")) /
          (col("q_norm") * col("n_norm")), 6).as("cos"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    rer.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** IVF × BINARY-QUANTIZATION composed two-tier top-k — the production
    * ANN recipe at 100 TB: the coarse quantizer prunes FIRST (each
    * corpus row lives in its nearest-centroid cell; the query probes its
    * own cell plus the runner-up, [[ivfProbeCells]]), then tier 1 ranks
    * ONLY the probed cells' rows by native Hamming over 1-bit/dim sign
    * codes, and tier 2 fetches float vectors for the `cTop` survivors
    * alone. Composition multiplies the savings: the cell equi-join cuts
    * the scanned fraction to ~(probes/k_cells) of the corpus, and within
    * the probed cells the scan touches the 32×-compressed codes, not the
    * vectors. Each (query, candidate) pair arises at most once — cells
    * partition the corpus and a query's probe cells are distinct — so no
    * dedup precedes the tier-1 window (the [[multiProbeTopK]] argument).
    */
  def ivfBinaryQuantTopK(candidates: DataFrame, queries: DataFrame,
                         idCol: String, vecCol: String,
                         cents: Array[Array[Double]], dim: Int,
                         cTop: Int, k: Int): DataFrame = {
    val planes = signBitPlanes(dim)
    val cc = candidates.select(col(idCol).as("n_id"),
      centroidCell(col(vecCol), cents).as("cell"),
      projectionBucket(col(vecCol), planes).as("n_code"))
    ivfBinaryQuantTopKFromIndex(candidates, cc, queries, idCol, vecCol,
      cents, dim, cTop, k)
  }

  /** [[ivfBinaryQuantTopK]] with BOTH pruning tiers supplied as one
    * prebuilt index table instead of recomputed — the PERSISTED composed
    * index: `index` (n_id, cell, n_code) carries the coarse-quantizer
    * cell AND the 1-bit/dim sign code per corpus row (one lake artifact,
    * built once by an indexing job), so the query path encodes and
    * cell-assigns only ITS OWN vectors, equi-joins the probe cells
    * against the index, Hamming-ranks inside them, and touches corpus
    * floats only at the tier-2 candidate fetch. Must return exactly what
    * the inline form returns over the same corpus — the two share their
    * oracle (the sim_topk_ivf_persist / sim_topk_bq_persist contract,
    * applied to the composition).
    */
  def ivfBinaryQuantTopKFromIndex(candidates: DataFrame, index: DataFrame,
                                  queries: DataFrame, idCol: String,
                                  vecCol: String,
                                  cents: Array[Array[Double]], dim: Int,
                                  cTop: Int, k: Int): DataFrame = {
    val planes = signBitPlanes(dim)
    val qc = queries.select(col(idCol).as("q_id"),
      projectionBucket(col(vecCol), planes).as("q_code"),
      explode(ivfProbeCells(col(vecCol), cents)).as("cell"))
    val cc = index.select(col("n_id"), col("n_code"), col("cell"))
    val ham = cc.join(broadcast(qc), Seq("cell"))
      .where(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        graft.functions.NativeFunctions
          .hammingDist(col("q_code"), col("n_code")).as("ham"))
    val wH = Window.partitionBy(col("q_id"))
      .orderBy(col("ham"), col("n_id"))
    val cand = ham.withColumn("crank", row_number().over(wH))
      .where(col("crank") <= cTop)
      .select(col("q_id"), col("n_id"), col("ham"))
    bqExactRerank(candidates, queries, idCol, vecCol, cand, k)
  }

  /** TRAINED IVF coarse quantizer: Lloyd k-means over the embedding
    * column, [[ivfCentroids]]-seeded. Each iteration is one distributed
    * aggregate — assign every vector to its nearest centroid (max dot,
    * ties → lowest index, the [[centroidCell]] rule), then recompute each
    * cell's mean; only the k×dim means ever reach the driver. Cells that
    * lose all members keep their previous centroid.
    *
    * Determinism (so an oracle can replay training from the raw parquet):
    * per-component means are an EXACT decimal sum cast to double, divided
    * by the count — order-independent, identical on any engine — and a
    * binary double can never sit exactly on a decimal(…,12) rounding
    * half-tie (that needs a 5^12 denominator), so the decimal cast is
    * rounding-mode-proof.
    *
    * At 100 TB train on a sampled subset (`df.sample` upstream) — k-means
    * quality needs ~O(k·dim) effective samples, not the corpus; the
    * assignment scan that follows is the part that must (and does) stay
    * full-corpus and distributed.
    */
  def kmeansCentroids(df: DataFrame, vecCol: String, dim: Int, k: Int,
                      iters: Int, seed: Long): Array[Array[Double]] = {
    // Stage the training set ONCE: every Lloyd iteration re-reads it,
    // and left lazy each iteration re-runs the full upstream lineage
    // (parquet scan + cast + slice for the PQ subspace callers) — the
    // same loop-input rule as pagerankWeightedInt (SCALE.md r6). At
    // 100 TB this is "materialize the training sample", which is how
    // k-means training is run anyway.
    val v = df.localCheckpoint()
    var cents = ivfCentroids(dim, k, seed)
    for (_ <- 1 to iters) {
      val rows = v
        .select(centroidCell(col(vecCol), cents).as("cell"),
          posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg((sum(col("x").cast("decimal(25,12)")).cast("double") /
          count(lit(1))).as("m"))
        .collect()
      val next = cents.map(_.clone())
      rows.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      // Spherical k-means step: cell assignment is max-DOT, so centroids
      // must be unit-norm or high-norm cells swallow the space; for a
      // cosine index the spherical variant is the standard. The norm
      // folds left-to-right like the oracle's unnest-sum.
      cents = next.map { m =>
        val n = math.sqrt(m.map(x => x * x).sum)
        if (n == 0.0) m else m.map(_ / n)
      }
    }
    cents
  }
}
