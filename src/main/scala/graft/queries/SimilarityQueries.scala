package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.NativeFunctions
import graft.operators.{Dedup, Pq, Similarity}
import graft.sources.Tables

/** Similarity-search queries over `embeddings.parquet` (500×64-dim float
  * vectors): brute-force cosine top-k as the exact baseline and the
  * label-partitioned (IVF-style) pruned variant as the scale path.
  */
object SimilarityQueries {
  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "embeddings")

  private val PqM = 4
  private val PqSub = 16
  private val PqK = 8
  private val PqIters = 2
  private val PqSeed = 11L

  /** Oracle-side training source for the shared coarse quantizer: the
    * deterministic 50% sample (`vec_id % 2 = 0` — replayable in any
    * engine, unlike `df.sample`'s RNG). Training on a bounded subset is
    * the 100 TB posture ([[Similarity.kmeansCentroids]] doc, SCALE.md);
    * the final assignment always scans the FULL corpus.
    */
  private val TrainSrc = "(SELECT * FROM v WHERE vec_id % 2 = 0)"

  /** The trained k=8/iters=2/seed=7 coarse quantizer, staged ONCE per
    * (JVM, sf-dir) and shared across the whole trained-quantizer family
    * (cell balance, diversity sample, kNN join/purity, IVF/IVF-PQ
    * variants) — the sim_topk_ivf_persist pattern applied in-process:
    * training is deterministic, so cache-hit ≡ retrain, and re-running
    * the same 2 Lloyd iterations per consuming query was 24% of the r6
    * bench (VERDICT r6). Trains on the deterministic 50% sample the
    * oracle replays via [[TrainSrc]].
    */
  private val trainedCache =
    scala.collection.concurrent.TrieMap.empty[String, Array[Array[Double]]]
  private def trainedCells(s: SparkSession, d: String): Array[Array[Double]] =
    trainedCache.getOrElseUpdate(new java.io.File(d).getCanonicalPath,
      Similarity.kmeansCentroids(
        emb(s, d).where(col("vec_id") % 2 === 0), "embedding",
        dim = 64, k = 8, iters = 2, seed = 7L))

  /** The m=4 PQ codebooks (seed 11), staged once per (JVM, sf-dir) like
    * [[trainedCells]] — every ADC consumer shares one training.
    */
  private val pqCache = scala.collection.concurrent.TrieMap
    .empty[String, Array[Array[Array[Double]]]]
  private def pqCodebooks(s: SparkSession, d: String)
      : Array[Array[Array[Double]]] =
    pqCache.getOrElseUpdate(new java.io.File(d).getCanonicalPath,
      Pq.codebooks(emb(s, d), "embedding", dim = 64, m = PqM, k = PqK,
        iters = PqIters, seed = PqSeed))

  /** Staging dir for a persisted-index lake artifact: collision-free
    * path-keyed naming + pid isolation + shutdown cleanup via
    * [[Tables.scratchDir]] (ADVICE r8 — the previous `d.hashCode` key
    * could collide and left index tables littering /tmp).
    */
  private def stagedIndexDir(tag: String, d: String): String =
    Tables.scratchDir(s"graft_${tag}_idx", d)

  /** nDCG discount weights floor(1e6/log2(i+1)) for ranks 1..10, pinned
    * as integer micro-units so no engine evaluates a logarithm
    * (dq_benford's shared-literal discipline), and their prefix sums
    * (the ideal-DCG table indexed by min(10, n_relevant)).
    */
  private[queries] val NdcgW: Seq[Long] = Seq(
    1000000L, 630930L, 500000L, 430677L, 386853L,
    356207L, 333333L, 315465L, 301030L, 289065L)
  private[queries] val NdcgC: Seq[Long] =
    NdcgW.scanLeft(0L)(_ + _).tail

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Product quantization ANN: 64 floats → 4 codes (per-subspace trained
    // codebooks); candidates ranked by the asymmetric-distance sum of
    // subspace LUT dots. Oracle replays the 4 k-means trainings, the
    // encoding, and the ADC ranking from raw parquet.
    "sim_topk_pq" -> ((s, d) => {
      val v = emb(s, d)
      val cbs = pqCodebooks(s, d)
      Pq.adcTopK(v, v.where(col("vec_id") < 5), "vec_id", "embedding",
          cbs, k = 5)
        .orderBy(col("q_id"), col("rank"))
    }),

    // PQ recall calibration: ADC top-10 overlap against the float-cosine
    // brute top-10 per query — what 16× vector compression costs, both
    // rankings exactly replayed.
    "sim_recall_pq" -> ((s, d) => {
      val v = emb(s, d)
      val cbs = pqCodebooks(s, d)
      val pq = Pq.adcTopK(v, v.where(col("vec_id") < 5), "vec_id",
        "embedding", cbs, k = 10).select(col("q_id"), col("n_id"))
      val br = Similarity.bruteForceTopK(v, v.where(col("vec_id") < 5),
        "vec_id", "embedding", k = 10).select(col("q_id"), col("n_id"))
      pq.join(br, Seq("q_id", "n_id"))
        .groupBy(col("q_id")).agg(count(lit(1)).as("n_overlap"))
        .orderBy(col("q_id"))
    }),

    "sim_topk_brute" -> ((s, d) => {
      val v = emb(s, d)
      Similarity.bruteForceTopK(v, v.where(col("vec_id") < 5),
        "vec_id", "embedding", k = 10)
        .orderBy(col("q_id"), col("rank"))
    }),

    // RANGE (radius) search: every neighbor with cosine ≥ 0.25 of each
    // query — the "all sufficiently similar" retrieval face top-k can't
    // express (dedup candidates, recall-oriented retrieval, near-match
    // audits). Unlike top-k there is NO per-query window at all: the
    // threshold is a plain filter on the scored scan, so the plan is
    // one broadcast-queries pass over the candidates with the predicate
    // fused into the projection — embarrassingly parallel at any corpus
    // size, and the LSH/IVF bucketing of the sim_topk_* family prunes
    // the same scan when the corpus outgrows brute force. Scores are
    // round-6 like every cosine here (absorbs the last-ulp drift of the
    // two engines' sequential float sums).
    "sim_range_search" -> ((s, d) => {
      val v = emb(s, d)
      val q = v.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      v.select(col("vec_id").as("n_id"), col("embedding").as("n_vec"))
        .crossJoin(broadcast(q))
        .where(col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"),
          round(Similarity.cosine(col("q_vec"), col("n_vec")), 6)
            .as("cos"))
        .where(col("cos") >= 0.25)
        .orderBy(col("q_id"), col("cos").desc, col("n_id"))
    }),

    // MMR diversity re-rank: top-20 cosine candidates for query vec 0,
    // greedily re-ranked by λ·rel − μ·max-sim-to-selected (λ=0.7,
    // μ=0.3 as an EXPLICIT shared literal — 1−0.7 is a different
    // double than 0.3). The RAG post-retrieval step; candidate set and
    // k² sim matrix are tiny by construction (see mmrRerank scaladoc).
    "sim_mmr_rerank" -> ((s, d) => {
      val v = emb(s, d)
      val q = v.where(col("vec_id") === 0)
        .select(col("embedding").as("q_vec"))
      val cands = v.where(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id").as("n_id"), col("embedding"),
          round(Similarity.cosine(col("q_vec"), col("embedding")), 6)
            .as("rel"))
        .orderBy(col("rel").desc, col("n_id")).limit(20)
      Similarity.mmrRerank(cands, "n_id", "embedding", "rel",
          k = 5, lambda = 0.7, mu = 0.3)
        .orderBy(col("rank"))
    }),

    // Hard-negative mining — the contrastive-training companion of
    // top-k retrieval: for each query, the 5 MOST-similar vectors with
    // a DIFFERENT label (near-misses a trainer should push apart).
    // Same broadcast-query brute scorer as sim_topk_brute with the
    // label disequality in the join predicate, so candidates prune
    // BEFORE scoring; at scale the candidate side swaps to the IVF
    // bucket path like every other sim_* query.
    "sim_hard_negatives" -> ((s, d) => {
      val v = emb(s, d)
      val q = v.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
          col("label").as("q_label"))
      val c = v.select(col("vec_id").as("n_id"),
        col("embedding").as("n_vec"), col("label").as("n_label"))
      val scored = c.crossJoin(broadcast(q))
        .where(col("n_label") =!= col("q_label"))
        .select(col("q_id"), col("n_id"),
          round(Similarity.cosine(col("q_vec"), col("n_vec")), 6)
            .as("cos"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= 5)
        .orderBy(col("q_id"), col("rank"))
    }),

    // Retrieval EVALUATION harness — the measurement beside the
    // retrieval operators: for each of 20 query vectors, rank every
    // other vector by exact cosine (round 6, ties to lower id — the
    // sim_topk_brute ranking) and report the rank of the first
    // SAME-LABEL hit (the MRR numerator, exact integer), hits@10, and
    // the reciprocal rank (ONE exact int division — the only float).
    // The per-query rows ARE the eval sheet; mean-ing them into MRR is
    // one trivial aggregate the caller owns. Scale shape: same
    // broadcast-query brute scorer as sim_hard_negatives — at corpus
    // scale the candidate side swaps to the IVF bucket path and the
    // harness is unchanged.
    "sim_mrr_label" -> ((s, d) => {
      val v = emb(s, d)
      val q = v.where(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
          col("label").as("q_label"))
      val c = v.select(col("vec_id").as("n_id"),
        col("embedding").as("n_vec"), col("label").as("n_label"))
      val scored = c.crossJoin(broadcast(q))
        .where(col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("q_label"), col("n_id"),
          col("n_label"),
          round(Similarity.cosine(col("q_vec"), col("n_vec")), 6)
            .as("cos"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .groupBy(col("q_id"), col("q_label"))
        .agg(min(when(col("n_label") === col("q_label"), col("rank")))
            .as("first_rel_rank"),
          sum(when(col("n_label") === col("q_label") &&
            col("rank") <= 10, 1L).otherwise(0L)).as("n_rel_top10"))
        .withColumn("rr", lit(1.0) / col("first_rel_rank"))
        .orderBy(col("q_id"))
    }),

    // nDCG@10 over the same labeled ranking — the graded companion of
    // sim_mrr_label. The discount weights 1/log2(i+1) are pinned as
    // INTEGER micro-units (no engine evaluates a log), so DCG and the
    // ideal DCG are exact BIGINT sums and nDCG is ONE division,
    // rounded at 6dp — bit-stable across engines. IDCG = the prefix
    // sum of the first min(10, n_relevant) weights, also a pinned
    // literal table indexed by the relevant count.
    "sim_ndcg_label" -> ((s, d) => {
      val v = emb(s, d)
      val q = v.where(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
          col("label").as("q_label"))
      val c = v.select(col("vec_id").as("n_id"),
        col("embedding").as("n_vec"), col("label").as("n_label"))
      val scored = c.crossJoin(broadcast(q))
        .where(col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("q_label"), col("n_id"),
          col("n_label"),
          round(Similarity.cosine(col("q_vec"), col("n_vec")), 6)
            .as("cos"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
      val wLit = array(NdcgW.map(x => lit(x)): _*)
      val cLit = array(NdcgC.map(x => lit(x)): _*)
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .groupBy(col("q_id"), col("q_label"))
        .agg(
          sum(when(col("n_label") === col("q_label") &&
            col("rank") <= 10,
            element_at(wLit, col("rank").cast("int")))
            .otherwise(0L)).as("dcg_int"),
          sum(when(col("n_label") === col("q_label"), 1L)
            .otherwise(0L)).as("n_rel"))
        .withColumn("idcg_int",
          element_at(cLit, least(col("n_rel"), lit(10L)).cast("int")))
        .withColumn("ndcg",
          round(col("dcg_int").cast("double") / col("idcg_int"), 6))
        .select(col("q_id"), col("q_label"), col("n_rel"),
          col("dcg_int"), col("idcg_int"), col("ndcg"))
        .orderBy(col("q_id"))
    }),

    // Embedding-space drift gate: cosine between the two corpus halves'
    // centroid vectors — count denominators cancel, so the statistic is
    // three exact integer sums over floor(x·4096) quantized per-dim
    // totals, then one sqrt·sqrt division. 1.0 = no semantic shift.
    "dq_drift_embedding" -> ((s, d) => {
      val v = emb(s, d)
      graft.operators.Drift.embeddingCentroidDrift(
        v.where(col("vec_id") % 2 === 0),
        v.where(col("vec_id") % 2 === 1), "embedding")
    }),

    // IVF-PQ index PERSISTENCE: build (id, cell, codes) + quantizer
    // tables once as parquet; the query path reloads them and NEVER
    // touches a candidate vector — the 16×-smaller index table is all
    // a serving node reads. Shares the train-inline oracle: persisted
    // and inline answers must agree exactly.
    "sim_topk_ivfpq_persist" -> ((s, d) => {
      val idx = stagedIndexDir("ivfpq", d)
      val v0 = emb(s, d)
      val cells = trainedCells(s, d)
      val cbs = pqCodebooks(s, d)
      // One-time build: code/cell assignments (vectors NOT stored) +
      // both quantizers as tiny tables.
      v0.select(col("vec_id").as("n_id") +:
          Similarity.centroidCell(col("embedding"), cells).as("cell") +:
          Pq.codeCols(col("embedding"), cbs): _*)
        .write.mode("overwrite").parquet(s"$idx/assign")
      import s.implicits._
      cells.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }
        .toDF("cell", "centroid")
        .write.mode("overwrite").parquet(s"$idx/cells")
      cbs.zipWithIndex.toSeq.flatMap { case (cb, mi) =>
        cb.zipWithIndex.map { case (c, ci) => (mi, ci, c.toSeq) }
      }.toDF("m", "code", "centroid")
        .write.mode("overwrite").parquet(s"$idx/codebooks")
      // Query path: reload quantizers (k·d doubles) + the index table.
      val rCells = s.read.parquet(s"$idx/cells")
        .orderBy(col("cell")).collect()
        .map(_.getSeq[Double](1).toArray)
      val rCbs = s.read.parquet(s"$idx/codebooks")
        .collect().groupBy(_.getInt(0)).toSeq.sortBy(_._1)
        .map(_._2.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray))
        .toArray
      Pq.ivfAdcTopKFromIndex(s.read.parquet(s"$idx/assign"),
          v0.where(col("vec_id") < 5), "vec_id", "embedding",
          rCells, rCbs, k = 5)
        .orderBy(col("q_id"), col("rank"))
    }),

    // IVF-PQ (the standard billion-scale composition): trained Voronoi
    // cells prune the scan to the query's posting list; PQ codes replace
    // the vectors inside it. Same trained quantizers as
    // sim_topk_ivf_trained (seed 7) and sim_topk_pq (seed 11).
    "sim_topk_ivfpq" -> ((s, d) => {
      val v = emb(s, d)
      val cells = trainedCells(s, d)
      val cbs = pqCodebooks(s, d)
      Pq.ivfAdcTopK(v, v.where(col("vec_id") < 5), "vec_id", "embedding",
          cells, cbs, k = 5)
        .orderBy(col("q_id"), col("rank"))
    }),
    "sim_topk_ivf" -> ((s, d) => {
      val v = emb(s, d)
      Similarity.partitionedTopK(v, v.where(col("vec_id") < 5),
        "vec_id", "embedding", "label", k = 5)
        .orderBy(col("q_id"), col("rank"))
    }),
    // Int8 vector quantization: per-vector symmetric scale (127/max|x|),
    // verified via the quantized norm² — exact integer arithmetic — and
    // the 6dp-rounded scale. The compression pass an embedding store
    // runs before an ANN index ships; per-row projection, zero shuffle.
    "sim_quantize_int8" -> ((s, d) => {
      val dv = transform(col("embedding"), x => abs(x.cast("double")))
      val scale = lit(127.0) / array_max(dv)
      val q = transform(col("embedding"),
        x => round(x.cast("double") * scale).cast("long"))
      emb(s, d).select(col("vec_id"),
          round(scale, 6).as("scale"),
          aggregate(q, lit(0L), (acc, v) => acc + v * v).as("qnorm2"))
        .orderBy(col("vec_id"))
    }),

    // Quantized ANN closed loop: top-k ranked by INT8 dot products (per-
    // vector symmetric scale, exact integer arithmetic) overlapped
    // against the float cosine top-k — the memory/bandwidth-for-recall
    // trade (4× smaller vectors) measured per query, and both rankings
    // fully replayed by the oracle (no tolerance bands: integer dots are
    // exact on both engines).
    "sim_recall_int8" -> ((s, d) => {
      val v = emb(s, d)
      def q8(vec: org.apache.spark.sql.Column) = {
        val sc = lit(127.0) /
          array_max(transform(vec, x => abs(x.cast("double"))))
        transform(vec, x => round(x.cast("double") * sc).cast("long"))
      }
      val int8Scorer = (a: org.apache.spark.sql.Column,
                        b: org.apache.spark.sql.Column) =>
        aggregate(zip_with(q8(a), q8(b), (x, y) => x * y), lit(0L), _ + _)
          .cast("double")
      val qs = v.where(col("vec_id") < 5)
      val i8 = Similarity.bruteForceTopK(v, qs, "vec_id", "embedding",
        k = 10, scorer = int8Scorer).select(col("q_id"), col("n_id"))
      val fl = Similarity.bruteForceTopK(v, qs, "vec_id", "embedding",
        k = 10).select(col("q_id"), col("n_id"))
      i8.join(fl, Seq("q_id", "n_id"))
        .groupBy(col("q_id")).agg(count(lit(1)).as("n_overlap"))
        .orderBy(col("q_id"))
    }),

    // Same brute-force top-k through the NATIVE fused CosineSimilarity
    // expression (single-pass codegen) — shares sim_topk_brute's oracle,
    // proving the custom Expression is bit-identical to the declarative
    // composition.
    "sim_topk_native" -> ((s, d) => {
      NativeFunctions.register(s)
      val v = emb(s, d)
      Similarity.bruteForceTopK(v, v.where(col("vec_id") < 5),
        "vec_id", "embedding", k = 10, scorer = NativeFunctions.cosineSim)
        .orderBy(col("q_id"), col("rank"))
    }),

    // Embedding-cosine near-dup pairs, blocked by label — Σ|block|² work,
    // never the N² all-pairs cross join.
    "sim_neardup_cosine" -> ((s, d) =>
      Similarity.cosineNearDupPairs(emb(s, d), "vec_id", "embedding",
        "label", threshold = 0.35)
        .orderBy(col("id_a"), col("id_b"))),

    // Distributed PCA contract: covariance from ONE map-side-combinable
    // Gram aggregate, eigensolve on the driver (64×64 — the tiny-bounds
    // collect posture), components back as plan literals. The gates tie
    // the driver eigensolve to the DATA distributedly: the corpus
    // variance along each component must equal its eigenvalue, the two
    // projections must be uncorrelated, and the top-2 captured-variance
    // share must clear the uniform floor (top-k eigenvalues ≥ k·mean, so
    // ≥ 2/64 is structurally guaranteed — blob-structured embeddings land
    // far above it).
    "sim_pca" -> ((s, d) => {
      val e = emb(s, d)
      val (evals, evecs) = graft.operators.Pca.jacobiEigen(
        graft.operators.Pca.covariance(e, "vec_id", "embedding", 64))
      val top2Share = (evals(0) + evals(1)) / evals.sum
      val p0 = graft.operators.Pca.project(col("embedding"), evecs(0))
      val p1 = graft.operators.Pca.project(col("embedding"), evecs(1))
      e.agg(var_pop(p0).as("v0"), var_pop(p1).as("v1"),
          covar_pop(p0, p1).as("c01"))
        .select(
          (abs(col("v0") - evals(0)) <= lit(1e-6) * evals(0))
            .as("var0_is_eigval"),
          (abs(col("v1") - evals(1)) <= lit(1e-6) * evals(1))
            .as("var1_is_eigval"),
          (abs(col("c01")) <= lit(1e-9)).as("projections_uncorrelated"),
          lit(top2Share >= 2.0 / 64).as("captures_at_least_uniform"))
    }),

    // Embedding whitening: per-DIMENSION z-standardization (the prep step
    // before cosine/IVF when dimensions carry different scales). One
    // grouped aggregate over the exploded (dim, x) pairs, stats broadcast
    // back, transform per-row. Cross-engine exactness: floats quantize by
    // floor(x·2^20) — float→double is exact, ·2^20 is an exponent shift,
    // floor is deterministic — so the moments are exact INTEGER sums and
    // every remaining op (double divide, sqrt) is IEEE-identical in both
    // engines. (A decimal(18,9) cast is NOT portable: Spark rounds the
    // float's shortest string, DuckDB the double expansion.) Output
    // sampled to 5 vectors in long (vec_id, dim, z) form; the stats still
    // aggregate the WHOLE corpus.
    "sim_whiten" -> ((s, d) => {
      val x = emb(s, d)
        .select(col("vec_id"), posexplode(col("embedding")))
        .toDF("vec_id", "dim", "x")
        .withColumn("dx",
          floor(col("x").cast("double") * 1048576).cast("long"))
      val stats = x.groupBy(col("dim")).agg(
        sum(col("dx")).as("s"), sum(col("dx") * col("dx")).as("sq"),
        count(lit(1)).as("n"))
      val mean = col("s").cast("double") / col("n")
      val variance = col("sq").cast("double") / col("n") - mean * mean
      x.join(broadcast(stats), Seq("dim"))
        .where(col("vec_id") < 5)
        .select(col("vec_id"), col("dim"),
          ((col("dx").cast("double") - mean) / sqrt(variance)).as("z"))
        .orderBy(col("vec_id"), col("dim"))
    }),

    // Nearest-centroid classification EVAL over the labeled embeddings —
    // the accuracy sheet for an embedding space: per-class centroids from
    // quantized integer moments (floor(x·2^20) — exact sums, same trick
    // as sim_whiten), per-vector squared distance scaled by n² so every
    // comparison is a single division of exact integers, argmin with a
    // label tie-break, then the (label, pred) confusion matrix. All in
    // long (vec_id, dim) form: two grouped aggregates + one broadcast
    // join — no per-class scan, no driver-side centroids.
    "sim_centroid_classify" -> ((s, d) => {
      val x = emb(s, d)
        .select(col("vec_id"), col("label"), posexplode(col("embedding")))
        .toDF("vec_id", "label", "dim", "x")
        .withColumn("dx",
          floor(col("x").cast("double") * 1048576).cast("long"))
      val cent = x.groupBy(col("label").as("c"), col("dim"))
        .agg(sum(col("dx")).as("sv"), count(lit(1)).as("n"))
      val dist = x.join(broadcast(cent), Seq("dim"))
        .withColumn("diff", col("n") * col("dx") - col("sv"))
        .groupBy(col("vec_id"), col("label"), col("c"))
        .agg(sum(col("diff").cast("decimal(38,0)") *
            col("diff").cast("decimal(38,0)")).as("a"),
          max(col("n")).as("n"))
        .withColumn("dist",
          col("a").cast("double") / (col("n") * col("n")).cast("double"))
      dist.groupBy(col("vec_id"), col("label"))
        .agg(min_by(col("c"), struct(col("dist"), col("c"))).as("pred"))
        .groupBy(col("label"), col("pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("label"), col("pred"))
    }),

    // SEMANTIC dedup end-to-end: cosine near-dup pairs → connected
    // components → keep each cluster's min id — the embedding-space
    // analog of t_neardup_kept (same min-label clustering operator, a
    // recursive-CTE oracle re-deriving the components independently).
    "sim_semantic_kept" -> ((s, d) => {
      val e = emb(s, d)
      val cc = Dedup.connectedComponents(
        Similarity.cosineNearDupPairs(e, "vec_id", "embedding",
          "label", threshold = 0.35),
        "id_a", "id_b")
      e.join(cc.where(col("node") =!= col("cluster"))
          .select(col("node").as("vec_id")),
          Seq("vec_id"), "left_anti")
        .select(col("vec_id"), col("label")).orderBy(col("vec_id"))
    }),

    // Real LSH path: sign-bit random-projection buckets (4 seeded
    // hyperplanes → 16 buckets), then bucket-pruned top-k. The planes are
    // plan literals, so the oracle replays the identical bucketing.
    "sim_topk_lsh" -> ((s, d) => {
      val v = emb(s, d).withColumn("bucket",
        Similarity.projectionBucket(col("embedding"), lshPlanes))
      Similarity.partitionedTopK(v, v.where(col("vec_id") < 5),
        "vec_id", "embedding", "bucket", k = 5)
        .orderBy(col("q_id"), col("rank"))
    }),

    // Per-DIMENSION variance profile of the embedding space — the
    // whitening/Matryoshka diagnostic ("which dims carry signal, which
    // are dead") read before choosing truncation or PCA rank. A naive
    // avg() over corpus-order doubles is shuffle-order-nondeterministic
    // — so each value first becomes an exact MICRO-UNIT integer
    // (round(v·10⁶), half-away-from-zero in both engines) and the
    // moments accumulate as order-independent decimal(38,0) sums; mean
    // and variance are then single deterministic IEEE expressions of
    // those exact integers, rounded to 12 (the g_assortativity
    // discipline). One positional explode + one 64-row aggregate.
    "sim_dim_variance" -> ((s, d) =>
      emb(s, d).select(
          posexplode(col("embedding").cast("array<double>"))
            .as(Seq("dim", "v")))
        .select(col("dim").cast("long").as("dim"),
          expr("cast(round(v * 1000000) as long)").as("u"))
        .groupBy(col("dim"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("u").cast("decimal(38,0)")).as("su"),
          sum((col("u") * col("u")).cast("decimal(38,0)")).as("su2"))
        .select(col("dim"), col("n"),
          round(col("su").cast("double") /
            (col("n").cast("double") * 1000000.0), 12).as("mean"),
          round((col("n").cast("decimal(38,0)") * col("su2") -
              col("su") * col("su")).cast("double") /
            (col("n").cast("double") * col("n").cast("double") * 1.0e12),
            12).as("variance"))
        .orderBy(col("dim"))),

    // LSH BUCKET-BALANCE report — the skew diagnostic that prices every
    // bucketed similarity join here: per bucket, vector count, corpus
    // share, and the within-bucket candidate-pair count n(n−1)/2 whose
    // SUM is exactly the work the partitioned top-k / near-dup joins
    // do. A fat bucket shows up as a fat n_pairs row — the signal to
    // add bits or re-seed planes BEFORE running the join. One grouped
    // count + a broadcast total; the share is one IEEE division,
    // n_pairs an exact integer (n(n−1) is always even, `div 2` exact).
    "sim_bucket_balance" -> ((s, d) => {
      val g = emb(s, d)
        .withColumn("bucket",
          Similarity.projectionBucket(col("embedding"), lshPlanes))
        .groupBy(col("bucket").cast("long").as("bucket"))
        .agg(count(lit(1)).cast("long").as("n_vecs"))
      g.crossJoin(broadcast(
          g.agg(sum(col("n_vecs")).cast("long").as("n_tot"))))
        .select(col("bucket"), col("n_vecs"),
          (col("n_vecs").cast("double") / col("n_tot").cast("double"))
            .as("share"),
          expr("n_vecs * (n_vecs - 1) div 2").cast("long").as("n_pairs"))
        .orderBy(col("bucket"))
    }),

    // Multi-probe LSH: query probes its own bucket plus every 1-bit
    // neighbor — the recall knob that widens the search without touching
    // the stored bucketing.
    "sim_topk_lsh_probe" -> ((s, d) => {
      val v = emb(s, d).withColumn("bucket",
        Similarity.projectionBucket(col("embedding"), lshPlanes))
      Similarity.multiProbeTopK(v, v.where(col("vec_id") < 5),
        "vec_id", "embedding", "bucket", nBits = 4, k = 5)
        .orderBy(col("q_id"), col("rank"))
    }),

    // True IVF shape: nearest-centroid (Voronoi) cell assignment over
    // seeded literal centroids, then cell-pruned top-k — the coarse
    // quantizer is a per-row projection, the cell equi-join is the prune.
    "sim_topk_ivf_centroid" -> ((s, d) => {
      val v = emb(s, d).withColumn("cell",
        Similarity.centroidCell(col("embedding"), centroids))
      Similarity.partitionedTopK(v, v.where(col("vec_id") < 5),
        "vec_id", "embedding", "cell", k = 5)
        .orderBy(col("q_id"), col("rank"))
    }),

    // IVF multi-probe: the query searches its own Voronoi cell AND the
    // 2nd-nearest centroid's cell — the recall knob on the IVF path
    // (neighbors just across a cell boundary come back without touching
    // the stored assignment).
    "sim_topk_ivf_probe" -> ((s, d) => {
      val v = emb(s, d).withColumn("cell",
        Similarity.centroidCell(col("embedding"), centroids))
      val q = v.where(col("vec_id") < 5).withColumn("cell",
        explode(Similarity.ivfProbeCells(col("embedding"), centroids)))
      Similarity.partitionedTopK(v, q, "vec_id", "embedding", "cell", k = 5)
        .orderBy(col("q_id"), col("rank"))
    }),

    // Recall@5 of single-cell vs 2-cell-probed IVF against exact brute
    // force, side by side — the measured recall LIFT the probe buys.
    "sim_recall_ivf" -> ((s, d) => {
      val v = emb(s, d).withColumn("cell",
        Similarity.centroidCell(col("embedding"), centroids))
      val q = v.where(col("vec_id") < 5)
      val brute = Similarity.bruteForceTopK(v, q, "vec_id", "embedding", k = 5)
        .select(col("q_id"), col("n_id"))
      val single = Similarity.partitionedTopK(v, q, "vec_id", "embedding",
        "cell", k = 5)
        .select(col("q_id"), col("n_id"), lit(1L).as("hit_cell"))
      val qProbe = q.withColumn("cell",
        explode(Similarity.ivfProbeCells(col("embedding"), centroids)))
      val probed = Similarity.partitionedTopK(v, qProbe, "vec_id", "embedding",
        "cell", k = 5)
        .select(col("q_id"), col("n_id"), lit(1L).as("hit_probe"))
      brute
        .join(single, Seq("q_id", "n_id"), "left")
        .join(probed, Seq("q_id", "n_id"), "left")
        .groupBy(col("q_id"))
        .agg((sum(coalesce(col("hit_cell"), lit(0L))) / lit(5)).as("recall_cell"),
          (sum(coalesce(col("hit_probe"), lit(0L))) / lit(5)).as("recall_probe"))
        .orderBy(col("q_id"))
    }),

    // TRAINED IVF: two Lloyd k-means iterations refine the seeded
    // centroids over the corpus itself, then cell-pruned top-k — the full
    // production IVF recipe (train coarse quantizer → assign → prune).
    // The oracle REPLAYS the training from the raw parquet with exact
    // decimal means, so even the k-means iterations are cross-engine
    // verified, not just the final search.
    "sim_topk_ivf_trained" -> ((s, d) => {
      val v0 = emb(s, d)
      val trained = trainedCells(s, d)
      val v = v0.withColumn("cell",
        Similarity.centroidCell(col("embedding"), trained))
      Similarity.partitionedTopK(v, v.where(col("vec_id") < 5),
        "vec_id", "embedding", "cell", k = 5)
        .orderBy(col("q_id"), col("rank"))
    }),

    // Dimensionality-reduced ANN (the PCA×retrieval composition): brute
    // top-5 in the 8-component PCA space vs the full 64-dim answer,
    // measured as recall@5 per query and gated — the memory/compute
    // trade every vector store offers (8/64 = 12.5% of the dot-product
    // work), quantified on this corpus. The synthetic embeddings are
    // near-isotropic, so 8 components capture little variance and
    // absolute recall is low (measured 0.10); the honest gate is
    // against the RANDOM-pick baseline (5/499 ≈ 0.01): the reduced
    // space must beat random by ≥5×. Gate-style oracle (constants),
    // like sim_pca/a8_hll_bound: the eigensolve is driver Jacobi over
    // the d×d covariance and not SQL-replayable, but the measurement is
    // deterministic, so the booleans are pinned.
    // Matryoshka-style TRUNCATED-dimension recall: score with only the
    // FIRST 8 of the 64 dims (a prefix slice — zero transform cost,
    // unlike PCA's covariance+eigen pass) and measure top-5 recall vs
    // the full-dim truth. The cheapest dimensionality/recall trade a
    // serving stack can make — MRL-trained embeddings put the signal in
    // the prefix by construction; on THIS synthetic corpus the planted
    // cluster structure spans all dims uniformly, so prefix slicing ≈
    // any 8-dim projection: the gate asserts it beats 5× random like
    // PCA-8 does. Same bounded shape as sim_recall_pca: 20 queries ×
    // corpus brute force, recall aggregated to one row.
    "sim_recall_trunc" -> ((s, d) => {
      val e = emb(s, d)
      val reduced = e.select(col("vec_id"),
        slice(col("embedding"), 1, 8).as("embedding"))
      def top5(v: DataFrame) =
        Similarity.bruteForceTopK(v, v.where(col("vec_id") < 20),
          "vec_id", "embedding", k = 5)
          .select(col("q_id"), col("n_id"))
      val full = top5(e)
      val red = top5(reduced).withColumnRenamed("n_id", "r_id")
      full.join(red,
          full("q_id") === red("q_id") && col("n_id") === col("r_id"),
          "left")
        .groupBy(full("q_id"))
        .agg((count(col("r_id")) / 5.0).as("recall"))
        .agg(avg(col("recall")).as("mean_recall"),
          count(lit(1)).as("n_queries"))
        .select((col("mean_recall") >= 5.0 * 5.0 / 499.0)
            .as("recall_beats_random_5x"),
          (col("mean_recall") <= 1.0).as("recall_is_sane"),
          col("n_queries"))
    }),

    "sim_recall_pca" -> ((s, d) => {
      val e = emb(s, d)
      val (_, evecs) = graft.operators.Pca.jacobiEigen(
        graft.operators.Pca.covariance(e, "vec_id", "embedding", 64))
      val reduced = e.select(col("vec_id"),
        array((0 until 8).map(i =>
          graft.operators.Pca.project(col("embedding"), evecs(i))
            .cast("float")): _*).as("embedding"))
      def top5(v: DataFrame) =
        Similarity.bruteForceTopK(v, v.where(col("vec_id") < 20),
          "vec_id", "embedding", k = 5)
          .select(col("q_id"), col("n_id"))
      val full = top5(e)
      val red = top5(reduced).withColumnRenamed("n_id", "r_id")
      full.join(red,
          full("q_id") === red("q_id") && col("n_id") === col("r_id"),
          "left")
        .groupBy(full("q_id"))
        .agg((count(col("r_id")) / 5.0).as("recall"))
        .agg(avg(col("recall")).as("mean_recall"),
          count(lit(1)).as("n_queries"))
        .select((col("mean_recall") >= 5.0 * 5.0 / 499.0)
            .as("recall_beats_random_5x"),
          (col("mean_recall") <= 1.0).as("recall_is_sane"),
          col("n_queries"))
    }),

    // kNN self-JOIN: top-3 neighbors for EVERY corpus vector (not a
    // 5-query probe set) through the trained-IVF cell blocking — the
    // neighbor-graph build that semantic dedup, diversity sampling, and
    // retrieval eval all start from. Same Σ|cell|² candidate bound as
    // every blocked operator; per-cell top-k, never an all-pairs corpus
    // join.
    "sim_knn_join" -> ((s, d) => {
      val v0 = emb(s, d)
      val trained = trainedCells(s, d)
      val v = v0.withColumn("cell",
        Similarity.centroidCell(col("embedding"), trained))
      Similarity.partitionedTopK(v, v, "vec_id", "embedding", "cell",
          k = 3)
        .orderBy(col("q_id"), col("rank"))
    }),

    // Embedding NORM audit — the dead/exploding-vector detector run
    // before any cosine machinery trusts the space (a near-zero norm
    // makes cosine meaningless; an extreme one dominates dot-product
    // retrieval). Norm² in exact micro²-units (Σu², u = round(v·10⁶))
    // so the band test 4·n2 < lo·10¹² / 4·n2 > hi·10¹² is pure integer
    // cross-multiplication against the pinned [0.5, 2.0]² band; per
    // label: vectors, dead, exploding, and the flagged share (one
    // division). One explode + two grouped aggregates.
    "sim_norm_audit" -> ((s, d) => {
      val n2 = emb(s, d).select(col("vec_id"),
          col("label").cast("long").as("label"),
          posexplode(col("embedding").cast("array<double>"))
            .as(Seq("dim", "v")))
        .select(col("vec_id"), col("label"),
          expr("cast(round(v * 1000000) as long)").as("u"))
        .groupBy(col("vec_id"), col("label"))
        .agg(sum(expr("u * u")).cast("decimal(38,0)").as("n2"))
      n2.select(col("label"),
          (col("n2") < lit(250000000000L)).as("dead"),
          (col("n2") > lit(4000000000000L)).as("exploding"))
        .groupBy(col("label"))
        .agg(count(lit(1)).cast("long").as("n_vecs"),
          sum(when(col("dead"), 1L).otherwise(0L)).cast("long")
            .as("n_dead"),
          sum(when(col("exploding"), 1L).otherwise(0L)).cast("long")
            .as("n_exploding"))
        .withColumn("flagged_share",
          (col("n_dead") + col("n_exploding")).cast("double") /
            col("n_vecs").cast("double"))
        .orderBy(col("label"))
    }),

    // IVF cell BALANCE — the trained-quantizer counterpart of
    // sim_bucket_balance: per-cell population and the exact
    // n(n−1)/2 pair bill a cell-bucketed self-join would pay there.
    // A collapsed quantizer (one cell holding most vectors) shows up
    // as one dominant pairs row — the retrain/raise-k signal. One
    // broadcast-centroid projection + an 8-row aggregate.
    "sim_cell_balance" -> ((s, d) => {
      val v0 = emb(s, d)
      val trained = trainedCells(s, d)
      v0.withColumn("cell",
          Similarity.centroidCell(col("embedding"), trained)
            .cast("long"))
        .groupBy(col("cell")).agg(count(lit(1)).as("n_vecs"))
        .withColumn("pairs",
          expr("(n_vecs * (n_vecs - 1)) div 2"))
        .orderBy(col("cell"))
    }),

    // DIVERSITY sampling — one small quota per k-means cell of the
    // embedding space (the SemDeDup/DiverseSample curation move: a
    // uniform row sample over-draws the dense clusters; sampling
    // per-cell guarantees every REGION of the space is represented).
    // Training is the shared k=8/iters=2/seed=7 codepath the IVF
    // variants already prove; assignment is one broadcast-centroid
    // projection, and the quota is a row_number over each cell
    // ordered by vec_id — deterministic, never a global sort.
    "sim_diverse_sample" -> ((s, d) => {
      val v0 = emb(s, d)
      val trained = trainedCells(s, d)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cell")).orderBy(col("vec_id"))
      v0.withColumn("cell",
          Similarity.centroidCell(col("embedding"), trained)
            .cast("long"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= 5)
        .select(col("cell"), col("vec_id"), col("rank"))
        .orderBy(col("cell"), col("rank"))
    }),

    // Embedding-space ANISOTROPY audit — the mean pairwise dot product
    // of the whole corpus WITHOUT any pair join: for quantized vectors
    // q = floor(x·4096), Σ_{i≠j}⟨q_i,q_j⟩ = ‖Σq‖² − Σ‖q‖², so the
    // corpus-collapse check (a healthy space has near-zero mean dot; a
    // collapsed/anisotropic one trends positive — the signal behind
    // "all my nearest neighbours look the same") costs per-dim totals
    // plus one scalar: two tiny aggregates over ONE scan at ANY corpus
    // size. Exact DECIMAL(38,0) integers throughout; the display mean
    // is the only division (both engines cast the same integers).
    "sim_anisotropy" -> ((s, d) => {
      val q = emb(s, d).select(col("vec_id"),
        expr("transform(embedding, x -> floor(cast(x as double) * 4096))")
          .as("q"))
      val dims = q
        .select(posexplode(col("q")).as(Seq("dim", "qx")))
        .groupBy(col("dim"))
        .agg(sum(col("qx")).cast("decimal(38,0)").as("sd"))
        .agg(sum(col("sd") * col("sd")).cast("decimal(38,0)")
          .as("centroid_dot"))
      q.select(expr("aggregate(q, 0L, (a, x) -> a + x * x)").as("n2"))
        .agg(count(lit(1)).as("n"),
          sum(col("n2")).cast("decimal(38,0)").as("sum_norm2"))
        .crossJoin(broadcast(dims))
        .select(col("n"),
          col("sum_norm2").cast("long").as("sum_norm2"),
          col("centroid_dot").cast("long").as("centroid_dot"),
          ((col("centroid_dot") - col("sum_norm2")).cast("double") /
            (col("n") * (col("n") - 1)).cast("double"))
            .as("mean_pair_dot"))
    }),

    // Label-centroid SEPARATION matrix — class separability at a
    // glance (two labels whose centroids run cos ≈ 1 will confuse any
    // classifier or ANN filter built on this space). The trick that
    // keeps it deterministic: cos(mean_a, mean_b) = cos(sum_a, sum_b)
    // — the 1/n factors cancel — so after the micro-unit integer cast
    // (the sim_dim_variance discipline) the per-(label, dim) SUMS are
    // exact decimals, the 45-pair dot products and squared norms stay
    // exact, and the only floats are one √·√ division per pair,
    // round-12. Plan: one explode + a (label, dim) aggregate (640
    // rows), then a dim-keyed pair join over that aggregate — nothing
    // vector-sized is ever pairwise.
    "sim_label_separation" -> ((s, d) => {
      val x = emb(s, d).select(col("label").cast("long").as("label"),
          posexplode(col("embedding").cast("array<double>"))
            .as(Seq("dim", "v")))
        .select(col("label"), col("dim"),
          expr("cast(round(v * 1000000) as long)").as("u"))
        .groupBy(col("label"), col("dim"))
        .agg(sum(col("u").cast("decimal(38,0)")).as("su"))
        .localCheckpoint()
      val nrm = x.groupBy(col("label"))
        .agg(sum((col("su") * col("su")).cast("decimal(38,0)"))
          .as("n2"))
      x.select(col("label").as("la"), col("dim"), col("su").as("sa"))
        .join(x.select(col("label").as("lb"), col("dim").as("dim2"),
          col("su").as("sb")),
          col("dim") === col("dim2") && col("la") < col("lb"))
        .groupBy(col("la"), col("lb"))
        .agg(sum((col("sa") * col("sb")).cast("decimal(38,0)"))
          .as("dot"))
        .join(broadcast(nrm.select(col("label").as("la"),
          col("n2").as("n2a"))), Seq("la"))
        .join(broadcast(nrm.select(col("label").as("lb"),
          col("n2").as("n2b"))), Seq("lb"))
        .select(col("la").as("label_a"), col("lb").as("label_b"),
          round(col("dot").cast("double") /
            (sqrt(col("n2a").cast("double")) *
              sqrt(col("n2b").cast("double"))), 12).as("centroid_cos"))
        .orderBy(col("label_a"), col("label_b"))
    }),

    // kNN label PURITY — the LOCAL embedding-quality eval beside
    // sim_centroid_classify's global one: for every vector, what
    // fraction of its 3 nearest (cell-bucketed) neighbors share its
    // label. A space whose purity collapses can't support kNN search,
    // retrieval eval, or semantic dedup, whatever the centroid
    // accuracy says. Reuses sim_knn_join's exact bucketed top-k; two
    // |V|-keyed label joins; purity one exact-int IEEE division per
    // label row.
    "sim_knn_purity" -> ((s, d) => {
      val v0 = emb(s, d)
      val trained = trainedCells(s, d)
      val v = v0.withColumn("cell",
        Similarity.centroidCell(col("embedding"), trained))
      val lab = emb(s, d).select(col("vec_id"), col("label"))
      Similarity.partitionedTopK(v, v, "vec_id", "embedding", "cell",
          k = 3)
        .select(col("q_id"), col("n_id"))
        .join(lab.select(col("vec_id").as("q_id"),
          col("label").as("q_label")), Seq("q_id"))
        .join(lab.select(col("vec_id").as("n_id"),
          col("label").as("n_label")), Seq("n_id"))
        .groupBy(col("q_label").as("label"))
        .agg(countDistinct(col("q_id")).cast("long").as("n_queries"),
          count(lit(1)).cast("long").as("n_neighbors"),
          sum(when(col("q_label") === col("n_label"), 1L).otherwise(0L))
            .cast("long").as("n_same"))
        .withColumn("purity", col("n_same").cast("double") /
          col("n_neighbors").cast("double"))
        .orderBy(col("label"))
    }),

    // Index PERSISTENCE — build once, query many: the trained quantizer
    // (8 centroid rows) and the per-vector cell assignments land as
    // parquet lake artifacts; the query path then reads the INDEX (one
    // tiny-bounds 8-row collect for the centroid literals + the
    // assignment table join) and never re-trains or re-assigns the
    // corpus. Result must be identical to the train-inline path, so the
    // two queries share the oracle replay.
    "sim_topk_ivf_persist" -> ((s, d) => {
      val idx = stagedIndexDir("ivf", d)
      val v0 = emb(s, d)
      val trained = trainedCells(s, d)
      // Index build (one-time): assignments + centroid table.
      v0.withColumn("cell",
          Similarity.centroidCell(col("embedding"), trained))
        .select(col("vec_id"), col("cell"))
        .write.mode("overwrite").parquet(s"$idx/assign")
      import s.implicits._
      trained.zipWithIndex.toSeq
        .map { case (c, i) => (i, c.toSeq) }.toDF("cell", "centroid")
        .write.mode("overwrite").parquet(s"$idx/centroids")
      // Query path: centroids reload from the index (k rows), corpus
      // cells come from the assignment table — no training, no
      // re-assignment scan.
      val reloaded = s.read.parquet(s"$idx/centroids")
        .orderBy(col("cell")).collect()
        .map(_.getSeq[Double](1).toArray)
      val v = v0.join(s.read.parquet(s"$idx/assign"), "vec_id")
      val q = v0.where(col("vec_id") < 5).withColumn("cell",
        Similarity.centroidCell(col("embedding"), reloaded))
      Similarity.partitionedTopK(v, q, "vec_id", "embedding", "cell",
          k = 5)
        .orderBy(col("q_id"), col("rank"))
    }),

    // Multi-probe over the TRAINED quantizer: the query searches its
    // nearest and 2nd-nearest k-means cell — the recall knob composed
    // with the trained-centroid path (same probe rule as the seeded
    // sim_topk_ivf_probe; the oracle replays training then probes).
    "sim_topk_ivf_trained_probe" -> ((s, d) => {
      val v0 = emb(s, d)
      val trained = trainedCells(s, d)
      val v = v0.withColumn("cell",
        Similarity.centroidCell(col("embedding"), trained))
      val q = v0.where(col("vec_id") < 5).withColumn("cell",
        explode(Similarity.ivfProbeCells(col("embedding"), trained)))
      Similarity.partitionedTopK(v, q, "vec_id", "embedding", "cell", k = 5)
        .orderBy(col("q_id"), col("rank"))
    }),

    // Recall@5 of seeded-random vs k-means-trained IVF cells against
    // exact brute force, side by side. On THIS corpus the embeddings are
    // isotropic noise (within-label cosine ≈ cross-label ≈ 0), so there
    // is no structure to learn and trained ≈ seeded is the honest
    // expected outcome; KmeansSpec proves the lift on planted blobs,
    // where training drives cell purity and pruned recall to 1.0.
    "sim_recall_ivf_trained" -> ((s, d) => {
      val v0 = emb(s, d)
      val trained = trainedCells(s, d)
      val vs = v0.withColumn("cell",
        Similarity.centroidCell(col("embedding"), centroids))
      val vt = v0.withColumn("cell",
        Similarity.centroidCell(col("embedding"), trained))
      val brute = Similarity.bruteForceTopK(v0,
        v0.where(col("vec_id") < 5), "vec_id", "embedding", k = 5)
        .select(col("q_id"), col("n_id"))
      val seeded = Similarity.partitionedTopK(vs,
        vs.where(col("vec_id") < 5), "vec_id", "embedding", "cell", k = 5)
        .select(col("q_id"), col("n_id"), lit(1L).as("hit_seed"))
      val tr = Similarity.partitionedTopK(vt,
        vt.where(col("vec_id") < 5), "vec_id", "embedding", "cell", k = 5)
        .select(col("q_id"), col("n_id"), lit(1L).as("hit_train"))
      brute
        .join(seeded, Seq("q_id", "n_id"), "left")
        .join(tr, Seq("q_id", "n_id"), "left")
        .groupBy(col("q_id"))
        .agg((sum(coalesce(col("hit_seed"), lit(0L))) / lit(5))
          .as("recall_seeded"),
          (sum(coalesce(col("hit_train"), lit(0L))) / lit(5))
            .as("recall_trained"))
        .orderBy(col("q_id"))
    }),

    // Recall@5 of the LSH-pruned path against the exact brute-force top-k
    // — the quality loop an ANN deployment runs when tuning nBits/probes.
    // Per query: |lsh∩brute| / k, an exact-integer division identical on
    // both engines.
    "sim_recall_lsh" -> ((s, d) => {
      val v = emb(s, d).withColumn("bucket",
        Similarity.projectionBucket(col("embedding"), lshPlanes))
      val q = v.where(col("vec_id") < 5)
      val brute = Similarity.bruteForceTopK(v, q, "vec_id", "embedding", k = 5)
        .select(col("q_id"), col("n_id"))
      val lsh = Similarity.partitionedTopK(v, q, "vec_id", "embedding",
        "bucket", k = 5)
        .select(col("q_id"), col("n_id"), lit(1L).as("hit"))
      brute.join(lsh, Seq("q_id", "n_id"), "left")
        .groupBy(col("q_id"))
        .agg((sum(coalesce(col("hit"), lit(0L))) / lit(5)).as("recall"))
        .orderBy(col("q_id"))
    }),

    // BINARY-QUANTIZATION two-tier ANN: 1-bit-per-dim sign codes (the
    // 32×-compressed memory tier a production vector store keeps
    // resident) ranked by native Hamming distance, then the cTop=50
    // survivors — and ONLY them — fetch their float vectors for the
    // exact-cosine rerank. Both native expressions (projection_bits
    // over identity planes, hamming_dist) run in whole-stage codegen;
    // the oracle replays codes, Hamming ranking, and rerank from raw
    // parquet.
    "sim_topk_bq" -> ((s, d) => {
      val v = emb(s, d)
      Similarity.binaryQuantTopK(v, v.where(col("vec_id") < 5),
          "vec_id", "embedding", dim = 64, cTop = 50, k = 5)
        .orderBy(col("q_id"), col("rank"))
    }),

    // BQ recall calibration: per query, how many of the float-cosine
    // brute top-10 the code-tier funnel (Hamming top-50 → cosine
    // rerank top-10) retains — what 32× memory compression costs,
    // the sim_recall_pq question for the binary tier.
    "sim_recall_bq" -> ((s, d) => {
      val v = emb(s, d)
      val q = v.where(col("vec_id") < 5)
      val brute = Similarity.bruteForceTopK(v, q, "vec_id", "embedding",
          k = 10).select(col("q_id"), col("n_id"))
      val bq = Similarity.binaryQuantTopK(v, q, "vec_id", "embedding",
          dim = 64, cTop = 50, k = 10)
        .select(col("q_id"), col("n_id"), lit(1L).as("hit"))
      brute.join(bq, Seq("q_id", "n_id"), "left")
        .groupBy(col("q_id"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
        .orderBy(col("q_id"))
    }),

    // IVF × BQ composed two-tier ANN — the full production path: the
    // Voronoi cell equi-join prunes first (query probes its cell + the
    // runner-up), the probed cells' rows rank by native Hamming over
    // sign codes, and only the cTop=50 survivors fetch float vectors
    // for the exact-cosine rerank. The oracle replays cells, probe
    // list, codes, Hamming funnel, and rerank from raw parquet.
    "sim_topk_ivf_bq" -> ((s, d) => {
      val v = emb(s, d)
      Similarity.ivfBinaryQuantTopK(v, v.where(col("vec_id") < 5),
          "vec_id", "embedding", centroids, dim = 64, cTop = 50, k = 5)
        .orderBy(col("q_id"), col("rank"))
    }),

    // Composed-funnel recall: per query, how many of the float-cosine
    // brute top-10 survive BOTH pruning stages (2-of-8 cell probe,
    // then Hamming top-50 → cosine rerank top-10) — the compounded
    // recall cost of the full IVF×BQ path, next to sim_recall_ivf
    // (cell prune alone) and sim_recall_bq (code funnel alone).
    "sim_recall_ivf_bq" -> ((s, d) => {
      val v = emb(s, d)
      val q = v.where(col("vec_id") < 5)
      val brute = Similarity.bruteForceTopK(v, q, "vec_id", "embedding",
          k = 10).select(col("q_id"), col("n_id"))
      val bq = Similarity.ivfBinaryQuantTopK(v, q, "vec_id", "embedding",
          centroids, dim = 64, cTop = 50, k = 10)
        .select(col("q_id"), col("n_id"), lit(1L).as("hit"))
      brute.join(bq, Seq("q_id", "n_id"), "left")
        .groupBy(col("q_id"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
        .orderBy(col("q_id"))
    }),

    // Index PERSISTENCE for the binary-quantization tier — build once,
    // query many (the sim_topk_ivf_persist posture applied to the code
    // table): the 1-bit/dim sign codes land as a parquet lake artifact;
    // the query path reads the CODE TABLE (ids + codes, the 32×-
    // compressed resident tier a serving node holds) and encodes only
    // its own query vectors — the corpus floats are never re-scanned
    // until the tier-2 candidate fetch. Result must be identical to the
    // inline sim_topk_bq, so the two share the oracle replay.
    "sim_topk_bq_persist" -> ((s, d) => {
      val idx = stagedIndexDir("bq", d)
      val v = emb(s, d)
      val planes = Similarity.signBitPlanes(64)
      // Index build (one-time): the resident code tier.
      v.select(col("vec_id").as("n_id"),
          Similarity.projectionBucket(col("embedding"), planes)
            .as("n_code"))
        .write.mode("overwrite").parquet(idx)
      // Query path: corpus codes come from the index; only the Q query
      // vectors encode.
      Similarity.binaryQuantTopKFromCodes(v, s.read.parquet(idx),
          v.where(col("vec_id") < 5), "vec_id", "embedding",
          dim = 64, cTop = 50, k = 5)
        .orderBy(col("q_id"), col("rank"))
    }),

    // Persisted COMPOSED index — both pruning tiers as ONE lake artifact
    // (r8 verdict item 6, completing the sim_topk_ivf_persist /
    // sim_topk_bq_persist pair): the indexing job writes (n_id, cell,
    // n_code) — each corpus row's coarse-quantizer cell AND its
    // 1-bit/dim sign code — plus the tiny centroid table; the query path
    // reloads the centroids (8 rows), cell-assigns and encodes only its
    // OWN vectors, and runs the cell-prune → Hamming funnel entirely
    // over the index table. Corpus floats are touched only at the
    // tier-2 rerank fetch — on a serving fleet the index table is the
    // resident tier (~33 bits/row vs 256 float bytes) and this query IS
    // the steady-state read path. Result must be identical to the
    // inline sim_topk_ivf_bq, so the two share the oracle replay.
    "sim_topk_ivf_bq_persist" -> ((s, d) => {
      val idx = stagedIndexDir("ivfbq", d)
      val v = emb(s, d)
      val planes = Similarity.signBitPlanes(64)
      // Index build (one-time): both tiers in one table + centroids.
      v.select(col("vec_id").as("n_id"),
          Similarity.centroidCell(col("embedding"), centroids).as("cell"),
          Similarity.projectionBucket(col("embedding"), planes)
            .as("n_code"))
        .write.mode("overwrite").parquet(s"$idx/assign")
      import s.implicits._
      centroids.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }
        .toDF("cell", "centroid")
        .write.mode("overwrite").parquet(s"$idx/cells")
      // Query path: centroids reload from the index (8 rows); the
      // corpus side is the index table alone.
      val rCells = s.read.parquet(s"$idx/cells")
        .orderBy(col("cell")).collect()
        .map(_.getSeq[Double](1).toArray)
      Similarity.ivfBinaryQuantTopKFromIndex(v,
          s.read.parquet(s"$idx/assign"),
          v.where(col("vec_id") < 5), "vec_id", "embedding", rCells,
          dim = 64, cTop = 50, k = 5)
        .orderBy(col("q_id"), col("rank"))
    })
  )

  /** 4 hyperplanes over the corpus's 64-dim embeddings, seed pinned so the
    * DuckDB oracle (literal-embedded constants) replays them exactly.
    */
  private val lshPlanes = Similarity.lshPlanes(dim = 64, nBits = 4, seed = 42L)

  /** 8 IVF centroids, seed pinned for the same oracle-replay reason. */
  private val centroids = Similarity.ivfCentroids(dim = 64, k = 8, seed = 7L)

  /** SQL recomputation of the 1-bit-per-dimension binary-quantization
    * code over `e`: identity planes make [[bucketSql]]'s hyperplane dot
    * degenerate to the component itself, so the code is the per-dim sign
    * bits under the same ≥0→'1' convention (IEEE: −0.0 ≥ 0 on both
    * engines, and summing the 63 exact 0.0 products cannot change e[i]).
    * Known NaN divergence (ADVICE r7): DuckDB's total order makes
    * `NaN >= 0` TRUE so a NaN component would encode '1' here, while the
    * native ProjectionBits encodes '0' (Java NaN comparisons are false).
    * The embeddings fixture is NaN-free (generated finite doubles); if
    * NaN ever enters the embedding column, expect a hash mismatch HERE
    * before suspecting the funnel.
    */
  private val bqCodeSql =
    """array_to_string(list_transform(generate_series(1,64),
      | i -> CASE WHEN e[i] >= 0 THEN '1' ELSE '0' END), '')""".stripMargin

  /** SQL Hamming distance between `q_code`/`n_code` bit-strings — the
    * per-position compare the native hamming_dist expression fuses.
    */
  private val hamSql =
    """len(list_filter(generate_series(1,64),
      | i -> substr(q_code,i,1) <> substr(n_code,i,1)))""".stripMargin

  /** Shared replay for the binary-quantization top-k (inline and
    * persisted-code-table — the two must agree exactly).
    */
  private lazy val bqTopkSql =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |b AS (SELECT vec_id, e, $bqCodeSql AS code FROM v),
       |q AS (SELECT vec_id AS q_id, e AS q_vec, code AS q_code FROM b WHERE vec_id<5),
       |c AS (SELECT vec_id AS n_id, e AS n_vec, code AS n_code FROM b),
       |h AS (SELECT q_id, n_id, q_vec, n_vec, $hamSql AS ham
       |  FROM c, q WHERE n_id<>q_id),
       |t AS (SELECT q_id, n_id, q_vec, n_vec, ham,
       |  row_number() OVER (PARTITION BY q_id ORDER BY ham, n_id) AS crank
       |  FROM h),
       |r AS (SELECT q_id, n_id, CAST(ham AS BIGINT) AS ham, $cosSql AS cos
       |  FROM t WHERE crank<=50),
       |f AS (SELECT q_id, n_id, ham, cos,
       |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
       |  FROM r)
       |SELECT q_id, n_id, ham, cos, rank FROM f WHERE rank<=5
       |ORDER BY q_id, rank""".stripMargin

  /** Shared replay for the composed IVF×BQ top-k (inline and
    * persisted-index — the two must agree exactly): cells + probe list,
    * codes, Hamming funnel inside the probed cells, exact-cosine rerank.
    */
  private lazy val ivfBqTopkSql =
    s"""WITH $ivfProbeCtes,
       |b AS (SELECT vec_id, e, cell1, msc, $bqCodeSql AS code FROM a2),
       |q AS (SELECT vec_id AS q_id, e AS q_vec, code AS q_code,
       |  unnest([cell1, list_position(msc, list_max(msc))-1]) AS cell
       |  FROM b WHERE vec_id<5),
       |c AS (SELECT vec_id AS n_id, e AS n_vec, code AS n_code,
       |  cell1 AS cell FROM b),
       |h AS (SELECT q_id, n_id, q_vec, n_vec, $hamSql AS ham
       |  FROM c JOIN q USING (cell) WHERE n_id<>q_id),
       |t AS (SELECT q_id, n_id, q_vec, n_vec, ham,
       |  row_number() OVER (PARTITION BY q_id ORDER BY ham, n_id) AS crank
       |  FROM h),
       |r AS (SELECT q_id, n_id, CAST(ham AS BIGINT) AS ham, $cosSql AS cos
       |  FROM t WHERE crank<=50),
       |f AS (SELECT q_id, n_id, ham, cos,
       |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
       |  FROM r)
       |SELECT q_id, n_id, ham, cos, rank FROM f WHERE rank<=5
       |ORDER BY q_id, rank""".stripMargin

  /** SQL recomputation of the sign-bit bucket over `e`, with the SAME
    * hyperplane constants as the Spark plan (Double.toString round-trips
    * exactly; the unnest-sum folds in element order like Spark's
    * `aggregate`).
    */
  private def bucketSql: String = lshPlanes.map { p =>
    val arr = p.mkString("[", ",", "]")
    s"""(CASE WHEN (SELECT sum(a*b) FROM (SELECT unnest(e) AS a,
       | unnest($arr::DOUBLE[]) AS b)) >= 0 THEN '1' ELSE '0' END)""".stripMargin
  }.mkString(" || ")

  /** SQL recomputation of the IVF cell over `e`: per-centroid dot-product
    * scores, then the first index achieving the max (same tie order as
    * `centroidCell`).
    */
  private def cellSql: String = {
    val scores = centroids.map { c =>
      val arr = c.mkString("[", ",", "]")
      s"""(SELECT sum(a*b) FROM (SELECT unnest(e) AS a,
         | unnest($arr::DOUBLE[]) AS b))""".stripMargin
    }
    val mx = scores.mkString("greatest(", ",", ")")
    val cases = scores.init.zipWithIndex
      .map { case (s, i) => s"WHEN $s = $mx THEN $i" }.mkString(" ")
    s"(CASE $cases ELSE ${centroids.length - 1} END)"
  }

  /** Probe-bucket list SQL over a computed `bucket` varchar of `nBits`
    * chars: the bucket itself plus each 1-bit flip (same order as
    * `probeBuckets`; order is irrelevant post-join).
    */
  private def probeSql(nBits: Int): String = {
    val flips = (1 to nBits).map { i =>
      s"""substr(bucket,1,${i - 1}) ||
         | (CASE WHEN substr(bucket,$i,1)='1' THEN '0' ELSE '1' END) ||
         | substr(bucket,${i + 1},${nBits - i})""".stripMargin
    }
    ("bucket" +: flips).mkString("[", ",", "]")
  }

  /** Per-centroid dot-product scores over `e` as a SQL LIST — the list
    * form lets the probe oracle take argmax and runner-up via
    * `list_position`/`list_max` instead of a quadratic CASE blowup.
    * `list_position` returns the FIRST index of the max, the same tie
    * order as `centroidCell`'s first-match CASE chain.
    */
  private def scoreListSql: String =
    centroids.map { c =>
      val arr = c.mkString("[", ",", "]")
      s"""(SELECT sum(a*b) FROM (SELECT unnest(e) AS a,
         | unnest($arr::DOUBLE[]) AS b))""".stripMargin
    }.mkString("[", ",", "]")

  /** Shared cell-assignment CTE prefix for the IVF-probe oracles:
    * `a1` = (vec_id, e, sc, cell1); `a2` adds the winner-masked score list
    * `msc` whose argmax is the 2nd-nearest cell (same masking constant as
    * `Similarity.ivfProbeCells`).
    */
  private def ivfProbeCtes: String =
    s"""v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |s0 AS (SELECT vec_id, e, $scoreListSql AS sc FROM v),
       |a1 AS (SELECT vec_id, e, sc,
       |  list_position(sc, list_max(sc))-1 AS cell1 FROM s0),
       |a2 AS (SELECT vec_id, e, cell1,
       |  list_transform(generate_series(1,${centroids.length}),
       |    i -> CASE WHEN i-1=cell1 THEN -1.7976931348623157e308
       |         ELSE sc[i] END) AS msc
       |  FROM a1)""".stripMargin

  private val cosSql =
    """round(
      | (SELECT sum(a*b) FROM (SELECT unnest(q_vec) AS a, unnest(n_vec) AS b))
      | / (sqrt((SELECT sum(a*a) FROM (SELECT unnest(q_vec) AS a)))
      |    * sqrt((SELECT sum(b*b) FROM (SELECT unnest(n_vec) AS b)))), 6)""".stripMargin

  /** SQL replay of [[Similarity.kmeansCentroids]]: `cent0` holds the
    * seeded init as literals; each unrolled iteration assigns every
    * vector to its max-dot centroid (`row_number` ties → lowest cell,
    * the `centroidCell` rule) and rebuilds each cell's mean as an exact
    * DECIMAL sum cast to double over the count — the same
    * order-independent arithmetic the Spark side uses, so the trained
    * centroids are bit-identical. `aF` is the final assignment under
    * `cent{iters}`.
    */
  private def kmeansCtes(k: Int, iters: Int, seed: Long, dim: Int = 64,
                         vSrc: String = "v", p: String = "",
                         tSrc: String = null): String = {
    // Training scans read `tSrc` (the bounded training sample — the
    // 100 TB posture: k-means quality needs ~O(k·dim) effective samples,
    // not the corpus); the FINAL assignment `aF` always reads the full
    // `vSrc` — assignment is the part that must stay full-corpus.
    val trainSrc = Option(tSrc).getOrElse(vSrc)
    val init = Similarity.ivfCentroids(dim = dim, k = k, seed = seed)
    val cent0 = init.zipWithIndex
      .map { case (c, i) => s"($i, ${c.mkString("[", ",", "]")}::DOUBLE[])" }
      .mkString(s"${p}cent0(cell, c) AS (VALUES ", ", ", ")")
    def assign(t: String, cent: String, src: String) =
      s"""${p}sc$t AS (SELECT v.vec_id, v.e, ct.cell,
         |  (SELECT sum(a*b) FROM (SELECT unnest(v.e) AS a, unnest(ct.c) AS b)) AS s
         |  FROM $src v, $cent ct),
         |${p}a$t AS (SELECT vec_id, e, cell FROM (SELECT vec_id, e, cell,
         |  row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell) AS rn
         |  FROM ${p}sc$t) WHERE rn=1)""".stripMargin
    val iterCtes = (0 until iters).map { t =>
      s"""${assign(t.toString, s"${p}cent$t", trainSrc)},
         |${p}m$t AS (SELECT cell, g.i AS pos,
         |  CAST(sum(CAST(e[g.i] AS DECIMAL(25,12))) AS DOUBLE)/count(*) AS m
         |  FROM ${p}a$t, generate_series(1,$dim) AS g(i) GROUP BY 1,2),
         |${p}u$t AS (SELECT c0.cell, coalesce(mm.mc, c0.c) AS cv,
         |  sqrt((SELECT sum(y*y)
         |    FROM (SELECT unnest(coalesce(mm.mc, c0.c)) AS y))) AS nrm
         |  FROM ${p}cent$t c0 LEFT JOIN (SELECT cell, list(m ORDER BY pos) AS mc
         |    FROM ${p}m$t GROUP BY cell) mm ON c0.cell=mm.cell),
         |${p}cent${t + 1} AS (SELECT cell, CASE WHEN nrm=0 THEN cv
         |  ELSE list_transform(cv, y -> y/nrm) END AS c FROM ${p}u$t)""".stripMargin
    }.mkString(",\n")
    s"$cent0,\n$iterCtes,\n${assign("F", s"${p}cent$iters", vSrc)}"
  }

  /** SQL replay of [[graft.operators.Pq]]: per-subspace sliced views
    * (`e[lo:hi]`), one full k-means unroll per subspace (prefix `p<mi>_`),
    * then a `codes` table joining each vector's m cell assignments.
    * `p<mi>_cent<iters>` are the final codebooks the ADC score reads.
    */
  private def pqCtes(m: Int, sub: Int, k: Int, iters: Int,
                     seed: Long): String = {
    val per = (0 until m).map { mi =>
      s"""v$mi AS (SELECT vec_id, e[${mi * sub + 1}:${(mi + 1) * sub}] AS e
         |  FROM v),
         |${kmeansCtes(k, iters, seed + mi, dim = sub, vSrc = s"v$mi",
            p = s"p${mi}_")}""".stripMargin
    }.mkString(",\n")
    val codeSel = (0 until m).map(mi => s"a$mi.cell AS c$mi").mkString(", ")
    val codeJoin = (0 until m)
      .map(mi => s"JOIN p${mi}_aF a$mi ON a$mi.vec_id = v.vec_id")
      .mkString(" ")
    s"""$per,
       |codes AS (SELECT v.vec_id, $codeSel FROM v $codeJoin)""".stripMargin
  }

  /** The ADC score expression over `codes cd` joined to the final
    * codebooks `cb<mi>`: subspace dots summed in index order, rounded to
    * 6dp — the same fold the Spark side performs.
    */
  private def pqAdcSql(m: Int, sub: Int): String = {
    val terms = (0 until m).map { mi =>
      s"""(SELECT sum(a*b) FROM (SELECT
         |    unnest(q_vec[${mi * sub + 1}:${(mi + 1) * sub}]) AS a,
         |    unnest(cb$mi.c) AS b))""".stripMargin
    }.mkString(" + ")
    s"round($terms, 6)"
  }

  /** Shared replay for the trained-IVF top-k: training unrolled in SQL,
    * then cell-pruned cosine ranking — used by both the train-inline
    * query and the persisted-index query (which must agree exactly).
    */
  private lazy val trainedTopkSql =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |${kmeansCtes(k = 8, iters = 2, seed = 7L, tSrc = TrainSrc)},
       |q AS (SELECT vec_id AS q_id, cell, e AS q_vec FROM aF WHERE vec_id<5),
       |c AS (SELECT vec_id AS n_id, cell, e AS n_vec FROM aF),
       |s AS (SELECT q_id, n_id, $cosSql AS cos FROM c JOIN q USING (cell)
       |  WHERE n_id<>q_id),
       |r AS (SELECT q_id, n_id, cos,
       |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
       |  FROM s)
       |SELECT q_id, n_id, cos, rank FROM r WHERE rank<=5
       |ORDER BY q_id, rank""".stripMargin

  private lazy val pqJoinCbs = (0 until PqM)
    .map(mi => s"JOIN p${mi}_cent$PqIters cb$mi ON cb$mi.cell = cd.c$mi")
    .mkString(" ")

  /** Shared replay for the IVF-PQ top-k (train-inline and persisted —
    * the two must agree exactly).
    */
  private lazy val ivfpqTopkSql =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |${kmeansCtes(k = 8, iters = 2, seed = 7L, tSrc = TrainSrc)},
       |${pqCtes(PqM, PqSub, PqK, PqIters, PqSeed)},
       |q AS (SELECT vec_id AS q_id, cell, e AS q_vec FROM aF
       |  WHERE vec_id<5),
       |c AS (SELECT cd.vec_id AS n_id, aF.cell,
       |  ${(0 until PqM).map(mi => s"cd.c$mi").mkString(", ")}
       |  FROM codes cd JOIN aF ON aF.vec_id = cd.vec_id),
       |s AS (SELECT q_id, n_id, ${pqAdcSql(PqM, PqSub)} AS adc
       |  FROM c cd $pqJoinCbs JOIN q ON q.cell = cd.cell
       |  WHERE n_id<>q_id),
       |r AS (SELECT q_id, n_id, adc,
       |  row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, n_id) AS rank
       |  FROM s)
       |SELECT q_id, n_id, adc, rank FROM r WHERE rank<=5
       |ORDER BY q_id, rank""".stripMargin

  val oracles: Map[String, String] = Map(
    "sim_topk_pq" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |${pqCtes(PqM, PqSub, PqK, PqIters, PqSeed)},
         |q AS (SELECT vec_id AS q_id, e AS q_vec FROM v WHERE vec_id<5),
         |s AS (SELECT q_id, cd.vec_id AS n_id, ${pqAdcSql(PqM, PqSub)} AS adc
         |  FROM codes cd $pqJoinCbs CROSS JOIN q WHERE cd.vec_id<>q_id),
         |r AS (SELECT q_id, n_id, adc,
         |  row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, n_id) AS rank
         |  FROM s)
         |SELECT q_id, n_id, adc, rank FROM r WHERE rank<=5
         |ORDER BY q_id, rank""".stripMargin,
    "dq_drift_embedding" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |x AS (SELECT vec_id, g.i AS dim,
        |  CAST(floor(e[g.i]*4096) AS BIGINT) AS dx
        |  FROM v, generate_series(1,64) AS g(i)),
        |a AS (SELECT dim, CAST(sum(dx) AS DECIMAL(38,0)) AS sa
        |  FROM x WHERE vec_id%2=0 GROUP BY 1),
        |b AS (SELECT dim, CAST(sum(dx) AS DECIMAL(38,0)) AS sb
        |  FROM x WHERE vec_id%2=1 GROUP BY 1),
        |s AS (SELECT CAST(sum(sa*sb) AS DECIMAL(38,0)) AS ab,
        |  CAST(sum(sa*sa) AS DECIMAL(38,0)) AS aa,
        |  CAST(sum(sb*sb) AS DECIMAL(38,0)) AS bb
        |  FROM a JOIN b USING (dim))
        |SELECT (SELECT count(*) FROM v WHERE vec_id%2=0) AS n_a,
        |  (SELECT count(*) FROM v WHERE vec_id%2=1) AS n_b,
        |  CAST(ab AS DOUBLE)/(sqrt(CAST(aa AS DOUBLE))*sqrt(CAST(bb AS DOUBLE)))
        |    AS centroid_cosine
        |FROM s""".stripMargin,
    "sim_topk_ivfpq" -> ivfpqTopkSql,
    // Persisted index ≡ inline training: the SAME oracle must match
    // both (the persist/reload path proven lossless).
    "sim_topk_ivfpq_persist" -> ivfpqTopkSql,
    "sim_recall_pq" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |${pqCtes(PqM, PqSub, PqK, PqIters, PqSeed)},
         |q AS (SELECT vec_id AS q_id, e AS q_vec FROM v WHERE vec_id<5),
         |s AS (SELECT q_id, cd.vec_id AS n_id, ${pqAdcSql(PqM, PqSub)} AS adc
         |  FROM codes cd $pqJoinCbs CROSS JOIN q WHERE cd.vec_id<>q_id),
         |rp AS (SELECT q_id, n_id, row_number()
         |  OVER (PARTITION BY q_id ORDER BY adc DESC, n_id) AS rk FROM s),
         |f AS (SELECT q_id, n_id, $cosSql AS cos FROM
         |  (SELECT vec_id AS n_id, e AS n_vec FROM v) c2,
         |  (SELECT vec_id AS q_id, e AS q_vec FROM v WHERE vec_id<5) q2
         |  WHERE n_id <> q_id),
         |rf AS (SELECT q_id, n_id, row_number()
         |  OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk FROM f)
         |SELECT a.q_id, count(*) AS n_overlap
         |FROM (SELECT q_id, n_id FROM rp WHERE rk<=10) a
         |JOIN (SELECT q_id, n_id FROM rf WHERE rk<=10) b
         |  USING (q_id, n_id)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sim_topk_brute" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |q AS (SELECT vec_id AS q_id, e AS q_vec FROM v WHERE vec_id<5),
         |c AS (SELECT vec_id AS n_id, e AS n_vec FROM v),
         |s AS (SELECT q_id, n_id, $cosSql AS cos FROM c, q WHERE n_id<>q_id),
         |r AS (SELECT q_id, n_id, cos,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |  FROM s)
         |SELECT q_id, n_id, cos, rank FROM r WHERE rank<=10
         |ORDER BY q_id, rank""".stripMargin,
    "sim_dim_variance" ->
      """WITH v AS (SELECT CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings),
        |x AS (SELECT CAST(i - 1 AS BIGINT) AS dim,
        |  CAST(round(e[i] * 1000000) AS BIGINT) AS u
        |  FROM v, unnest(range(1, len(e) + 1)) AS r(i)),
        |m AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |  sum(CAST(u AS HUGEINT)) AS su,
        |  sum(CAST(u AS HUGEINT) * u) AS su2 FROM x GROUP BY 1)
        |SELECT dim, n,
        |  round(CAST(su AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * 1000000.0), 12) AS mean,
        |  round(CAST(n * su2 - su * su AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 1.0e12), 12)
        |    AS variance
        |FROM m ORDER BY dim""".stripMargin,
    "sim_bucket_balance" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |b AS (SELECT vec_id, e, $bucketSql AS bucket FROM v),
         |g AS (SELECT CAST(bucket AS BIGINT) AS bucket,
         |  CAST(count(*) AS BIGINT) AS n_vecs FROM b GROUP BY 1),
         |t AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS n_tot FROM g)
         |SELECT bucket, n_vecs,
         |  CAST(n_vecs AS DOUBLE) / CAST(n_tot AS DOUBLE) AS share,
         |  CAST((n_vecs * (n_vecs - 1)) // 2 AS BIGINT) AS n_pairs
         |FROM g, t ORDER BY bucket""".stripMargin,
    "sim_range_search" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |q AS (SELECT vec_id AS q_id, e AS q_vec FROM v WHERE vec_id<5),
         |c AS (SELECT vec_id AS n_id, e AS n_vec FROM v),
         |s AS (SELECT q_id, n_id, $cosSql AS cos FROM c, q WHERE n_id<>q_id)
         |SELECT q_id, n_id, cos FROM s WHERE cos >= 0.25
         |ORDER BY q_id, cos DESC, n_id""".stripMargin,
    "sim_mrr_label" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         |  label FROM embeddings),
         |q AS (SELECT vec_id AS q_id, e AS q_vec, label AS q_label
         |  FROM v WHERE vec_id < 20),
         |c AS (SELECT vec_id AS n_id, e AS n_vec, label AS n_label
         |  FROM v),
         |s AS (SELECT q_id, q_label, n_id, n_label, $cosSql AS cos
         |  FROM c, q WHERE n_id <> q_id),
         |r AS (SELECT q_id, q_label, n_label, row_number() OVER (
         |  PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank FROM s)
         |SELECT q_id, q_label,
         |  min(CASE WHEN n_label = q_label THEN rank END)
         |    AS first_rel_rank,
         |  count(*) FILTER (WHERE n_label = q_label AND rank <= 10)
         |    AS n_rel_top10,
         |  CAST(1.0 AS DOUBLE) /
         |    min(CASE WHEN n_label = q_label THEN rank END) AS rr
         |FROM r GROUP BY 1, 2 ORDER BY q_id""".stripMargin,
    "sim_ndcg_label" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         |  label FROM embeddings),
         |q AS (SELECT vec_id AS q_id, e AS q_vec, label AS q_label
         |  FROM v WHERE vec_id < 20),
         |c AS (SELECT vec_id AS n_id, e AS n_vec, label AS n_label
         |  FROM v),
         |s AS (SELECT q_id, q_label, n_id, n_label, $cosSql AS cos
         |  FROM c, q WHERE n_id <> q_id),
         |r AS (SELECT q_id, q_label, n_label, row_number() OVER (
         |  PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank FROM s),
         |a AS (SELECT q_id, q_label,
         |  CAST(coalesce(sum(([${NdcgW.mkString(", ")}])
         |    [CAST(rank AS INT)]) FILTER (
         |    WHERE n_label = q_label AND rank <= 10), 0) AS BIGINT)
         |    AS dcg_int,
         |  count(*) FILTER (WHERE n_label = q_label) AS n_rel
         |  FROM r GROUP BY 1, 2)
         |SELECT q_id, q_label, n_rel, dcg_int,
         |  CAST(([${NdcgC.mkString(", ")}])
         |    [CAST(least(n_rel, 10) AS INT)] AS BIGINT) AS idcg_int,
         |  round(CAST(dcg_int AS DOUBLE) / ([${NdcgC.mkString(", ")}])
         |    [CAST(least(n_rel, 10) AS INT)], 6) AS ndcg
         |FROM a ORDER BY q_id""".stripMargin,
    "sim_mmr_rerank" -> {
      // Greedy selection unrolled: round i picks the argmax of
      // 0.7·rel − 0.3·max(sim to r_{i−1}) among unselected candidates
      // (round 1 has no penalty term), ties to the lower id — the
      // exact comparison sequence of Similarity.mmrRerank.
      val rounds = (2 to 5).map { i =>
        s"""s$i AS (SELECT c.n_id, c.rel FROM cand c
           |  WHERE c.n_id NOT IN (SELECT n_id FROM r${i - 1})
           |  ORDER BY CAST(0.7 AS DOUBLE)*c.rel - CAST(0.3 AS DOUBLE)*
           |    (SELECT max(sim) FROM sims WHERE ia=c.n_id
           |      AND ib IN (SELECT n_id FROM r${i - 1})) DESC, c.n_id
           |  LIMIT 1),
           |r$i AS (SELECT n_id FROM r${i - 1}
           |  UNION ALL SELECT n_id FROM s$i)""".stripMargin
      }.mkString(",\n")
      val un = (2 to 5)
        .map(i => s"UNION ALL SELECT $i, n_id, rel FROM s$i")
        .mkString("\n")
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings),
         |qv AS (SELECT e AS q_vec FROM v WHERE vec_id = 0),
         |cs AS (SELECT vec_id AS n_id, e, round(
         |   (SELECT sum(x*y)
         |    FROM (SELECT unnest(q_vec) AS x, unnest(e) AS y))
         |   / (sqrt((SELECT sum(x*x) FROM (SELECT unnest(q_vec) AS x)))
         |      * sqrt((SELECT sum(y*y)
         |              FROM (SELECT unnest(e) AS y)))), 6) AS rel
         |  FROM v, qv WHERE vec_id <> 0),
         |cand AS (SELECT n_id, e, rel FROM cs
         |  ORDER BY rel DESC, n_id LIMIT 20),
         |sims AS (SELECT a.n_id AS ia, b.n_id AS ib, round(
         |   (SELECT sum(x*y)
         |    FROM (SELECT unnest(a.e) AS x, unnest(b.e) AS y))
         |   / (sqrt((SELECT sum(x*x) FROM (SELECT unnest(a.e) AS x)))
         |      * sqrt((SELECT sum(y*y)
         |              FROM (SELECT unnest(b.e) AS y)))), 6) AS sim
         |  FROM cand a JOIN cand b ON a.n_id <> b.n_id),
         |s1 AS (SELECT n_id, rel FROM cand
         |  ORDER BY CAST(0.7 AS DOUBLE)*rel DESC, n_id LIMIT 1),
         |r1 AS (SELECT n_id FROM s1),
         |$rounds
         |SELECT * FROM (
         |SELECT CAST(1 AS BIGINT) AS rank, n_id, rel FROM s1
         |$un)
         |ORDER BY rank""".stripMargin
    },
    "sim_hard_negatives" ->
      s"""WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings),
         |q AS (SELECT vec_id AS q_id, label AS q_label, e AS q_vec
         |  FROM v WHERE vec_id<5),
         |c AS (SELECT vec_id AS n_id, label AS n_label, e AS n_vec FROM v),
         |s AS (SELECT q_id, n_id, $cosSql AS cos FROM c, q
         |  WHERE n_label <> q_label),
         |r AS (SELECT q_id, n_id, cos,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id)
         |    AS rank
         |  FROM s)
         |SELECT q_id, n_id, cos, rank FROM r WHERE rank<=5
         |ORDER BY q_id, rank""".stripMargin,
    "sim_recall_int8" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |sc AS (SELECT vec_id, e,
         |  127.0/(SELECT max(abs(x)) FROM unnest(e) t(x)) AS s FROM v),
         |d8 AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |  (SELECT sum(CAST(round(a*q.s) AS BIGINT)
         |            * CAST(round(b*c.s) AS BIGINT))
         |   FROM (SELECT unnest(q.e) AS a, unnest(c.e) AS b)) AS dot
         |  FROM sc c, (SELECT * FROM sc WHERE vec_id<5) q
         |  WHERE c.vec_id <> q.vec_id),
         |r8 AS (SELECT q_id, n_id, row_number()
         |  OVER (PARTITION BY q_id ORDER BY dot DESC, n_id) AS rk FROM d8),
         |f AS (SELECT q_id, n_id, $cosSql AS cos FROM
         |  (SELECT vec_id AS n_id, e AS n_vec FROM v) c2,
         |  (SELECT vec_id AS q_id, e AS q_vec FROM v WHERE vec_id<5) q2
         |  WHERE n_id <> q_id),
         |rf AS (SELECT q_id, n_id, row_number()
         |  OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk FROM f)
         |SELECT a.q_id, count(*) AS n_overlap
         |FROM (SELECT q_id, n_id FROM r8 WHERE rk<=10) a
         |JOIN (SELECT q_id, n_id FROM rf WHERE rk<=10) b
         |  USING (q_id, n_id)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sim_quantize_int8" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |s AS (SELECT vec_id, e,
        |  127.0/(SELECT max(abs(x)) FROM unnest(e) t(x)) AS sc FROM v)
        |SELECT vec_id, round(sc,6) AS scale,
        |  CAST((SELECT sum(CAST(round(x*sc) AS BIGINT)
        |    *CAST(round(x*sc) AS BIGINT))
        |   FROM unnest(e) t(x)) AS BIGINT) AS qnorm2
        |FROM s ORDER BY vec_id""".stripMargin,
    "sim_topk_native" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |q AS (SELECT vec_id AS q_id, e AS q_vec FROM v WHERE vec_id<5),
         |c AS (SELECT vec_id AS n_id, e AS n_vec FROM v),
         |s AS (SELECT q_id, n_id, $cosSql AS cos FROM c, q WHERE n_id<>q_id),
         |r AS (SELECT q_id, n_id, cos,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |  FROM s)
         |SELECT q_id, n_id, cos, rank FROM r WHERE rank<=10
         |ORDER BY q_id, rank""".stripMargin,
    "sim_topk_lsh" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |b AS (SELECT vec_id, e, $bucketSql AS bucket FROM v),
         |q AS (SELECT vec_id AS q_id, bucket, e AS q_vec FROM b WHERE vec_id<5),
         |c AS (SELECT vec_id AS n_id, bucket, e AS n_vec FROM b),
         |s AS (SELECT q_id, n_id, $cosSql AS cos FROM c JOIN q USING (bucket)
         |  WHERE n_id<>q_id),
         |r AS (SELECT q_id, n_id, cos,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |  FROM s)
         |SELECT q_id, n_id, cos, rank FROM r WHERE rank<=5
         |ORDER BY q_id, rank""".stripMargin,
    "sim_neardup_cosine" ->
      s"""WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  a.e AS q_vec, b.e AS n_vec
         |  FROM v a JOIN v b ON a.label=b.label AND a.vec_id<b.vec_id),
         |s AS (SELECT id_a, id_b, $cosSql AS cos FROM p)
         |SELECT id_a, id_b, cos FROM s WHERE cos>=0.35 ORDER BY 1,2""".stripMargin,
    "sim_recall_pca" ->
      """SELECT CAST(1 AS BOOLEAN) AS recall_beats_random_5x,
        |CAST(1 AS BOOLEAN) AS recall_is_sane,
        |CAST(20 AS BIGINT) AS n_queries""".stripMargin,
    "sim_recall_trunc" ->
      """SELECT CAST(1 AS BOOLEAN) AS recall_beats_random_5x,
        |CAST(1 AS BOOLEAN) AS recall_is_sane,
        |CAST(20 AS BIGINT) AS n_queries""".stripMargin,
    "sim_pca" ->
      """SELECT CAST(1 AS BOOLEAN) AS var0_is_eigval,
        |CAST(1 AS BOOLEAN) AS var1_is_eigval,
        |CAST(1 AS BOOLEAN) AS projections_uncorrelated,
        |CAST(1 AS BOOLEAN) AS captures_at_least_uniform""".stripMargin,
    "sim_whiten" ->
      """WITH x AS (SELECT vec_id, CAST(i-1 AS INT) AS dim,
        |  CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT)
        |    AS dx
        |  FROM embeddings, (SELECT unnest(range(1, 65)) AS i)),
        |st AS (SELECT dim, sum(dx) AS s, sum(dx*dx) AS sq, count(*) AS n
        |  FROM x GROUP BY 1),
        |m AS (SELECT dim, CAST(s AS DOUBLE)/n AS mean,
        |  CAST(sq AS DOUBLE)/n
        |    - (CAST(s AS DOUBLE)/n)*(CAST(s AS DOUBLE)/n) AS vr
        |  FROM st)
        |SELECT x.vec_id, x.dim, (CAST(dx AS DOUBLE) - m.mean)/sqrt(m.vr) AS z
        |FROM x JOIN m USING (dim) WHERE vec_id < 5
        |ORDER BY 1, 2""".stripMargin,
    "sim_centroid_classify" ->
      """WITH x AS (SELECT vec_id, label, i-1 AS dim,
        |  CAST(floor(CAST(embedding[i] AS DOUBLE)*1048576) AS BIGINT)
        |    AS dx
        |  FROM embeddings, (SELECT unnest(range(1, 65)) AS i)),
        |cent AS (SELECT label AS c, dim, sum(dx) AS sv, count(*) AS n
        |  FROM x GROUP BY 1, 2),
        |dd AS (SELECT x.vec_id, x.label, cent.c,
        |    sum(CAST(cent.n*x.dx - cent.sv AS HUGEINT)
        |        * (cent.n*x.dx - cent.sv)) AS a,
        |    max(cent.n) AS n
        |  FROM x JOIN cent USING (dim) GROUP BY 1, 2, 3),
        |dist AS (SELECT vec_id, label, c,
        |    CAST(a AS DOUBLE)/(n*n) AS dist FROM dd),
        |p AS (SELECT vec_id, label, c,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, c)
        |      AS rk FROM dist)
        |SELECT label, c AS pred, count(*) AS n FROM p WHERE rk = 1
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "sim_semantic_kept" ->
      s"""WITH RECURSIVE v AS (SELECT vec_id, label,
         |  CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  a.e AS q_vec, b.e AS n_vec
         |  FROM v a JOIN v b ON a.label=b.label AND a.vec_id<b.vec_id),
         |s AS (SELECT id_a, id_b, $cosSql AS cos FROM p),
         |pairs AS (SELECT id_a, id_b FROM s WHERE cos>=0.35),
         |eg AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach(src, dst) AS (SELECT src, src FROM eg
         |  UNION SELECT eg.src, r.dst FROM eg JOIN reach r ON eg.dst=r.src),
         |cc AS (SELECT src AS node, min(dst) AS cluster FROM reach GROUP BY 1)
         |SELECT vec_id, label FROM embeddings
         |WHERE vec_id NOT IN (SELECT node FROM cc WHERE node<>cluster)
         |ORDER BY 1""".stripMargin,
    "sim_topk_lsh_probe" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |b AS (SELECT vec_id, e, $bucketSql AS bucket FROM v),
         |q0 AS (SELECT vec_id AS q_id, bucket, e AS q_vec FROM b WHERE vec_id<5),
         |q AS (SELECT q_id, q_vec, unnest(${probeSql(4)}) AS bucket FROM q0),
         |c AS (SELECT vec_id AS n_id, bucket, e AS n_vec FROM b),
         |s AS (SELECT q_id, n_id, $cosSql AS cos FROM c JOIN q USING (bucket)
         |  WHERE n_id<>q_id),
         |r AS (SELECT q_id, n_id, cos,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |  FROM s)
         |SELECT q_id, n_id, cos, rank FROM r WHERE rank<=5
         |ORDER BY q_id, rank""".stripMargin,
    "sim_topk_ivf_trained" -> trainedTopkSql,
    "sim_knn_join" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |${kmeansCtes(k = 8, iters = 2, seed = 7L, tSrc = TrainSrc)},
         |q AS (SELECT vec_id AS q_id, cell, e AS q_vec FROM aF),
         |c AS (SELECT vec_id AS n_id, cell, e AS n_vec FROM aF),
         |s AS (SELECT q_id, n_id, $cosSql AS cos FROM c JOIN q USING (cell)
         |  WHERE n_id<>q_id),
         |r AS (SELECT q_id, n_id, cos,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |  FROM s)
         |SELECT q_id, n_id, cos, rank FROM r WHERE rank<=3
         |ORDER BY q_id, rank""".stripMargin,
    "sim_cell_balance" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings),
         |${kmeansCtes(k = 8, iters = 2, seed = 7L, tSrc = TrainSrc)}
         |SELECT CAST(cell AS BIGINT) AS cell,
         |  CAST(count(*) AS BIGINT) AS n_vecs,
         |  (CAST(count(*) AS BIGINT) * (CAST(count(*) AS BIGINT) - 1))
         |    // 2 AS pairs
         |FROM aF GROUP BY 1 ORDER BY 1""".stripMargin,
    "sim_diverse_sample" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings),
         |${kmeansCtes(k = 8, iters = 2, seed = 7L, tSrc = TrainSrc)},
         |r AS (SELECT CAST(cell AS BIGINT) AS cell, vec_id,
         |  CAST(row_number() OVER (PARTITION BY cell ORDER BY vec_id)
         |    AS BIGINT) AS rank
         |  FROM aF)
         |SELECT cell, vec_id, rank FROM r WHERE rank <= 5
         |ORDER BY cell, rank""".stripMargin,
    "sim_anisotropy" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings),
        |x AS (SELECT vec_id, g.i AS dim,
        |  CAST(floor(e[g.i] * 4096) AS BIGINT) AS qx
        |  FROM v, generate_series(1, 64) AS g(i)),
        |dt AS (SELECT dim, CAST(sum(qx) AS DECIMAL(38,0)) AS sd
        |  FROM x GROUP BY 1),
        |cd AS (SELECT CAST(sum(sd * sd) AS DECIMAL(38,0)) AS centroid_dot
        |  FROM dt),
        |n2 AS (SELECT vec_id, sum(qx * qx) AS n2 FROM x GROUP BY 1),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(n2) AS DECIMAL(38,0)) AS sum_norm2 FROM n2)
        |SELECT s.n, CAST(s.sum_norm2 AS BIGINT) AS sum_norm2,
        |  CAST(cd.centroid_dot AS BIGINT) AS centroid_dot,
        |  CAST(cd.centroid_dot - s.sum_norm2 AS DOUBLE) /
        |    CAST(s.n * (s.n - 1) AS DOUBLE) AS mean_pair_dot
        |FROM s, cd""".stripMargin,
    "sim_norm_audit" ->
      """WITH v AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |  CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |x AS (SELECT vec_id, label,
        |  CAST(round(e[i] * 1000000) AS BIGINT) AS u
        |  FROM v, unnest(range(1, len(e) + 1)) AS r(i)),
        |n2 AS (SELECT vec_id, label, sum(CAST(u AS HUGEINT) * u) AS n2
        |  FROM x GROUP BY 1, 2),
        |f AS (SELECT label, n2 < 250000000000 AS dead,
        |  n2 > 4000000000000 AS exploding FROM n2)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(sum(CASE WHEN dead THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dead,
        |  CAST(sum(CASE WHEN exploding THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_exploding,
        |  CAST(sum(CASE WHEN dead OR exploding THEN 1 ELSE 0 END)
        |    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS flagged_share
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "sim_label_separation" ->
      """WITH v AS (SELECT label, CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings),
        |x AS (SELECT CAST(label AS BIGINT) AS label,
        |  CAST(i - 1 AS BIGINT) AS dim,
        |  CAST(round(e[i] * 1000000) AS BIGINT) AS u
        |  FROM v, unnest(range(1, len(e) + 1)) AS r(i)),
        |sm AS (SELECT label, dim, sum(CAST(u AS HUGEINT)) AS su
        |  FROM x GROUP BY 1, 2),
        |nm AS (SELECT label, sum(su * su) AS n2 FROM sm GROUP BY 1),
        |p AS (SELECT a.label AS la, b.label AS lb,
        |  sum(a.su * b.su) AS dot
        |  FROM sm a JOIN sm b ON a.dim = b.dim AND a.label < b.label
        |  GROUP BY 1, 2)
        |SELECT p.la AS label_a, p.lb AS label_b,
        |  round(CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE))
        |    * sqrt(CAST(nb.n2 AS DOUBLE))), 12) AS centroid_cos
        |FROM p JOIN nm na ON p.la = na.label
        |JOIN nm nb ON p.lb = nb.label
        |ORDER BY 1, 2""".stripMargin,
    "sim_knn_purity" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |${kmeansCtes(k = 8, iters = 2, seed = 7L, tSrc = TrainSrc)},
         |q AS (SELECT vec_id AS q_id, cell, e AS q_vec FROM aF),
         |c AS (SELECT vec_id AS n_id, cell, e AS n_vec FROM aF),
         |s AS (SELECT q_id, n_id, $cosSql AS cos FROM c JOIN q USING (cell)
         |  WHERE n_id<>q_id),
         |r AS (SELECT q_id, n_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id)
         |    AS rank FROM s),
         |k3 AS (SELECT q_id, n_id FROM r WHERE rank <= 3),
         |lb AS (SELECT vec_id, label FROM embeddings)
         |SELECT ql.label,
         |  CAST(count(DISTINCT k3.q_id) AS BIGINT) AS n_queries,
         |  CAST(count(*) AS BIGINT) AS n_neighbors,
         |  CAST(sum(CASE WHEN ql.label = nl.label THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_same,
         |  CAST(sum(CASE WHEN ql.label = nl.label THEN 1 ELSE 0 END)
         |    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS purity
         |FROM k3 JOIN lb ql ON k3.q_id = ql.vec_id
         |JOIN lb nl ON k3.n_id = nl.vec_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // The persisted-index path must return EXACTLY the train-inline
    // result — same oracle.
    "sim_topk_ivf_persist" -> trainedTopkSql,
    "sim_recall_ivf_trained" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |${kmeansCtes(k = 8, iters = 2, seed = 7L, tSrc = TrainSrc)},
         |sb AS (SELECT vec_id, e, $cellSql AS cell FROM v),
         |q0 AS (SELECT vec_id AS q_id, e AS q_vec FROM v WHERE vec_id<5),
         |bs AS (SELECT q_id, n_id, $cosSql AS cos FROM
         |  (SELECT vec_id AS n_id, e AS n_vec FROM v) c, q0 WHERE n_id<>q_id),
         |brute AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |  FROM bs) WHERE rank<=5),
         |ss AS (SELECT q_id, n_id, $cosSql AS cos
         |  FROM (SELECT vec_id AS n_id, cell, e AS n_vec FROM sb) c
         |  JOIN (SELECT vec_id AS q_id, cell, e AS q_vec FROM sb
         |    WHERE vec_id<5) q USING (cell)
         |  WHERE n_id<>q_id),
         |seeded AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |  FROM ss) WHERE rank<=5),
         |ts AS (SELECT q_id, n_id, $cosSql AS cos
         |  FROM (SELECT vec_id AS n_id, cell, e AS n_vec FROM aF) c
         |  JOIN (SELECT vec_id AS q_id, cell, e AS q_vec FROM aF
         |    WHERE vec_id<5) q USING (cell)
         |  WHERE n_id<>q_id),
         |trained AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |  FROM ts) WHERE rank<=5)
         |SELECT brute.q_id,
         |  CAST(count(seeded.n_id) AS DOUBLE)/5 AS recall_seeded,
         |  CAST(count(trained.n_id) AS DOUBLE)/5 AS recall_trained
         |FROM brute
         |LEFT JOIN seeded ON brute.q_id=seeded.q_id AND brute.n_id=seeded.n_id
         |LEFT JOIN trained ON brute.q_id=trained.q_id AND brute.n_id=trained.n_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sim_recall_lsh" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |b AS (SELECT vec_id, e, $bucketSql AS bucket FROM v),
         |q AS (SELECT vec_id AS q_id, bucket, e AS q_vec FROM b WHERE vec_id<5),
         |c AS (SELECT vec_id AS n_id, bucket, e AS n_vec FROM b),
         |bs AS (SELECT q_id, n_id, $cosSql AS cos FROM c, q WHERE n_id<>q_id),
         |brute AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |  FROM bs) WHERE rank<=5),
         |ls AS (SELECT q_id, n_id, $cosSql AS cos FROM c JOIN q USING (bucket)
         |  WHERE n_id<>q_id),
         |lsh AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |  FROM ls) WHERE rank<=5)
         |SELECT brute.q_id, CAST(count(lsh.n_id) AS DOUBLE)/5 AS recall
         |FROM brute LEFT JOIN lsh ON brute.q_id=lsh.q_id AND brute.n_id=lsh.n_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sim_topk_bq" -> bqTopkSql,
    // The persisted-code-table path must return EXACTLY the inline
    // result — same oracle.
    "sim_topk_bq_persist" -> bqTopkSql,
    "sim_recall_bq" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |b AS (SELECT vec_id, e, $bqCodeSql AS code FROM v),
         |q AS (SELECT vec_id AS q_id, e AS q_vec, code AS q_code FROM b WHERE vec_id<5),
         |c AS (SELECT vec_id AS n_id, e AS n_vec, code AS n_code FROM b),
         |bs AS (SELECT q_id, n_id, q_code, n_code, $cosSql AS cos
         |  FROM c, q WHERE n_id<>q_id),
         |brute AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |  FROM bs) WHERE rank<=10),
         |t0 AS (SELECT q_id, n_id, cos, $hamSql AS ham FROM bs),
         |t AS (SELECT q_id, n_id, cos,
         |  row_number() OVER (PARTITION BY q_id ORDER BY ham, n_id) AS crank
         |  FROM t0),
         |bq AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |  FROM t WHERE crank<=50) WHERE rank<=10)
         |SELECT brute.q_id, CAST(count(bq.n_id) AS BIGINT) AS n_overlap
         |FROM brute LEFT JOIN bq ON brute.q_id=bq.q_id AND brute.n_id=bq.n_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sim_topk_ivf_bq" -> ivfBqTopkSql,
    // Persisted composed index ≡ inline composition, bit for bit.
    "sim_topk_ivf_bq_persist" -> ivfBqTopkSql,
    "sim_recall_ivf_bq" ->
      s"""WITH $ivfProbeCtes,
         |b AS (SELECT vec_id, e, cell1, msc, $bqCodeSql AS code FROM a2),
         |q AS (SELECT vec_id AS q_id, e AS q_vec, code AS q_code,
         |  cell1, msc FROM b WHERE vec_id<5),
         |bs AS (SELECT q_id, n_id, $cosSql AS cos FROM
         |  (SELECT vec_id AS n_id, e AS n_vec FROM b) c, q WHERE n_id<>q_id),
         |brute AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |  FROM bs) WHERE rank<=10),
         |qp AS (SELECT q_id, q_code,
         |  unnest([cell1, list_position(msc, list_max(msc))-1]) AS cell FROM q),
         |c2 AS (SELECT vec_id AS n_id, code AS n_code, cell1 AS cell FROM b),
         |h AS (SELECT q_id, n_id, $hamSql AS ham
         |  FROM c2 JOIN qp USING (cell) WHERE n_id<>q_id),
         |t AS (SELECT q_id, n_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY ham, n_id) AS crank
         |  FROM h),
         |rr AS (SELECT bs.q_id, bs.n_id, bs.cos FROM bs
         |  JOIN t ON t.q_id=bs.q_id AND t.n_id=bs.n_id AND t.crank<=50),
         |bqr AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |  FROM rr) WHERE rank<=10)
         |SELECT brute.q_id, CAST(count(bqr.n_id) AS BIGINT) AS n_overlap
         |FROM brute LEFT JOIN bqr
         |  ON brute.q_id=bqr.q_id AND brute.n_id=bqr.n_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sim_topk_ivf_centroid" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |b AS (SELECT vec_id, e, $cellSql AS cell FROM v),
         |q AS (SELECT vec_id AS q_id, cell, e AS q_vec FROM b WHERE vec_id<5),
         |c AS (SELECT vec_id AS n_id, cell, e AS n_vec FROM b),
         |s AS (SELECT q_id, n_id, $cosSql AS cos FROM c JOIN q USING (cell)
         |  WHERE n_id<>q_id),
         |r AS (SELECT q_id, n_id, cos,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |  FROM s)
         |SELECT q_id, n_id, cos, rank FROM r WHERE rank<=5
         |ORDER BY q_id, rank""".stripMargin,
    "sim_topk_ivf_probe" ->
      s"""WITH $ivfProbeCtes,
         |q AS (SELECT vec_id AS q_id, e AS q_vec,
         |  unnest([cell1, list_position(msc, list_max(msc))-1]) AS cell
         |  FROM a2 WHERE vec_id<5),
         |c AS (SELECT vec_id AS n_id, cell1 AS cell, e AS n_vec FROM a1),
         |s AS (SELECT q_id, n_id, $cosSql AS cos FROM c JOIN q USING (cell)
         |  WHERE n_id<>q_id),
         |r AS (SELECT q_id, n_id, cos,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |  FROM s)
         |SELECT q_id, n_id, cos, rank FROM r WHERE rank<=5
         |ORDER BY q_id, rank""".stripMargin,
    "sim_topk_ivf_trained_probe" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |${kmeansCtes(k = 8, iters = 2, seed = 7L, tSrc = TrainSrc)},
         |q0 AS (SELECT vec_id, e FROM v WHERE vec_id<5),
         |qs AS (SELECT q0.vec_id, q0.e, ct.cell,
         |  (SELECT sum(a*b) FROM (SELECT unnest(q0.e) AS a, unnest(ct.c) AS b)) AS s
         |  FROM q0, cent2 ct),
         |q AS (SELECT vec_id AS q_id, e AS q_vec, cell FROM (
         |  SELECT vec_id, e, cell,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell) AS rn
         |  FROM qs) WHERE rn<=2),
         |c AS (SELECT vec_id AS n_id, cell, e AS n_vec FROM aF),
         |s AS (SELECT q_id, n_id, $cosSql AS cos FROM c JOIN q USING (cell)
         |  WHERE n_id<>q_id),
         |r AS (SELECT q_id, n_id, cos,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |  FROM s)
         |SELECT q_id, n_id, cos, rank FROM r WHERE rank<=5
         |ORDER BY q_id, rank""".stripMargin,
    "sim_recall_ivf" ->
      s"""WITH $ivfProbeCtes,
         |q0 AS (SELECT vec_id AS q_id, cell1, msc, e AS q_vec FROM a2 WHERE vec_id<5),
         |qp AS (SELECT q_id, q_vec,
         |  unnest([cell1, list_position(msc, list_max(msc))-1]) AS cell FROM q0),
         |c AS (SELECT vec_id AS n_id, cell1 AS cell, e AS n_vec FROM a1),
         |bs AS (SELECT q_id, n_id, $cosSql AS cos
         |  FROM c, (SELECT q_id, q_vec FROM q0) q WHERE n_id<>q_id),
         |brute AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |  FROM bs) WHERE rank<=5),
         |ss AS (SELECT q_id, n_id, $cosSql AS cos
         |  FROM c JOIN (SELECT q_id, cell1 AS cell, q_vec FROM q0) q USING (cell)
         |  WHERE n_id<>q_id),
         |single AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |  FROM ss) WHERE rank<=5),
         |ps AS (SELECT q_id, n_id, $cosSql AS cos FROM c JOIN qp q USING (cell)
         |  WHERE n_id<>q_id),
         |probe AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |  FROM ps) WHERE rank<=5)
         |SELECT brute.q_id,
         |  CAST(count(single.n_id) AS DOUBLE)/5 AS recall_cell,
         |  CAST(count(probe.n_id) AS DOUBLE)/5 AS recall_probe
         |FROM brute
         |LEFT JOIN single ON brute.q_id=single.q_id AND brute.n_id=single.n_id
         |LEFT JOIN probe ON brute.q_id=probe.q_id AND brute.n_id=probe.n_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sim_topk_ivf" ->
      s"""WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |q AS (SELECT vec_id AS q_id, label, e AS q_vec FROM v WHERE vec_id<5),
         |c AS (SELECT vec_id AS n_id, label, e AS n_vec FROM v),
         |s AS (SELECT q_id, n_id, $cosSql AS cos FROM c JOIN q USING (label)
         |  WHERE n_id<>q_id),
         |r AS (SELECT q_id, n_id, cos,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
         |  FROM s)
         |SELECT q_id, n_id, cos, rank FROM r WHERE rank<=5
         |ORDER BY q_id, rank""".stripMargin
  )
}
