package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Chunking, Retrieval, Sketches}
import graft.sources.Tables

/** Retrieval/sketch surface: sliding-window chunking, BM25 corpus scoring,
  * count–min heavy hitters, and bloom-pruned incremental dedup. Every
  * oracle replays the same md5/rational-arithmetic construction in DuckDB
  * SQL, so estimates and scores are compared EXACTLY, not within a band.
  */
object RetrievalQueries {
  // Spread the single-split documents scan before per-row hashing work
  // (Tables.spread: guide §2.5; no-op at production split counts).
  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.loadSpread(s, d, "documents", "doc_id")

  private val ChunkSize = 8
  private val ChunkStride = 5
  private val Bm25Terms = Seq("scan", "hash", "merge")
  private val CmsDepth = 3
  private val CmsPrefix = 2
  private val BloomPrefix = 2

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Overlapping token windows (size 8, stride 5) — per-row generator,
    // no shuffle; ORDER BY only for the compare.
    "t_chunk_overlap" -> ((s, d) =>
      Chunking.chunk(docs(s, d), "doc_id", "text", ChunkSize, ChunkStride)
        .orderBy(col("doc_id"), col("chunk_ix"))),

    // BM25 (rational idf) against a fixed query; top-20 by score with a
    // deterministic doc_id tie-break at the cut.
    "t_bm25" -> ((s, d) =>
      Retrieval.bm25(docs(s, d), "doc_id", "text", Bm25Terms)
        .orderBy(col("score").desc, col("doc_id")).limit(20)),

    // Count–min heavy hitters over event users: exact top-10 vs the
    // sketch estimate, compared cell-exactly by the oracle.
    "t_cms_heavy" -> ((s, d) =>
      Sketches.cmsHeavyHitters(
          Tables.load(s, d, "events"), "user_id",
          k = 10, depth = CmsDepth, prefixLen = CmsPrefix)
        .orderBy(col("exact_cnt").desc, col("k"))),

    // KMV theta-sketch pairwise audience overlap across event types:
    // Jaccard/intersection of distinct-user sets from k-bounded sketches
    // (the set op HLL's max-merge can never answer), exact truth riding
    // beside the estimate. Sketch contents AND estimates replay exactly
    // in the oracle (lexicographic md5 k-minima, m/k int division).
    "t_kmv_overlap" -> ((s, d) =>
      Sketches.kmvPairwiseOverlap(
          Tables.load(s, d, "events"), "event_type", "user_id", k = 64)
        .orderBy(col("ga"), col("gb"))),

    // The STREAMED KMV face under the driver's own gate — events
    // replayed as three deterministic micro-batches through
    // KmvStream.applyBatch (min-k re-minimization: idempotent algebra,
    // the write-then-swap recipe, no partial directories needed), then
    // pairwise Jaccard answered FROM STATE alone. The streamed sketch
    // equals the one-shot sketch HASH-FOR-HASH on any batching
    // (KmvStreamSpec), so the estimates land on the batch oracle's
    // sketch half exactly — the exact-truth columns are the one thing
    // state cannot answer, which is the point of keeping it.
    "t_kmv_overlap_stream" -> ((s, d) => {
      val st = Tables.freshScratchDir("kmv_stream", d) + "/state"
      val ev = Tables.load(s, d, "events")
      (0 to 2).foreach { i =>
        // coalesce: the split must PARTITION the table — a null
        // event_id would otherwise match no batch and silently drop
        // its (type, user) pair from the streamed sketch.
        graft.streaming.KmvStream.applyBatch(
          ev.where(pmod(coalesce(col("event_id"), lit(0L)), lit(3)) === i),
          st, "event_type", "user_id", k = 64)
      }
      graft.streaming.KmvStream.pairwiseEstimates(s, st, k = 64)
        .orderBy(col("ga"), col("gb"))
    }),

    // Inverted-index build (long-form postings, DF band [2, 50] — the
    // stop-term cap discipline) + conjunctive retrieval THROUGH it.
    "t_inverted_index" -> ((s, d) =>
      Retrieval.invertedIndex(docs(s, d), "doc_id", "text",
          minDf = 2, maxDf = 50)
        .orderBy(col("term"), col("doc_id"))),

    // AND query answered from postings only (corpus never rescanned);
    // oracle answers it by direct text scan — index ≡ scan proven.
    "t_index_and_query" -> ((s, d) =>
      Retrieval.conjunctiveQuery(
        Retrieval.invertedIndex(docs(s, d), "doc_id", "text",
          minDf = 1, maxDf = Int.MaxValue),
        Bm25Terms).orderBy(col("doc_id"))),

    // AGMS join-size estimate from two counter grids (lineitem ⋈ part on
    // partkey): grids touched, rows never joined. Oracle replays both
    // grids and the min-of-seeds inner product EXACTLY.
    "t_cms_join_size" -> ((s, d) =>
      Sketches.cmsJoinSize(
        Tables.load(s, d, "lineitem"), "l_partkey",
        Tables.load(s, d, "part"), "p_partkey",
        depth = CmsDepth, prefixLen = CmsPrefix)),

    // The STREAMED AGMS face under the driver's own gate — both sides'
    // counter grids maintained by replayed micro-batches (lineitem in
    // two partkey-parity batches, part in three), each compacted by
    // PartialState.compact mid-replay (so compaction itself sits under
    // the oracle), then the join-size read off the two state tables
    // with neither stream re-read. CM linearity makes the streamed
    // estimate equal the one-shot batch est_size EXACTLY on any
    // batching — the oracle is t_cms_join_size's sketch half.
    "t_cms_join_size_stream" -> ((s, d) => {
      val st = Tables.freshScratchDir("cms_js_stream", d)
      val li = Tables.load(s, d, "lineitem")
      val pt = Tables.load(s, d, "part")
      graft.streaming.CmsStream.applyBatch(
        li.where(pmod(col("l_partkey"), lit(2)) === 0), 0L,
        s"$st/a", "l_partkey", CmsDepth, CmsPrefix)
      graft.streaming.CmsStream.compact(s, s"$st/a")
      graft.streaming.CmsStream.applyBatch(
        li.where(pmod(col("l_partkey"), lit(2)) === 1), 1L,
        s"$st/a", "l_partkey", CmsDepth, CmsPrefix)
      (0 to 2).foreach(i => graft.streaming.CmsStream.applyBatch(
        pt.where(pmod(col("p_partkey"), lit(3)) === i), i.toLong,
        s"$st/b", "p_partkey", CmsDepth, CmsPrefix))
      graft.streaming.CmsStream.compact(s, s"$st/b")
      graft.streaming.CmsStream.joinSizeEstimate(s, s"$st/a", s"$st/b")
    }),

    // Self-join size Σf(k)² of lineitem.l_partkey — the skew statistic a
    // planner reads before picking a join strategy.
    "t_cms_selfjoin_size" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
      Sketches.cmsJoinSize(li, "l_partkey", li, "l_partkey",
        depth = CmsDepth, prefixLen = CmsPrefix)
    }),

    // Bloom-(prefix-bitmap-)pruned incremental dedup ≡ plain anti-join:
    // the oracle is the UNPRUNED semantics, so a green row proves the
    // membership prune drops and invents nothing.
    "t_dedup_bloom" -> ((s, d) => {
      val all = docs(s, d)
      Sketches.bloomPrunedNewRows(
          all.where(pmod(col("doc_id"), lit(3)) === 0),
          all.where(pmod(col("doc_id"), lit(3)) =!= 0),
          "doc_id", "text", prefixLen = BloomPrefix)
        .orderBy(col("doc_id"))
    }),

    // Reciprocal-rank fusion — HYBRID retrieval, the shape a RAG stack
    // actually serves: lexical BM25 top-20 and embedding-cosine top-20
    // (query = vector 0) fused by rrf = Σ 1/(60+rank). Both rankings
    // cut to top-k BEFORE fusing (TakeOrderedAndProject — no global
    // sort materializes at any corpus size); the rank windows then run
    // over ≤20 rows. Absent-from-one-ranking docs take a fixed penalty
    // rank of 1000. The rrf double is two correctly-rounded divisions
    // + one addition in fixed order — bit-stable on both engines.
    "t_rrf_fusion" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val bmTop = Retrieval.bm25(docs(s, d), "doc_id", "text", Bm25Terms)
        .orderBy(col("score").desc, col("doc_id")).limit(20)
        .withColumn("r_bm", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("r_bm"))
      val v = Tables.load(s, d, "embeddings")
      val q = v.where(col("vec_id") === 0)
        .select(col("embedding").as("q_vec"))
      val cosTop = v.where(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id").as("doc_id"),
          round(graft.operators.Similarity.cosine(
            col("q_vec"), col("embedding")), 6).as("cos"))
        .orderBy(col("cos").desc, col("doc_id")).limit(20)
        .withColumn("r_cos", row_number().over(
          Window.orderBy(col("cos").desc, col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("r_cos"))
      bmTop.join(cosTop, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("r_bm"), lit(1000L)).as("r_bm"),
          coalesce(col("r_cos"), lit(1000L)).as("r_cos"))
        .withColumn("rrf",
          lit(1.0) / (col("r_bm") + 60) + lit(1.0) / (col("r_cos") + 60))
        .orderBy(col("rrf").desc, col("doc_id"))
    }),

    // Cross-document duplicated-span fraction: of each doc's distinct
    // 8-gram spans, what share also appears in ANOTHER doc — the
    // memorization-risk / boilerplate profile that decides whether a
    // source needs span-level dedup before training. One shuffle on the
    // gram (distinct-doc counts), one map-side join back; never pairwise.
    "t_dup_spans" -> ((s, d) => {
      val grams = docs(s, d).select(col("doc_id"),
        explode(graft.functions.TextFunctions.shingles(col("text"), 8))
          .as("g"))
      // shingles() is per-doc distinct, so each doc contributes one row
      // per gram: count(*) ≡ count(DISTINCT doc_id) without the
      // distinct-aggregate expand.
      val df8 = grams.groupBy(col("g"))
        .agg(count(lit(1)).as("ndocs"))
      grams.join(df8, Seq("g"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("long").as("n_grams"),
          sum(when(col("ndocs") > 1, 1L).otherwise(0L))
            .cast("long").as("dup_grams"))
        .withColumn("dup_frac",
          col("dup_grams").cast("double") / col("n_grams"))
        .orderBy(col("doc_id"))
    }))

  private val wsSql = "regexp_split_to_array(lower(trim(text)), '\\s+')"
  private val nSql =
    s"CASE WHEN length(trim(text))=0 THEN 0 ELSE len($wsSql) END"

  /** BM25 scoring pieces shared by the t_bm25 and t_rrf_fusion oracles. */
  private val bm25TermSql = Bm25Terms.zipWithIndex.map { case (t, i) =>
    s"""((CAST(n_docs AS DOUBLE) - df_$i + 0.5) / (df_$i + 0.5))
       | * (CAST(len(list_filter(ws, x -> x = '$t')) AS DOUBLE)
       |      * (1.2 + 1))
       |   / (CAST(len(list_filter(ws, x -> x = '$t')) AS DOUBLE)
       |      + 1.2 * ((1 - 0.75)
       |               + 0.75 * (dl / (CAST(tot_dl AS DOUBLE)/n_docs))))"""
      .stripMargin.replace("\n", " ")
  }.mkString(" + ")
  private val bm25Ctes = {
    val dfSql = Bm25Terms.zipWithIndex.map { case (t, i) =>
      s"sum(CASE WHEN list_contains(ws, '$t') THEN 1 ELSE 0 END) AS df_$i"
    }.mkString(", ")
    s"""b AS (SELECT doc_id, $wsSql AS ws,
       |  CAST($nSql AS BIGINT) AS dl FROM documents),
       |st AS (SELECT count(*) AS n_docs, sum(dl) AS tot_dl, $dfSql
       |  FROM b)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "t_chunk_overlap" ->
      s"""WITH t AS (SELECT doc_id, $wsSql AS ws,
         |  CAST($nSql AS BIGINT) AS n FROM documents),
         |c AS (SELECT doc_id, ws, n,
         |  CAST(floor((greatest(n - $ChunkSize, 0) + ${ChunkStride - 1})
         |    / $ChunkStride.0) AS BIGINT) + 1 AS nc FROM t),
         |e AS (SELECT doc_id, ws, n, unnest(range(0, nc)) AS chunk_ix
         |  FROM c)
         |SELECT doc_id, chunk_ix,
         |  least($ChunkSize, n - chunk_ix*$ChunkStride) AS n_chunk_tokens,
         |  array_to_string(list_slice(ws, chunk_ix*$ChunkStride + 1,
         |    chunk_ix*$ChunkStride + $ChunkSize), ' ') AS chunk_text
         |FROM e ORDER BY doc_id, chunk_ix""".stripMargin,

    "t_bm25" ->
      s"""WITH $bm25Ctes
         |SELECT doc_id, $bm25TermSql AS score FROM b, st
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    "t_rrf_fusion" ->
      s"""WITH $bm25Ctes,
         |bm AS (SELECT doc_id, $bm25TermSql AS score FROM b, st
         |  ORDER BY score DESC, doc_id LIMIT 20),
         |bmr AS (SELECT doc_id, row_number() OVER
         |  (ORDER BY score DESC, doc_id) AS r_bm FROM bm),
         |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings),
         |qv AS (SELECT e AS q_vec FROM v WHERE vec_id = 0),
         |cs AS (SELECT vec_id AS doc_id, round(
         |   (SELECT sum(a*b2)
         |    FROM (SELECT unnest(q_vec) AS a, unnest(e) AS b2))
         |   / (sqrt((SELECT sum(a*a) FROM (SELECT unnest(q_vec) AS a)))
         |      * sqrt((SELECT sum(b2*b2)
         |              FROM (SELECT unnest(e) AS b2)))), 6) AS cos
         |  FROM v, qv WHERE vec_id <> 0),
         |ct AS (SELECT doc_id, cos FROM cs
         |  ORDER BY cos DESC, doc_id LIMIT 20),
         |ctr AS (SELECT doc_id, row_number() OVER
         |  (ORDER BY cos DESC, doc_id) AS r_cos FROM ct),
         |f AS (SELECT coalesce(bmr.doc_id, ctr.doc_id) AS doc_id,
         |  CAST(coalesce(r_bm, 1000) AS BIGINT) AS r_bm,
         |  CAST(coalesce(r_cos, 1000) AS BIGINT) AS r_cos
         |  FROM bmr FULL OUTER JOIN ctr ON bmr.doc_id = ctr.doc_id)
         |SELECT doc_id, r_bm, r_cos,
         |  CAST(1 AS DOUBLE)/(r_bm+60) + CAST(1 AS DOUBLE)/(r_cos+60)
         |    AS rrf
         |FROM f ORDER BY rrf DESC, doc_id""".stripMargin,

    // The streamed face's oracle is the batch oracle's SKETCH HALF
    // (same CTEs, minus the exact-truth columns state cannot answer):
    // min-k idempotence makes streamed state ≡ the one-shot sketch
    // hash-for-hash on any batching.
    "t_kmv_overlap_stream" ->
      """WITH dv AS (SELECT DISTINCT event_type AS g,
        |  CAST(user_id AS VARCHAR) AS v FROM events
        |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
        |hv AS (SELECT g, md5(v) AS h FROM dv),
        |sk AS (SELECT g, h FROM (SELECT g, h, row_number() OVER
        |    (PARTITION BY g ORDER BY h) AS rn FROM hv) WHERE rn <= 64),
        |pairs AS (SELECT a.g AS ga, b.g AS gb
        |  FROM (SELECT DISTINCT g FROM sk) a
        |  JOIN (SELECT DISTINCT g FROM sk) b ON a.g < b.g),
        |u0 AS (SELECT DISTINCT ga, gb, h FROM (
        |  SELECT p.ga, p.gb, s.h FROM pairs p JOIN sk s ON s.g = p.ga
        |  UNION ALL
        |  SELECT p.ga, p.gb, s.h FROM pairs p JOIN sk s ON s.g = p.gb)),
        |u AS (SELECT ga, gb, h FROM (SELECT ga, gb, h, row_number() OVER
        |    (PARTITION BY ga, gb ORDER BY h) AS rn FROM u0)
        |  WHERE rn <= 64)
        |SELECT u.ga, u.gb,
        |  CAST(sum(CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS m,
        |  count(*) AS k_used,
        |  CAST(sum(CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL
        |    THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS jaccard_est
        |FROM u LEFT JOIN sk sa ON sa.g = u.ga AND sa.h = u.h
        |LEFT JOIN sk sb ON sb.g = u.gb AND sb.h = u.h
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "t_kmv_overlap" ->
      """WITH dv AS (SELECT DISTINCT event_type AS g,
        |  CAST(user_id AS VARCHAR) AS v FROM events
        |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
        |hv AS (SELECT g, md5(v) AS h FROM dv),
        |sk AS (SELECT g, h FROM (SELECT g, h, row_number() OVER
        |    (PARTITION BY g ORDER BY h) AS rn FROM hv) WHERE rn <= 64),
        |pairs AS (SELECT a.g AS ga, b.g AS gb
        |  FROM (SELECT DISTINCT g FROM sk) a
        |  JOIN (SELECT DISTINCT g FROM sk) b ON a.g < b.g),
        |u0 AS (SELECT DISTINCT ga, gb, h FROM (
        |  SELECT p.ga, p.gb, s.h FROM pairs p JOIN sk s ON s.g = p.ga
        |  UNION ALL
        |  SELECT p.ga, p.gb, s.h FROM pairs p JOIN sk s ON s.g = p.gb)),
        |u AS (SELECT ga, gb, h FROM (SELECT ga, gb, h, row_number() OVER
        |    (PARTITION BY ga, gb ORDER BY h) AS rn FROM u0)
        |  WHERE rn <= 64),
        |mm AS (SELECT u.ga, u.gb, count(*) AS k_used,
        |  CAST(sum(CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS m
        |  FROM u LEFT JOIN sk sa ON sa.g = u.ga AND sa.h = u.h
        |  LEFT JOIN sk sb ON sb.g = u.gb AND sb.h = u.h
        |  GROUP BY 1, 2),
        |n AS (SELECT g, count(*) AS n FROM dv GROUP BY 1),
        |inter AS (SELECT a.g AS ga, b.g AS gb, count(*) AS n_inter
        |  FROM dv a JOIN dv b ON a.v = b.v AND a.g < b.g GROUP BY 1, 2)
        |SELECT mm.ga, mm.gb, mm.m, mm.k_used,
        |  CAST(mm.m AS DOUBLE) / mm.k_used AS jaccard_est,
        |  coalesce(i.n_inter, 0) AS n_inter,
        |  na.n + nb.n - coalesce(i.n_inter, 0) AS n_union,
        |  CAST(coalesce(i.n_inter, 0) AS DOUBLE) /
        |    (na.n + nb.n - coalesce(i.n_inter, 0)) AS jaccard_exact
        |FROM mm JOIN n na ON na.g = mm.ga JOIN n nb ON nb.g = mm.gb
        |LEFT JOIN inter i ON i.ga = mm.ga AND i.gb = mm.gb
        |ORDER BY 1, 2""".stripMargin,

    "t_dup_spans" ->
      s"""WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
         |gr AS (SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, greatest(len(ws)-7,1)+1),
         |    i -> array_to_string(ws[i:i+7],' ')))) AS g FROM w),
         |dfx AS (SELECT g, count(DISTINCT doc_id) AS ndocs FROM gr
         |  GROUP BY 1)
         |SELECT gr.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |  CAST(sum(CASE WHEN ndocs>1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS dup_grams,
         |  CAST(sum(CASE WHEN ndocs>1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*) AS dup_frac
         |FROM gr JOIN dfx USING (g) GROUP BY 1 ORDER BY 1""".stripMargin,

    "t_cms_heavy" ->
      s"""WITH k AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
         |top AS (SELECT k, count(*) AS exact_cnt FROM k GROUP BY k
         |  ORDER BY exact_cnt DESC, k LIMIT 10),
         |grid AS (SELECT s, substr(md5(s || ':' || k), 1, $CmsPrefix) AS b,
         |  count(*) AS c
         |  FROM k, (SELECT unnest(range(0, $CmsDepth)) AS s) GROUP BY s, b),
         |est AS (SELECT top.k, top.exact_cnt, min(grid.c) AS est_cnt
         |  FROM top JOIN grid
         |    ON substr(md5(grid.s || ':' || top.k), 1, $CmsPrefix) = grid.b
         |  GROUP BY top.k, top.exact_cnt)
         |SELECT k, exact_cnt, est_cnt, est_cnt - exact_cnt AS overestimate
         |FROM est ORDER BY exact_cnt DESC, k""".stripMargin,

    "t_inverted_index" ->
      s"""WITH p AS (SELECT doc_id, unnest(list_distinct($wsSql)) AS term
         |  FROM documents),
         |p2 AS (SELECT * FROM p WHERE term <> ''),
         |d AS (SELECT term, count(*) AS df FROM p2 GROUP BY 1
         |  HAVING count(*) BETWEEN 2 AND 50)
         |SELECT p2.term, d.df, p2.doc_id FROM p2 JOIN d USING (term)
         |ORDER BY term, doc_id""".stripMargin,
    "t_index_and_query" -> {
      val conds = Bm25Terms
        .map(t => s"list_contains($wsSql, '$t')").mkString(" AND ")
      s"SELECT doc_id FROM documents WHERE $conds ORDER BY doc_id"
    },
    "t_cms_join_size" ->
      s"""WITH ka AS (SELECT CAST(l_partkey AS VARCHAR) AS k FROM lineitem),
         |kb AS (SELECT CAST(p_partkey AS VARCHAR) AS k FROM part),
         |ga AS (SELECT s, substr(md5(s || ':' || k), 1, $CmsPrefix) AS b,
         |  count(*) AS c
         |  FROM ka, (SELECT unnest(range(0, $CmsDepth)) AS s) GROUP BY 1, 2),
         |gb AS (SELECT s, substr(md5(s || ':' || k), 1, $CmsPrefix) AS b,
         |  count(*) AS c
         |  FROM kb, (SELECT unnest(range(0, $CmsDepth)) AS s) GROUP BY 1, 2),
         |p AS (SELECT ga.s, sum(ga.c * gb.c) AS p FROM ga
         |  JOIN gb ON ga.s = gb.s AND ga.b = gb.b GROUP BY 1),
         |est AS (SELECT CASE WHEN count(*) < $CmsDepth THEN 0
         |  ELSE min(p) END AS est_size FROM p),
         |ex AS (SELECT coalesce(sum(fa.f * fb.f), 0) AS exact_size
         |  FROM (SELECT k, count(*) AS f FROM ka GROUP BY 1) fa
         |  JOIN (SELECT k, count(*) AS f FROM kb GROUP BY 1) fb
         |    ON fa.k = fb.k)
         |SELECT CAST(exact_size AS BIGINT) AS exact_size,
         |  CAST(est_size AS BIGINT) AS est_size,
         |  CAST(est_size - exact_size AS BIGINT) AS overestimate
         |FROM ex CROSS JOIN est""".stripMargin,
    // The streamed face's oracle is the SKETCH HALF of t_cms_join_size:
    // the maintained grids answer est_size only (the exact side would
    // re-read the streams, which is the thing the sketch exists to
    // avoid).
    "t_cms_join_size_stream" ->
      s"""WITH ka AS (SELECT CAST(l_partkey AS VARCHAR) AS k FROM lineitem),
         |kb AS (SELECT CAST(p_partkey AS VARCHAR) AS k FROM part),
         |ga AS (SELECT s, substr(md5(s || ':' || k), 1, $CmsPrefix) AS b,
         |  count(*) AS c
         |  FROM ka, (SELECT unnest(range(0, $CmsDepth)) AS s) GROUP BY 1, 2),
         |gb AS (SELECT s, substr(md5(s || ':' || k), 1, $CmsPrefix) AS b,
         |  count(*) AS c
         |  FROM kb, (SELECT unnest(range(0, $CmsDepth)) AS s) GROUP BY 1, 2),
         |p AS (SELECT ga.s, sum(ga.c * gb.c) AS p FROM ga
         |  JOIN gb ON ga.s = gb.s AND ga.b = gb.b GROUP BY 1),
         |est AS (SELECT CASE WHEN count(*) < $CmsDepth THEN 0
         |  ELSE min(p) END AS est_size FROM p)
         |SELECT CAST(est_size AS BIGINT) AS est_size FROM est""".stripMargin,
    "t_cms_selfjoin_size" ->
      s"""WITH ka AS (SELECT CAST(l_partkey AS VARCHAR) AS k FROM lineitem),
         |ga AS (SELECT s, substr(md5(s || ':' || k), 1, $CmsPrefix) AS b,
         |  count(*) AS c
         |  FROM ka, (SELECT unnest(range(0, $CmsDepth)) AS s) GROUP BY 1, 2),
         |p AS (SELECT s, sum(c * c) AS p FROM ga GROUP BY 1),
         |est AS (SELECT CASE WHEN count(*) < $CmsDepth THEN 0
         |  ELSE min(p) END AS est_size FROM p),
         |ex AS (SELECT coalesce(sum(f * f), 0) AS exact_size
         |  FROM (SELECT k, count(*) AS f FROM ka GROUP BY 1))
         |SELECT CAST(exact_size AS BIGINT) AS exact_size,
         |  CAST(est_size AS BIGINT) AS est_size,
         |  CAST(est_size - exact_size AS BIGINT) AS overestimate
         |FROM ex CROSS JOIN est""".stripMargin,
    "t_dedup_bloom" ->
      """SELECT doc_id FROM documents WHERE doc_id%3=0
        |AND md5(text) NOT IN
        |  (SELECT md5(text) FROM documents WHERE doc_id%3<>0)
        |ORDER BY doc_id""".stripMargin)
}
