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
  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

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
    }))

  private val wsSql = "regexp_split_to_array(lower(trim(text)), '\\s+')"
  private val nSql =
    s"CASE WHEN length(trim(text))=0 THEN 0 ELSE len($wsSql) END"

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

    "t_bm25" -> {
      val termSql = Bm25Terms.zipWithIndex.map { case (t, i) =>
        s"""((CAST(n_docs AS DOUBLE) - df_$i + 0.5) / (df_$i + 0.5))
           | * (CAST(len(list_filter(ws, x -> x = '$t')) AS DOUBLE)
           |      * (1.2 + 1))
           |   / (CAST(len(list_filter(ws, x -> x = '$t')) AS DOUBLE)
           |      + 1.2 * ((1 - 0.75)
           |               + 0.75 * (dl / (CAST(tot_dl AS DOUBLE)/n_docs))))"""
          .stripMargin.replace("\n", " ")
      }.mkString(" + ")
      val dfSql = Bm25Terms.zipWithIndex.map { case (t, i) =>
        s"sum(CASE WHEN list_contains(ws, '$t') THEN 1 ELSE 0 END) AS df_$i"
      }.mkString(", ")
      s"""WITH b AS (SELECT doc_id, $wsSql AS ws,
         |  CAST($nSql AS BIGINT) AS dl FROM documents),
         |st AS (SELECT count(*) AS n_docs, sum(dl) AS tot_dl, $dfSql
         |  FROM b)
         |SELECT doc_id, $termSql AS score FROM b, st
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
    },

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
