package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-level relevance scoring (BM25 family) — ranking documents
  * against a query term set, the retrieval half of a RAG/data-curation
  * pipeline.
  *
  * Scale design: the only aggregation is ONE tiny pass producing the
  * corpus statistics the formula needs — document count, total token
  * count, and one document-frequency counter per query term (a single
  * row, map-side combined). That row broadcasts back over the corpus and
  * every score is then a per-row projection over the token array. No
  * per-term explode, no inverted-index shuffle, no join keyed by terms:
  * at 100 TB the cost is two scans (one agg, one score), both at scan
  * speed.
  *
  * The idf is the Robertson–Sparck-Jones odds ratio WITHOUT the log:
  * `(N - df + 0.5) / (df + 0.5)`. Dropping the log keeps every operation
  * rational arithmetic on exact integer counts, so scores are
  * bit-reproducible across engines (IEEE `+ * /` only — no libm, whose
  * last-ulp `ln` differences would break cross-engine hash comparison).
  * Rank order per term is unchanged (the transform is monotone in df).
  */
object Retrieval {

  /** Score every document against `queryTerms`; returns (idCol, score).
    * `k1` damps term-frequency saturation, `b` the length normalization —
    * the classic BM25 knobs (defaults 1.2 / 0.75).
    */
  /** Inverted-index build in LONG form: one (term, doc_id) posting row
    * per distinct term occurrence, restricted to terms whose document
    * frequency lies in [minDf, maxDf]. The DF band is the scale
    * contract: singleton terms (typos, ids) bloat the index without
    * retrieval value, and stop-term postings approach |corpus| — the
    * same cap discipline as decontamination's stop-gram bound. The
    * build is one explode + two hash aggregates, all map-side
    * combinable; the posting table is naturally partitioned by term —
    * exactly the layout a term-lookup service shards by.
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
                    minDf: Int = 2, maxDf: Int = Int.MaxValue): DataFrame = {
    val postings = df
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(TextFunctions.tokens(col(textCol))))
          .as("term"))
      .where(col("term") =!= "")
    val dfs = postings.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .where(col("df") >= minDf && col("df") <= maxDf)
    postings.join(dfs, Seq("term"))
      .select(col("term"), col("df"), col("doc_id"))
  }

  /** Conjunctive (AND) retrieval THROUGH the index: a document matches
    * iff it appears in every queried term's posting list. Postings of
    * the |terms| queried terms explode to (doc, term) rows; one count
    * aggregate keeps docs hitting all terms. Cost is Σ df(term) of the
    * queried terms — the index's whole point: the corpus is never
    * rescanned.
    */
  def conjunctiveQuery(index: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    index.where(col("term").isin(terms: _*))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("term")).as("_k"))
      .where(col("_k") === terms.distinct.size)
      .select(col("doc_id"))
  }

  def bm25(df: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75)
      : DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val base = df.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("_ws"),
      TextFunctions.tokenCount(col(textCol)).as("_dl"))
    // One-row corpus stats: N, total tokens, df per query term.
    val dfAggs = queryTerms.zipWithIndex.map { case (t, i) =>
      sum(when(array_contains(col("_ws"), t), 1L).otherwise(0L)).as(s"_df_$i")
    }
    val stats = base.agg(
      count(lit(1)).as("_n_docs"),
      (sum(col("_dl")).as("_tot_dl") +: dfAggs): _*)
    val scored = base.crossJoin(broadcast(stats))
    // Per-term contribution; mirrored op-for-op by the SQL oracle so the
    // doubles land bit-identical.
    def term(t: String, i: Int): Column = {
      val tf = size(filter(col("_ws"), w => w === t)).cast("double")
      val idf = (col("_n_docs").cast("double") - col(s"_df_$i") + 0.5) /
        (col(s"_df_$i") + lit(0.5))
      val avgdl = col("_tot_dl").cast("double") / col("_n_docs")
      idf * (tf * (k1 + 1)) /
        (tf + lit(k1) * (lit(1) - b + lit(b) * (col("_dl") / avgdl)))
    }
    val score = queryTerms.zipWithIndex
      .map { case (t, i) => term(t, i) }
      .reduce(_ + _)
    scored.select(col(idCol), score.as("score"))
  }
}
