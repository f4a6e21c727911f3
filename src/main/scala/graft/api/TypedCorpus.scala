package graft.api

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.sources.Tables

/** A corpus document row (the `documents` table's shape). */
case class Doc(doc_id: Long, text: String, lang: String, source: String,
               n_chars: Long)

/** A scored document: the curation features a quality gate reads. */
case class ScoredDoc(doc_id: Long, lang: String, source: String,
                     n_tokens: Long, quality: Double)

/** Typed `Dataset[T]` facade over the corpus pipeline — the type-safe
  * entry point the brief's API surface calls for, WITHOUT giving up the
  * engine's execution posture: every transformation below is
  * Column-expression-based (`select`/`where` + `.as[T]`), so Catalyst
  * still sees through it (column pruning, filter pushdown, whole-stage
  * codegen all survive — TypedCorpusSpec asserts the pushdown
  * mechanically). Typed LAMBDAS (`ds.map`, `ds.filter(f: T => Boolean)`)
  * would carry the same signatures but opaque the plan into
  * deserialize→func→serialize; that trade is documented here once, and
  * the facade deliberately never takes it.
  */
object TypedCorpus {

  /** The corpus as a typed Dataset (compile-time column safety from here
    * on; encoder-checked schema at the boundary).
    */
  def docs(spark: SparkSession, dir: String): Dataset[Doc] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents").as[Doc]
  }

  /** Quality features per doc — same composite as the registered
    * t_quality_score query (0.5·len + 0.3·(1−punct) + 0.2·wordlen).
    */
  def scored(ds: Dataset[Doc]): Dataset[ScoredDoc] = {
    import ds.sparkSession.implicits._
    val nt = TextFunctions.tokenCount(col("text"))
    val pr = TextFunctions.punctRatio(col("text"))
    val awl = TextFunctions.avgWordLen(col("text"))
    ds.select(col("doc_id"), col("lang"), col("source"),
      nt.as("n_tokens"),
      (lit(0.5) * (least(nt, lit(100)).cast("double") / lit(100.0)) +
        lit(0.3) * (lit(1.0) - pr) +
        lit(0.2) * (least(awl, lit(10.0)) / lit(10.0))).as("quality"))
      .as[ScoredDoc]
  }

  /** Keep documents at or above the quality floor — still `Dataset[Doc]`,
    * still a pushable Column predicate.
    */
  def curated(ds: Dataset[Doc], minTokens: Long): Dataset[Doc] =
    ds.where(TextFunctions.tokenCount(col("text")) >= minTokens)
}
