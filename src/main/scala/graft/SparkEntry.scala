package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the LLM-pipeline
  * extensions) is registered here as a named query over the synthetic
  * corpus, paired with ANSI SQL the driver runs in DuckDB as the
  * correctness oracle. Queries live in graft.queries.*; this object only
  * aggregates the registries.
  */
object SparkEntry {

  /** Flagship query (dashboard D9 shape: top artists by wins) on
    * sf=0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("d9_top_artists")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.defs ++ SourceQueries.defs ++ DashboardQueries.defs ++
      TextQueries.defs ++ SimilarityQueries.defs ++ EventQueries.defs ++
      PipelineQueries.defs ++ MixQueries.defs ++ OlapQueries.defs ++
      RetrievalQueries.defs

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ SourceQueries.oracles ++ DashboardQueries.oracles ++
      TextQueries.oracles ++ SimilarityQueries.oracles ++ EventQueries.oracles ++
      PipelineQueries.oracles ++ MixQueries.oracles ++ OlapQueries.oracles ++
      RetrievalQueries.oracles
}
