package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Benchmark decontamination: find training documents that share word
  * n-grams with an evaluation/benchmark set — the overlap scan every
  * training-data pipeline must run before a corpus ships (a training doc
  * containing an eval doc's n-grams leaks the benchmark).
  *
  * Plan shape (the standard scale recipe): shingle-explode both sides,
  * equi-join on the shingle, count distinct shared shingles per
  * (train, eval) pair. Nothing is all-pairs — the join is hash-partitioned
  * BY shingle, so cost is Σ|posting list| · |eval posting list|, and the
  * eval side is tiny by construction (a benchmark suite, not a corpus).
  *
  * The one scale hazard is a HOT shingle (a ubiquitous phrase appearing in
  * a large fraction of the corpus): its posting list join fans out toward
  * |train| rows. `maxShingleDf` prunes shingles whose train-side document
  * frequency exceeds the cap before the join — ubiquitous n-grams carry no
  * contamination evidence, and the cap bounds every join bucket. AQE skew
  * splitting covers the residual middle ground.
  */
object Decontam {

  /** Per (train doc, eval doc) count of shared distinct word n-grams,
    * keeping pairs with at least `minOverlap` shared shingles.
    *
    * Only shingles that occur in the EVAL set can ever produce an overlap
    * row, so the eval shingle set — tiny by construction — broadcasts and
    * prunes the exploded train side map-side, at the scan. Everything
    * downstream (the stop-gram DF count, the pair join) then runs over
    * eval-matching postings only, not the corpus: the corpus-wide
    * shingle-DF shuffle the naive plan pays becomes an aggregate over
    * |eval shingles| posting lists. The DF cap is still the train-side
    * document frequency of each shingle — the broadcast prune keeps every
    * train posting of a surviving shingle, so counts are unchanged.
    *
    * @param maxShingleDf drop shingles appearing in more than this many
    *                     train documents (stop-gram pruning)
    * @return DataFrame[train_id, eval_id, n_overlap]
    */
  def overlaps(train: DataFrame, evalSet: DataFrame, idCol: String,
               textCol: String, n: Int = 3, minOverlap: Int = 2,
               maxShingleDf: Long = 1000L): DataFrame = {
    def shingled(df: DataFrame, out: String) =
      df.select(col(idCol).as(out),
        explode(TextFunctions.shingles(col(textCol), n)).as("sh"))
    // Eval side is read twice (shingle set + pair join) — materialize once.
    val ev = shingled(evalSet, "eval_id").localCheckpoint()
    val evalShingles = ev.select(col("sh")).distinct()
    // One corpus scan: explode, broadcast-prune to eval shingles, then
    // feed BOTH the DF count and the pair join from the materialized hits
    // (without the boundary the corpus explode would run per branch).
    val trHits = shingled(train, "train_id")
      .join(broadcast(evalShingles), Seq("sh"))
      .localCheckpoint()
    val rare = trHits.groupBy(col("sh")).agg(count(lit(1)).as("_df"))
      .where(col("_df") <= maxShingleDf)
      .select(col("sh"))
    trHits.join(broadcast(rare), Seq("sh"))
      .join(broadcast(ev), Seq("sh"))
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_overlap"))
      .where(col("n_overlap") >= minOverlap)
  }
}
