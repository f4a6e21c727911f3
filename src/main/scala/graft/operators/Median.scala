package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group order statistics WITHOUT sorting any group — the
  * scalable answer where `percentile(x, q)` (a per-group sorted buffer
  * on one reducer) and `approx_percentile` (not exact) both fall short.
  *
  * Two passes over the facts, both linear, for ANY number of requested
  * ranks at once:
  *   1. HISTOGRAM pass: per-group (min, max, count) bounds, then a
  *      4096-bucket count histogram ([[Histogram.bucketOf]] integer
  *      arithmetic). The running bucket total locates, for each
  *      requested rank, WHICH bucket holds it and the rank offset
  *      inside that bucket. Cumulative windows run over per-group
  *      histograms (≤ 4096 rows each), never over facts.
  *   2. TARGET pass: only rows landing in a located bucket (a broadcast
  *      semi-join of ~|ranks| rows per group) are re-read, reduced to
  *      (value, count) — at cent-discrete data a bucket holds at most
  *      bucket-width distinct values — and the offset picks the order
  *      statistic from the tiny per-bucket value ladder.
  *
  * Everything is integer-exact; the only doubles are single divisions
  * at the very end — bit-reproducible across engines. Group count can
  * be millions; group SIZE can be billions (no task ever holds more
  * than a bucket's value ladder).
  */
object Median {

  /** Cents extraction must go through DECIMAL(12,2) first: on a raw
    * DOUBLE column, `x*100` sits a hair below the integer (73789.18·100
    * = 7378917.999…) and Spark's long cast TRUNCATES where DuckDB's
    * rounds — the half-cent divergence the decimal hop removes on both
    * engines identically.
    */
  private def centsFacts(df: DataFrame, gs: Seq[Column],
                         valueCol: String,
                         weight: Column = lit(1L)): DataFrame =
    df.where(col(valueCol).isNotNull)
      .select(gs ++ Seq((col(valueCol).cast("decimal(12,2)") * 100)
        .cast("long").as("_v"), weight.cast("long").as("_w")): _*)
      .where(col("_w") > 0)
      .localCheckpoint() // two passes by construction

  /** Rank-picking core. `targets` carries one row per requested order
    * statistic: (groupCols..., _lo, _hi, _tag, _k) with _k the 1-based
    * rank and _tag a caller label (distinct per row within a group).
    * Returns (groupCols..., _tag, _v).
    */
  private def pick(facts: DataFrame, groupCols: Seq[String],
                   targets: DataFrame, nBuckets: Int): DataFrame = {
    val gs = groupCols.map(col)
    val hist = facts.join(
        broadcast(targets.select(gs :+ col("_lo") :+ col("_hi"): _*)
          .distinct()), groupCols)
      .groupBy(gs :+
        Histogram.bucketOf(col("_v"), col("_lo"), col("_hi"), nBuckets)
          .as("_bucket"): _*)
      .agg(sum(col("_w")).as("_bn")) // weight-rank space (weight 1 = rows)
    val cumW = Window.partitionBy(gs: _*).orderBy(col("_bucket"))
    val cum = hist
      .withColumn("_cum", sum(col("_bn")).over(
        cumW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_below", col("_cum") - col("_bn"))
    // Locate each target rank's bucket + in-bucket rank offset.
    val located = cum.join(targets, groupCols)
      .where(col("_below") < col("_k") && col("_k") <= col("_cum"))
      .select(gs ++ Seq(col("_bucket"), col("_lo"), col("_hi"),
        col("_tag"), (col("_k") - col("_below")).as("_off")): _*)
    // Pass 2: rows of located buckets only → per-value counts — the
    // value ladder inside each (group, bucket) is bucket-width-bounded.
    val inBucket = facts.join(broadcast(located), groupCols)
      .where(Histogram.bucketOf(col("_v"), col("_lo"), col("_hi"), nBuckets)
        === col("_bucket"))
      .groupBy(gs ++ Seq(col("_bucket"), col("_tag"), col("_off"),
        col("_v")): _*)
      .agg(sum(col("_w")).as("_vn"))
    val ladderW = Window
      .partitionBy(gs ++ Seq(col("_bucket"), col("_tag")): _*)
      .orderBy(col("_v"))
    inBucket
      .withColumn("_vcum", sum(col("_vn")).over(
        ladderW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(col("_vcum") - col("_vn") < col("_off") &&
        col("_off") <= col("_vcum"))
      .select(gs ++ Seq(col("_tag"), col("_v")): _*)
  }

  /** Exact median of a DECIMAL(p,2) column per group.
    * @return (groupCols..., median: double) — (a+b)/200.0 over the two
    *         middle cent values (equal when the group has odd count).
    */
  def groupMedianCents(df: DataFrame, groupCols: Seq[String],
                       valueCol: String, nBuckets: Int = 4096): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    val gs = groupCols.map(col)
    val facts = centsFacts(df, gs, valueCol)
    val bounds = facts.groupBy(gs: _*).agg(
      min(col("_v")).as("_lo"), max(col("_v")).as("_hi"),
      sum(col("_w")).as("_n"))
      .localCheckpoint() // group-sized; read by targets AND hist bounds
    // Middle ranks (1-based): (n+1) div 2 and (n+2) div 2; tagged by
    // the rank itself (distinct after array_distinct).
    val targets = bounds.select(gs ++ Seq(col("_lo"), col("_hi"),
      explode(array_distinct(array(
        Histogram.idiv(col("_n") + 1, lit(2)),
        Histogram.idiv(col("_n") + 2, lit(2))))).as("_k")): _*)
      .withColumn("_tag", col("_k"))
    // One or two rows per group: sum·(3−rows) normalizes both cases to
    // a+b, then the single exact-int division.
    pick(facts, groupCols, targets, nBuckets)
      .groupBy(gs: _*)
      .agg((sum(col("_v")) * (lit(3) - count(lit(1)))).as("_ab"))
      .select(gs :+ (col("_ab").cast("double") / 200.0).as("median"): _*)
  }

  /** WEIGHTED median: the value at weight-rank ⌈(W+1)/2⌉ / ⌈(W+2)/2⌉
    * where W = Σ weights — "the document length below which half the
    * corpus TOKENS sit", the corpus-curation statistic a row-count
    * median gets wrong on mixed-length data. With integer weights this
    * is EXACTLY the unweighted median of the weight-expanded multiset
    * (each row repeated `weight` times) — the property the oracle and
    * spec verify — computed without expanding anything: the same two
    * passes, with every count replaced by a weight sum. Zero- and
    * negative-weight rows are excluded.
    */
  def groupWeightedMedianCents(df: DataFrame, groupCols: Seq[String],
                               valueCol: String, weight: Column,
                               nBuckets: Int = 4096): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    val gs = groupCols.map(col)
    val facts = centsFacts(df, gs, valueCol, weight)
    val bounds = facts.groupBy(gs: _*).agg(
      min(col("_v")).as("_lo"), max(col("_v")).as("_hi"),
      sum(col("_w")).as("_n"))
      .localCheckpoint()
    val targets = bounds.select(gs ++ Seq(col("_lo"), col("_hi"),
      explode(array_distinct(array(
        Histogram.idiv(col("_n") + 1, lit(2)),
        Histogram.idiv(col("_n") + 2, lit(2))))).as("_k")): _*)
      .withColumn("_tag", col("_k"))
    pick(facts, groupCols, targets, nBuckets)
      .groupBy(gs: _*)
      .agg((sum(col("_v")) * (lit(3) - count(lit(1)))).as("_ab"))
      .select(gs :+ (col("_ab").cast("double") / 200.0)
        .as("weighted_median"): _*)
  }

  /** ONE-pass approximate median: the midpoint of the histogram bucket
    * holding the LOWER-median order statistic (rank ⌈n/2⌉) — that
    * value provably lies inside the bucket, so |estimate − statistic|
    * ≤ width/2 by construction, for HALF the scans of the exact
    * two-pass form. (The bound is against the rank-⌈n/2⌉ ORDER
    * STATISTIC, not the even-n averaged median: in sparse data the two
    * middle values can sit buckets apart, and no one-bucket estimate
    * can bound their average.) Same exact integer arithmetic; bucket
    * edges come from the ceiling-division inverse, so the oracle
    * replays the estimate bit-for-bit.
    * @return (groupCols..., approx_median, width) — width is the
    *         bucket span in currency units; the error bound vs the
    *         lower-median statistic is width/2 (+½ cent midpoint
    *         rounding).
    */
  def approxMedianCents(df: DataFrame, groupCols: Seq[String],
                        valueCol: String, nBuckets: Int = 4096)
      : DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    val gs = groupCols.map(col)
    val facts = centsFacts(df, gs, valueCol)
    val bounds = facts.groupBy(gs: _*).agg(
      min(col("_v")).as("_lo"), max(col("_v")).as("_hi"),
      sum(col("_w")).as("_n"))
    val hist = facts.join(broadcast(bounds), groupCols)
      .groupBy(gs :+
        Histogram.bucketOf(col("_v"), col("_lo"), col("_hi"), nBuckets)
          .as("_bucket"): _*)
      .agg(sum(col("_w")).as("_bn"))
    val cumW = Window.partitionBy(gs: _*).orderBy(col("_bucket"))
    val w = col("_hi") - col("_lo") + 1
    hist
      .withColumn("_cum", sum(col("_bn")).over(
        cumW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(bounds, groupCols)
      .where(col("_cum") - col("_bn") < Histogram.idiv(col("_n") + 1, lit(2)) &&
        Histogram.idiv(col("_n") + 1, lit(2)) <= col("_cum"))
      .select(gs ++ Seq(
        ((col("_lo") + Histogram.icdiv(col("_bucket") * w, lit(nBuckets))) +
          (col("_lo") +
            Histogram.icdiv((col("_bucket") + 1) * w, lit(nBuckets))))
          .cast("double")./(200.0).as("approx_median"),
        (Histogram.icdiv((col("_bucket") + 1) * w, lit(nBuckets)) -
          Histogram.icdiv(col("_bucket") * w, lit(nBuckets)))
          .cast("double")./(100.0).as("width")): _*)
  }

  /** Exact per-group quantile ladder: for each percent p in `percents`,
    * the value at rank max(1, ⌈p·n/100⌉) — the lower exact order
    * statistic, NO interpolation, so every output value is a real data
    * value and the only double is the final cents→currency division.
    * All ranks ride ONE histogram pass and ONE target pass.
    * @return (groupCols..., pct, value)
    */
  def groupQuantilesCents(df: DataFrame, groupCols: Seq[String],
                          valueCol: String,
                          percents: Seq[Int] = (1 to 9).map(_ * 10),
                          nBuckets: Int = 4096): DataFrame =
    quantileCore(centsFacts(df, groupCols.map(col), valueCol),
        groupCols, percents, nBuckets)
      .select(groupCols.map(col) ++ Seq(col("_tag").as("pct"),
        (col("_v").cast("double") / 100.0).as("value")): _*)

  /** Quantile ladder over an INTEGER-valued column — value returned as
    * the raw long, no division anywhere: the building block for
    * composed robust statistics (deviations, MAD) that must stay in
    * exact integers end to end.
    */
  def groupQuantilesLong(df: DataFrame, groupCols: Seq[String],
                         valueCol: String,
                         percents: Seq[Int],
                         nBuckets: Int = 4096): DataFrame = {
    val gs = groupCols.map(col)
    val facts = df.where(col(valueCol).isNotNull)
      .select(gs ++ Seq(col(valueCol).cast("long").as("_v"),
        lit(1L).as("_w")): _*)
      .localCheckpoint()
    quantileCore(facts, groupCols, percents, nBuckets)
      .select(gs ++ Seq(col("_tag").as("pct"), col("_v").as("value")): _*)
  }

  /** Shared ladder: targets from weight-space ranks, then [[pick]]. */
  private def quantileCore(facts: DataFrame, groupCols: Seq[String],
                           percents: Seq[Int], nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    require(percents.nonEmpty && percents.forall(p => p > 0 && p <= 100),
      s"percents must be in (0, 100]: $percents")
    require(percents.distinct.size == percents.size,
      s"duplicate percents: $percents")
    val gs = groupCols.map(col)
    val bounds = facts.groupBy(gs: _*).agg(
      min(col("_v")).as("_lo"), max(col("_v")).as("_hi"),
      sum(col("_w")).as("_n"))
      .localCheckpoint() // group-sized; read by targets AND hist bounds
    val pcts = array(percents.map(p => lit(p.toLong)): _*)
    val targets = bounds
      .select(gs ++ Seq(col("_lo"), col("_hi"), col("_n"),
        explode(pcts).as("_tag")): _*)
      // rank = max(1, ⌈p·n/100⌉) = max(1, (p·n + 99) div 100)
      .withColumn("_k", greatest(lit(1L),
        Histogram.idiv(col("_tag") * col("_n") + 99, lit(100))))
      .drop("_n")
    pick(facts, groupCols, targets, nBuckets)
  }
}
