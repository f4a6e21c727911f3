package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group median WITHOUT sorting any group — the scalable
  * answer where `percentile(x, 0.5)` (a per-group sorted buffer on one
  * reducer) and `approx_percentile` (not exact) both fall short.
  *
  * Two passes over the facts, both linear:
  *   1. HISTOGRAM pass: per-group (min, max, count) bounds, then a
  *      4096-bucket count histogram ([[Histogram.bucketOf]] integer
  *      arithmetic). The running bucket total locates, for each of the
  *      two middle ranks, WHICH bucket holds it and the rank offset
  *      inside that bucket. Cumulative windows run over per-group
  *      histograms (≤ 4096 rows each), never over facts.
  *   2. TARGET pass: only rows landing in a located bucket (a broadcast
  *      semi-join of ~2 rows per group) are re-read, reduced to
  *      (value, count) — at cent-discrete data a bucket holds at most
  *      bucket-width distinct values — and the offset picks the order
  *      statistic from the tiny per-bucket value ladder.
  *
  * Everything to the final division is integer-exact; the median is the
  * ONE double division (a+b)/200 (cents → currency), bit-reproducible
  * across engines. Group count can be millions (all tables are
  * group-keyed aggregates); group SIZE can be billions (no task ever
  * holds more than a bucket's value ladder).
  */
object Median {

  /** Exact median of a DECIMAL(p,2) column per group.
    * @return (groupCols..., median: double) — (a+b)/200.0 over the two
    *         middle cent values (equal when the group has odd count).
    */
  def groupMedianCents(df: DataFrame, groupCols: Seq[String],
                       valueCol: String, nBuckets: Int = 4096): DataFrame = {
    val gs = groupCols.map(col)
    val facts = df.where(col(valueCol).isNotNull)
      .select(gs :+ (col(valueCol) * 100).cast("long").as("_v"): _*)
      .localCheckpoint() // two passes by construction
    val bounds = facts.groupBy(gs: _*).agg(
      min(col("_v")).as("_lo"), max(col("_v")).as("_hi"),
      count(lit(1)).as("_n"))
    // Middle ranks (1-based): (n+1) div 2 and (n+2) div 2.
    val targets = bounds.select(gs ++ Seq(col("_lo"), col("_hi"),
      explode(array_distinct(array(
        Histogram.idiv(col("_n") + 1, lit(2)),
        Histogram.idiv(col("_n") + 2, lit(2))))).as("_k")): _*)
    val hist = facts.join(broadcast(bounds), groupCols)
      .groupBy(gs :+
        Histogram.bucketOf(col("_v"), col("_lo"), col("_hi"), nBuckets)
          .as("_bucket"): _*)
      .agg(count(lit(1)).as("_bn"))
    val cumW = Window.partitionBy(gs: _*).orderBy(col("_bucket"))
    val cum = hist
      .withColumn("_cum", sum(col("_bn")).over(
        cumW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_below", col("_cum") - col("_bn"))
    // Locate each target rank's bucket + in-bucket rank offset.
    val located = cum.join(targets, groupCols)
      .where(col("_below") < col("_k") && col("_k") <= col("_cum"))
      .select(gs ++ Seq(col("_bucket"), col("_lo"), col("_hi"),
        col("_k"), (col("_k") - col("_below")).as("_off")): _*)
    // Pass 2: rows of located buckets only → per-value counts → the
    // value ladder inside each (group, bucket) is bucket-width-bounded.
    val inBucket = facts.join(broadcast(located), groupCols)
      .where(Histogram.bucketOf(col("_v"), col("_lo"), col("_hi"), nBuckets)
        === col("_bucket"))
      .groupBy(gs ++ Seq(col("_bucket"), col("_k"), col("_off"),
        col("_v")): _*)
      .agg(count(lit(1)).as("_vn"))
    val ladderW = Window.partitionBy(gs ++ Seq(col("_bucket"), col("_k")): _*)
      .orderBy(col("_v"))
    val picked = inBucket
      .withColumn("_vcum", sum(col("_vn")).over(
        ladderW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(col("_vcum") - col("_vn") < col("_off") &&
        col("_off") <= col("_vcum"))
      .select(gs :+ col("_v"): _*)
    // Two rows per group (one when both middle ranks share a value and
    // the ranks coincide — odd n): sum·(3−rows) normalizes both cases
    // to a+b, then the single exact-int division.
    picked.groupBy(gs: _*)
      .agg((sum(col("_v")) * (lit(3) - count(lit(1)))).as("_ab"))
      .select(gs :+ (col("_ab").cast("double") / 200.0).as("median"): _*)
  }
}
