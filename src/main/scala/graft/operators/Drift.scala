package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two corpus slices (yesterday's
  * batch vs today's, source A vs source B) — the monitoring gate a
  * training-data pipeline runs before a new crawl is allowed into the
  * mix.
  *
  * The statistic is total variation distance over a categorical column:
  * TVD = ½ Σ_c |p_a(c) − p_b(c)|. Computed as exact integers end to
  * end: |n_a(c)·N_b − n_b(c)·N_a| summed, then ONE division by
  * 2·N_a·N_b — bit-reproducible across engines (the same
  * cross-multiplication trick as the quality-score ratios; never a sum
  * of per-category float divisions, whose order would differ).
  *
  * Scale shape: one linear hash aggregate per side (category counts),
  * a category-sized full-outer join (absent category = 0 on that side),
  * broadcast-scalar totals. Facts are scanned once per side; no
  * windows, no collect. Numeric columns drift-test through
  * [[Histogram.bucketOf]] — same machinery over bucket ids.
  */
object Drift {

  /** Per-category comparison table: counts, each side's share (single
    * exact divisions), and the |cross-multiplied| numerator the TVD
    * sums. Categories are never dropped: a category present on one side
    * only shows (n, 0).
    */
  def categoricalDrift(a: DataFrame, b: DataFrame, catCol: String)
      : DataFrame = {
    val ca = a.groupBy(col(catCol).as("cat")).agg(count(lit(1)).as("n_a"))
    val cb = b.groupBy(col(catCol).as("cat")).agg(count(lit(1)).as("n_b"))
    val ta = a.agg(count(lit(1)).as("_ta"))
    val tb = b.agg(count(lit(1)).as("_tb"))
    ca.join(cb, Seq("cat"), "full_outer")
      .na.fill(0L, Seq("n_a", "n_b"))
      .crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
      .select(col("cat"), col("n_a"), col("n_b"),
        col("n_a").cast("double")./(col("_ta")).as("share_a"),
        col("n_b").cast("double")./(col("_tb")).as("share_b"),
        abs(col("n_a") * col("_tb") - col("n_b") * col("_ta")).as("x_num"),
        col("_ta").as("total_a"), col("_tb").as("total_b"))
  }

  /** One-row drift summary: total variation distance as the single
    * division Σ x_num / (2·N_a·N_b), plus the category count that
    * diverged at all (x_num > 0).
    */
  def totalVariation(a: DataFrame, b: DataFrame, catCol: String)
      : DataFrame =
    totalVariationFromCounts(
      a.groupBy(col(catCol).as("cat")).agg(count(lit(1)).as("n")),
      b.groupBy(col(catCol).as("cat")).agg(count(lit(1)).as("n")))

  /** TVD from ALREADY-AGGREGATED (cat, n) count tables — the entry
    * point for maintained/streamed histograms where the raw rows are
    * long gone. Same exact-integer cross-multiplication; absent
    * categories count 0. The final division is a TRY_DIVIDE: with an
    * EMPTY side (a never-started stream probed against a reference)
    * every cross-multiplied term carries the zero total, and under
    * Spark 4's default ANSI mode a plain `/` would throw
    * DIVIDE_BY_ZERO and kill the monitoring read — the degenerate
    * verdict is a NULL tvd (counts still report "0 rows vs the
    * reference"), identical to `/` on every non-degenerate input.
    */
  def totalVariationFromCounts(a: DataFrame, b: DataFrame): DataFrame = {
    val ca = a.select(col("cat"), col("n").cast("long").as("n_a"))
    val cb = b.select(col("cat"), col("n").cast("long").as("n_b"))
    val ta = ca.agg(coalesce(sum(col("n_a")), lit(0L)).as("_ta"))
    val tb = cb.agg(coalesce(sum(col("n_b")), lit(0L)).as("_tb"))
    ca.join(cb, Seq("cat"), "full_outer")
      .na.fill(0L, Seq("n_a", "n_b"))
      .crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
      .select(col("cat"),
        abs(col("n_a") * col("_tb") - col("n_b") * col("_ta")).as("x_num"),
        col("_ta"), col("_tb"))
      .groupBy(col("_ta"), col("_tb"))
      .agg(sum(col("x_num")).as("_sx"),
        sum(when(col("x_num") > 0, 1L).otherwise(0L)).as("n_diverged"),
        count(lit(1)).as("n_categories"))
      .select(col("_ta").as("n_a"), col("_tb").as("n_b"),
        col("n_categories"), col("n_diverged"),
        try_divide(col("_sx").cast("double"),
          lit(2d) * col("_ta").cast("double") * col("_tb").cast("double"))
          .as("tvd"))
  }

  /** Per-category two-sample χ² contributions from ALREADY-AGGREGATED
    * (cat, n) count tables — WHICH category drove the shift, the
    * attribution sheet beside [[totalVariationFromCounts]]'s single
    * score. The χ² term collapses algebraically to D_i²/(A·B·c_i) with
    * D_i = B·a_i − A·b_i and c_i = a_i + b_i — all exact integers, one
    * double division per category and NO global float sum (Σ over
    * categories is the caller's reduction; a cross-engine float sum
    * over an unordered aggregate would not be bit-stable, so the
    * engine refuses to take it). Shared by the batch gate
    * (`dq_drift_chisq`) and the streamed face
    * ([[graft.streaming.DriftStream.chisqAgainstReference]]) — count
    * tables are additive, so the streamed counts feed the identical
    * kernel.
    */
  def chisqFromCounts(a: DataFrame, b: DataFrame): DataFrame = {
    val ca = a.select(col("cat"), col("n").cast("long").as("n_a"))
    val cb = b.select(col("cat"), col("n").cast("long").as("n_b"))
    val j = ca.join(cb, Seq("cat"), "full_outer")
      .na.fill(0L, Seq("n_a", "n_b"))
    val tot = j.agg(sum(col("n_a")).cast("long").as("ta"),
      sum(col("n_b")).cast("long").as("tb"))
    val d38 = "decimal(38,0)"
    j.crossJoin(broadcast(tot))
      .select(col("cat"), col("n_a"), col("n_b"),
        ((col("tb") * col("n_a") - col("ta") * col("n_b"))
          .cast(d38) *
         (col("tb") * col("n_a") - col("ta") * col("n_b"))
          .cast(d38)).cast("double")
          .divide(((col("ta") * col("tb")).cast(d38) *
            (col("n_a") + col("n_b")).cast(d38)).cast("double"))
          .as("contrib"))
      .orderBy(col("cat"))
  }

  /** Numeric drift: bucket both sides with the SAME pinned integer
    * histogram grid, then categorical TVD over bucket ids.
    */
  def numericTvd(a: DataFrame, b: DataFrame, valueCol: String,
                 lo: Long, hi: Long, nb: Int): DataFrame = {
    def bucketed(df: DataFrame) = df.where(col(valueCol).isNotNull)
      .select(Histogram.bucketOf(col(valueCol), lit(lo), lit(hi), nb)
        .as("bucket"))
    totalVariation(bucketed(a), bucketed(b), "bucket")
  }

  /** EMBEDDING-space drift: cosine between the two slices' centroid
    * vectors — did the new crawl's semantic center move?
    *
    * The count denominators cancel out of the cosine, so the whole
    * statistic reduces to THREE exact integer sums over quantized
    * per-dimension totals (floor(x·4096), the sim_whiten trick):
    * cos = ΣS_aS_b / (√ΣS_a² · √ΣS_b²). Sums ride DECIMAL(38,0) (the
    * per-dim totals grow with corpus size); the only floats are two
    * sqrts, one multiply, one division — bit-reproducible.
    *
    * Scale: each side is one linear posexplode aggregate to `dim` rows;
    * everything after is dim-sized. 1.0 = no shift; the gate alarms on
    * a drop.
    */
  def embeddingCentroidDrift(a: DataFrame, b: DataFrame, vecCol: String,
                             scale: Int = 4096): DataFrame = {
    def sums(df: DataFrame, out: String) = df
      .select(posexplode(col(vecCol).cast("array<double>")))
      .toDF("dim", "x")
      .groupBy(col("dim"))
      .agg(sum(floor(col("x") * scale).cast("long"))
        .cast("decimal(38,0)").as(out))
    val ca = a.agg(count(lit(1)).as("n_a"))
    val cb = b.agg(count(lit(1)).as("n_b"))
    sums(a, "sa").join(sums(b, "sb"), Seq("dim"))
      .agg(sum(col("sa") * col("sb")).cast("decimal(38,0)").as("_ab"),
        sum(col("sa") * col("sa")).cast("decimal(38,0)").as("_aa"),
        sum(col("sb") * col("sb")).cast("decimal(38,0)").as("_bb"))
      .crossJoin(broadcast(ca)).crossJoin(broadcast(cb))
      .select(col("n_a"), col("n_b"),
        (col("_ab").cast("double") /
          (sqrt(col("_aa").cast("double")) *
            sqrt(col("_bb").cast("double")))).as("centroid_cosine"))
  }
}
