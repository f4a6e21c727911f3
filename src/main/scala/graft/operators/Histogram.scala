package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Equi-width histograms over integer-valued columns — the profiling /
  * drift-detection primitive. All bucket arithmetic is EXACT integer
  * division (`div`, identical to DuckDB's `//` on non-negatives), so the
  * same row lands in the same bucket in every engine — no float edges,
  * no boundary drift.
  *
  * Scale shape: ONE linear hash aggregate over the facts (bucket id is a
  * per-row projection); the bucket spine (`sequence` + explode) exists
  * only to emit empty buckets and is nb rows, never data. When bounds
  * are not known a priori, they come from a broadcast-scalar min/max
  * aggregate — the same one-extra-tiny-stage pattern as the dashboard
  * share-of-total queries (never a window, never a collect).
  */
object Histogram {

  /** Integer division for NON-NEGATIVE operands (where floor = truncate
    * = DuckDB `//`). Exact 64-bit `div` — the earlier double-division
    * floor silently rounded once dividends passed 2^52 (reachable when
    * DECIMAL(12,2) cents span their full range × 4096 buckets).
    */
  private[operators] def idiv(a: Column, b: Column): Column =
    call_function("div", a.cast("long"), b.cast("long"))

  /** Bucket id for `x` over [lo, hi] split into `nb` equal integer
    * cells: (x−lo)·nb div (hi−lo+1), clamped to [0, nb−1]. The +1 makes
    * the top value inclusive without a special case; clamping x to lo
    * BEFORE the division keeps the dividend non-negative (floor ≡
    * truncate on both engines).
    */
  def bucketOf(x: Column, lo: Column, hi: Column, nb: Int): Column =
    least(lit(nb - 1),
      idiv((greatest(x, lo) - lo) * nb, hi - lo + 1)).cast("long")

  /** Ceiling division for non-negative operands: the exact inverse of
    * [[bucketOf]] — bucket b holds x ∈ [⌈b·w/nb⌉, ⌈(b+1)·w/nb⌉).
    */
  private[operators] def icdiv(a: Column, b: Column): Column =
    idiv(a + b - 1, b)

  /** Histogram with pinned integer bounds: one row per bucket 0..nb−1
    * (empty buckets included with n=0), integer edges
    * [lo + ⌈b·w/nb⌉, lo + ⌈(b+1)·w/nb⌉) where w = hi−lo+1 (ceiling,
    * the exact inverse of the floor in `bucketOf`).
    * Out-of-range rows are clamped into the edge buckets (profiling
    * semantics: nothing silently dropped); NULLs are excluded.
    */
  def equiWidth(df: DataFrame, valueCol: String,
                lo: Long, hi: Long, nb: Int): DataFrame = {
    require(nb > 0 && hi >= lo, s"need nb>0, hi>=lo; got nb=$nb [$lo,$hi]")
    val counts = df.where(col(valueCol).isNotNull)
      .groupBy(bucketOf(col(valueCol), lit(lo), lit(hi), nb).as("bucket"))
      .agg(count(lit(1)).as("n"))
    val w = hi - lo + 1
    val spine = df.sparkSession.range(1)
      .select(explode(sequence(lit(0L), lit(nb - 1L))).as("bucket"))
    spine.join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        (lit(lo) + icdiv(col("bucket") * w, lit(nb))).as("edge_lo"),
        (lit(lo) + icdiv((col("bucket") + 1) * w, lit(nb))).as("edge_hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Histogram with data-derived bounds: min/max ride one tiny broadcast
    * aggregate into every row's bucket projection.
    */
  def equiWidthAuto(df: DataFrame, valueCol: String, nb: Int): DataFrame = {
    require(nb > 0, s"need nb>0; got $nb")
    val v = df.where(col(valueCol).isNotNull)
    val bounds = v.agg(min(col(valueCol)).cast("long").as("_lo"),
      max(col(valueCol)).cast("long").as("_hi"))
    val counts = v.crossJoin(broadcast(bounds))
      .groupBy(bucketOf(col(valueCol), col("_lo"), col("_hi"), nb)
        .as("bucket"))
      .agg(count(lit(1)).as("n"))
    val spine = df.sparkSession.range(1)
      .select(explode(sequence(lit(0L), lit(nb - 1L))).as("bucket"))
      .crossJoin(broadcast(bounds))
    spine.join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        (col("_lo") + icdiv(col("bucket") * (col("_hi") - col("_lo") + 1),
          lit(nb))).as("edge_lo"),
        (col("_lo") + icdiv((col("bucket") + 1) *
          (col("_hi") - col("_lo") + 1), lit(nb))).as("edge_hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }
}
