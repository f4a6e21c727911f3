package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout (Z-order / Morton clustering) — the
  * lake-layout step that makes parquet min/max statistics selective on
  * MORE THAN ONE column at once.
  *
  * A range-sorted layout ([[graft.sources.Tables.writePartitioned]],
  * `repartitionByRange`) gives tight per-file bounds on the sort column
  * and useless full-span bounds on every other column. Interleaving the
  * bit patterns of per-column quantile cells (the Morton curve) gives
  * every clustered column a per-file span of roughly
  * `global_span / files^(1/dims)` — so a box predicate on ANY clustered
  * dimension skips most files via footer stats alone, before a byte of
  * data is read.
  *
  * Scale design: the per-column cell bounds are quantiles computed once
  * and broadcast (exact `percentile` at test scale, `approx_percentile`
  * is the 100 TB drop-in — same contract as the decile operator), cell
  * assignment is a map-side fold against the broadcast bounds, and the
  * physical clustering is one `repartitionByRange` on the z-value — a
  * single shuffle, the same cost as any re-layout. Nothing collects,
  * nothing is driver-sized.
  */
object Layout {

  /** Quantile-cell id in [0, 2^bits): how many of the broadcast bounds
    * lie strictly below the value. Equal-depth cells make the curve
    * robust to skewed value distributions.
    */
  def cellId(value: Column, bounds: Column): Column =
    aggregate(bounds, lit(0),
      (acc, b) => acc + when(value > b, 1).otherwise(0))

  /** Morton z-value: interleave the low `bits` bits of each cell id —
    * dimension j contributes bit i to output bit `i * dims + j`.
    */
  def zValue(cells: Seq[Column], bits: Int): Column = {
    val n = cells.size
    cells.zipWithIndex.map { case (c, j) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1)), i * n + j)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _).cast("long")
  }

  /** The equal-depth cell bounds for each clustered column, as one
    * single-row broadcastable aggregate (2^bits − 1 quantiles per
    * column). approx_percentile, deliberately: the GK sketch is one-pass
    * and MERGEABLE (map-side partials, no single-reducer sort of the
    * whole column — exact `percentile` collects every value into one
    * task, the failure mode the decile operator documents), and cell
    * bounds only steer LAYOUT, never answers — a slightly off bound
    * shifts file boundaries, not results.
    */
  def cellBounds(df: DataFrame, cols: Seq[String], bits: Int): DataFrame = {
    val ps = (1 until (1 << bits))
      .map(i => i.toDouble / (1 << bits)).mkString("array(", ",", ")")
    df.agg(
      expr(s"approx_percentile(${cols.head}, $ps, 10000)")
        .as(s"bounds_${cols.head}"),
      cols.tail.map(c =>
        expr(s"approx_percentile($c, $ps, 10000)").as(s"bounds_$c")): _*)
  }

  /** `df` with a `zkey` column appended (broadcast bounds + map-side
    * interleave).
    */
  def withZKey(df: DataFrame, cols: Seq[String], bits: Int = 4): DataFrame =
    df.crossJoin(broadcast(cellBounds(df, cols, bits)))
      .withColumn("zkey",
        zValue(cols.map(c => cellId(col(c), col(s"bounds_$c"))), bits))
      .drop(cols.map(c => s"bounds_$c"): _*)

  /** Rewrite `df` as `nFiles` parquet files clustered on the Morton
    * curve over `cols`: one range shuffle on the z-value, in-file z
    * order so row-group stats are tight too.
    */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
                    bits: Int = 4, nFiles: Int = 16): Unit =
    withZKey(df, cols, bits)
      .repartitionByRange(nFiles, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .drop("zkey")
      .write.mode("overwrite").parquet(path)
}
