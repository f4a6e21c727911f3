package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benford first-digit audit — the classic fabricated-data screen:
  * observed first-digit shares of a positive numeric column against the
  * Benford expectation log10(1+1/d). The kernel is shared by the batch
  * gate (`dq_benford`) and the streamed face ([[graft.streaming.BenfordStream]])
  * so the two can never drift: both are [[reportFromCounts]] over a
  * (digit, n) count table, and digit counts are plain additive
  * integers — sum-mergeable across batches/partitions/days by
  * construction.
  *
  * Scale shape: one linear aggregate to ≤ 9 count rows; everything
  * after is 9-row arithmetic. Counts are exact ints; share and
  * deviation are one division + one subtraction each.
  */
object Benford {

  /** Expectations log10(1+1/d), pinned to 6 dp as STRING literals so
    * Spark's `lit(...toDouble)` and the oracle's `CAST(... AS DOUBLE)`
    * parse the identical constant — no engine evaluates a log.
    */
  val expected: Seq[(String, String)] = Seq(
    "1" -> "0.30103", "2" -> "0.176091", "3" -> "0.124939",
    "4" -> "0.09691", "5" -> "0.079181", "6" -> "0.066947",
    "7" -> "0.057992", "8" -> "0.051153", "9" -> "0.045757")

  /** First-digit counts of `valCol` rendered as decimal(12,2) — the
    * additive (digit, n) table both faces maintain. The render is a
    * TRY_CAST: under Spark 4's default ANSI mode a plain cast THROWS
    * on decimal overflow (≥ 10^10), which would kill a whole streamed
    * micro-batch over one outlier amount; try_cast turns it into a
    * null, and only digits 1-9 are counted — a null render, a negative
    * sign, or a leading 0 (value < 1) is OUTSIDE the Benford domain,
    * and counting such rows in the total while the join with the 9-row
    * expectation table drops their digit group would silently deflate
    * every share — a false fabricated-data alarm on clean data.
    * Excluded from numerator AND denominator (the oracle applies the
    * identical predicate).
    */
  def firstDigitCounts(df: DataFrame, valCol: String): DataFrame = {
    val digit = substring(
      expr(s"try_cast(`$valCol` AS DECIMAL(12,2))").cast("string"), 1, 1)
    df.where(digit.between("1", "9"))
      .groupBy(digit.as("digit"))
      .agg(count(lit(1)).as("n"))
  }

  /** The audit report from an ALREADY-AGGREGATED (digit, n) table —
    * (digit, n, share, expected, deviation) ordered by digit. Identical
    * expression structure to the original inline `dq_benford` so the
    * refactor is hash-invariant under the oracle.
    */
  def reportFromCounts(counts: DataFrame): DataFrame = {
    val expDf = expected
      .foldLeft(Option.empty[DataFrame]) { case (acc, (dd, p)) =>
        val row = counts.sparkSession.range(1)
          .select(lit(dd).as("digit"), lit(p.toDouble).as("expected"))
        Some(acc.fold(row)(_ unionByName row))
      }.get
    counts
      .crossJoin(broadcast(counts.agg(sum(col("n")).as("_tot"))))
      .join(broadcast(expDf), "digit")
      .select(col("digit"), col("n").cast("long").as("n"),
        (col("n").cast("double") / col("_tot")).as("share"),
        col("expected"),
        abs((col("n").cast("double") / col("_tot")) - col("expected"))
          .as("deviation"))
      .orderBy(col("digit"))
  }
}
