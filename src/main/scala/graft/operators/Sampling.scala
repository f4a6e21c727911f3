package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators.
  *
  * The load-bearing design point is [[stratifiedTopKByHash]]'s pre-filter:
  * a per-stratum `row_number()` window alone funnels EVERY row of a stratum
  * through one task's sort — terabytes per task when a stratum is a whole
  * language at 100 TB. A hash-threshold predicate first shrinks each
  * stratum to ~O(k) candidates (the hash is uniform, so `safety·k/n` of the
  * stratum survives in expectation), and only the survivors reach the exact
  * window. The result is IDENTICAL to the plain window — the filter keeps a
  * prefix of the hash order, verified to hold at least min(k, n) rows per
  * stratum before the window runs — so the oracle can stay the simple
  * full-window SQL.
  */
object Sampling {

  /** Hash-order ranking key: md5 of the id, as used by the reproducible
    * "k docs per stratum" sampling queries (no RNG, no seed drift).
    */
  def hashKey(idCol: Column): Column = md5(idCol.cast("string"))

  /** Order-preserving 52-bit numeric prefix of [[hashKey]] (13 hex digits
    * fit a double/long exactly) — the filterable form of the hash order.
    */
  def hashKeyNum(idCol: Column): Column =
    conv(substring(hashKey(idCol), 1, 13), 16, 10).cast("long")

  private val HashSpace: Double = math.pow(16.0, 13)

  /** 16^13 as an exact long — the size of the [[hashKeyNum]] space. */
  private val HashSpaceL: Long = 1L << 52

  /** Deterministic probability-proportional-to-size sampling: row i
    * survives with probability ≈ targetK·wᵢ/W (clamped at 1), decided
    * by its OWN id hash against a weight-scaled threshold — no RNG, no
    * seed drift, identical on re-runs, replayable in SQL. The keep
    * test is the cross-multiplied EXACT integer comparison
    * h·W < targetK·wᵢ·2⁵² (no division anywhere), a pure per-row
    * predicate after one broadcast-scalar total-weight aggregate —
    * zero shuffle at any corpus size.
    *
    * The PPS workhorse of corpus curation: sample documents
    * proportional to token count and long docs stop being
    * under-represented per-document sampling leaves them.
    */
  def ppsSample(df: DataFrame, idCol: String, weight: Column,
                targetK: Long): DataFrame = {
    require(targetK > 0, s"targetK must be positive: $targetK")
    val d38 = "decimal(38,0)"
    // Zero/negative-weight rows can never be kept, so they must not
    // inflate W either: total weight aggregates over the SAME filtered
    // set the keep predicate runs on (an unfiltered W both skews every
    // inclusion probability and, if W ≤ 0, accepts everything).
    val pos = df.withColumn("_w", weight.cast("long"))
      .where(col("_w") > 0)
    val tot = pos.agg(sum(col("_w")).cast(d38).as("_tw"))
    pos
      .crossJoin(broadcast(tot))
      .where(hashKeyNum(col(idCol)).cast(d38) * col("_tw") <
        lit(targetK).cast(d38) * col("_w").cast(d38) *
          lit(HashSpaceL).cast(d38))
      .drop("_w", "_tw")
  }

  /** Deterministic stratified sample: the `k` rows with the smallest
    * (md5(id), id) per stratum — equal to
    * `row_number() OVER (PARTITION BY strata ORDER BY md5(id), id) <= k`
    * but scale-safe: a hash-threshold pre-filter bounds the window's input
    * to ~`safety·k` candidate rows per stratum, so no task ever sorts a
    * whole stratum.
    *
    * The driver loop only widens the threshold in the (astronomically
    * unlikely, but possible) case a stratum kept fewer than min(k, n)
    * candidates; each check is a distributed aggregate over the tiny
    * candidate set. Strata with n ≤ safety·k keep all rows (bound ≥ 1).
    */
  def stratifiedTopKByHash(df: DataFrame, strataCol: String, idCol: String,
                           k: Int, safety: Double = 8.0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("_n"))
    var factor = safety
    var candidates = prefilter(df, counts, strataCol, idCol, k, factor)
    // Correctness guard: every stratum must keep at least min(k, n)
    // candidates, else the filtered top-k could miss a true top-k row.
    while (!shortStrata(candidates, counts, strataCol, k).isEmpty) {
      factor *= 4
      candidates = prefilter(df, counts, strataCol, idCol, k, factor)
    }
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashKey(col(idCol)), col(idCol))
    candidates.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= k)
      .drop("_rn")
  }

  /** Keep rows whose hash prefix falls below `safety·k/n` of the hash
    * space — an expected `safety·k` survivors per stratum. The per-stratum
    * counts broadcast (one row per stratum).
    */
  private def prefilter(df: DataFrame, counts: DataFrame, strataCol: String,
                        idCol: String, k: Int, safety: Double): DataFrame = {
    val bound = least(lit(1.0),
      lit(safety * k) / col("_n").cast("double")) * lit(HashSpace)
    df.join(broadcast(counts), Seq(strataCol))
      .where(hashKeyNum(col(idCol)).cast("double") < bound)
      .drop("_n")
  }

  private def shortStrata(candidates: DataFrame, counts: DataFrame,
                          strataCol: String, k: Int): DataFrame =
    // LEFT from counts: a stratum that lost ALL its rows to the filter
    // must still register as short.
    counts.join(
        candidates.groupBy(col(strataCol)).agg(count(lit(1)).as("_c")),
        Seq(strataCol), "left")
      .where(coalesce(col("_c"), lit(0L)) < least(lit(k.toLong), col("_n")))
}
