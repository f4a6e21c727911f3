package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — the time-series lookup Spark has no
  * built-in operator for: every left row picks the single latest right row
  * with `rightTime <= leftTime` within its key group.
  *
  * Implemented as the union–carry-forward plan, the scale-safe shape:
  * tag both sides, union them, and within each key run one
  * time-ordered window whose `last(_, ignoreNulls)` carries the most
  * recent right payload forward into every subsequent left row. ONE
  * shuffle (hash by key), per-key sorts that parallelize across keys —
  * never a per-row range probe, never a broadcast of a time dimension,
  * and no equality-bucketing approximation. At equal timestamps the
  * right row sorts first (`_side` 0 < 1), giving the conventional
  * inclusive (`<=`) as-of semantics.
  */
object AsofJoin {

  /** Left as-of join: all of `left`'s columns plus `payload` columns from
    * the matched right row (null when no right row precedes the left row).
    *
    * `right` must be unique per (key, time) — pre-aggregate if not (the
    * carry-forward would otherwise pick an arbitrary row among equal
    * timestamps). `payload` names must not collide with left columns.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "payload columns required")
    val payloadType = right.select(payload.map(col): _*).schema
    val leftType = left.schema
    val rTagged = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTime).as("_t"), lit(0).as("_side"),
        struct(payload.map(col): _*).as("_p"),
        lit(null).cast(leftType).as("_l")): _*)
    val lTagged = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTime).as("_t"), lit(1).as("_side"),
        lit(null).cast(payloadType).as("_p"),
        struct(left.columns.map(col).toSeq: _*).as("_l")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    rTagged.unionByName(lTagged)
      .withColumn("_asof", last(col("_p"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(col("_l.*") +: payload.map(c => col(s"_asof.$c")): _*)
  }

  /** As-of join WITH a staleness bound — the "recent quote only"
    * semantics: a match farther than `maxGapUs` microseconds before the
    * left row is treated as NO match (payload nulled), so a years-old
    * last-known value can never silently enrich today's row. Same
    * single-shuffle carry-forward plan as [[asofJoin]] plus one per-row
    * predicate; `payload` must carry `rightTime` so the gap is testable
    * on the joined row.
    */
  def asofJoinWithin(left: DataFrame, right: DataFrame,
                     keyCols: Seq[String], leftTime: String,
                     rightTime: String, payload: Seq[String],
                     maxGapUs: Long): DataFrame = {
    require(payload.contains(rightTime),
      s"payload must include $rightTime for the staleness test")
    val j = asofJoin(left, right, keyCols, leftTime, rightTime, payload)
    val stale = col(rightTime).isNull ||
      unix_micros(col(leftTime)) - unix_micros(col(rightTime)) >
        maxGapUs
    val out = j.withColumn("_stale", stale)
    out.select(out.columns.filterNot(_ == "_stale").map { c =>
      if (payload.contains(c)) when(!col("_stale"), col(c)).as(c)
      else col(c)
    }.toIndexedSeq: _*)
  }
}
