package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing dimension, type 2: every natural key carries a history
  * of attribute versions with `[valid_from, valid_to)` intervals; the
  * current version has `valid_to IS NULL`.
  *
  * The reference's warehouse keeps only the latest attribute values — a
  * dim re-load silently overwrites history (merge_to_dw.py:153-170 keys
  * dims on the natural key alone). SCD2 is the standard warehouse answer
  * when facts must join the dimension AS OF their event time (a 2019 fact
  * should see the artist's 2019 attributes, not today's).
  *
  * Scale design: one snapshot apply = ONE full-outer hash join between
  * the open versions and the snapshot on the natural key, then a single
  * generator pass that emits each joined row's output versions
  * (kept-open / closed / newly-opened) — closed history never enters the
  * join at all, and no branch re-executes the join. Deterministic: given
  * the same snapshots and as-of dates, the version table is reproducible
  * anywhere (no sequence ids, no load-order dependence).
  */
object Scd2 {

  private val From = "valid_from"
  private val To = "valid_to"

  /** Initial load: every snapshot row becomes the open version of its
    * key. The snapshot must be unique per natural key (it is a point-in-
    * time state of the dimension, not an event log).
    */
  def init(snapshot: DataFrame, naturalKey: Seq[String], attrs: Seq[String],
           asOf: Column): DataFrame =
    snapshot.select((naturalKey ++ attrs).map(col): _*)
      .withColumn(From, asOf.cast("date"))
      .withColumn(To, lit(null).cast("date"))

  /** Apply one dimension snapshot taken at `asOf`:
    *   - key in both, attrs unchanged (null-safe)  → open row untouched;
    *   - key in both, any attr changed             → old version closed at
    *     `asOf`, new open version appended;
    *   - key only in the snapshot                  → new open version;
    *   - key absent from the snapshot              → open row untouched
    *     (a missing key is "no news", not a delete — the no-delete SCD2
    *     variant; deletions would close the row the same way).
    */
  def applySnapshot(dim: DataFrame, snapshot: DataFrame,
                    naturalKey: Seq[String], attrs: Seq[String],
                    asOf: Column): DataFrame = {
    val at = asOf.cast("date")
    val open = dim.where(col(To).isNull).withColumn("_in_dim", lit(1))
    val hist = dim.where(col(To).isNotNull)
    val snap = attrs.foldLeft(
      snapshot.select((naturalKey ++ attrs).map(col): _*))(
      (df, a) => df.withColumnRenamed(a, s"_new_$a"))
      .withColumn("_in_snap", lit(1))

    val j = open.join(snap, naturalKey, "full_outer")
    val changed = attrs.map(a => !(col(a) <=> col(s"_new_$a"))).reduce(_ || _)
    val keepOld = col("_in_dim").isNotNull &&
      (col("_in_snap").isNull || !changed)
    val closeOld = col("_in_dim").isNotNull && col("_in_snap").isNotNull &&
      changed
    val addNew = col("_in_snap").isNotNull &&
      (col("_in_dim").isNull || changed)

    // Each joined row fans out to its output versions through ONE array +
    // explode — three `j.where(...)` branches would re-execute the join
    // per branch.
    def ver(vals: Seq[Column], from: Column, to: Column): Column =
      struct((attrs.zip(vals).map { case (a, v) => v.as(a) } :+
        from.cast("date").as(From)) :+ to.cast("date").as(To): _*)
    val oldAttrs = attrs.map(col)
    val newAttrs = attrs.map(a => col(s"_new_$a"))
    val nullDate = lit(null).cast("date")
    val versions = array(
      when(keepOld, ver(oldAttrs, col(From), nullDate)),
      when(closeOld, ver(oldAttrs, col(From), at)),
      when(addNew, ver(newAttrs, at, nullDate)))

    hist.unionByName(
      j.select(naturalKey.map(col) :+
          explode(filter(versions, v => v.isNotNull)).as("_v"): _*)
        .select(naturalKey.map(col) :+ col("_v.*"): _*))
  }

  /** Point-in-time view: the version of each key valid at `at`
    * (`valid_from <= at < valid_to`, open-ended for the current row).
    * This is what a fact join uses to see event-time attributes.
    */
  def asOfVersion(dim: DataFrame, at: Column): DataFrame =
    dim.where(col(From) <= at && (col(To).isNull || at < col(To)))
}
