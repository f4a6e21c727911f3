package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic MERGE INTO semantics — the lakehouse upsert statement
  * (WHEN MATCHED [AND cond] THEN UPDATE / DELETE, WHEN NOT MATCHED THEN
  * INSERT) — expressed as ONE full-outer join + one projection + one
  * filter, so Catalyst plans it like any other join: broadcast when the
  * change-set is small (the common case — a CDC batch against a big
  * table), sort-merge with AQE skew-split otherwise, zero-Exchange when
  * the target is bucketed on the key ([[graft.sources.Tables.writeBucketed]]).
  *
  * This is the set-based generalization of the narrower upsert shapes
  * already in the engine: [[StarSchema.upsertDim]] (insert-if-absent) and
  * [[Scd2.applySnapshot]] (versioned history). At 100 TB the physical
  * rewrite under this logical MERGE prunes to the files whose parquet
  * min/max key ranges intersect the change-set; the plan here is exactly
  * the MERGE those engines execute per touched file.
  *
  * Contract: `source` must be unique per `key` (the standard MERGE
  * precondition — multiple source matches per target row are ambiguous).
  * Update / delete / insert expressions may reference both sides via the
  * aliases `t` (target) and `s` (source), e.g. `col("s.new_bal")`.
  */
object LakeMerge {

  /** Apply MERGE INTO `target` USING `source` ON `t.key = s.key`.
    *
    * @param whenMatchedUpdate  target column → new value for matched,
    *                           non-deleted rows; unlisted columns keep
    *                           their target value (column-level
    *                           copy-on-write).
    * @param whenMatchedDelete  boolean over `t`/`s`: matched rows where
    *                           this holds are dropped.
    * @param whenNotMatchedInsert target column → value for source-only
    *                           rows; unlisted columns insert NULL.
    * @param whenNotMatchedInsertCond boolean over `s`: source-only rows
    *                           failing it are skipped instead of
    *                           inserted (e.g. a CDC delete for a key the
    *                           target never had).
    */
  def mergeInto(target: DataFrame, source: DataFrame, key: String,
                whenMatchedUpdate: Map[String, Column],
                whenMatchedDelete: Column = lit(false),
                whenNotMatchedInsert: Map[String, Column] = Map.empty,
                whenNotMatchedInsertCond: Column = lit(true))
  : DataFrame = {
    // Row-presence markers, NOT key nullness, discriminate the merge
    // classes: a NULL-key target row is still a present target row (it
    // can never match, `===` rejects null pairs — it must pass through
    // unchanged), while testing `t.key IS NULL` would misclassify it as
    // source-only and overwrite it with insert values.
    // The markers are injected via withColumn, which silently REPLACES
    // an existing column of the same name — an input already carrying
    // one would misclassify rows (e.g. matched rows treated as
    // source-only), so collisions are rejected outright.
    for (m <- Seq("_t_present", "_s_present");
         side <- Seq("target" -> target, "source" -> source))
      require(!side._2.columns.contains(m),
        s"mergeInto: ${side._1} already has internal marker column $m")
    val joined = target.withColumn("_t_present", lit(true)).alias("t")
      .join(source.withColumn("_s_present", lit(true)).alias("s"),
        col(s"t.$key") === col(s"s.$key"), "full_outer")
    val matched =
      col("t._t_present").isNotNull && col("s._s_present").isNotNull
    val srcOnly = col("t._t_present").isNull
    val outCols = target.columns.map { c =>
      val keep = col(s"t.$c")
      val ins = whenNotMatchedInsert.getOrElse(c,
        lit(null).cast(target.schema(c).dataType))
      when(srcOnly, ins)
        .when(matched, whenMatchedUpdate.getOrElse(c, keep))
        .otherwise(keep).as(c)
    }
    // NULL delete-condition must mean "keep", NULL insert-condition must
    // mean "skip" — coalesce pins both against three-valued surprises.
    joined
      .where(!(matched && coalesce(whenMatchedDelete, lit(false))) &&
        !(srcOnly && !coalesce(whenNotMatchedInsertCond, lit(false))))
      .select(outCols.toIndexedSeq: _*)
  }
}
