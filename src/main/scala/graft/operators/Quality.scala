package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints (the Deequ/dbt-tests family):
  * uniqueness, completeness, range, and referential-integrity checks
  * evaluated as a constraint REPORT — (rule, violations, pass) rows —
  * the contract a pipeline asserts before publishing a table.
  *
  * Scale design: every single-table rule is an aggregate EXPRESSION, so
  * all of a table's rules fuse into ONE map-side-combinable pass over it
  * (`check` — adding a rule adds a column, not a scan); only referential
  * integrity pays a join, and that join is an anti-join the optimizer
  * can broadcast when the parent's key set is small. Nothing collects:
  * the report itself is rows.
  *
  * For counters that must ride an EXISTING materialization instead of
  * their own pass, [[Observe.counters]] is the companion (CollectMetrics
  * on the output plan); this module is the standalone gate.
  */
object Quality {

  /** Violations-count aggregate expressions for common rules. */
  def uniqueViolations(cols: Column*): Column =
    (count(lit(1)) - count_distinct(cols.head, cols.tail: _*))
      .cast("long")

  def nullViolations(c: Column): Column =
    sum(when(c.isNull, 1L).otherwise(0L)).cast("long")

  def rangeViolations(c: Column, lo: Column, hi: Column): Column =
    sum(when(c.between(lo, hi) || c.isNull, 0L).otherwise(1L))
      .cast("long")

  /** Evaluate named violation aggregates over `df` in ONE pass, returned
    * as (rule, violations) rows.
    */
  def check(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val wide = df.agg(rules.head._2.as(rules.head._1),
      rules.tail.map { case (n, e) => e.as(n) }: _*)
    val stacked = rules.map { case (n, _) => s"'$n', `$n`" }
      .mkString(s"stack(${rules.size}, ", ", ", ")")
    wide.select(expr(s"$stacked as (rule, violations)"))
  }

  /** Referential integrity: child rows whose `fk` has no match in the
    * parent's `pk` (NULL fks are completeness's concern, not FK's).
    */
  def fkViolations(name: String, child: DataFrame, fk: String,
                   parent: DataFrame, pk: String): DataFrame =
    child.where(col(fk).isNotNull)
      .join(parent.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")
      .agg(count(lit(1)).cast("long").as("violations"))
      .select(lit(name).as("rule"), col("violations"))

  /** Union per-table reports into the final gate: pass ⇔ 0 violations. */
  def report(parts: DataFrame*): DataFrame =
    parts.reduce(_ unionByName _)
      .withColumn("pass", col("violations") === 0L)
      .orderBy(col("rule"))
}
