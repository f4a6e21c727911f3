package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared reader for the per-batchId partial-count state layout every
  * non-idempotent streamed sketch uses (`statePath/batch=<batchId>/`
  * holding additive (keys..., count) rows — the [[DriftStream]]
  * exactly-once recipe): the maintained table is the per-key SUM over
  * all batch partials, or the caller's zero-row frame when no state
  * exists yet. One definition so the CMS / histogram / category /
  * Benford faces cannot drift on the exists-check or the sum-merge.
  */
private[streaming] object PartialState {

  def summed(spark: SparkSession, statePath: String, keyCols: Seq[String],
             cntCol: String, empty: => DataFrame): DataFrame = {
    val p = new Path(statePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) empty
    else spark.read.parquet(statePath)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(cntCol)).cast("long").as(cntCol))
  }
}
