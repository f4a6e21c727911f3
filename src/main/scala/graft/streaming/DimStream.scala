package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.operators.Scd2

/** Streaming dimension maintenance: a stream of dimension snapshot rows
  * (tagged with their snapshot date) folded into a parquet-backed SCD2
  * version table via `foreachBatch` — the lake-upsert pattern for sinks
  * Structured Streaming has no native writer for.
  *
  * The reference refreshes its dims by overwriting attributes in place on
  * every weekly run (merge_to_dw.py:153-170); this path keeps the history
  * those overwrites destroy, continuously.
  *
  * Exactly-once without sink transactions: `foreachBatch` may REPLAY a
  * micro-batch after recovery, so the apply must be idempotent — and
  * SCD2 snapshot-apply is (re-applying an unchanged snapshot is a no-op,
  * asserted in Scd2Spec); the version table converges to the same state
  * on any replay. The dim itself is read → applied → written to a temp
  * dir → swapped in, because a Spark job cannot overwrite its own input.
  *
  * Scale: the per-batch driver work is the DISTINCT SNAPSHOT DATES in
  * the batch (a handful by construction — snapshots are daily/weekly cuts,
  * not events); everything row-shaped stays distributed in
  * [[Scd2.applySnapshot]]'s one-join plan.
  */
object DimStream {

  /** Start-ready writer: fold each micro-batch of `snapshots` (columns =
    * naturalKey ++ attrs ++ asOfCol, `asOfCol` an ISO `yyyy-MM-dd`
    * string) into the version table at `dimPath`.
    */
  def scd2Writer(snapshots: DataFrame, dimPath: String, checkpoint: String,
                 naturalKey: Seq[String], attrs: Seq[String],
                 asOfCol: String): DataStreamWriter[Row] =
    snapshots.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, dimPath, naturalKey, attrs, asOfCol)
      }

  /** One micro-batch: apply its snapshot dates in order, then swap the
    * rewritten version table in. Also the batch-mode entry point (used
    * directly by tests and backfills).
    */
  def applyBatch(batch: DataFrame, dimPath: String, naturalKey: Seq[String],
                 attrs: Seq[String], asOfCol: String): Unit = {
    val spark = batch.sparkSession
    // Distinct snapshot dates only — ISO strings sort chronologically.
    val dates = batch.select(col(asOfCol)).distinct()
      .collect().map(_.getString(0)).sorted
    if (dates.isEmpty) return

    val path = new Path(dimPath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing = if (fs.exists(path)) Some(spark.read.parquet(dimPath))
                   else None

    val applied = dates.foldLeft(existing) { (dim, d) =>
      val snap = batch.where(col(asOfCol) === d).drop(asOfCol)
      Some(dim match {
        case None => Scd2.init(snap, naturalKey, attrs, lit(d))
        case Some(cur) =>
          Scd2.applySnapshot(cur, snap, naturalKey, attrs, lit(d))
      })
    }.get

    // Write to a sibling temp dir first (materializes the new state —
    // a job cannot overwrite its own input), then swap.
    val tmp = new Path(dimPath + ".tmp")
    applied.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(path, true)
    fs.rename(tmp, path)
    ()
  }
}
