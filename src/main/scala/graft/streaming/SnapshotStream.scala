package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.sources.Snapshots

/** Streaming lake ingestion through [[Snapshots]] — every micro-batch
  * becomes one published table VERSION, so downstream batch jobs read a
  * consistent snapshot (`readAsOf` / `readLatest`) instead of racing a
  * directory that files keep landing in, and the whole ingestion history
  * stays time-travelable.
  *
  * Exactly-once WITHOUT an extra ledger: the batch's data directory is
  * named `bid-<batchId>`, and membership of that name in the LATEST
  * manifest is the "already published?" test — the manifest the format
  * maintains anyway doubles as the commit log. `foreachBatch` replays a
  * batch after crash recovery in exactly two states:
  *   - data written, manifest not yet published → the retry overwrites
  *     the same directory and publishes it once;
  *   - manifest published → the retry sees the reference and skips.
  * Either way each batchId contributes exactly one directory to exactly
  * one version (machine-asserted in SnapshotStreamSpec).
  *
  * Contract: this sink owns the table and is append-only — a concurrent
  * `overwrite` would clear the membership history the idempotence test
  * reads. Compaction/retention run as separate maintenance (vacuum after
  * an overwriting rewrite), exactly like any lake table.
  */
object SnapshotStream {

  /** Start-ready writer publishing each micro-batch as one version at
    * `basePath`.
    */
  def snapshotWriter(df: DataFrame, basePath: String,
                     checkpoint: String): DataStreamWriter[Row] =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, basePath, batchId); ()
      }

  /** One micro-batch (also the replay/backfill entry point). Returns the
    * published version, or 0 when the batch was empty or already
    * published.
    */
  def applyBatch(batch: DataFrame, basePath: String, batchId: Long): Int = {
    if (batch.isEmpty) return 0
    val spark = batch.sparkSession
    val dirName = s"bid-$batchId"
    val applied = Snapshots.latestDirs(spark, basePath)
      .exists(_.endsWith(s"/data/$dirName"))
    if (applied) 0
    else Snapshots.appendAs(spark, basePath, batch, dirName)
  }
}
