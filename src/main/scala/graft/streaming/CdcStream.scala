package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.operators.LakeMerge

/** Streaming CDC mirror maintenance: a change stream
  * (op ∈ {U, D}, key, attributes, seq) folded into a parquet-backed
  * TYPE-1 lake mirror via `foreachBatch` MERGE INTO — the companion of
  * [[DimStream]] (which keeps type-2 history); this path keeps only the
  * LATEST state per key, the replicated-table shape every downstream
  * join wants.
  *
  * Per micro-batch: (1) compact the batch to its latest change per key
  * (`max_by` over seq — one grouped aggregate, the CDC log-compaction
  * operator from ev_latest_compact); (2) one [[LakeMerge.mergeInto]]
  * against the mirror — upserts update-or-insert, deletes drop, and a
  * delete for a key the mirror never had is SKIPPED via the
  * insert-condition (not resurrected as a null row).
  *
  * Exactly-once by IDEMPOTENCE, like every lake sink here: `foreachBatch`
  * replays batches after recovery, and re-merging an already-applied
  * change-set is a no-op (same latest-per-key state ⇒ same merge result
  * — machine-asserted in CdcStreamSpec). Write-then-swap because a job
  * cannot overwrite its own input.
  *
  * Scale: the merge is the change-set (small, broadcastable) against the
  * mirror — at the lake the physical rewrite prunes to files whose key
  * ranges intersect the change-set (see LakeMerge scaladoc); nothing
  * here collects rows to the driver.
  */
object CdcStream {

  /** Start-ready writer: fold each micro-batch of `changes` (columns:
    * `op` ("U"/"D"), `key`, `attrs`..., `seqCol`) into the mirror at
    * `mirrorPath`.
    */
  def mergeWriter(changes: DataFrame, mirrorPath: String,
                  checkpoint: String, key: String, attrs: Seq[String],
                  seqCol: String): DataStreamWriter[Row] =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, mirrorPath, key, attrs, seqCol)
      }

  /** One micro-batch (also the batch/backfill entry point). */
  def applyBatch(batch: DataFrame, mirrorPath: String, key: String,
                 attrs: Seq[String], seqCol: String): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    // CDC log compaction: latest change per key by seq (deterministic —
    // seq is the log position, unique per key by contract).
    val latest = batch.groupBy(col(key))
      .agg(max_by(struct((Seq("op") ++ attrs).map(col): _*),
        col(seqCol)).as("c"))
      .select(col(key) +: (Seq("op") ++ attrs).map(c => col(s"c.$c")): _*)

    val path = new Path(mirrorPath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(mirrorPath + ".tmp")
    val old = new Path(mirrorPath + ".old")
    // Crash recovery BEFORE reading: the swap below never deletes the
    // live mirror until the new one is in place, but a crash can still
    // land between renames. Finish the interrupted swap first — a .tmp
    // is only ever renamed at `path` after its write completed, and
    // while `path` is absent either .tmp or .old holds a full copy, so
    // no interleaving rebuilds the mirror from the empty prototype.
    if (!fs.exists(path)) {
      if (fs.exists(tmp)) fs.rename(tmp, path)
      else if (fs.exists(old)) fs.rename(old, path)
    } else {
      // Stale leftovers from a crash after the new mirror landed.
      fs.delete(tmp, true)
      fs.delete(old, true)
    }
    val existing =
      if (fs.exists(path)) spark.read.parquet(mirrorPath)
      else {
        // Empty mirror with the target schema (key ++ attrs).
        val proto = latest.select(col(key) +: attrs.map(col): _*)
        proto.where(lit(false))
      }

    val merged = LakeMerge.mergeInto(
      existing, latest, key,
      whenMatchedUpdate = attrs.map(a => a -> col(s"s.$a")).toMap,
      whenMatchedDelete = col("s.op") === "D",
      whenNotMatchedInsert =
        (key +: attrs).map(a => a -> col(s"s.$a")).toMap,
      whenNotMatchedInsertCond = col("s.op") =!= "D")

    // Rename-aside swap: write the replacement fully, step the live
    // mirror aside, promote, then drop the aside copy — at every
    // instant at least one complete mirror exists on disk (the
    // delete-then-rename it replaces had a zero-copy crash window).
    merged.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(path)) fs.rename(path, old)
    fs.rename(tmp, path)
    fs.delete(old, true)
    ()
  }
}
