package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming KMV (k-minimum-values) sketch maintenance — the set-operation
  * companion of [[SketchStream]]'s HLL distinct counts: HLL registers
  * union (max-merge) but can never intersect; a maintained KMV sketch is a
  * uniform sample of each key's distinct-value hash space, so any two
  * keys' audiences can be intersected/Jaccard'd FROM STATE at any moment,
  * without re-reading the stream (Sketches.kmvPairwiseOverlap is the batch
  * face and the oracle surface — `t_kmv_overlap`).
  *
  * Per micro-batch (`foreachBatch`): hash the batch's distinct
  * (key, value) pairs, take the k lexicographically smallest md5s per key,
  * union with the persisted sketch table, RE-MINIMIZE to k, write-then-
  * swap. Min-k over a set is commutative, associative and IDEMPOTENT
  * (re-inserting a hash changes nothing — the merge is a set-union
  * followed by truncation at the k-th order statistic), so the streamed
  * sketch equals the one-shot batch sketch HASH-FOR-HASH on any batching,
  * and replaying a batch after recovery converges to identical state:
  * exactly-once by algebra, machine-asserted in KmvStreamSpec.
  *
  * Scale: state is |keys| × k hashes forever, independent of stream
  * length; each batch costs one distinct + one per-key top-k window over
  * batch-sized input plus a re-minimize over |keys|·k state rows. The
  * pairwise read face touches only state, never data.
  */
object KmvStream {

  /** Start-ready writer maintaining per-`keyCol` KMV sketches of
    * `valCol` at `statePath`.
    */
  def sketchWriter(events: DataFrame, statePath: String,
                   checkpoint: String, keyCol: String, valCol: String,
                   k: Int = 256): DataStreamWriter[Row] =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, statePath, keyCol, valCol, k)
      }

  /** One micro-batch (also the batch/backfill entry point). */
  def applyBatch(batch: DataFrame, statePath: String, keyCol: String,
                 valCol: String, k: Int): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    val bs = minK(
      batch.select(col(keyCol).as("g"),
          md5(col(valCol).cast("string")).as("h"))
        .where(col("g").isNotNull && col("h").isNotNull), k)
    val path = new Path(statePath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (!fs.exists(path)) bs
      else minK(spark.read.parquet(statePath).unionByName(bs), k)
    val tmp = new Path(statePath + ".tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(path, true)
    fs.rename(tmp, path)
    ()
  }

  /** k smallest distinct hashes per key — the sketch invariant both the
    * batch insert and the state merge re-establish. Native KMV aggregate
    * (bounded buffer, map-side partials), not a row_number window — see
    * functions/KmvMinK.scala.
    */
  private def minK(hashed: DataFrame, k: Int): DataFrame = {
    graft.functions.NativeFunctions.register(hashed.sparkSession)
    hashed.groupBy(col("g"))
      .agg(graft.functions.NativeFunctions.kmvMinK(col("h"), k).as("hs"))
      .select(col("g"), explode(col("hs")).as("h"))
  }

  /** Pairwise Jaccard estimates from the CURRENT state table alone —
    * answered without touching the stream: re-minimize each pair's union
    * to k positions, count positions present in both single-key
    * sketches, estimate = m / k_used (one exact int division).
    */
  def pairwiseEstimates(spark: SparkSession, statePath: String,
                        k: Int): DataFrame = {
    val sk = spark.read.parquet(statePath).localCheckpoint()
    val pairs = sk.select(col("g").as("ga")).distinct()
      .join(sk.select(col("g").as("gb")).distinct(), col("ga") < col("gb"))
    graft.functions.NativeFunctions.register(spark)
    val u = sk.join(pairs, col("g") === col("ga")).select("ga", "gb", "h")
      .unionByName(
        sk.join(pairs, col("g") === col("gb")).select("ga", "gb", "h"))
      .groupBy(col("ga"), col("gb"))
      .agg(graft.functions.NativeFunctions.kmvMinK(col("h"), k).as("hs"))
      .select(col("ga"), col("gb"), explode(col("hs")).as("h"))
    u.join(sk.select(col("g").as("ga"), col("h"), lit(1L).as("_ina")),
        Seq("ga", "h"), "left")
      .join(sk.select(col("g").as("gb"), col("h"), lit(1L).as("_inb")),
        Seq("gb", "h"), "left")
      .groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("k_used"),
        sum(when(col("_ina") === 1L && col("_inb") === 1L, 1L)
          .otherwise(0L)).as("m"))
      .select(col("ga"), col("gb"), col("m"), col("k_used"),
        (col("m").cast("double") / col("k_used")).as("jaccard_est"))
  }
}
