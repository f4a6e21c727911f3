package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming distinct-count maintenance via HLL sketch merge — the
  * unbounded-cardinality companion of the watermarked aggregations in
  * [[EventPipeline]]: exact streaming `countDistinct` needs state
  * proportional to the distinct values seen (unbounded on an infinite
  * stream), while an HLL register array is FIXED-SIZE per key forever,
  * at a contracted error (the a8_hll_bound/a8_hll_merge contracts).
  *
  * Per micro-batch (`foreachBatch`): sketch the batch per key (one
  * grouped aggregate), union with the persisted sketch table
  * (`hll_union_agg` — register-wise max), write-then-swap. HLL inserts
  * and unions are commutative and IDEMPOTENT (registers are maxes), so
  * the streamed sketch equals the one-shot batch sketch REGISTER-FOR-
  * REGISTER no matter how the stream was batched — and replaying a
  * batch after recovery converges to the same registers: exactly-once
  * by algebra, machine-asserted in SketchStreamSpec.
  *
  * Scale: state is |keys| × sketch-size (KBs), independent of stream
  * length; each batch costs one grouped aggregate over the batch plus a
  * union over |keys| rows.
  */
object SketchStream {

  /** Start-ready writer maintaining per-`keyCol` HLL sketches of
    * `valCol` at `statePath`.
    */
  def distinctWriter(events: DataFrame, statePath: String,
                     checkpoint: String, keyCol: String, valCol: String)
  : DataStreamWriter[Row] =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, statePath, keyCol, valCol)
      }

  /** One micro-batch (also the batch/backfill entry point). */
  def applyBatch(batch: DataFrame, statePath: String, keyCol: String,
                 valCol: String): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    val bs = batch.groupBy(col(keyCol))
      .agg(hll_sketch_agg(col(valCol)).as("sk"))
    val path = new Path(statePath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (!fs.exists(path)) bs
      else spark.read.parquet(statePath).unionByName(bs)
        .groupBy(col(keyCol))
        .agg(hll_union_agg(col("sk"), lit(false)).as("sk"))
    val tmp = new Path(statePath + ".tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(path, true)
    fs.rename(tmp, path)
    ()
  }

  /** The current distinct-count estimates from the sketch table. */
  def estimates(spark: SparkSession, statePath: String,
                keyCol: String): DataFrame =
    spark.read.parquet(statePath)
      .select(col(keyCol),
        hll_sketch_estimate(col("sk")).as("n_distinct"))
}
