package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextFunctions
import graft.operators.TrainingMix

/** Streaming corpus ingestion: the continuous-arrival counterpart of the
  * batch curation funnel (`t_curation_funnel`). New document files land in
  * a directory (JSONL — the format corpora actually ship in), and each
  * micro-batch is quality-gated, PII-scrubbed, and exact-deduped against
  * every document seen inside the watermark horizon.
  *
  * The per-row stages (quality signals, scrub, content hash) are the SAME
  * column expressions the batch queries use — batch/streaming is a
  * property of the source, not the transformation. Near-dup dedup stays
  * batch (its candidate join needs the whole corpus); the streaming layer
  * handles the arrival-time window, a periodic batch job sweeps the rest.
  *
  * Scale: every stage is a map-side projection except the dedup, whose
  * state is bounded by the watermark (one hash per doc inside the
  * horizon, evicted as the watermark advances) — never O(corpus).
  */
object CorpusStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("ingest_ts", TimestampType)))

  /** JSONL file stream with pinned schema (inference is unavailable on
    * streams anyway — another reason corpus readers declare their schema).
    */
  def readCorpusStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).json(dir)

  /** Quality gate → PII scrub → content-hash exact dedup within the
    * watermark. Emits the curated rows with their quality features.
    */
  def curateStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val nt = TextFunctions.tokenCount(col("text"))
    val pr = TextFunctions.punctRatio(col("text"))
    val awl = TextFunctions.avgWordLen(col("text"))
    docs
      .withWatermark("ingest_ts", watermark)
      .where(nt >= 5 && pr <= 0.1 && awl >= 2.0 && awl <= 10.0)
      .withColumn("text", TextFunctions.redactPii(col("text")))
      .withColumn("content_hash", md5(col("text")))
      .dropDuplicatesWithinWatermark("content_hash")
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        col("content_hash"), nt.as("n_tokens"), col("ingest_ts"))
  }

  /** [[curateStream]] followed by deterministic weighted source mixing
    * (TrainingMix.weightedMix). The mix predicate is a stateless per-row
    * hash threshold, so it composes with any streaming plan and yields
    * the SAME kept set as the batch mix over the same rows — micro-batch
    * boundaries cannot change a row's own md5.
    */
  def curateAndMixStream(docs: DataFrame, rates: Map[String, Double],
                         watermark: String = "1 hour"): DataFrame =
    TrainingMix.weightedMix(curateStream(docs, watermark),
      "lang", "doc_id", rates)
}
