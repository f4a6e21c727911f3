package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.functions.TextFunctions
import graft.operators.{Decontam, Dedup, TrainingMix}

/** Runner for the training-data side: the full curation→mix→pack chain
  * (the `t_training_pipeline` plan) from a parquet corpus to sharded
  * training output — the command a data team actually schedules.
  *
  * Usage: runMain graft.jobs.CorpusJobs shards \
  *          <documentsParquet> <outDir> [docsPerShard]
  *
  * Stages (each the registered, oracle-checked operator): quality gate →
  * exact dedup → near-dup clustering keeper → benchmark decontamination
  * (docs overlapping the eval slice removed) → deterministic weighted
  * source mixing → shard-partitioned parquet in training shuffle order.
  */
object CorpusJobs {

  /** Default per-language keep rates (override by editing the map a
    * deployment passes to [[curated]]).
    */
  val defaultRates: Map[String, Double] =
    Map("en" -> 0.75, "de" -> 0.5, "es" -> 0.25, "fr" -> 0.125)

  /** The curation chain: quality gate → exact dedup → near-dup keeper →
    * decontam removal → weighted mix. `evalPred` marks the held-out eval
    * slice decontamination protects.
    */
  def curated(docs: DataFrame, rates: Map[String, Double] = defaultRates,
              evalModulus: Int = 37): DataFrame = {
    val nt = TextFunctions.tokenCount(col("text"))
    val pr = TextFunctions.punctRatio(col("text"))
    val awl = TextFunctions.avgWordLen(col("text"))
    val quality = docs
      .where(nt >= 5 && pr <= 0.1 && awl >= 2.0 && awl <= 10.0)
    val exact = Dedup.exactDedup(quality, "doc_id", "text")
    val kept = Dedup.nearDedupKept(exact, "doc_id", "text", threshold = 0.5)
    val isEval = pmod(col("doc_id"), lit(evalModulus)) === 0
    val train = kept.where(!isEval)
    val flagged = Decontam.overlaps(train, docs.where(isEval),
        "doc_id", "text", n = 3, minOverlap = 2, maxShingleDf = 50L)
      .select(col("train_id").as("doc_id")).distinct()
    TrainingMix.weightedMix(
      train.join(flagged, Seq("doc_id"), "left_anti"),
      "lang", "doc_id", rates)
  }

  /** Curate and write shard-partitioned training parquet. */
  def curateToShards(spark: SparkSession, inPath: String, outDir: String,
                     docsPerShard: Long): Unit =
    TrainingMix.writeShards(
      curated(spark.read.parquet(inPath)), "doc_id", docsPerShard, outDir)

  /** Curate, then explode into overlapping retrieval chunks (the RAG
    * export): same curation chain, `Chunking.chunk` fan-out, parquet out.
    */
  def curateToChunks(spark: SparkSession, inPath: String, outDir: String,
                     size: Int, stride: Int): Unit =
    graft.operators.Chunking
      .chunk(curated(spark.read.parquet(inPath)), "doc_id", "text",
        size, stride)
      .write.mode("overwrite").parquet(outDir)

  /** Lake maintenance: compact small files to size-targeted ones, then
    * optionally Z-order the result on the given columns — the nightly
    * layout job run against landed partitions (compaction fixes file
    * counts, clustering fixes footer-stat selectivity).
    */
  def maintainLayout(spark: SparkSession, inPath: String, outDir: String,
                     zorderCols: Seq[String]): Unit =
    if (zorderCols.isEmpty)
      { graft.sources.Tables.compact(spark, inPath, outDir); () }
    else graft.operators.Layout.writeZOrdered(
      spark.read.parquet(inPath), outDir, zorderCols)

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: shards <documentsParquet> <outDir> [docsPerShard] | " +
        "chunks <documentsParquet> <outDir> [size] [stride] | " +
        "layout <parquetDir> <outDir> [zorderCol,zorderCol...]")
    val Array(job, inPath, outDir) = args.take(3)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, s"graft-$job")
    try job match {
      case "shards" =>
        curateToShards(spark, inPath, outDir,
          args.lift(3).map(_.toLong).getOrElse(1024L))
      case "chunks" =>
        curateToChunks(spark, inPath, outDir,
          args.lift(3).map(_.toInt).getOrElse(512),
          args.lift(4).map(_.toInt).getOrElse(384))
      case "layout" =>
        maintainLayout(spark, inPath, outDir,
          args.lift(3).map(_.split(",").toSeq).getOrElse(Seq.empty))
      case other => sys.error(s"unknown job $other")
    } finally spark.stop()
  }
}
