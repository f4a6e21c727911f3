package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads ride through the engine as
  * opaque `binary` columns with a typed metadata struct beside them.
  *
  * The Spark-side design is the real deliverable here — schema, batch
  * shape, and partitioning are what a 100 TB media pipeline lives or dies
  * by:
  *  - payloads stay in ONE binary column, never exploded into rows, so
  *    Parquet keeps them contiguous and the scan can prune them when a
  *    query touches only metadata (column pruning skips megabytes/row);
  *  - decode/feature-extract runs per-PARTITION over an iterator
  *    (`mapPartitions`), the JVM shape that amortizes per-batch codec
  *    setup exactly like `mapInPandas` batches do in Python;
  *  - repartitioning before decode is byte-budgeted, not row-budgeted
  *    (`targetPartitionBytes`), since row counts mean nothing when rows
  *    are 10 KB–100 MB.
  *
  * The codec itself is STUBBED (this container has no image/audio libs):
  * `decodeStub` derives deterministic fake dimensions from the payload
  * bytes. The seam where a real decoder plugs in is `decodePartition`.
  */
object Multimodal {

  /** Typed metadata carried beside a binary payload. */
  case class MediaMeta(byteLen: Long, mime: String, width: Int, height: Int)

  case class MediaRow(id: Long, payload: Array[Byte], meta: MediaMeta)

  /** Wrap a text corpus as fake media rows: payload = utf-8 bytes. Lets
    * the whole pipeline be exercised on the synthetic corpus.
    */
  def asMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** STUB decoder: deterministic fake dimensions from the payload bytes.
    * A real implementation would hand `bytes` to a codec; everything
    * around this call (batching, schema, partitioning) is production
    * shape.
    */
  def decodeStub(bytes: Array[Byte]): MediaMeta = {
    val len = bytes.length.toLong
    // Cheap deterministic pseudo-dimensions: fold the first/last bytes.
    val h = bytes.foldLeft(17L)((a, b) => a * 31 + (b & 0xff))
    MediaMeta(len, "application/octet-stream",
      (math.abs(h) % 1920).toInt + 1, (math.abs(h / 1920) % 1080).toInt + 1)
  }

  /** Per-partition decode: iterator-in/iterator-out, so a real codec can
    * allocate once per partition and stream rows through (the JVM
    * equivalent of a `mapInPandas` batch loop).
    */
  def decodePartition(rows: Iterator[(Long, Array[Byte])]): Iterator[MediaRow] =
    rows.map { case (id, bytes) => MediaRow(id, bytes, decodeStub(bytes)) }

  /** Full decode pipeline: byte-budgeted repartition → per-partition
    * decode → typed Dataset with the metadata struct materialized.
    */
  def decode(spark: SparkSession, media: DataFrame,
             targetPartitionBytes: Long = 128L * 1024 * 1024): Dataset[MediaRow] = {
    import spark.implicits._
    val stats = media.agg(sum(length(col("payload"))).as("bytes")).head()
    val totalBytes = Option(stats.getAs[Long]("bytes")).getOrElse(0L)
    val parts = math.max(1, (totalBytes / targetPartitionBytes).toInt)
    media.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .repartition(parts)
      .mapPartitions(decodePartition)
  }
}
