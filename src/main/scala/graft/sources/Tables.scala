package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Sources & sinks (SURVEY.md §2.1, S1–S12).
  *
  * The reference reads CSVs with pandas inference (merge_to_dw.py:28-34,
  * limpiezaSpotify.py:75) and hand-loads a SQLite table row by row
  * (bd.py:27-45). Here every source has a pinned schema — inference is a
  * correctness hazard (a junk cell silently flips a column to string) and a
  * perf hazard (inference is an extra full scan). All loads are set-based;
  * nothing is ever written row-at-a-time (S6/S10/S11 re-architecture).
  */
object Tables {

  /** The driver's synthetic star-schema corpus (TESTDATA.md). */
  val synthetic: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** S8: parquet read. Schema is embedded; nothing to pin.
    *
    * `events.parquet` has shipped two `ts` encodings across corpus drops:
    * TIMESTAMP(NANOS) (which Spark's µs timestamp refuses unless
    * `nanosAsLong` surfaces it as int64) and, since the round-5 corpus,
    * a plain TIMESTAMP(µs). The loader is SCHEMA-ADAPTIVE: it inspects the
    * resolved type of `ts` and only applies the nanos→µs rewrite when the
    * column actually arrived as int64. A µs column is normalized from
    * TIMESTAMP_NTZ to the session-zoned TimestampType — with the session
    * pinned to UTC (GraftSession.tuned) the values are bit-identical to
    * what the nanos path produced, so every downstream query and DuckDB
    * oracle comparison is unaffected by which corpus generation is on
    * disk. (nanosAsLong is a no-op for µs files, so setting it is safe in
    * both worlds; without it the nanos-era read throws before the schema
    * can even be inspected.)
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions.{col, expr}
      df.schema("ts").dataType match {
        case LongType =>
          df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType =>
          df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Spread a low-split scan across the session's shuffle parallelism
    * before CPU-heavy per-row work (optimization guide §2.5 "input skew":
    * one unsplittable file — a single parquet row group behaves the same —
    * serializes every downstream map stage; measured round 15: the
    * documents scan arrives as ONE split, so winnow/minhash/shingle
    * hashing ran single-threaded, 4-30 s of a 32-core box doing nothing).
    *
    * Scale-adaptive, never a constant: the target is the session's
    * configured shuffle parallelism (tracks SPARK_GRAFT_CPUS locally, the
    * cluster conf in production) and the repartition is SKIPPED when the
    * scan already carries that many splits — at 100 TB a table's
    * row-group count dwarfs any core count, so this is a planning-time
    * no-op there, and the one place it fires (a small dimension-sized
    * input feeding expensive per-row hashing) is exactly where the guide
    * says to repartition after the read.
    *
    * Hash-partitioned by the stable row key, not round-robin: no
    * sort-before-repartition tax, deterministic under retry, and
    * downstream key-partitioned exchanges (per-doc windows, per-doc
    * aggregates) can reuse the layout. Every engine aggregate over the
    * spread tables is exact-integer/decimal (the repo's money/ratio
    * discipline), so row placement cannot move a result bit.
    */
  def spread(df: DataFrame, keyCol: String): DataFrame = {
    val conf = df.sparkSession.sessionState.conf
    val n = conf.numShufflePartitions
    // Planning-time stats only (catalog file sizes — no RDD, no codegen,
    // no job): the scan can reach n splits iff its bytes exceed n input
    // partitions' worth of maxPartitionBytes. At that point the spread is
    // skipped — the production no-op path.
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes >= BigInt(n) * conf.filesMaxPartitionBytes) df
    else {
      import org.apache.spark.sql.functions.{col, xxhash64}
      // Partition on a DERIVED hash of the key, not the key itself: a
      // plain hashpartitioning(key) output is reusable by downstream
      // key-partitioned operators (EnsureRequirements elides their
      // exchange), which sounds like a win but moves the expensive
      // per-row projections BACK onto this exchange's map side — the
      // single scan task the spread exists to escape (measured round 15:
      // t_winnow_pairs kept a 4.6 s one-task stage under a doc_id
      // spread). xxhash64(key) satisfies no downstream requirement, so
      // heavy projections always run on the spread side. Deterministic
      // under task retry (unlike rand()-derived keys, SPARK-38388), no
      // sort-before-repartition tax (unlike round-robin).
      df.repartition(n, xxhash64(col(keyCol)))
    }
  }

  /** [[load]] + [[spread]]: the reader for tables whose consumers do
    * CPU-heavy per-row work (text corpus → shingle/minhash/winnow
    * hashing). Same rows, same schema — only the split layout changes.
    */
  def loadSpread(spark: SparkSession, dir: String, name: String,
                 keyCol: String): DataFrame =
    spread(load(spark, dir, name), keyCol)

  /** Register every synthetic table as a temp view so `spark.sql` queries
    * (the engine's SQL surface, SURVEY.md §3 "ad-hoc entry points") can
    * name them exactly like the DuckDB oracle does.
    *
    * Fault-isolated: a table whose load fails (e.g. corpus drift changing
    * a column encoding) is reported to stderr and skipped, so queries that
    * never touch it still plan — in round 5 an eager all-or-nothing
    * registration let a broken events loader take down the unrelated
    * `s2_sql_scan`/`s4_catalog`. A query that DOES need the bad table
    * still fails loudly at resolution (TABLE_OR_VIEW_NOT_FOUND), and
    * CorpusSmokeSpec fails the build on any load failure, so nothing is
    * silently masked.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    synthetic.foreach { n =>
      try load(spark, dir, n).createOrReplaceTempView(n)
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(
            s"[graft] registerAll: skipping table '$n' (${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.next()})")
      }
    }

  /** Pinned schema for the reference's Spotify tracks CSV
    * (README.md:91-96). Includes the stray `Unnamed: 0` index column the
    * loader must tolerate (merge_to_dw.py:268, SURVEY.md §7.4.5) and the
    * MySQL-reserved `key` column renamed at ingest (S12,
    * merge_to_dw.py:176-181).
    */
  val spotifySchema: StructType = StructType(Seq(
    StructField("Unnamed: 0", LongType),
    StructField("track_id", StringType),
    StructField("artists", StringType),
    StructField("album_name", StringType),
    StructField("track_name", StringType),
    StructField("popularity", IntegerType),
    StructField("duration_ms", LongType),
    StructField("explicit", BooleanType),
    StructField("danceability", DoubleType),
    StructField("energy", DoubleType),
    StructField("key", IntegerType),
    StructField("loudness", DoubleType),
    StructField("mode", IntegerType),
    StructField("speechiness", DoubleType),
    StructField("acousticness", DoubleType),
    StructField("instrumentalness", DoubleType),
    StructField("liveness", DoubleType),
    StructField("valence", DoubleType),
    StructField("tempo", DoubleType),
    StructField("time_signature", IntegerType),
    StructField("track_genre", StringType)))

  /** Pinned schema for the Grammy awards CSV (bd.py:11-24). The
    * `published_at`/`updated_at` columns are TEXT timestamps parsed on
    * demand (notebook cell 4), so they stay strings here.
    */
  val grammySchema: StructType = StructType(Seq(
    StructField("year", IntegerType),
    StructField("title", StringType),
    StructField("published_at", StringType),
    StructField("updated_at", StringType),
    StructField("category", StringType),
    StructField("nominee", StringType),
    StructField("artist", StringType),
    StructField("workers", StringType),
    StructField("img", StringType),
    StructField("winner", BooleanType)))

  /** S1: header CSV scan with a pinned schema. `key` → `track_key` rename
    * happens here, at ingest (S12), so no downstream code ever sees the
    * reserved word.
    */
  def readSpotifyCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(spotifySchema)
      .option("header", "true")
      .csv(path)
      .withColumnRenamed("key", "track_key")
      .withColumnRenamed("Unnamed: 0", "row_idx")

  def readGrammyCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(grammySchema)
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .csv(path)

  /** P4: required-column assertion (limpiezaSpotify.py:78-81) — fail fast
    * before any job is launched, not mid-pipeline.
    */
  def requireColumns(df: DataFrame, required: Seq[String]): DataFrame = {
    val missing = required.filterNot(df.columns.contains)
    require(missing.isEmpty, s"missing required columns: ${missing.mkString(", ")}")
    df
  }

  /** S7: parquet write (replaces the reference's /tmp hand-off files,
    * merge_to_dw.py:87-92).
    */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** S9: CSV export (limpiezaSpotify.py:103-104, merge_to_drive.py:32-37). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** JSONL (newline-delimited JSON) export — the interchange format LLM
    * training corpora ship in. Splittable: a 100 TB corpus of .jsonl
    * files scans with full parallelism (unlike multiLine JSON).
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** JSONL scan with a PINNED schema: inference costs an extra full pass
    * over 100 TB and can drift types between corpus drops (an all-numeric
    * string column comes back BIGINT), so readers must state what they
    * expect.
    */
  def readJsonl(spark: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC write/read — the second columnar lake format (built into Spark).
    * Same pushdown/pruning story as parquet: predicate pushdown, column
    * pruning, and min/max stripe skipping all apply, so a corpus landed
    * by an ORC-native upstream needs no conversion pass to query.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** XML write/read — the third row-oriented interchange format (built
    * into Spark 4's sql module; no external package). Row-based like
    * CSV/JSONL, so a 100 TB landing of XML exports scans with full file
    * parallelism; the schema is PINNED on read for the same
    * inference-cost/type-drift reasons as [[readJsonl]].
    */
  def writeXml(df: DataFrame, path: String, rowTag: String): Unit =
    df.write.mode("overwrite").option("rowTag", rowTag)
      .format("xml").save(path)

  def readXml(spark: SparkSession, path: String, rowTag: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("rowTag", rowTag)
      .format("xml").load(path)

  /** Stage one file per row — the raw-asset landing shape (crawled
    * pages, images, audio) the `binaryFile` source ingests. Executors
    * write their partitions' files in parallel (per-partition imperative
    * IO is exactly what mapPartitions/foreachPartition is for); the
    * target dir is deleted first so re-runs can't accumulate stale
    * files. Scheme-split write path (ADVICE r7): on a REMOTE scratch
    * (hdfs://, s3a://, …) every per-file write goes through the Hadoop
    * FileSystem resolved from the path INSIDE each partition — a
    * java.nio local write there would land files on executor-local
    * disks and the later binaryFile scan would silently see a partial
    * dir. The session's Hadoop conf is shipped as a plain key/value
    * array (Configuration itself is not serializable) so filesystem
    * creds/endpoints reach the executors. On a `file:` scratch the
    * writes stay raw java.nio (~5× less per-create overhead than
    * LocalFileSystem, measured on the 200-file fixture) — correct ONLY
    * when all executors share the driver's filesystem (local mode, or a
    * cluster whose scratch is a shared mount); a multi-node cluster
    * with per-node local disks must pass a remote scheme. Bound the row
    * count upstream: one file per row is the many-small-files
    * anti-pattern unless the assets genuinely arrive as files (which is
    * the case this source exists for).
    */
  def stageDocFiles(df: DataFrame, idCol: String, textCol: String,
                    dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val hadoopConf = df.sparkSession.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(hadoopConf)
    fs.delete(p, true)
    fs.mkdirs(p)
    val localFs = fs.getUri.getScheme == "file"
    val localBase = fs.makeQualified(p).toUri.getPath
    val confEntries: Array[(String, String)] =
      if (localFs) Array.empty
      else hadoopConf.iterator().asScala.map(e => e.getKey -> e.getValue)
        .toArray
    df.select(org.apache.spark.sql.functions.col(idCol).cast("long"),
        org.apache.spark.sql.functions.col(textCol).cast("string"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        if (localFs) {
          rows.foreach { r =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(localBase, s"doc_${r.getLong(0)}.txt"),
              r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
        } else {
          val conf = new org.apache.hadoop.conf.Configuration(false)
          confEntries.foreach { case (k, v) => conf.set(k, v) }
          val base = new org.apache.hadoop.fs.Path(dir)
          // Own (non-cached) FS instance per partition: checksum
          // sidecars off for raw asset files (the sidecar doubles the
          // tiny-file count), and mutating the JVM-cached shared
          // instance would leak that setting to unrelated writers.
          val pfs = org.apache.hadoop.fs.FileSystem.newInstance(
            base.toUri, conf)
          try {
            pfs.setWriteChecksum(false)
            rows.foreach { r =>
              val out = pfs.create(
                new org.apache.hadoop.fs.Path(base,
                  s"doc_${r.getLong(0)}.txt"), true)
              try out.write(r.getString(1)
                .getBytes(java.nio.charset.StandardCharsets.UTF_8))
              finally out.close()
            }
          } finally pfs.close()
        }
      }
  }

  /** `binaryFile` scan: one row per staged file with (path, length,
    * content) — Spark's built-in whole-file source for opaque assets.
    * The format is read-only by design; pair it with [[stageDocFiles]]
    * (or any upstream landing job) for fixtures.
    */
  def readBinaryFiles(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)

  /** Hive-style partitioned write: one directory per distinct value of
    * `partCols` (e.g. `yr=1995/`). At 100 TB this is THE first-line scan
    * reducer: a reader filtering on a partition column never opens the
    * other directories at all (partition pruning happens at planning,
    * before any I/O — asserted in PlanAuditSpec). Partition columns must
    * be low-cardinality (dates, sources, languages): one dir per value,
    * and a high-cardinality key would shatter the table into millions of
    * tiny files.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetBytes` files. Streaming sinks and fine-grained partitioned
    * writers accumulate kilobyte-sized files; every later scan then pays
    * one task launch and one file open per fragment, and the driver pays
    * the listing. Sizing comes from the directory's file statuses — a
    * driver-side METADATA listing, no data scan — and the rewrite is one
    * round-robin repartition to the computed file count. Returns the
    * number of output files. Run it per partition directory on a
    * partitioned table (compaction must not merge across partition
    * boundaries).
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long = 128L << 20): Int = {
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val total = fs.listStatus(p).filter(_.isFile)
      .map(_.getLen).filter(_ > 0).sum
    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath).repartition(n)
      .write.mode("overwrite").parquet(outPath)
    n
  }

  /** Schema-evolution read: a lake table's batches drift over time
    * (columns added/dropped); `mergeSchema` unions every footer schema at
    * planning time and null-fills absent columns per file. Planning cost
    * is one footer read per file — fine for a one-off backfill; a
    * long-lived 100 TB table should pin the merged schema in a catalog
    * instead of re-deriving it per query (the read path is then [[load]]
    * with the pinned schema).
    */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Batch-incremental processing ledger: which Hive-style partition
    * directories of `dataPath` has a scheduled batch job NOT yet
    * processed? The ledger is a plain text file of processed partition
    * names — driver-side METADATA only (one directory listing + one
    * small file read, no data scan), the batch counterpart of the file
    * tracking a streaming checkpoint does. Idempotent by construction:
    * re-running a period sees its partitions already in the ledger and
    * gets an empty work list. (Concurrent writers need a real lock
    * service; scheduled batch jobs run one instance per table.)
    */
  def unprocessedPartitions(spark: SparkSession, dataPath: String,
                            ledgerPath: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dataPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.contains("=")).toSeq
    val lp = new org.apache.hadoop.fs.Path(ledgerPath)
    val done: Set[String] = if (!fs.exists(lp)) Set.empty
      else {
        val in = fs.open(lp)
        try scala.io.Source.fromInputStream(in).getLines().toSet
        finally in.close()
      }
    parts.filterNot(done).sorted
  }

  /** Append newly-processed partition names to the ledger. */
  def markProcessed(spark: SparkSession, ledgerPath: String,
                    parts: Seq[String]): Unit = {
    if (parts.isEmpty) return
    val lp = new org.apache.hadoop.fs.Path(ledgerPath)
    val fs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prior = if (!fs.exists(lp)) Seq.empty
      else {
        val in = fs.open(lp)
        try scala.io.Source.fromInputStream(in).getLines().toSeq
        finally in.close()
      }
    val out = fs.create(lp, true)
    try out.write((prior ++ parts).distinct.sorted
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Stage boundary: materialize `df` as a parquet table and return a
    * scan of it. For a relation fanned into many downstream branches
    * (the warehouse build reads its merge output 8+ ways), this beats
    * both recompute-per-branch and `.persist()`: each branch's scan is
    * COLUMN-PRUNED and filter-pushed against parquet, while the in-memory
    * cache pays columnar encoding for all columns and every branch scans
    * the full width. At cluster scale this is the staging table written
    * to the lake between pipeline stages.
    */
  def stage(df: DataFrame, path: String): DataFrame = {
    // lz4 over the default snappy: measured ~35% faster encode on the
    // wide merge relation at the same compressed size — a staging table
    // is written once and read a handful of times, so encode speed wins.
    df.write.mode("overwrite").option("compression", "lz4").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Scratch dir under java.io.tmpdir for a staged per-data-dir artifact
    * (persisted ANN indexes, the warehouse merge stage). The FULL
    * data-dir path is encoded (sanitized) into the name — the previous
    * `d.hashCode` key could collide across data dirs, and two concurrent
    * JVMs sharing a tmpdir would silently overwrite each other's builds
    * (ADVICE r8) — plus the pid, which isolates concurrent runs while
    * staying stable across calls within one process (a bench rep
    * overwrites its own previous build, never another run's). A one-time
    * shutdown hook deletes every staged tree, so correctness runs stop
    * accumulating artifacts in /tmp.
    */
  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete(); ()
  }
  private val scratchDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val scratchHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      scratchDirs.forEach(p => rmTree(new java.io.File(p)))
    }))
  def scratchDir(prefix: String, d: String): String = {
    val safe = new java.io.File(d).getCanonicalPath
      .replaceAll("[^A-Za-z0-9._-]", "_")
    val f = new java.io.File(sys.props("java.io.tmpdir"),
      s"${prefix}_p${ProcessHandle.current().pid()}_$safe")
    scratchHook
    scratchDirs.add(f.getAbsolutePath)
    f.getAbsolutePath
  }

  /** A scratch dir cleared NOW — for the stream-replay queries that
    * rebuild per-batch state from empty on every execution, so a bench
    * rep always times the canonical fresh sequence rather than an
    * incremental top-up of the previous rep's state.
    */
  def freshScratchDir(prefix: String, d: String): String = {
    val p = scratchDir(prefix, d)
    rmTree(new java.io.File(p))
    p
  }

  /** Drop a managed table AND its warehouse files. The in-memory catalog
    * is session-scoped but warehouse files persist: a table created by a
    * previous session is invisible to DROP TABLE yet still blocks CREATE
    * with LOCATION_ALREADY_EXISTS, so the location is cleared explicitly.
    */
  def dropManaged(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    rmTree(new java.io.File(wh, table.toLowerCase))
  }

  /** Bucketed managed-table write: pre-shuffles data into `nBuckets` by
    * `bucketCol` at write time so later equi-joins/aggregations on that
    * column plan WITHOUT a shuffle exchange (asserted in BucketingSpec).
    * This is the at-rest co-location strategy for 100 TB fact⋈fact joins:
    * pay the shuffle once when the table is built, never per query.
    */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int,
                    bucketCol: String, sortCols: String*): Unit = {
    dropManaged(df.sparkSession, table)
    val w = df.write.mode("overwrite").bucketBy(nBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
