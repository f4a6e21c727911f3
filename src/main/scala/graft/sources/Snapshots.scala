package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-based snapshot versioning — a minimal table format giving the
  * lake TIME TRAVEL over immutable parquet files (the capability the big
  * table formats build on: every write is a new set of data files plus a
  * new manifest listing exactly the files visible in that version; old
  * manifests keep old versions readable forever, until vacuumed).
  *
  * Layout under `basePath`:
  * {{{
  *   data/batch-<v>/part-*.parquet   — immutable; written once by version v
  *   _manifests/v<v>.txt             — one data directory path per line
  * }}}
  *
  * Semantics:
  *  - `append` writes a new batch directory and publishes manifest v+1 =
  *    (previous manifest's dirs) + the new dir;
  *  - `overwrite` writes a new batch directory and publishes manifest
  *    v+1 = [the new dir] alone — logically replacing the table while
  *    PHYSICALLY retaining every older version;
  *  - `readAsOf(v)` plans a scan over exactly manifest v's directories —
  *    column pruning and predicate pushdown apply per file as on any
  *    parquet scan, and planning cost is one small-file read (the
  *    manifest), NOT a directory listing of the whole history;
  *  - `vacuum(keepFrom)` deletes data directories referenced only by
  *    manifests older than `keepFrom` (and those manifests) — the
  *    retention knob that bounds storage at 100 TB write volume.
  *
  * Publication order makes readers crash-consistent: data files land
  * before their manifest, and a manifest write is a single small-file
  * create — a reader either sees version v (complete by construction) or
  * doesn't see it yet. Concurrent WRITERS need a lock service or
  * conditional-put (same caveat as [[Tables.markProcessed]]); scheduled
  * batch jobs run one writer per table.
  */
object Snapshots {

  private def fs(spark: SparkSession, basePath: String) =
    new Path(basePath).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(basePath: String, v: Int) =
    new Path(s"$basePath/_manifests/v$v.txt")

  /** Highest published version, or 0 if the table does not exist. */
  def latestVersion(spark: SparkSession, basePath: String): Int = {
    val dir = new Path(s"$basePath/_manifests")
    val f = fs(spark, basePath)
    if (!f.exists(dir)) 0
    else f.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".txt") =>
        n.stripPrefix("v").stripSuffix(".txt").toInt }
      .foldLeft(0)(math.max)
  }

  private def readManifest(spark: SparkSession, basePath: String,
                           v: Int): Seq[String] = {
    val f = fs(spark, basePath)
    val p = manifestPath(basePath, v)
    require(f.exists(p), s"snapshot version $v does not exist under $basePath")
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in).getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  private def writeManifest(spark: SparkSession, basePath: String, v: Int,
                            dirs: Seq[String]): Unit = {
    val out = fs(spark, basePath).create(manifestPath(basePath, v), true)
    try out.write(dirs.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def publish(spark: SparkSession, basePath: String, df: DataFrame,
                      carryForward: Boolean,
                      dirName: Option[String] = None): Int = {
    val v = latestVersion(spark, basePath) + 1
    val dir = s"$basePath/data/${dirName.getOrElse(s"batch-$v")}"
    df.write.mode("overwrite").parquet(dir)
    val prior =
      if (carryForward && v > 1) readManifest(spark, basePath, v - 1)
      else Seq.empty
    writeManifest(spark, basePath, v, prior :+ dir)
    v
  }

  /** Append under a CALLER-CHOSEN data directory name — the hook an
    * idempotent writer needs: name the directory after its source batch
    * id and membership in the latest manifest answers "was this batch
    * already published?" without any extra ledger
    * (see streaming.SnapshotStream). Crash-safe in both windows: data
    * written but manifest not published → the retry overwrites the same
    * directory and publishes once; manifest published → the retry sees
    * the reference and skips.
    */
  def appendAs(spark: SparkSession, basePath: String, df: DataFrame,
               dirName: String): Int =
    publish(spark, basePath, df, carryForward = true, Some(dirName))

  /** The latest manifest's directory list (empty if no version yet). */
  def latestDirs(spark: SparkSession, basePath: String): Seq[String] = {
    val v = latestVersion(spark, basePath)
    if (v == 0) Seq.empty else readManifest(spark, basePath, v)
  }

  /** Publish a new version containing the previous version plus `df`.
    * Returns the new version number.
    */
  def append(spark: SparkSession, basePath: String, df: DataFrame): Int =
    publish(spark, basePath, df, carryForward = true)

  /** Publish a new version containing ONLY `df` (logical replace; all
    * prior versions stay readable). Returns the new version number.
    */
  def overwrite(spark: SparkSession, basePath: String, df: DataFrame): Int =
    publish(spark, basePath, df, carryForward = false)

  /** Scan the table exactly as of `version`. */
  def readAsOf(spark: SparkSession, basePath: String,
               version: Int): DataFrame = {
    val dirs = readManifest(spark, basePath, version)
    spark.read.parquet(dirs: _*)
  }

  /** Scan the latest published version. */
  def readLatest(spark: SparkSession, basePath: String): DataFrame =
    readAsOf(spark, basePath, latestVersion(spark, basePath))

  /** Drop versions below `keepFrom`: delete their manifests and any data
    * directory no surviving manifest references. Returns the deleted
    * data directories. Metadata-only decision (set difference of
    * manifest contents); the data deletes are the only I/O.
    */
  def vacuum(spark: SparkSession, basePath: String,
             keepFrom: Int): Seq[String] = {
    val f = fs(spark, basePath)
    val latest = latestVersion(spark, basePath)
    require(keepFrom >= 1 && keepFrom <= latest,
      s"keepFrom must be in [1, $latest]: $keepFrom")
    val keep = (keepFrom to latest)
      .flatMap(readManifest(spark, basePath, _)).toSet
    val drop = (1 until keepFrom)
      .flatMap(readManifest(spark, basePath, _)).distinct
      .filterNot(keep)
    drop.foreach(d => f.delete(new Path(d), true))
    (1 until keepFrom).foreach(v =>
      f.delete(manifestPath(basePath, v), false))
    drop
  }
}
