package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Anonymity

/** Streaming k-anonymity maintenance — the always-on face of the
  * `dq_k_anonymity` batch audit (is the arriving data drifting toward
  * re-identifiable quasi-identifier classes?): maintain the
  * equivalence-class size table of a streamed QI tuple and read the
  * full exposure report from state at any moment, without re-reading
  * the stream.
  *
  * Class sizes are plain additive integers, so exactly-once follows the
  * [[DriftStream]] recipe for non-idempotent counts: each micro-batch
  * writes ITS OWN partial (keys..., n) table to
  * `statePath/batch=<batchId>/` with overwrite — a replayed batch
  * rewrites the same directory and the total is unchanged. The
  * maintained sizes are the sum over partials; the report is
  * [[Anonymity.reportFromCounts]] — the IDENTICAL kernel the batch gate
  * runs, so streamed ≡ batch on any batching (machine-asserted in
  * KAnonStreamSpec).
  *
  * QI keys are rendered AS STRINGS in the partials: the rendering is
  * injective per column type, so the class partition — and therefore
  * every count the report aggregates — is unchanged, while the state
  * schema stays fixed for any key arity/type mix (one reader recipe,
  * no per-face schema plumbing). CONTRACT (round 12): the rendered
  * partition IS the batch kernel's `groupBy` partition for every
  * column type, floating point included — float/double QIs are
  * normalized to aggregate equality BEFORE the render (-0.0 → 0.0 via
  * IEEE `x + 0.0`; every NaN payload → the one canonical NaN), the
  * same normalization Spark's own NormalizeFloatingNumbers applies to
  * group keys, so "-0.0" vs "0.0" can never split a class that the
  * batch gate counts as one (machine-asserted in KAnonStreamSpec's
  * double-QI case). Raw float equality is still a questionable
  * quasi-identifier — banding/rounding (the dq_anon_ladder rungs)
  * remains the recommended modelling — but a fractional QI is now
  * exact, not caveated.
  *
  * Scale: per batch one grouped count over the batch only, to
  * |classes-in-batch| rows; state grows one tiny parquet per batch
  * until [[compact]] folds the partials into a single
  * `batch=compacted-<hwm>` directory (call it every N-th batch —
  * unbounded directory growth is a file-listing scale-killer on an
  * always-on stream). The read face touches only state.
  */
object KAnonStream {

  /** State-key render format version. v2 (round 12) normalizes
    * float/double QIs (-0.0 → 0.0, canonical NaN) BEFORE the string
    * render; v1 rendered them raw, so a pre-v2 state directory can
    * hold "-0.0" / non-canonical-NaN partials that would silently
    * SPLIT a class when summed with v2 partials. The format is part of
    * the state's identity exactly like BloomStream's bitmap width, and
    * only for float/double QIs is v1 ≠ v2 — so the first write of a
    * float/double-QI tuple stamps a zero-byte `.qifmt-2` marker beside
    * the partials, and every later float/double-QI write must find it
    * or fail LOUDLY (an unstamped non-empty state predates the
    * normalization and must be rebuilt — or compacted through a
    * one-off normalizing migration — before resuming). Integer/string
    * QI tuples render identically under both formats and are exempt.
    */
  val QiFormatVersion = 2

  /** Per-query-run memo of a successful [[checkQiFormat]] (round 14,
    * advisor): the marker can only legitimately change between runs,
    * never mid-run, so re-listing the state root on EVERY float-QI
    * micro-batch buys nothing and costs a driver-side listing
    * round-trip per batch on an object store. [[qiWriter]] creates one
    * gate per started query, so a RESTART (new writer) re-validates;
    * within a run the first batch's validation is cached. Direct
    * [[applyBatch]] calls default to a fresh gate per call — i.e. they
    * keep validating every time, the batch/backfill-safe posture.
    */
  final class QiFormatGate(origin: Option[SparkSession] = None) {
    // Validation is cached PER QUERY RUN, not per gate instance
    // (round-15 advice fix): the micro-batch thread carries the
    // query's id as the `sql.streaming.queryId` local property, and
    // the ORIGINATING session's StreamingQueryManager — the writer's
    // session; the micro-batch clone's manager does not track the
    // query — maps it to the run's UUID, which is fresh on every
    // start(). A writer reused across stop()/start() therefore
    // re-validates on the new run's first float-QI batch instead of
    // trusting the previous run's check. Outside a streaming run (or
    // with no origin session) the key is None — direct applyBatch
    // calls keep their fresh-per-call default gate, hence still
    // validate every call.
    @volatile private var validatedRun: Option[String] = null
    private[streaming] def ensure(spark: SparkSession,
                                  statePath: String): Unit = {
      val run = for {
        o <- origin
        qid <- Option(spark.sparkContext
          .getLocalProperty("sql.streaming.queryId"))
        q <- Option(o.streams.get(qid))
      } yield q.runId.toString
      if ((validatedRun eq null) || validatedRun != run) {
        checkQiFormat(spark, statePath)
        validatedRun = run
      }
    }
  }

  private def hasFloatQi(batch: DataFrame, keys: Seq[String]): Boolean =
    keys.exists(k => batch.schema(k).dataType match {
      case org.apache.spark.sql.types.DoubleType
           | org.apache.spark.sql.types.FloatType => true
      case _ => false
    })

  /** Stamp-or-validate the render-format marker (see
    * [[QiFormatVersion]]). Same discipline as BloomStream.checkWidth:
    * createNewFile is atomic (a same-version racer loses benignly),
    * and a marker from a DIFFERENT version — or none, over existing
    * partials — is a loud failure, never a listing-order guess.
    */
  private def checkQiFormat(spark: SparkSession, statePath: String)
  : Unit = {
    val root = new Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def entries() =
      if (!fs.exists(root)) Array.empty[org.apache.hadoop.fs.FileStatus]
      else fs.listStatus(root)
    val es = entries()
    val versions = es.iterator.map(_.getPath.getName)
      .filter(_.startsWith(".qifmt-"))
      .flatMap(_.stripPrefix(".qifmt-").toIntOption).toList.sorted
    val hasPartials = es.exists(s =>
      s.isDirectory && s.getPath.getName.startsWith("batch="))
    versions match {
      case v :: Nil =>
        require(v == QiFormatVersion,
          s"k-anonymity state at $statePath renders float QIs with " +
            s"format v$v, this writer uses v$QiFormatVersion; rebuild " +
            "the state (or migrate it) before resuming")
      case Nil if hasPartials =>
        // NOTE the diagnosis is deliberately "unknown", not "v1": the
        // normalized renderer predates the marker by one release, so
        // an unstamped state may be perfectly valid v2 partials. The
        // refusal is still right (we cannot TELL from the partials),
        // but the operator who knows the writer's lineage has an
        // explicit acknowledgment path — stampQiFormat — instead of a
        // forced rebuild of valid state. (Round 14, advisor.)
        throw new IllegalStateException(
          s"k-anonymity state at $statePath holds float/double-QI " +
            "partials with NO render-format marker: the render format " +
            "is unknown (v1 raw floats, or v2-normalized but written " +
            "before markers were stamped). Mixing raw with normalized " +
            "partials can split classes (-0.0/NaN), so refusing to " +
            "guess: if EVERY partial is known to come from the " +
            s"v$QiFormatVersion (normalized) renderer, acknowledge " +
            "with KAnonStream.stampQiFormat(spark, statePath) once; " +
            "otherwise rebuild the state before resuming")
      case Nil =>
        fs.mkdirs(root)
        fs.createNewFile(new Path(root, s".qifmt-$QiFormatVersion"))
        ()
      case many =>
        throw new IllegalStateException(
          s"k-anonymity state at $statePath carries ${many.size} " +
            s"format markers (${many.mkString(", ")}); the state is " +
            "mixed-format and must be rebuilt")
    }
  }

  /** Operator acknowledgment for a non-empty UNSTAMPED state that is
    * KNOWN (from deployment lineage, not from the partials — they
    * cannot tell) to have been written entirely by the normalized
    * (v$QiFormatVersion) renderer: stamps the marker once so the
    * stream can resume without rebuilding valid state. Refuses loudly
    * if any marker already exists — an already-stamped state needs no
    * acknowledgment, and a DIFFERENT-version marker means the state
    * really is incompatible and must be rebuilt (stamping over it
    * would forge compatibility). A state whose lineage includes ANY
    * pre-normalization (raw-render) writer must NOT be stamped — its
    * "-0.0"/non-canonical-NaN keys would silently split classes;
    * rebuild or run a one-off normalizing compaction instead.
    */
  def stampQiFormat(spark: SparkSession, statePath: String): Unit = {
    val root = new Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root),
      s"no k-anonymity state at $statePath: nothing to acknowledge " +
        "(the first write stamps new states itself)")
    val markers = fs.listStatus(root).iterator.map(_.getPath.getName)
      .filter(_.startsWith(".qifmt-")).toList
    require(markers.isEmpty,
      s"k-anonymity state at $statePath already carries format " +
        s"marker(s) ${markers.mkString(", ")}: stampQiFormat is only " +
        "for unstamped pre-marker states; a version mismatch means " +
        "the state must be rebuilt, not re-stamped")
    fs.createNewFile(new Path(root, s".qifmt-$QiFormatVersion"))
    ()
  }

  /** Start-ready writer maintaining class sizes of the `keys` tuple. */
  def qiWriter(events: DataFrame, statePath: String, checkpoint: String,
               keys: Seq[String],
               compactEvery: Int = PartialState.DefaultCompactEvery)
  : DataStreamWriter[Row] = {
    // The gate validates on each run's first float-QI batch and
    // caches for the rest of that run, keyed on the query runId — so
    // both a fresh writer AND a reused writer restarted after stop()
    // re-validate (the runId changes per start()).
    val gate = new QiFormatGate(Some(events.sparkSession))
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        maintainBatch(batch, batchId, statePath, keys, compactEvery,
          gate)
      }
  }

  /** The writer's per-batch maintenance — apply the batch, then fold
    * the partials on the cadence ([[PartialState.cadenceDue]]). The
    * `foreachBatch` body, named for spec replay.
    */
  def maintainBatch(batch: DataFrame, batchId: Long, statePath: String,
                    keys: Seq[String],
                    compactEvery: Int = PartialState.DefaultCompactEvery,
                    gate: QiFormatGate = new QiFormatGate)
  : Unit = {
    applyBatch(batch, batchId, statePath, keys, gate)
    if (PartialState.cadenceDue(batchId, compactEvery)) {
      compact(batch.sparkSession, statePath, keys)
      ()
    }
  }

  /** One micro-batch (also the batch/backfill entry point): THIS
    * batch's class sizes to its own directory — replay overwrites,
    * never accumulates. The default (fresh-per-call) `gate` means a
    * direct call always validates the format marker; [[qiWriter]]
    * passes its run-scoped gate so a streaming run lists the state
    * root once, not once per batch.
    */
  def applyBatch(batch: DataFrame, batchId: Long, statePath: String,
                 keys: Seq[String],
                 gate: QiFormatGate = new QiFormatGate): Unit = {
    if (batch.isEmpty) return
    // The render format only matters where v1 and v2 differ —
    // float/double QIs; integer/string tuples are format-invariant
    // and skip the marker entirely.
    if (hasFloatQi(batch, keys))
      gate.ensure(batch.sparkSession, statePath)
    Anonymity.qiCounts(
        batch.select(keys.map(k => renderQi(batch, k)): _*), keys)
      .write.mode("overwrite").parquet(s"$statePath/batch=$batchId")
    ()
  }

  /** One QI column as its state-key string. Floating-point columns are
    * normalized to the exact equality `groupBy` uses BEFORE rendering
    * — `x + 0.0` is the IEEE -0.0 → 0.0 normalizer, `isnan` routes
    * every NaN bit pattern to the canonical literal — so the streamed
    * class partition coincides with the batch kernel's for every
    * column type. Nulls pass through every branch (isnan(null) is
    * null → otherwise → null + 0.0 is null), so the null class is
    * shared too. All other types render injectively as-is.
    */
  private def renderQi(batch: DataFrame, k: String)
  : org.apache.spark.sql.Column = {
    val c = col(k)
    batch.schema(k).dataType match {
      case org.apache.spark.sql.types.DoubleType =>
        when(isnan(c), lit(Double.NaN)).otherwise(c + lit(0d))
          .cast("string").as(k)
      case org.apache.spark.sql.types.FloatType =>
        when(isnan(c), lit(Float.NaN)).otherwise(c + lit(0f))
          .cast("string").as(k)
      case _ => c.cast("string").as(k)
    }
  }

  /** The maintained class-size table: per-tuple totals over all
    * partials.
    */
  def currentCounts(spark: SparkSession, statePath: String,
                    keys: Seq[String]): DataFrame =
    PartialState.summed(spark, statePath, keys, "n",
      spark.emptyDataFrame
        .select(keys.map(k => lit("").as(k)) :+ lit(0L).as("n"): _*)
        .limit(0))

  /** The full exposure report (n_groups, groups_below_k, rows_at_risk,
    * min_group_size) from the CURRENT state alone — the batch kernel
    * over streamed class sizes.
    */
  def report(spark: SparkSession, statePath: String, keys: Seq[String],
             k: Int = 5): DataFrame =
    Anonymity.reportFromCounts(currentCounts(spark, statePath, keys), k)

  /** Fold all class-size partials into one compacted directory —
    * read-equivalent before/after, replay of folded batches ignored
    * structurally ([[PartialState.compact]]). Returns the folded
    * high-water batch id.
    */
  def compact(spark: SparkSession, statePath: String,
              keys: Seq[String]): Long =
    PartialState.compact(spark, statePath, keys, "n")
}
