package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Per-user session accumulator for [[EventPipeline.sessionStatsWithState]].
  * `lastTs` is epoch millis of the newest event seen so far.
  */
case class SessionAcc(lastTs: Long, sessions: Long, events: Long)

/** Output row of [[EventPipeline.sessionStatsWithState]]. */
case class UserSessionStats(user_id: Long, n_sessions: Long, n_events: Long)

/** Structured-Streaming event pipeline.
  *
  * The reference has no streaming (SURVEY.md §2.8 — its "streaming" is an
  * Airflow weekly cron), so this module is the engine's forward-looking
  * ingest path: the SAME transformation functions serve the registered
  * batch queries and the `readStream` pipeline — in Spark a windowed
  * aggregation is one definition, batch/streaming is a property of the
  * source.
  *
  * Scale design: watermarks bound state (without one, windowed state grows
  * forever); `Trigger.AvailableNow` gives the reference's periodic-batch
  * cadence with incremental progress + exactly-once file sinks.
  */
object EventPipeline {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling 1-hour windowed counts + value sums per event type.
    * Works identically on a batch DataFrame or a streaming one.
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        (round(sum(col("value")), 4) / count(lit(1))).as("avg_value"))
      .select(col("window.start").as("ws"), col("event_type"), col("cnt"),
        col("avg_value"))

  /** Gap-based sessionization (30-minute inactivity gap) rolled up to one
    * row per user. `session_window` keeps per-key state bounded by the
    * watermark in streaming mode.
    */
  def sessionStats(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))

  /** Streaming exact dedup: drop duplicate ids arriving within the
    * watermark delay. State holds one entry per id seen inside the
    * watermark horizon and is evicted as the watermark advances — bounded
    * state, unlike an unwatermarked `dropDuplicates` whose state grows
    * forever. The batch analog is the content-hash dedup in
    * graft.operators.Dedup.
    */
  def dedupStream(events: DataFrame, idCols: Seq[String],
                  watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** Gap-based sessionization with EXPLICIT state
    * (`flatMapGroupsWithState`): one `SessionAcc` per user carries
    * (lastTs, sessions, events) across micro-batches; an event more than
    * `gapMinutes` after `lastTs` opens a new session. Events inside one
    * batch are sorted by time before folding (micro-batch iterators carry
    * no order guarantee). Emits the running totals per user each batch
    * (Update semantics).
    *
    * [[sessionStats]]'s `session_window` is the declarative form; this is
    * the escape hatch for session logic the built-in can't express — kept
    * semantically aligned so the two are cross-checked in tests.
    */
  def sessionStatsWithState(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    val fold = (userId: Long, it: Iterator[(Long, Long)],
                state: GroupState[SessionAcc]) => {
      val sorted = it.map(_._2).toSeq.sorted
      val init = state.getOption.getOrElse(SessionAcc(Long.MinValue, 0L, 0L))
      val acc = sorted.foldLeft(init) { (a, ts) =>
        val newSession = a.lastTs == Long.MinValue || ts - a.lastTs >= gapMs
        SessionAcc(math.max(a.lastTs, ts),
          a.sessions + (if (newSession) 1 else 0), a.events + 1)
      }
      state.update(acc)
      Iterator.single(UserSessionStats(userId, acc.sessions, acc.events))
    }
    events.select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .map { case (u, ts) => (u, ts.getTime) }
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionAcc, UserSessionStats](
        OutputMode.Update, GroupStateTimeout.NoTimeout)(fold)
      .toDF()
  }

  /** JSON property extraction from the props payload column. */
  def withJsonProp(events: DataFrame, field: String, out: String): DataFrame =
    events.withColumn(out,
      get_json_object(col("props"), s"$$.$field").cast("long"))

  /** Streaming source over an events directory (parquet files appearing
    * over time), watermarked for state cleanup.
    */
  def readEventStream(spark: SparkSession, dir: String,
                      watermark: String = "1 hour"): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .parquet(dir)
      .withWatermark("ts", watermark)

  /** Periodic-batch writer: process everything available, then stop —
    * the Structured-Streaming equivalent of the reference's weekly cron
    * (limpiezaSpotify.py:63-69) with checkpointed exactly-once output.
    */
  def availableNowWriter(df: DataFrame, checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
}
