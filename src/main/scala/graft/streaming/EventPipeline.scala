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

/** Emitted once per key that has gone silent past the horizon. */
case class SilenceAlert(user_id: Long, last_seen: java.sql.Timestamp)

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

  /** Silence / heartbeat detection — the state-TIMEOUT primitive: a key
    * that stops sending events is invisible to every aggregation over
    * arriving rows (you cannot aggregate rows that never come); only a
    * state timeout can emit "key X went quiet". One tiny state row per
    * key holds its last-seen event time; the timeout arms at
    * `lastSeen + silenceMinutes` in EVENT time, so the watermark both
    * drives detection and bounds state — a key silent past the horizon
    * emits one alert and its state is removed (state is O(live keys),
    * and dead keys cost nothing forever after).
    */
  def detectSilence(events: DataFrame,
                    silenceMinutes: Int = 60): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val silenceMs = silenceMinutes * 60000L
    // The watermarked timestamp COLUMN must reach the stateful operator
    // (event-time timeouts read it) — so no epoch-long re-mapping here.
    val fold = (userId: Long, it: Iterator[(Long, java.sql.Timestamp)],
                state: GroupState[Long]) => {
      if (state.hasTimedOut) {
        val last = state.get
        state.remove()
        Iterator.single(SilenceAlert(userId,
          new java.sql.Timestamp(last)))
      } else {
        val latest =
          (it.map(_._2.getTime) ++ state.getOption.iterator).max
        state.update(latest)
        state.setTimeoutTimestamp(latest + silenceMs)
        Iterator.empty
      }
    }
    events.select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, SilenceAlert](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
      .toDF()
  }

  /** Weekly cohort retention — the classic event-warehouse rollup: cohort
    * = a user's first-seen ISO week, and for each (cohort, week offset)
    * the count of users still active.
    *
    * Single user-keyed shuffle: one aggregate collects the user's first
    * week AND their distinct active-week set (bounded by the retention
    * horizon — weeks, not events — so the set state is O(horizon), safe
    * at any event volume), then explodes and re-aggregates. The naive
    * distinct → join-back → groupBy formulation costs three shuffles of
    * event-scale data; this shuffles events once and weeks-per-user after.
    */
  def cohortRetention(events: DataFrame): DataFrame =
    events
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("wk"))
      .groupBy(col("user_id"))
      .agg(min(col("wk")).as("cohort"), collect_set(col("wk")).as("weeks"))
      .select(col("cohort"), explode(col("weeks")).as("wk"))
      // both dates are week-truncated, so the day diff is an exact
      // multiple of 7 and the double division is exact
      .groupBy(col("cohort"),
        (datediff(col("wk"), col("cohort")) / 7).cast("long").as("week_n"))
      .agg(count(lit(1)).as("active_users"))

  /** Ordered conversion funnel over per-user FIRST event times: a user
    * reaches step i when their first `steps(i)` event is strictly after
    * their first `steps(i-1)` event (the min-timestamp funnel semantic).
    * One user-keyed shuffle (conditional-min partials combine map-side),
    * then a scalar rollup — no window, no per-user event ordering shuffle.
    *
    * @return one row: `n_<step>` = users reaching each step in order.
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    val mins = steps.map(st =>
      min(when(col("event_type") === st, col("ts"))).as(s"t_$st"))
    val perUser = events.groupBy(col("user_id")).agg(mins.head, mins.tail: _*)
    val reached = steps.indices.map { i =>
      val cond = (1 to i).foldLeft(col(s"t_${steps.head}").isNotNull) {
        (acc, j) =>
          acc && col(s"t_${steps(j)}").isNotNull &&
            col(s"t_${steps(j - 1)}") < col(s"t_${steps(j)}")
      }
      count_if(cond).as(s"n_${steps(i)}")
    }
    perUser.agg(reached.head, reached.tail: _*)
  }

  /** Click attribution — each view joined to the same user's clicks
    * landing within `horizonMinutes` after it. ONE definition for both
    * engines: on batch frames it's a user-keyed equi-join with the time
    * band as a post-join filter; on two watermarked streams it is a
    * STREAM–STREAM interval join, where the same band is what lets Spark
    * expire buffered rows — each side's state holds only the watermark +
    * horizon window, never the full history. Without the band (or the
    * watermarks) stream state grows forever; with them, state is
    * O(traffic within the horizon).
    */
  def attributeClicks(views: DataFrame, clicks: DataFrame,
                      horizonMinutes: Int = 30,
                      joinType: String = "inner"): DataFrame = {
    val v = views.select(col("user_id"), col("event_id").as("view_id"),
      col("ts").as("view_ts"))
    val c = clicks.select(col("user_id").as("_cu"),
      col("event_id").as("click_id"), col("ts").as("click_ts"))
    v.join(c,
      col("user_id") === col("_cu") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") < col("view_ts") +
          expr(s"INTERVAL $horizonMinutes MINUTES"),
      joinType)
      .select(col("user_id"), col("view_id"), col("click_id"),
        (unix_micros(col("click_ts")) - unix_micros(col("view_ts")))
          .as("gap_us"))
  }

  /** Left-outer attribution: every view emits, matched or not — the
    * "which impressions never converted" face of [[attributeClicks]].
    * On streams this is the stream–stream OUTER interval join: an
    * unmatched view's null row can only be emitted once the click-side
    * watermark has passed the view's whole horizon (no later click can
    * still match), so the same band + watermarks that bound join state
    * also bound the null-emission delay. State stays O(horizon traffic).
    */
  def attributeClicksOuter(views: DataFrame, clicks: DataFrame,
                           horizonMinutes: Int = 30): DataFrame =
    attributeClicks(views, clicks, horizonMinutes, "left_outer")

  /** JSON property extraction from the props payload column. */
  def withJsonProp(events: DataFrame, field: String, out: String): DataFrame =
    events.withColumn(out,
      get_json_object(col("props"), s"$$.$field").cast("long"))

  /** Hourly VARIANT-typed property rollup — the streaming face of the
    * parse-at-ingest posture (the windowed form of the batch
    * `ev_variant_props`): props parse ONCE into the binary variant
    * encoding (`parse_json`), every downstream extraction is a cheap
    * typed read (`variant_get`), and the aggregation is a tumbling
    * event-time window, so the SAME definition runs over
    * [[readEventStream]] with watermark-bounded state (append output as
    * the watermark passes each window) — at 100 TB/day this is the
    * landing job that turns raw JSON text into queryable typed columns
    * incrementally instead of re-parsing strings per query.
    */
  def variantHourlyAgg(events: DataFrame): DataFrame = {
    val v = parse_json(col("props"))
    events
      .select(col("ts"), col("event_type"),
        variant_get(v, "$.k", "bigint").as("k"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"),
        col("k_sum"))
  }

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
