package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.EventPipeline

/** Batch-mode registrations of the streaming pipeline's transformations
  * over `events.parquet` — the same functions power `readStream` in
  * graft.streaming.EventPipeline.
  */
object EventQueries {
  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "events")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 1h window counts + stable mean value per event type.
    "ev_window_agg" -> ((s, d) =>
      EventPipeline.windowedAgg(ev(s, d))
        .orderBy(col("ws"), col("event_type"))),

    // 30-minute-gap sessionization rolled up per user.
    "ev_sessions" -> ((s, d) =>
      EventPipeline.sessionStats(ev(s, d))
        .orderBy(col("user_id"))),

    // JSON property extraction from the props column.
    "ev_json_prop" -> ((s, d) =>
      EventPipeline.withJsonProp(ev(s, d), "k", "k_val")
        .select(col("event_id"), col("k_val"))
        .orderBy(col("event_id"))),

    // Weekly cohort retention (single user-keyed shuffle).
    "ev_retention" -> ((s, d) =>
      EventPipeline.cohortRetention(ev(s, d))
        .orderBy(col("cohort"), col("week_n"))),

    // Ordered view → click → purchase funnel over first event times.
    "ev_funnel" -> ((s, d) =>
      EventPipeline.funnel(ev(s, d), Seq("view", "click", "purchase")))
  )

  val oracles: Map[String, String] = Map(
    "ev_window_agg" ->
      """SELECT date_trunc('hour', ts) AS ws, event_type, count(*) AS cnt,
        |round(sum(value),4)/count(*) AS avg_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    // Session semantics mirror Spark's session_window: a session covers
    // [first_ts, last_ts + gap); an event at diff >= gap opens a new one.
    "ev_sessions" ->
      """WITH o AS (SELECT user_id, ts,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        |  FROM events),
        |m AS (SELECT user_id, ts,
        |  CASE WHEN prev_ts IS NULL OR ts - prev_ts >= INTERVAL 30 MINUTE
        |       THEN 1 ELSE 0 END AS new_s FROM o),
        |s AS (SELECT user_id,
        |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT user_id, count(DISTINCT sid) AS n_sessions, count(*) AS n_events
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_json_prop" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events ORDER BY 1""".stripMargin,
    "ev_retention" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |  CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort FROM a GROUP BY 1)
        |SELECT cohort, CAST(date_diff('day', cohort, wk)/7 AS BIGINT) AS week_n,
        |count(*) AS active_users
        |FROM a JOIN c USING (user_id) GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "ev_funnel" ->
      """WITH u AS (SELECT user_id,
        |  min(ts) FILTER (WHERE event_type='view') AS t_view,
        |  min(ts) FILTER (WHERE event_type='click') AS t_click,
        |  min(ts) FILTER (WHERE event_type='purchase') AS t_purchase
        |  FROM events GROUP BY 1)
        |SELECT count(*) FILTER (WHERE t_view IS NOT NULL) AS n_view,
        |count(*) FILTER (WHERE t_view IS NOT NULL AND t_click IS NOT NULL
        |  AND t_view < t_click) AS n_click,
        |count(*) FILTER (WHERE t_view IS NOT NULL AND t_click IS NOT NULL
        |  AND t_view < t_click AND t_purchase IS NOT NULL
        |  AND t_click < t_purchase) AS n_purchase
        |FROM u""".stripMargin
  )
}
