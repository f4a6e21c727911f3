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

    // Spark 4 VARIANT path over the same JSON props: parse ONCE into the
    // binary variant encoding (parse_json), then typed extraction
    // (variant_get). Unlike the per-call string parse of
    // get_json_object, a variant column is parsed at ingest and every
    // downstream extraction is a cheap typed read — the
    // semi-structured-at-scale posture (at 100 TB you land props as a
    // variant column in parquet and never re-parse the JSON text). The
    // oracle replays the extraction with DuckDB's JSON functions over
    // the raw text — a hash match proves the variant encode/extract
    // pair preserves the values exactly.
    "ev_variant_props" -> ((s, d) => {
      val v = parse_json(col("props"))
      ev(s, d)
        .select(col("event_type"),
          variant_get(v, "$.k", "bigint").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"),
          min(col("k")).as("k_min"), max(col("k")).as("k_max"))
        .orderBy(col("event_type"))
    }),

    // Batch face of the streaming VARIANT rollup
    // (EventPipeline.variantHourlyAgg; StreamingSpec proves stream ≡
    // batch): parse-once variant extraction aggregated per tumbling
    // event-time hour — the incremental landing job that makes the
    // semi-structured column typed-queryable as data arrives.
    "ev_variant_stream" -> ((s, d) =>
      EventPipeline.variantHourlyAgg(ev(s, d))
        .orderBy(col("ws"), col("event_type"))),

    // Weekly cohort retention (single user-keyed shuffle).
    "ev_retention" -> ((s, d) =>
      EventPipeline.cohortRetention(ev(s, d))
        .orderBy(col("cohort"), col("week_n"))),

    // Top session JOURNEYS — the product-analytics "what do sessions
    // look like" card: gap-sessionize (the same 30-minute
    // session_window the streaming path uses), concatenate each
    // session's event types in (ts, event_id) order into a path
    // string, count identical paths, top-15 with full tie-breaks. Two
    // grouped aggregates — session assembly shuffles once on the user
    // key (session_window is user-local), paths once on the path
    // string; the oracle replays sessionization as the lag/cumsum
    // gaps-and-islands, proving the two formulations agree event-level.
    "ev_session_paths" -> ((s, d) => {
      val e = ev(s, d).where(col("ts").isNotNull)
      e.groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("sw"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"),
            col("event_type")))),
          x => x("event_type")), ">").as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("path")).limit(15)
    }),

    // MTTR — time from each ERROR to the user's next successful event:
    // the SRE recovery metric (p50/p90, exact microseconds). The
    // forward-looking "next OK" is ONE user-keyed conditional-min
    // window over the FOLLOWING frame — no self-join, no as-of pass —
    // and the quantiles come from the exact histogram ladder over the
    // error-gap set. Counts ride the same error slice; display
    // microseconds stay integers end-to-end.
    "ev_mttr" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(1, org.apache.spark.sql.expressions.Window
          .unboundedFollowing)
      val errs = ev(s, d).where(col("ts").isNotNull)
        .withColumn("nxt_ok",
          min(when(col("event_type") =!= "error", col("ts"))).over(w))
        .where(col("event_type") === "error")
        .localCheckpoint() // counts pass + quantile ladder passes
      val gaps = errs.where(col("nxt_ok").isNotNull)
        .select(lit("all").as("g"),
          expr("unix_micros(nxt_ok) - unix_micros(ts)").as("gap_us"))
      val q = graft.operators.Median.groupQuantilesLong(
          gaps, Seq("g"), "gap_us", Seq(50, 90))
        .select(col("pct"), col("value").as("gap_us"))
      val t = errs.agg(count(lit(1)).as("n_errors"),
        sum(when(col("nxt_ok").isNotNull, 1L).otherwise(0L))
          .cast("long").as("n_recovered"))
      q.crossJoin(broadcast(t))
        .select(col("pct"), col("n_errors"), col("n_recovered"),
          col("gap_us"))
        .orderBy(col("pct"))
    }),

    // Strict-order WINDOW FUNNEL (the ClickHouse windowFunnel
    // semantics, distinct from ev_funnel's min-timestamp family): how
    // deep does each user get through view → click → purchase when
    // every later step must happen AFTER the previous step and within
    // 24 h of the FIRST step. Each level is one conditional-min
    // aggregate joined user-keyed onto the previous level's anchor —
    // three fact passes, no window over facts, no per-user event
    // arrays; the result is the ≤4-row level histogram.
    "ev_window_funnel" -> ((s, d) => {
      val e = ev(s, d).where(col("ts").isNotNull)
      val t1 = e.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val t2 = e.where(col("event_type") === "click")
        .join(t1, "user_id")
        .where(col("ts") > col("t1") &&
          col("ts") <= col("t1") + expr("interval 24 hours"))
        .groupBy(col("user_id"), col("t1"))
        .agg(min(col("ts")).as("t2"))
      val t3 = e.where(col("event_type") === "purchase")
        .join(t2, "user_id")
        .where(col("ts") > col("t2") &&
          col("ts") <= col("t1") + expr("interval 24 hours"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      e.select(col("user_id")).distinct()
        .join(t1.select(col("user_id"), lit(1L).as("l1")), Seq("user_id"), "left")
        .join(t2.select(col("user_id"), lit(1L).as("l2")), Seq("user_id"), "left")
        .join(t3.select(col("user_id"), lit(1L).as("l3")), Seq("user_id"), "left")
        .select(
          when(col("l3").isNotNull, 3L)
            .when(col("l2").isNotNull, 2L)
            .when(col("l1").isNotNull, 1L)
            .otherwise(0L).as("level"))
        .groupBy(col("level")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("level"))
    }),

    // Per-path CONVERSION — which session journeys actually end in
    // money: the top-15 paths by volume with each path's exact
    // permille purchase-conversion rate (the "what flows convert"
    // card one step past ev_session_paths' raw counts). The SAME
    // user-local session_window assembly; the conversion flag is a
    // max() inside the session aggregate, so it costs nothing extra;
    // the rate divides the path row's own integers.
    "ev_path_conversion" -> ((s, d) => {
      val e = ev(s, d).where(col("ts").isNotNull)
      e.groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("sw"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"),
            col("event_type")))),
          x => x("event_type")), ">").as("path"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("conv")).cast("long").as("n_converted"))
        .orderBy(desc("n_sessions"), col("path")).limit(15)
        .withColumn("conv_permille",
          expr("(1000 * n_converted) div n_sessions"))
    }),

    // Does the ERROR count track the TRAFFIC — the capacity-planning
    // question ("are errors load-proportional or independent?"),
    // answered as Pearson r over hourly (events, errors) cells plus
    // the OLS slope (errors per event). One grouped count over facts;
    // the correlation moments are exact DECIMAL(38,0) sums over the
    // ~|hours| aggregate (the Stats.corrOls discipline), floats only
    // in the final r/slope divisions — identical ops both engines.
    "ev_load_error_corr" -> ((s, d) => {
      val hourly = ev(s, d).where(col("ts").isNotNull)
        .groupBy(date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("x"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("y"))
      val d38 = "decimal(38,0)"
      val m = hourly.agg(count(lit(1)).cast(d38).as("n"),
        sum(col("x")).cast(d38).as("sx"),
        sum(col("y")).cast(d38).as("sy"),
        sum((col("x") * col("y")).cast(d38)).as("sxy"),
        sum((col("x") * col("x")).cast(d38)).as("sxx"),
        sum((col("y") * col("y")).cast(d38)).as("syy"))
      val num = col("n") * col("sxy") - col("sx") * col("sy")
      val denx = col("n") * col("sxx") - col("sx") * col("sx")
      val deny = col("n") * col("syy") - col("sy") * col("sy")
      m.select(col("n").cast("long").as("n_hours"),
        col("sx").cast("long").as("total_events"),
        col("sy").cast("long").as("total_errors"),
        when(denx > 0 && deny > 0,
          num.cast("double") /
            (sqrt(denx.cast("double")) * sqrt(deny.cast("double"))))
          .as("r"),
        when(denx > 0, num.cast("double") / denx.cast("double"))
          .as("slope"))
    }),

    // Bounce rate per user — the engagement-quality companion of
    // ev_session_paths: share of a user's 30-minute sessions containing
    // exactly one event. Session assembly is the same user-local
    // session_window aggregate; the rate is one exact-int division.
    "ev_bounce_rate" -> ((s, d) => {
      val e = ev(s, d).where(col("ts").isNotNull)
      e.groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_ev"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_ev") === 1, 1L).otherwise(0L))
            .as("n_bounce"))
        .withColumn("bounce_rate",
          col("n_bounce").cast("double") / col("n_sessions"))
        .orderBy(col("user_id"))
    }),

    // LINEAR multi-touch attribution — the marketing-analytics op
    // beyond last-touch (ev_attribution pairs a click with ONE view):
    // every purchase splits one unit of credit EQUALLY across all of
    // the user's view/click touches in the trailing 24 h. Per purchase:
    // touch counts by channel (exact ints) and each channel's credit
    // share — ONE division of two of the row's own integers, so
    // nothing float-sums across rows. Join shape: purchases ⋈ touches
    // on the USER key with the time band as a join predicate — the
    // batch face of the stream-stream interval join, cost bounded by
    // per-user event volume, never all-pairs.
    "ev_attrib_linear" -> ((s, d) => {
      val e = ev(s, d).where(col("ts").isNotNull)
      val purch = e.where(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("ts").as("pt"))
      val touch = e.where(col("event_type").isin("view", "click"))
        .select(col("user_id").as("t_user"), col("ts").as("tt"),
          col("event_type").as("ch"))
      purch.join(touch,
          col("user_id") === col("t_user") &&
            col("tt") <= col("pt") &&
            col("tt") >= col("pt") - expr("INTERVAL 24 HOURS"),
          "left")
        .groupBy(col("p_id"))
        .agg(count(col("ch")).as("n_touch"),
          sum(when(col("ch") === "view", 1L).otherwise(0L))
            .as("n_view"),
          sum(when(col("ch") === "click", 1L).otherwise(0L))
            .as("n_click"))
        .withColumn("view_credit",
          when(col("n_touch") > 0,
            col("n_view").cast("double") / col("n_touch")))
        .withColumn("click_credit",
          when(col("n_touch") > 0,
            col("n_click").cast("double") / col("n_touch")))
        .orderBy(col("p_id"))
    }),

    // CUSUM mean-shift detection over the daily event series — the
    // change-point screen that catches a LEVEL shift a per-point
    // threshold (ev_bursts) misses: the cumulative deviation
    // dev_k = n_days·prefix_k − k·total (exact integers — prefix_k vs
    // the k-day share of a uniform series) drifts steadily when the
    // rate changes. Flag when |dev|·10 > n_days·total, i.e. cumulative
    // excess beyond 10% of total volume. The running sum is a window
    // over the ~30-row DAY aggregate (w_yoy posture — never events);
    // the totals broadcast as one row. Zero floats anywhere.
    "ev_cusum_shift" -> ((s, d) => {
      val daily = ev(s, d).where(col("ts").isNotNull)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
      val tot = daily.agg(sum(col("n")).as("total"),
        count(lit(1)).as("nd"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("day"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      daily
        .withColumn("k", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("day")))
          .cast("long"))
        .withColumn("prefix", sum(col("n")).over(w))
        .crossJoin(broadcast(tot))
        .withColumn("dev",
          col("nd") * col("prefix") - col("k") * col("total"))
        .withColumn("shift_flag",
          abs(col("dev")) * 10 > col("nd") * col("total"))
        .select(col("day"), col("n"), col("prefix"), col("dev"),
          col("shift_flag"))
        .orderBy(col("day"))
    }),

    // RFM customer segmentation — the classic marketing-warehouse op:
    // per user, Recency (days since last purchase vs the corpus max,
    // broadcast 1-row), Frequency (purchase count), Monetary (exact
    // decimal cents), each banded 1–3 by pinned thresholds and
    // concatenated into the segment code. One user-keyed shuffle; the
    // banding is integer compares — no quantile, no float, identical
    // on every engine. Thresholds calibrated on the corpus (median
    // freq 13, median spend ≈ 59 000 cents, recency 0–2 days).
    "ev_rfm" -> ((s, d) => {
      val e = ev(s, d).where(col("event_type") === "purchase")
      val mx = e.agg(max(col("ts")).cast("date").as("mxd"))
      e.groupBy(col("user_id"))
        .agg(max(col("ts")).cast("date").as("last_d"),
          count(lit(1)).as("freq"),
          (sum(col("value").cast("decimal(20,2)")) * 100)
            .cast("long").as("m_cents"))
        .crossJoin(broadcast(mx))
        .withColumn("recency_days",
          datediff(col("mxd"), col("last_d")).cast("long"))
        .withColumn("r_score",
          when(col("recency_days") <= 1, 3L)
            .when(col("recency_days") <= 4, 2L).otherwise(1L))
        .withColumn("f_score",
          when(col("freq") >= 15, 3L)
            .when(col("freq") >= 10, 2L).otherwise(1L))
        .withColumn("m_score",
          when(col("m_cents") >= 75000L, 3L)
            .when(col("m_cents") >= 50000L, 2L).otherwise(1L))
        .select(col("user_id"), col("recency_days"), col("freq"),
          col("m_cents"), col("r_score"), col("f_score"),
          col("m_score"),
          concat(col("r_score").cast("string"),
            col("f_score").cast("string"),
            col("m_score").cast("string")).as("segment"))
        .orderBy(col("user_id"))
    }),

    // DAU / WAU / stickiness per day — the engagement dashboard's
    // headline series. WAU(d) = distinct users active in [d−6, d]:
    // each distinct (user, day) pair fans out map-side to the ≤7
    // trailing days it supports (explode over a 7-literal sequence —
    // no self-join, no sliding distinct-set window), then ONE distinct
    // count per day. Day spine bounded to the observed range; the
    // stickiness ratio DAU/WAU is the only division. Cost: 7×|user-days|
    // exploded rows through one day-keyed shuffle — linear at any scale.
    "ev_dau_wau" -> ((s, d) => {
      val ud = ev(s, d).where(col("ts").isNotNull)
        .select(col("user_id"), col("ts").cast("date").as("day"))
        .distinct()
      val bounds = ud.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      val dau = ud.groupBy(col("day")).agg(countDistinct(col("user_id")).as("dau"))
      val wau = ud
        .select(col("user_id"), explode(sequence(lit(0), lit(6))).as("k"),
          col("day"))
        .select(col("user_id"), date_add(col("day"), col("k")).as("day"))
        .crossJoin(broadcast(bounds))
        .where(col("day") <= col("hi"))
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("wau"))
      dau.join(wau, Seq("day"))
        .withColumn("stickiness",
          col("dau").cast("double") / col("wau"))
        .orderBy(col("day"))
    }),

    // Ordered view → click → purchase funnel over first event times.
    "ev_funnel" -> ((s, d) =>
      EventPipeline.funnel(ev(s, d), Seq("view", "click", "purchase"))),

    // As-of join: each purchase picks the user's most recent
    // prior-or-equal view (AsofJoin union–carry-forward plan; the oracle
    // is DuckDB's native ASOF LEFT JOIN — an independent implementation
    // of the same semantics). Right side pre-aggregated unique per
    // (user, ts); gap in exact integer microseconds.
    "ev_asof_view" -> ((s, d) => {
      val e = ev(s, d)
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts"))
      val views = e.where(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("view_ts"), col("event_id"))
        .groupBy(col("user_id"), col("view_ts"))
        .agg(max(col("event_id")).as("view_id"))
      graft.operators.AsofJoin.asofJoin(purchases, views,
          Seq("user_id"), "ts", "view_ts", Seq("view_id", "view_ts"))
        .select(col("purchase_id"), col("user_id"), col("view_id"),
          (unix_micros(col("ts")) - unix_micros(col("view_ts")))
            .as("gap_us"))
        .orderBy(col("purchase_id"))
    }),

    // The SAME as-of semantics through the NATIVE whole-operator path
    // (graft.plans.NativeAsof: custom LogicalPlan node → injected
    // SparkStrategy → forward-only merge SparkPlan with SMJ-style
    // required distribution/ordering). Shares ev_asof_view's DuckDB
    // ASOF JOIN oracle, so the custom exec is held to the identical
    // row-level contract as the composed carry-forward operator.
    "ev_asof_native" -> ((s, d) => {
      val e = ev(s, d)
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts"))
      val views = e.where(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("view_ts"), col("event_id"))
        .groupBy(col("user_id"), col("view_ts"))
        .agg(max(col("event_id")).as("view_id"))
      graft.plans.NativeAsof.asofJoin(purchases, views,
          "user_id", "ts", "view_ts", Seq("view_id", "view_ts"))
        .select(col("purchase_id"), col("user_id"), col("view_id"),
          (unix_micros(col("ts")) - unix_micros(col("view_ts")))
            .as("gap_us"))
        .orderBy(col("purchase_id"))
    }),

    // Click attribution: view ⋈ same-user clicks within a 30-minute
    // horizon — the batch face of the STREAM–STREAM interval join
    // (EventPipeline.attributeClicks; StreamingSpec proves stream ≡
    // batch and cross-batch pairing on the same function).
    "ev_attribution" -> ((s, d) => {
      val e = ev(s, d)
      EventPipeline.attributeClicks(
          e.where(col("event_type") === "view"),
          e.where(col("event_type") === "click"))
        .orderBy(col("view_id"), col("click_id"))
    }),

    // Left-outer attribution (EventPipeline.attributeClicksOuter): every
    // view emits, matched or not — the batch face of the stream-stream
    // OUTER interval join (StreamingSpec proves the streamed null
    // emission after watermark passage equals this).
    "ev_attribution_outer" -> ((s, d) => {
      val e = ev(s, d)
      EventPipeline.attributeClicksOuter(
          e.where(col("event_type") === "view"),
          e.where(col("event_type") === "click"))
        .orderBy(col("view_id"), asc_nulls_first("click_id"))
    }),

    // Rolling 1-hour time-range window per user: event count and
    // decimal-exact mean value over each event's trailing hour — the
    // time-series feature window. Partitioned by user (parallel across
    // keys, never a global sort); the RANGE frame is over exact integer
    // microseconds, and the frame's value sum accumulates as exact
    // decimals, so the per-row doubles are bit-reproducible.
    "ev_rolling_1h" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-3600L * 1000000L, 0L)
      ev(s, d).withColumn("us", unix_micros(col("ts")))
        .select(col("event_id"),
          count(lit(1)).over(w).as("n_1h"),
          (sum(col("value").cast("decimal(20,2)")).over(w).cast("double") /
            count(lit(1)).over(w)).as("avg_1h"))
        .orderBy(col("event_id"))
    }),

    // Feature standardization: per-event-type z-score of `value` — the
    // scaling pass before features feed a model. Moments accumulate as
    // EXACT decimals (value is cent-discrete, so sums and sums of squares
    // are order-independent), then one deterministic double expression
    // per row; the tiny per-type stats broadcast.
    "ev_zscore" -> ((s, d) => {
      val e = ev(s, d)
      val dec = col("value").cast("decimal(20,2)")
      val stats = e.groupBy(col("event_type")).agg(
        sum(dec).as("s"), sum(dec * dec).as("sq"),
        count(lit(1)).as("n"))
      val mean = col("s").cast("double") / col("n")
      val variance = col("sq").cast("double") / col("n") - mean * mean
      e.join(broadcast(stats), Seq("event_type"))
        .select(col("event_id"),
          ((col("value") - mean) / sqrt(variance)).as("z"))
        .orderBy(col("event_id"))
    }),

    // Range join: events against overlapping per-segment campaign windows
    // (RangeJoin bucket-explode equi-join, 1-day buckets — never a
    // nested-loop). Campaign windows derive deterministically from the
    // region table; events map to segments by user_id mod 5.
    "ev_range_campaign" -> ((s, d) => {
      val campaigns = Tables.load(s, d, "region").select(
        col("r_regionkey").as("seg"),
        date_add(to_date(lit("2024-01-01")),
          (col("r_regionkey") * 5).cast("int")).cast("timestamp")
          .as("c_start"),
        date_add(to_date(lit("2024-01-01")),
          (col("r_regionkey") * 5 + 7).cast("int")).cast("timestamp")
          .as("c_end"))
      val e = ev(s, d).withColumn("seg", pmod(col("user_id"), lit(5)))
      graft.operators.RangeJoin.rangeJoin(e, campaigns, Seq("seg"),
          "ts", "c_start", "c_end", bucketMicros = 86400L * 1000000L)
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n_events"),
          (round(sum(col("value")), 4) / count(lit(1))).as("avg_value"))
        .orderBy(col("seg"))
    }),

    // Dense hourly grid per event type: absent (type, hour) buckets
    // zero-filled — the generated-spine gap fill (no re-scan of events to
    // discover the grid; see operators/TimeSeries.scala).
    "ev_gapfill" -> ((s, d) =>
      graft.operators.TimeSeries.gapFillHourly(ev(s, d), "event_type", "ts")
        .orderBy(col("event_type"), col("bucket"))),

    // Batch face of silence detection (EventPipeline.detectSilence is
    // the streaming form with event-time state timeouts): users whose
    // last event is older than the 30-minute horizon before the stream's
    // end — one grouped max + a broadcast-scalar horizon comparison.
    "ev_silent_users" -> ((s, d) => {
      val e = ev(s, d)
      val horizon = e.agg(
        (max(unix_micros(col("ts"))) - 30L * 60L * 1000000L)
          .as("cutoff"))
      e.groupBy(col("user_id"))
        .agg(max(unix_micros(col("ts"))).as("last_us"))
        .crossJoin(broadcast(horizon))
        .where(col("last_us") < col("cutoff"))
        .select(col("user_id"), col("last_us"))
        .orderBy(col("user_id"))
    }),

    // Tolerance as-of: each purchase enriched by its latest prior view
    // ONLY if that view is within 10 minutes — stale last-known values
    // null out instead of silently enriching (AsofJoin.asofJoinWithin).
    // The oracle replays DuckDB's native ASOF JOIN with the same gap
    // CASE, so the carry-forward + staleness predicate is proven
    // equivalent to the declarative form.
    "ev_asof_tolerance" -> ((s, d) => {
      val e = ev(s, d)
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts"))
      val views = e.where(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("view_ts"), col("event_id"))
        .groupBy(col("user_id"), col("view_ts"))
        .agg(max(col("event_id")).as("view_id"))
      graft.operators.AsofJoin.asofJoinWithin(purchases, views,
          Seq("user_id"), "ts", "view_ts", Seq("view_id", "view_ts"),
          maxGapUs = 600000000L)
        .select(col("purchase_id"), col("user_id"), col("view_id"),
          (unix_micros(col("ts")) - unix_micros(col("view_ts")))
            .as("gap_us"))
        .orderBy(col("purchase_id"))
    }),

    // Cascaded rollup maintenance: the summary-table ladder every metrics
    // warehouse keeps — events aggregate ONCE into minute partials, hours
    // build from minute PARTIALS, days from hour partials; raw events are
    // scanned exactly once for all three grains. Counts and decimal sums
    // are mergeable, so cascade ≡ direct — and the oracle proves it by
    // computing the DAY grain straight from raw events. At 100 TB this is
    // why the day rollup costs |hour rows|, not a history re-scan (the
    // batch face of a18_incr_rollup, stacked).
    "ev_rollup_cascade" -> ((s, d) => {
      val minutes = ev(s, d)
        .groupBy(col("event_type"),
          date_trunc("minute", col("ts")).as("m"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(20,2)")).as("v"))
      val hours = minutes
        .groupBy(col("event_type"), date_trunc("hour", col("m")).as("h"))
        .agg(sum(col("n")).cast("long").as("n"),
          sum(col("v")).cast("decimal(20,2)").as("v"))
      hours
        // Day surfaced as DATE (Spark's date_trunc emits TIMESTAMP) and
        // the decimal sum as exact cents — BIGINT/DATE outputs are the
        // only grains both engines hash identically.
        .groupBy(col("event_type"),
          date_trunc("day", col("h")).cast("date").as("day"))
        .agg(sum(col("n")).cast("long").as("n"),
          (sum(col("v")).cast("decimal(20,2)") * 100)
            .cast("long").as("v_cents"))
        .orderBy(col("event_type"), col("day"))
    }),

    // CDC log compaction: latest state per (user, event_type) in ONE
    // grouped aggregate — `max_by` over a (ts, event_id) struct gives the
    // deterministic last-writer-wins row with no per-key window sort.
    // This is the materialized-view refresh shape: one shuffle on the
    // key, map-side partial max, never row_number over the full log.
    "ev_latest_compact" -> ((s, d) =>
      ev(s, d).groupBy(col("user_id"), col("event_type"))
        .agg(
          max_by(col("value"), struct(col("ts"), col("event_id")))
            .as("last_value"),
          max(col("ts")).as("last_ts"))
        .orderBy(col("user_id"), col("event_type"))),

    // Longest consecutive-day activity streak per user — the
    // gaps-and-islands pattern: distinct active days minus their
    // per-user row_number is constant within a run of consecutive
    // dates, so one grouped count per (user, island) and a max gives
    // the streak. Windows run over DISTINCT DAYS per user (bounded),
    // never events; top-10 with id tie-break.
    "ev_streaks" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("day"))
      val days = ev(s, d).where(col("ts").isNotNull)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      days
        .withColumn("island",
          date_sub(col("day"), row_number().over(w)))
        .groupBy(col("user_id"), col("island"))
        .agg(count(lit(1)).as("len"))
        .groupBy(col("user_id"))
        .agg(max(col("len")).as("longest_streak"))
        .orderBy(col("longest_streak").desc, col("user_id"))
        .limit(10)
    }),

    // Cohort LTV curve: per (first-week cohort, weeks-since) total
    // purchase value — the revenue face of ev_retention (same cohort
    // definition: week-truncated first event). Value sums as exact
    // decimals; ONE user-keyed shuffle assigns cohorts, one grouped
    // aggregate builds the curve.
    "ev_cohort_ltv" -> ((s, d) => {
      val e = ev(s, d).where(col("ts").isNotNull)
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("wk"),
          when(col("event_type") === "purchase",
            col("value").cast("decimal(20,2)"))
            .otherwise(lit(0).cast("decimal(20,2)")).as("v"))
      val cohorts = e.groupBy(col("user_id"))
        .agg(min(col("wk")).as("cohort"))
      e.join(cohorts, Seq("user_id"))
        .groupBy(col("cohort"),
          (datediff(col("wk"), col("cohort")) / 7).cast("long")
            .as("week_n"))
        .agg(sum(col("v")).cast("decimal(20,2)").cast("double")
          .as("revenue"),
          countDistinct(col("user_id")).as("active_users"))
        .orderBy(col("cohort"), col("week_n"))
    }),

    // Burst detection: hours whose event count exceeds mean + 3σ of the
    // hourly series. σ comes from integer moments of the AGGREGATE
    // series (|hours| rows), and the flag is the cross-multiplied EXACT
    // test (N·n_h − S) > 0 ∧ (N·n_h − S)² > 9·(N·SQ − S²) — zero floats
    // in the decision; the reported z mirrors √ ops.
    "ev_bursts" -> ((s, d) => {
      val hourly = ev(s, d).where(col("ts").isNotNull)
        .groupBy(date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"))
      val d38 = "decimal(38,0)"
      val m = hourly.agg(count(lit(1)).cast(d38).as("_nh"),
        sum(col("n")).cast(d38).as("_s"),
        sum((col("n") * col("n")).cast(d38)).as("_sq"))
      val dd = col("_nh") * col("n") - col("_s")
      val varN2 = col("_nh") * col("_sq") - col("_s") * col("_s")
      hourly.crossJoin(broadcast(m))
        .where(dd > lit(0).cast(d38) &&
          dd * dd > lit(9).cast(d38) * varN2)
        .select(col("hr"), col("n"),
          (dd.cast("double") / sqrt(varN2.cast("double"))).as("z"))
        .orderBy(col("hr"))
    }),

    // Hour-of-day SEASONAL baseline anomaly — the seasonality-aware
    // face of ev_bursts: a (day, hour-of-day) cell is a peak when its
    // count exceeds 2× the mean of ITS OWN hour-of-day across days
    // (9am compares to 9am, not to 3am — a diurnal series flags real
    // spikes, not every rush hour). The decision n·cells > 2·total is
    // EXACT integer cross-multiplication — no float mean can flip it.
    // Shape: one cell aggregate (map-side combinable), one ≤24-row
    // baseline aggregate broadcast back — linear at any event volume.
    "ev_seasonal_hour" -> ((s, d) => {
      val hc = ev(s, d).where(col("ts").isNotNull)
        .groupBy(to_date(col("ts")).as("day"), hour(col("ts")).as("hod"))
        .agg(count(lit(1)).as("n"))
      val base = hc.groupBy(col("hod"))
        .agg(count(lit(1)).as("hod_cells"), sum(col("n")).as("hod_total"))
      hc.join(broadcast(base), Seq("hod"))
        .select(col("day"), col("hod").cast("long").as("hod"), col("n"),
          col("hod_cells"), col("hod_total"),
          (col("n") * col("hod_cells") > lit(2) * col("hod_total"))
            .as("is_peak"))
        .orderBy(col("day"), col("hod"))
    }),

    // Seasonality-ADJUSTED anomaly detection — the composition every
    // ops pipeline converges to: an hour cell is anomalous relative to
    // ITS OWN hour-of-day's typical load, not a global fence (a 3 AM
    // spike and a 3 PM lull both surface; a global threshold sees
    // neither). Per-(day, hod) counts → per-hod MEDIAN center and MAD
    // spread via the exact two-pass histogram ladder (never a
    // per-group sort) → |n − center| > 3·MAD flags in pure integers.
    // Facts pay one grouped count; everything after runs on the
    // ≤24-group ladder aggregates.
    "ev_anomaly_seasonal" -> ((s, d) => {
      val hc = ev(s, d).where(col("ts").isNotNull)
        .groupBy(to_date(col("ts")).as("day"),
          hour(col("ts")).cast("long").as("hod"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint() // center pass + deviation pass
      val c = graft.operators.Median.groupQuantilesLong(
          hc, Seq("hod"), "n", Seq(50))
        .select(col("hod"), col("value").as("center"))
      val dev = hc.join(broadcast(c), Seq("hod"))
        .select(col("hod"), col("center"),
          abs(col("n") - col("center")).as("devn"))
        .localCheckpoint() // MAD pass + flag count
      val mad = graft.operators.Median.groupQuantilesLong(
          dev, Seq("hod"), "devn", Seq(50))
        .select(col("hod"), col("value").as("mad"))
      dev.join(broadcast(mad), Seq("hod"))
        .groupBy(col("hod"), col("center"), col("mad"))
        .agg(count(lit(1)).as("n_cells"),
          sum(when(col("devn") > lit(3) * col("mad"), 1L).otherwise(0L))
            .cast("long").as("n_anomalies"))
        .orderBy(col("hod"))
    }),

    // Two-proportion A/B test (user-parity cohorts, purchase
    // conversion): z mirrors the float ops; the 95% SIGNIFICANCE
    // decision is EXACT integer arithmetic — 625·D²·N vs
    // 2401·n₁n₂·x·(N−x) with D = x₁n₂−x₂n₁ (z² > 1.96² cross-
    // multiplied, 1.96² = 2401/625) — no float threshold can flip it.
    // Sample-Ratio-Mismatch guardrail — the FIRST check any A/B
    // readout must pass: is the user_id%2 assignment actually 50/50?
    // A skewed split invalidates ev_ab_test before any effect size is
    // read. The 1-df χ² decision at α=0.05 is EXACT integer
    // arithmetic: (a−b)²/(a+b) > 3.84 ⟺ 25·(a−b)² > 96·(a+b) — no
    // float threshold can flip it. One distinct-user aggregate.
    "ev_ab_srm" -> ((s, d) =>
      ev(s, d).select(col("user_id")).distinct()
        .select(pmod(col("user_id"), lit(2)).cast("long").as("grp"))
        .agg(sum(when(col("grp") === 0, 1L).otherwise(0L))
            .cast("long").as("n_a"),
          sum(when(col("grp") === 1, 1L).otherwise(0L))
            .cast("long").as("n_b"))
        .select(col("n_a"), col("n_b"),
          (lit(25L) * (col("n_a") - col("n_b")) *
            (col("n_a") - col("n_b")) >
            lit(96L) * (col("n_a") + col("n_b"))).as("srm_detected"))),

    // Cumulative ADOPTION curve — per event type, how many users had
    // used it by each day: each user's first-use day per type is one
    // grouped min; the running total is a window over the ≤|types|·
    // |days| first-use aggregate, never over facts. The PM "feature
    // uptake" card.
    "ev_adoption_curve" -> ((s, d) => {
      val first = ev(s, d).where(col("ts").isNotNull)
        .groupBy(col("event_type"), col("user_id"))
        .agg(min(col("ts").cast("date")).as("first_day"))
      val daily = first.groupBy(col("event_type"),
          col("first_day").as("day"))
        .agg(count(lit(1)).as("n_new"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      daily.withColumn("n_adopted", sum(col("n_new")).over(w))
        .select(col("event_type"), col("day"), col("n_new"),
          col("n_adopted").cast("long").as("n_adopted"))
        .orderBy(col("event_type"), col("day"))
    }),

    "ev_ab_test" -> ((s, d) => {
      // Conversion = the user's FIRST purchase (event-time order, id
      // tie-break) had value ≥ 50 — a non-saturating definition ("has
      // any purchase" converts every synthetic user, zeroing the
      // pooled variance).
      val e = ev(s, d)
      val firstPv = e.where(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(min_by(col("value"), struct(col("ts"), col("event_id")))
          .as("fv"))
      val conv = e.select(col("user_id")).distinct()
        .join(firstPv, Seq("user_id"), "left")
        .select(when(col("fv") >= 50, 1L).otherwise(0L).as("c"),
          pmod(col("user_id"), lit(2)).as("grp"))
      val d38 = "decimal(38,0)"
      val m = conv.groupBy().agg(
        sum(when(col("grp") === 0, 1L).otherwise(0L)).cast(d38).as("n_a"),
        sum(when(col("grp") === 0, col("c")).otherwise(0L)).cast(d38)
          .as("x_a"),
        sum(when(col("grp") === 1, 1L).otherwise(0L)).cast(d38).as("n_b"),
        sum(when(col("grp") === 1, col("c")).otherwise(0L)).cast(d38)
          .as("x_b"))
      val bigN = col("n_a") + col("n_b")
      val x = col("x_a") + col("x_b")
      val dd = col("x_a") * col("n_b") - col("x_b") * col("n_a")
      val den = col("n_a") * col("n_b") * x * (bigN - x)
      m.select(
        col("n_a").cast("long").as("n_a"), col("x_a").cast("long").as("x_a"),
        col("n_b").cast("long").as("n_b"), col("x_b").cast("long").as("x_b"),
        when(den > lit(0).cast(d38),
          dd.cast("double") * sqrt(bigN.cast("double")) /
            sqrt(den.cast("double"))).as("z"),
        (lit(625).cast(d38) * dd * dd * bigN >
          lit(2401).cast(d38) * den).as("significant"))
    }),

    // Funnel conversion-latency percentiles (first view → first
    // purchase): exact p50/p90/p99 order statistics over µs deltas
    // through the two-pass quantile machinery — pure integers, zero
    // floats anywhere in the result.
    "ev_funnel_latency" -> ((s, d) => {
      val per = ev(s, d).groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view", col("ts"))).as("tv"),
          min(when(col("event_type") === "purchase", col("ts"))).as("tp"))
        .where(col("tv").isNotNull && col("tp").isNotNull &&
          col("tv") < col("tp"))
        .select((unix_micros(col("tp")) - unix_micros(col("tv")))
          .as("lat_us"))
      graft.operators.Median.groupQuantilesLong(
          per, Seq.empty, "lat_us", percents = Seq(50, 90, 99))
        .orderBy(col("pct"))
    }),

    // Per-(type, hour-of-day) p50/p90/p99 value bands — the SLO/latency
    // dashboard surface: exact order statistics through the two-pass
    // histogram quantile machinery (no per-group sort, no percentile
    // single-reducer buffer), composed over ~120 (type, hod) groups.
    // Integer cents end to end; one /100 presentation division.
    "ev_value_bands" -> ((s, d) => {
      val e = ev(s, d).where(col("ts").isNotNull && col("value").isNotNull)
        .select(col("event_type"), hour(col("ts")).cast("long").as("hod"),
          col("value"))
      graft.operators.Median.groupQuantilesCents(
          e, Seq("event_type", "hod"), "value", percents = Seq(50, 90, 99))
        .orderBy(col("event_type"), col("hod"), col("pct"))
    }),

    // Time-weighted average per series (the sensor/monitoring mean: a
    // value HOLDS until the next observation, so it weighs by holding
    // duration, not sample count — irregular sampling stops biasing the
    // mean). Exact integers end to end: cents × µs products summed in
    // DECIMAL(38,0), ONE final division; per-type windows never global.
    "ev_twa" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
      ev(s, d).where(col("ts").isNotNull && col("value").isNotNull)
        .select(col("event_type"),
          (col("value").cast("decimal(12,2)") * 100).cast("long").as("vc"),
          unix_micros(col("ts")).as("t"),
          unix_micros(lead(col("ts"), 1).over(w)).as("nt"))
        .where(col("nt").isNotNull)
        .groupBy(col("event_type"))
        .agg(
          sum((col("vc") * (col("nt") - col("t"))).cast("decimal(38,0)"))
            .as("_num"),
          sum(col("nt") - col("t")).as("_den"))
        .select(col("event_type"),
          (col("_num").cast("double") /
            (lit(100.0) * col("_den").cast("double"))).as("twa"))
        .orderBy(col("event_type"))
    }),

    // Frequent 3-step behavioral paths: two `lead`s over user-partitioned
    // time order (windows see one user's events, never the global log),
    // one count aggregate, top-15 with full tie-breaks.
    "ev_trigrams" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev(s, d)
        .select(col("event_type").as("step1"),
          lead(col("event_type"), 1).over(w).as("step2"),
          lead(col("event_type"), 2).over(w).as("step3"))
        .where(col("step2").isNotNull && col("step3").isNotNull)
        .groupBy(col("step1"), col("step2"), col("step3"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
        .limit(15)
    }),

    // Peak concurrency per hour: every event opens a 30-minute presence
    // interval; the ±1 sweep line rides the distributed two-phase prefix
    // sum (no global window over events), then one per-hour max.
    "ev_concurrency" -> ((s, d) =>
      graft.operators.TimeSeries.maxConcurrent(ev(s, d), "ts",
          durationMin = 30)
        .orderBy(col("hr"))),

    // Behavioral transition matrix: (event_type → next event_type) counts
    // in per-user time order — `lead` over user-partitioned windows (each
    // partition is one user's events; no global sort), then one count
    // aggregate over the bigram.
    "ev_transitions" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev(s, d)
        .select(col("event_type"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .where(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("next_type"))
    }),

    // Next-event Markov prediction accuracy — the eval face of
    // ev_transitions: train a first-order model on transitions that
    // COMPLETE before Jan 21 (next event inside the first 20 days),
    // predict the argmax next type per current type (ties broken to the
    // lexicographically smallest — row_number over the 5×5 count
    // matrix), and score it on transitions that START on/after the
    // split. Per current type: evals, hits, accuracy — the accuracy one
    // double division of exact integers. The model is ≤|types| rows and
    // BROADCASTS onto the eval pairs; both pair sets come from ONE
    // user-partitioned lead window, so the whole query is one user-
    // keyed shuffle plus a tiny aggregate. The boundary-straddling pair
    // (starts before, completes after) belongs to neither set by
    // construction — no train/eval leakage.
    "ev_markov_next" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val split = lit("2024-01-21 00:00:00").cast("timestamp")
      val pairs = ev(s, d).where(col("ts").isNotNull)
        .select(col("ts"), col("event_type"),
          lead(col("event_type"), 1).over(w).as("next_type"),
          lead(col("ts"), 1).over(w).as("next_ts"))
        .where(col("next_type").isNotNull)
      val wBest = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
        .orderBy(col("n").desc, col("next_type"))
      val model = pairs.where(col("next_ts") < split)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(wBest))
        .where(col("rn") === 1)
        .select(col("event_type"), col("next_type").as("predicted"))
      pairs.where(col("ts") >= split)
        .join(broadcast(model), Seq("event_type"), "left")
        .groupBy(col("event_type"), col("predicted"))
        .agg(count(lit(1)).cast("long").as("n_eval"),
          sum(when(col("next_type") === col("predicted"), 1L)
            .otherwise(0L)).cast("long").as("n_correct"))
        .withColumn("accuracy",
          col("n_correct").cast("double") / col("n_eval").cast("double"))
        .orderBy(col("event_type"))
    }),

    // Exponentially-weighted trailing average of the daily count series
    // (per event type) with DYADIC weights 128,64,…,1 over the last 8
    // observations — the smoothing EWMA recursion s_t = α·x_t +
    // (1−α)·s_{t−1} truncated at 8 terms so every weight is an exact
    // power of two: numerator and denominator are BIGINT dot products
    // (partial leading windows renormalize by the weights actually
    // present — no warm-up bias), and the only float is one final IEEE
    // division, so both engines agree bitwise where a float recursion
    // never could. One window over the |types|×|days| AGGREGATE; the
    // eight lags share a single window spec, so WindowExec materializes
    // the frame once.
    "ev_ewma" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("day"))
      val daily = ev(s, d).where(col("ts").isNotNull)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).cast("long").as("n"))
      val terms = (0 to 7).map { i =>
        val c = if (i == 0) col("n") else lag(col("n"), i).over(w)
        val wt = 1L << (7 - i)
        (when(c.isNotNull, c * wt).otherwise(lit(0L)),
         when(c.isNotNull, lit(wt)).otherwise(lit(0L)))
      }
      daily
        .withColumn("num", terms.map(_._1).reduce(_ + _))
        .withColumn("den", terms.map(_._2).reduce(_ + _))
        .select(col("event_type"), col("day"), col("n"),
          (col("num").cast("double") / col("den").cast("double"))
            .as("ewma"))
        .orderBy(col("event_type"), col("day"))
    }),

    // Audience overlap matrix: pairwise Jaccard and overlap coefficient
    // between event types' DISTINCT user sets — "how much of the
    // purchase audience also errors", the segmentation-overlap card.
    // The (type, user) distinct set is staged once and feeds both the
    // per-type sizes and the intersection self-join; that join is keyed
    // on user_id and each user contributes at most C(|types|,2) = 10
    // pairs, so the shuffle is ≤10× the distinct set — never quadratic
    // in users. Both statistics are one IEEE division of exact integers.
    "ev_audience_overlap" -> ((s, d) => {
      val tu = ev(s, d).select(col("event_type"), col("user_id"))
        .distinct().localCheckpoint()
      val sz = tu.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("long").as("n"))
      tu.as("a").join(tu.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"))
        .agg(count(lit(1)).cast("long").as("n_both"))
        .join(sz.select(col("event_type").as("type_a"),
          col("n").as("n_a")), Seq("type_a"))
        .join(sz.select(col("event_type").as("type_b"),
          col("n").as("n_b")), Seq("type_b"))
        .withColumn("jaccard", col("n_both").cast("double") /
          (col("n_a") + col("n_b") - col("n_both")).cast("double"))
        .withColumn("overlap", col("n_both").cast("double") /
          least(col("n_a"), col("n_b")).cast("double"))
        .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
          col("n_both"), col("jaccard"), col("overlap"))
        .orderBy(col("type_a"), col("type_b"))
    }),

    // Weekly GROWTH ACCOUNTING (new / retained / resurrected / churned)
    // — the canonical active-user decomposition beyond ev_retention's
    // cohort triangle: a user's week is `new` on first appearance,
    // `retained` when also active the prior week, `resurrected` after a
    // gap; a `churned` event lands on week w+7 when a user active in w
    // skips w+7 (attributed only up to the corpus's last observed week
    // — the future is unknowable). One user-keyed window over the
    // DISTINCT (user, week) set classifies everything; churn is the
    // same window's lead face; weeks where everyone quits still report
    // via the FULL join of the active and churn ledgers. All counts are
    // exact integers.
    "ev_growth_accounting" -> ((s, d) => {
      val uw = ev(s, d).where(col("ts").isNotNull)
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("wk"))
        .distinct().localCheckpoint()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("wk"))
      val lagged = uw
        .withColumn("prev", lag(col("wk"), 1).over(w))
        .withColumn("nxt", lead(col("wk"), 1).over(w))
      val active = lagged.groupBy(col("wk")).agg(
        sum(when(col("prev").isNull, 1L).otherwise(0L))
          .cast("long").as("n_new"),
        sum(when(datediff(col("wk"), col("prev")) === 7, 1L)
          .otherwise(0L)).cast("long").as("n_retained"),
        sum(when(col("prev").isNotNull &&
            datediff(col("wk"), col("prev")) > 7, 1L)
          .otherwise(0L)).cast("long").as("n_resurrected"))
      val churn = lagged
        .where(col("nxt").isNull || datediff(col("nxt"), col("wk")) > 7)
        .select(date_add(col("wk"), 7).as("wk"))
        .crossJoin(broadcast(uw.agg(max(col("wk")).as("_mx"))))
        .where(col("wk") <= col("_mx"))
        .groupBy(col("wk"))
        .agg(count(lit(1)).cast("long").as("n_churned"))
      active.join(churn, Seq("wk"), "full")
        .select(col("wk"),
          coalesce(col("n_new"), lit(0L)).as("n_new"),
          coalesce(col("n_retained"), lit(0L)).as("n_retained"),
          coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
          coalesce(col("n_churned"), lit(0L)).as("n_churned"))
        .orderBy(col("wk"))
    }),

    // Tukey-fence anomaly flags on the daily count series: a (type,
    // day) cell is an outlier when its count leaves [q1 − 1.5·IQR,
    // q3 + 1.5·IQR]. Quartiles are EXACT nearest-rank order statistics
    // from the two-pass histogram ladder (never a per-group sort), the
    // fences broadcast (≤|types| rows), and 1.5 = 3/2 makes the flag a
    // pure integer test 2n < 2q1 − 3·IQR — no float can flip it. The
    // robust complement to ev_bursts' mean+3σ flags: a heavy-tailed
    // day inflates σ and hides siblings, but can't move the quartiles.
    "ev_anomaly_iqr" -> ((s, d) => {
      val daily = ev(s, d).where(col("ts").isNotNull)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).cast("long").as("n"))
        .localCheckpoint()
      val fences = graft.operators.Median.groupQuantilesLong(
          daily, Seq("event_type"), "n", Seq(25, 75))
        .groupBy(col("event_type"))
        .agg(min(when(col("pct") === 25, col("value"))).as("q1"),
          min(when(col("pct") === 75, col("value"))).as("q3"))
      daily.join(broadcast(fences), Seq("event_type"))
        .withColumn("is_outlier",
          col("n") * 2 < col("q1") * 2 - (col("q3") - col("q1")) * 3 ||
            col("n") * 2 > col("q3") * 2 + (col("q3") - col("q1")) * 3)
        .select(col("event_type"), col("day"), col("n"),
          col("q1"), col("q3"), col("is_outlier"))
        .orderBy(col("event_type"), col("day"))
    }),

    // TIME-DECAY multi-touch attribution — the recency-weighted sibling
    // of ev_attrib_linear: each touch STRICTLY within the 24h
    // pre-purchase band (exclusive lower edge — an exactly-24h-old
    // touch would need weight 2^-1) carries weight 2^(23 − hours_ago),
    // an exact power of two (halving per hour — the dyadic half-life
    // trick from ev_ewma), so per-
    // purchase weight sums are BIGINT dot products and each channel's
    // credit is ONE IEEE division. The same user-keyed equi-join with
    // the band as predicate (PlanAuditSpec posture); touchless
    // purchases survive the left join with NULL credits.
    "ev_attrib_decay" -> ((s, d) => {
      val e = ev(s, d).where(col("ts").isNotNull)
      val purch = e.where(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("ts").as("pt"))
      val touch = e.where(col("event_type").isin("view", "click"))
        .select(col("user_id").as("t_user"), col("ts").as("tt"),
          col("event_type").as("ch"))
      purch.join(touch,
          col("user_id") === col("t_user") &&
            col("tt") <= col("pt") &&
            col("tt") > col("pt") - expr("INTERVAL 24 HOURS"),
          "left")
        .withColumn("w", expr(
          "shiftleft(1L, cast(23 - ((unix_micros(pt) - unix_micros(tt))" +
            " div 3600000000) as int))"))
        .groupBy(col("p_id"))
        .agg(count(col("ch")).as("n_touch"),
          sum(when(col("ch") === "view", col("w")).otherwise(0L))
            .cast("long").as("w_view"),
          sum(when(col("ch") === "click", col("w")).otherwise(0L))
            .cast("long").as("w_click"))
        .withColumn("view_credit", when(col("n_touch") > 0,
          col("w_view").cast("double") /
            (col("w_view") + col("w_click")).cast("double")))
        .withColumn("click_credit", when(col("n_touch") > 0,
          col("w_click").cast("double") /
            (col("w_view") + col("w_click")).cast("double")))
        .orderBy(col("p_id"))
    }),

    // Lead–lag cross-correlation between the error and purchase DAILY
    // series at offsets −3…+3 — "does error volume lead conversions?",
    // the ops-diagnostics screen. Per lag: Pearson r from exact
    // decimal(38,0) moments over the ~30-row aligned day pairs
    // (g_assortativity's discipline — floats only in the final
    // cov/√(varx·vary), round-12 both sides, NULL on zero variance).
    // The 7-row lag dimension broadcasts onto the day aggregate; the
    // alignment join is day-keyed. Everything runs on aggregates.
    "ev_lag_correlation" -> ((s, d) => {
      val daily = ev(s, d).where(col("ts").isNotNull)
        .groupBy(col("ts").cast("date").as("day"), col("event_type"))
        .agg(count(lit(1)).cast("long").as("n"))
        .localCheckpoint()
      val x = daily.where(col("event_type") === "error")
        .select(col("day"), col("n").as("x"))
      val y = daily.where(col("event_type") === "purchase")
        .select(col("day").as("yday"), col("n").as("y"))
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      x.crossJoin(broadcast(x.sparkSession.range(-3, 4)
          .select(col("id").cast("int").as("lag"))))
        .join(y, col("yday") === expr("date_add(day, lag)"))
        .groupBy(col("lag"))
        .agg(count(lit(1)).cast("long").as("n_days"),
          sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
          sum(dec(col("x") * col("x"))).as("sxx"),
          sum(dec(col("y") * col("y"))).as("syy"),
          sum(dec(col("x") * col("y"))).as("sxy"))
        .withColumn("cov",
          (dec(col("n_days")) * col("sxy") - col("sx") * col("sy"))
            .cast("double"))
        .withColumn("varx",
          (dec(col("n_days")) * col("sxx") - col("sx") * col("sx"))
            .cast("double"))
        .withColumn("vary",
          (dec(col("n_days")) * col("syy") - col("sy") * col("sy"))
            .cast("double"))
        .select(col("lag"), col("n_days"),
          when(col("varx") > 0 && col("vary") > 0,
            round(col("cov") / sqrt(col("varx") * col("vary")), 12))
            .as("r"))
        .orderBy(col("lag"))
    }),

    // p-CHART rate control: each day's ERROR RATE e_i/n_i against the
    // 3σ binomial control limits around the corpus rate E/N — the SRE
    // error-budget screen that ev_bursts (raw counts) can't replace on
    // days whose traffic volume itself moves. The σ test squares to
    // (e_i·N − E·n_i)² > 9·E·(N−E)·n_i — ENTIRELY in integers (cents-
    // style cross-multiplication), so no float can flip a flag; the
    // rate columns are one IEEE division each for display only. One
    // day-keyed aggregate + a broadcast one-row total.
    "ev_error_pchart" -> ((s, d) => {
      val daily = ev(s, d).where(col("ts").isNotNull)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .cast("long").as("e"))
        .localCheckpoint()
      val tot = daily.agg(sum(col("n")).cast("long").as("nn"),
        sum(col("e")).cast("long").as("ee"))
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      daily.crossJoin(broadcast(tot))
        .withColumn("lhs", {
          val diff = dec(col("e")) * col("nn") - dec(col("ee")) * col("n")
          diff * diff
        })
        .withColumn("rhs",
          dec(lit(9)) * col("ee") * (dec(col("nn")) - col("ee")) * col("n"))
        .select(col("day"), col("n"), col("e"),
          (col("e").cast("double") / col("n").cast("double")).as("rate"),
          (col("ee").cast("double") / col("nn").cast("double"))
            .as("rate_bar"),
          (col("lhs") > col("rhs")).as("out_of_control"))
        .orderBy(col("day"))
    }),

    // NEW vs RETURNING revenue split per day — the growth-quality card
    // ("is revenue coming from acquisition or retention"): a purchase
    // is NEW-user revenue when it lands on the purchaser's first-ever
    // activity day. First days come from one user aggregate that joins
    // back on the user key (never a window over facts); revenue is
    // exact cents with one display division per column. Days with only
    // one cohort still report via zero-filled sums.
    "ev_new_vs_returning" -> ((s, d) => {
      val e = ev(s, d).where(col("ts").isNotNull)
      val firstDay = e.groupBy(col("user_id"))
        .agg(min(col("ts").cast("date")).as("first_day"))
      e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").cast("date").as("day"),
          (col("value").cast("decimal(12,2)") * 100).cast("long")
            .as("cents"))
        .join(firstDay, Seq("user_id"))
        .groupBy(col("day"))
        .agg(count(lit(1)).cast("long").as("n_purchases"),
          sum(when(col("day") === col("first_day"), col("cents"))
            .otherwise(0L)).cast("long").as("new_cents"),
          sum(when(col("day") =!= col("first_day"), col("cents"))
            .otherwise(0L)).cast("long").as("ret_cents"))
        .select(col("day"), col("n_purchases"),
          (col("new_cents").cast("double") / 100.0).as("new_revenue"),
          (col("ret_cents").cast("double") / 100.0)
            .as("returning_revenue"))
        .orderBy(col("day"))
    }),

    // Forecast BACKTEST on the daily purchase-revenue series — price
    // the two classical baselines every real forecaster must beat:
    // seasonal-naive (f_d = actual_{d−7}) and the trailing-7-day mean
    // (f_d = floor(Σ_{d−7..d−1}/7) — the floor IS the model contract,
    // keeping every error an exact BIGINT cent). The series is
    // zero-filled onto a dense day spine first (a quiet day is a real
    // 0, and lag-7 must mean seven CALENDAR days, not seven observed
    // rows); both windows then run over the ~|days| daily aggregate,
    // never over facts. Scored only on days with a full 7-day history.
    // The model contract is NON-NEGATIVE revenue, enforced by filter on
    // both engines: the ma7 floor division is Spark `div` (truncates
    // toward zero) vs DuckDB `//` (floors) — identical on non-negative
    // sums, divergent on a refund-valued purchase day (ADVICE r6).
    "ev_forecast_backtest" -> ((s, d) => {
      val daily = ev(s, d)
        .where(col("ts").isNotNull && col("event_type") === "purchase" &&
          col("value") >= 0)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum((col("value").cast("decimal(12,2)") * 100)
          .cast("long")).as("cents"))
      val bounds = daily.agg(min(col("day")).as("lo"),
        max(col("day")).as("hi"))
      val spine = bounds.select(
        explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
      val dense = spine.join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("cents"), lit(0L)).as("cents"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
      dense
        .withColumn("rn", row_number().over(w))
        .withColumn("naive7", lag(col("cents"), 7).over(w))
        .withColumn("ma7",
          expr("sum(cents) over (order by day rows between 7 preceding and 1 preceding) div 7"))
        .where(col("rn") > 7)
        .agg(count(lit(1)).as("n_days"),
          sum(abs(col("cents") - col("naive7"))).as("sae_naive"),
          sum(abs(col("cents") - col("ma7"))).as("sae_ma"))
        .select(explode(array(
          struct(lit("seasonal_naive").as("model"), col("n_days"),
            col("sae_naive").as("sae_cents")),
          struct(lit("trailing_mean_7").as("model"), col("n_days"),
            col("sae_ma").as("sae_cents")))).as("r"))
        .select(col("r.model").as("model"), col("r.n_days").as("n_days"),
          col("r.sae_cents").as("sae_cents"),
          expr("r.sae_cents div r.n_days").as("mae_cents"))
        .orderBy(col("model"))
    }),

    // L7 POWER-USER CURVE — "of everyone active in the trailing week,
    // how many were active on 1, 2, …, 7 distinct days": the
    // engagement-depth histogram behind stickiness/health cards
    // (ev_dau_wau's volume decomposed by user intensity). One distinct
    // (user, day) aggregate over the 7-day slice (the max-date anchor
    // is a broadcast scalar, so the slice filter is a plain predicate
    // on the scan), one user-keyed count, then the ≤7-row histogram;
    // the share is exact permille floor division over a window on
    // that ≤7-row result — no float anywhere.
    "ev_power_curve" -> ((s, d) => {
      val e = ev(s, d).where(col("ts").isNotNull)
      val anchor = e.agg(max(col("ts").cast("date")).as("mxd"))
      val perUser = e
        .select(col("user_id"), col("ts").cast("date").as("day"))
        .crossJoin(broadcast(anchor))
        .where(col("day") >= date_sub(col("mxd"), 6))
        .select(col("user_id"), col("day")).distinct()
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("days_active"))
      perUser.groupBy(col("days_active"))
        .agg(count(lit(1)).as("n_users"))
        .withColumn("pct_permille",
          expr("(1000 * n_users) div sum(n_users) over ()"))
        .orderBy(col("days_active"))
    }),

    // Per-type INTER-ARRIVAL median and p90 — "how often does each
    // event type fire per user": exact microsecond gaps from ONE
    // user+type-keyed lead window, then the two-pass histogram
    // quantile ladder (never a per-group sort) over the ~5 type
    // groups. The cadence card behind rate-limit and session-gap
    // tuning; all integers until the display seconds (one division).
    "ev_interarrival_median" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val gaps = ev(s, d).where(col("ts").isNotNull)
        .select(col("event_type"), col("ts"), col("user_id"),
          col("event_id"))
        .withColumn("nxt", lead(col("ts"), 1).over(w))
        .where(col("nxt").isNotNull)
        .select(col("event_type"),
          expr("unix_micros(nxt) - unix_micros(ts)").as("gap_us"))
      graft.operators.Median.groupQuantilesLong(
          gaps, Seq("event_type"), "gap_us", Seq(50, 90))
        .groupBy(col("event_type"))
        .agg(min(when(col("pct") === 50, col("value"))).as("p50_us"),
          min(when(col("pct") === 90, col("value"))).as("p90_us"))
        .select(col("event_type"), col("p50_us"), col("p90_us"),
          (col("p50_us").cast("double") / 1000000.0).as("p50_sec"))
        .orderBy(col("event_type"))
    }),

    // Session DEPTH distribution in dyadic buckets — "how long are
    // sessions, at what multiplicity": the same 30-minute
    // session_window assembly as the journey query, bucketed by the
    // binary-digit-count floor(log2) (no float log), with each
    // bucket's session count, depth range, and event mass. One
    // user-keyed sessionization shuffle + a ≤64-row bucket count; the
    // oracle replays sessionization as gaps-and-islands, re-proving
    // the two formulations agree at the aggregate level.
    "ev_session_depth" -> ((s, d) =>
      ev(s, d).where(col("ts").isNotNull)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).cast("long").as("depth"))
        .withColumn("bucket",
          expr("cast(length(conv(depth, 10, 2)) - 1 as bigint)"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).cast("long").as("n_sessions"),
          min(col("depth")).as("min_depth"),
          max(col("depth")).as("max_depth"),
          sum(col("depth")).cast("long").as("n_events"))
        .orderBy(col("bucket"))),

    // FIRST-touch attribution — the family's missing corner (last-touch
    // rides the as-of join, linear and decay ship above): per purchase,
    // the EARLIEST view/click in the 24h band, resolved by min over a
    // (tt, event-order, channel) struct so ties at the same microsecond
    // break deterministically; the channel mix then aggregates per
    // channel. Same banded user-keyed equi-join; no window over facts
    // (the min is a grouped aggregate, map-side combinable).
    "ev_attrib_first" -> ((s, d) => {
      val e = ev(s, d).where(col("ts").isNotNull)
      val purch = e.where(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("ts").as("pt"))
      val touch = e.where(col("event_type").isin("view", "click"))
        .select(col("user_id").as("t_user"), col("ts").as("tt"),
          col("event_id").as("t_id"), col("event_type").as("ch"))
      purch.join(touch,
          col("user_id") === col("t_user") &&
            col("tt") <= col("pt") &&
            col("tt") >= col("pt") - expr("INTERVAL 24 HOURS"))
        .groupBy(col("p_id"))
        .agg(min(struct(col("tt"), col("t_id"), col("ch")))
          .getField("ch").as("first_channel"))
        .groupBy(col("first_channel"))
        .agg(count(lit(1)).cast("long").as("n_purchases"))
        .orderBy(col("first_channel"))
    }),

    // CART-ABANDONMENT rate per day: the share of view events NOT
    // followed by a purchase from the same user within 24h — the
    // conversion-health daily card. The existence probe is a LEFT SEMI
    // join on the user key with the 24h band as predicate (the
    // attribution join's shape, but semi: no fan-out, each view counts
    // once however many purchases follow), then one day aggregate;
    // the rate is ONE exact-int IEEE division.
    "ev_cart_abandonment" -> ((s, d) => {
      val e = ev(s, d).where(col("ts").isNotNull)
      val views = e.where(col("event_type") === "view")
        .select(col("event_id").as("v_id"), col("user_id"),
          col("ts").as("vt"))
        .localCheckpoint()
      val purch = e.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("pt"))
      val converted = views.join(purch,
          col("user_id") === col("p_user") &&
            col("pt") >= col("vt") &&
            col("pt") <= col("vt") + expr("INTERVAL 24 HOURS"),
          "left_semi")
        .select(col("v_id"), lit(1L).as("_conv"))
      views.join(converted, Seq("v_id"), "left")
        .groupBy(col("vt").cast("date").as("day"))
        .agg(count(lit(1)).cast("long").as("n_views"),
          sum(coalesce(col("_conv"), lit(0L))).cast("long")
            .as("n_converted"))
        .withColumn("abandon_rate",
          (col("n_views") - col("n_converted")).cast("double") /
            col("n_views").cast("double"))
        .orderBy(col("day"))
    }),

    // Per-user behavioral DIVERSITY: Simpson index 1 − Σc²/n² over each
    // user's event-type mix — the no-logarithm entropy stand-in
    // (t_simpson_diversity's trick pointed at behavior): 0 = pure
    // habit (one event type), →0.8 = uniform across all five. Σc² and
    // n come from one (user, type) count aggregate; the index is ONE
    // IEEE division of exact integers. Two linear key-hash shuffles,
    // never pairwise.
    "ev_user_diversity" -> ((s, d) =>
      ev(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).cast("long").as("c"))
        .groupBy(col("user_id"))
        .agg(sum(col("c")).cast("long").as("n_events"),
          count(lit(1)).cast("long").as("n_types"),
          sum(col("c") * col("c")).cast("long").as("sum_c2"))
        .withColumn("diversity",
          lit(1.0) - col("sum_c2").cast("double") /
            (col("n_events") * col("n_events")).cast("double"))
        .orderBy(col("user_id"))),

    // APDEX score per event type — the SRE satisfaction index over the
    // value column as latency: satisfied ≤ T, tolerating ≤ 4T (T = 50,
    // a PINNED literal both engines share), and the score
    // (satisfied + tolerating/2) / total computed as the SINGLE
    // division (2·sat + tol) / (2·total) so the half-weight never
    // exists as a float. One grouped aggregate; the band predicates
    // are plain comparisons on the scanned column.
    "ev_apdex" -> ((s, d) =>
      ev(s, d).where(col("value").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(when(col("value") <= 50.0, 1L).otherwise(0L))
            .cast("long").as("n_satisfied"),
          sum(when(col("value") > 50.0 && col("value") <= 200.0, 1L)
            .otherwise(0L)).cast("long").as("n_tolerating"))
        .withColumn("apdex",
          (col("n_satisfied") * 2 + col("n_tolerating")).cast("double") /
            (col("n") * 2).cast("double"))
        .orderBy(col("event_type"))),

    // Day-of-week × hour-of-day activity HEATMAP — the traffic-shape
    // card. Both axes are PURE INTEGER epoch arithmetic ((epoch days +
    // 3) mod 7 → 0 = Monday; epoch hours mod 24, UTC) because the two
    // engines disagree on dayofweek()'s origin (Spark 1=Sunday, DuckDB
    // 0=Sunday) and a convention bug here would pass every row-count
    // check while shifting the whole matrix a day. One grouped count +
    // a broadcast total; the share is one IEEE division.
    "ev_heatmap" -> ((s, d) => {
      val g = ev(s, d).where(col("ts").isNotNull)
        .groupBy(
          expr("(unix_micros(ts) div 86400000000 + 3) % 7").as("dow"),
          expr("(unix_micros(ts) div 3600000000) % 24").as("hod"))
        .agg(count(lit(1)).cast("long").as("n"))
      g.crossJoin(broadcast(g.agg(sum(col("n")).cast("long").as("nt"))))
        .select(col("dow"), col("hod"), col("n"),
          (col("n").cast("double") / col("nt").cast("double"))
            .as("share"))
        .orderBy(col("dow"), col("hod"))
    }),

    // Session-GAP sweep — price the sessionization knob before
    // committing a gap: session counts at τ ∈ {15, 30, 60} minutes
    // from ONE user-keyed lag pass (a session count is just the count
    // of session-OPENS, so three conditional sums over the same gap
    // column replace three sessionization runs). Same open-at-≥gap
    // semantics as ev_sessions / session_window; events-per-session is
    // an exact integer permille. The only data-sized shuffle is the
    // user key; the sweep itself aggregates to one row then fans to 3.
    "ev_session_gap_sweep" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val e = ev(s, d).where(col("ts").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("gap_us", unix_micros(col("ts")) -
          unix_micros(lag(col("ts"), 1).over(w)))
      def opens(mins: Int) = sum(when(col("gap_us").isNull ||
          col("gap_us") >= mins * 60L * 1000000L, 1L).otherwise(0L))
        .cast("long")
      e.agg(count(lit(1)).cast("long").as("n_events"),
          opens(15).as("s15"), opens(30).as("s30"), opens(60).as("s60"))
        .select(explode(array(
          struct(lit(15L).as("gap_minutes"), col("s15").as("n_sessions"),
            col("n_events")),
          struct(lit(30L).as("gap_minutes"), col("s30").as("n_sessions"),
            col("n_events")),
          struct(lit(60L).as("gap_minutes"), col("s60").as("n_sessions"),
            col("n_events")))).as("r"))
        .select(col("r.gap_minutes").as("gap_minutes"),
          col("r.n_sessions").as("n_sessions"),
          col("r.n_events").as("n_events"),
          expr("(1000 * r.n_events) div r.n_sessions")
            .as("events_per_session_permille"))
        .orderBy(col("gap_minutes"))
    }),

    // Attribution-WINDOW sweep — price the lookback knob: how many
    // purchases have a view/click touch within 1 h / 6 h / 24 h, from
    // ONE user-keyed window pass. The last preceding touch is a
    // conditional max over the PRECEDING frame (ev_mttr's shape,
    // looking back instead of forward — no banded self-join at all,
    // where ev_attrib_first pays one for its channel split), and the
    // three windows are conditional sums over the same gap column.
    // Exact µs integers; coverage is an integer permille.
    "ev_attrib_window_sweep" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)
      val e = ev(s, d).where(col("ts").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
      val p = e.withColumn("touch_us",
          max(when(col("event_type").isin("view", "click"),
            unix_micros(col("ts")))).over(w))
        .where(col("event_type") === "purchase")
        .withColumn("gap_us", unix_micros(col("ts")) - col("touch_us"))
      def within(h: Int) = sum(when(col("gap_us").isNotNull &&
          col("gap_us") <= h * 3600L * 1000000L, 1L).otherwise(0L))
        .cast("long")
      p.agg(count(lit(1)).cast("long").as("n_purchases"),
          within(1).as("a1"), within(6).as("a6"), within(24).as("a24"))
        .select(explode(array(
          struct(lit(1L).as("window_hours"), col("a1").as("n_attributed"),
            col("n_purchases")),
          struct(lit(6L).as("window_hours"), col("a6").as("n_attributed"),
            col("n_purchases")),
          struct(lit(24L).as("window_hours"),
            col("a24").as("n_attributed"), col("n_purchases")))).as("r"))
        .select(col("r.window_hours").as("window_hours"),
          col("r.n_attributed").as("n_attributed"),
          col("r.n_purchases").as("n_purchases"),
          expr("(1000 * r.n_attributed) div r.n_purchases")
            .as("attributed_permille"))
        .orderBy(col("window_hours"))
    }),

    // DWELL time per event type — how long users sit on each event
    // before their next action, p50/p90 in exact µs: the engagement
    // face of the latency dashboards. Dwell is lead(ts) − ts on the
    // user-keyed window, kept only when the gap stays inside the
    // 30-minute session bound (a cross-session gap is absence, not
    // dwell); the per-type quantiles come from the two-pass exact
    // histogram ladder — no per-group sort, ~10 output rows.
    "ev_dwell_time" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val e = ev(s, d).where(col("ts").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("dwell_us",
          unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
        .where(col("dwell_us").isNotNull &&
          col("dwell_us") < 30L * 60L * 1000000L)
        .select(col("event_type"), col("dwell_us"))
      graft.operators.Median.groupQuantilesLong(
          e, Seq("event_type"), "dwell_us", percents = Seq(50, 90))
        .orderBy(col("event_type"), col("pct"))
    }),

    // ERROR-BUDGET burn — the SRE companion to ev_error_pchart's
    // control limits: against a 200-permille error SLO, the cumulative
    // burn through the month and the over-budget flag per day, in
    // exact integers (burn = 1000·5·cumerr div cumev; 1000 = exactly
    // on budget, cross-multiplied flag so no float can flip it). The
    // fact pass is one day-grain aggregate; the running sums ride a
    // ≤31-row ordered window over that aggregate — aggregate-sized
    // state, the ev_error_pchart discipline.
    "ev_error_budget" -> ((s, d) => {
      val day = ev(s, d).where(col("ts").isNotNull)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).cast("long").as("n_events"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .cast("long").as("n_errors"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      day
        .withColumn("cum_events", sum(col("n_events")).over(w))
        .withColumn("cum_errors", sum(col("n_errors")).over(w))
        .select(col("day"), col("n_events"), col("n_errors"),
          col("cum_events"), col("cum_errors"),
          expr("(1000 * 5 * cum_errors) div cum_events")
            .as("burn_permille"),
          (col("cum_errors") * 5L > col("cum_events")).as("over_budget"))
        .orderBy(col("day"))
    })
  )

  val oracles: Map[String, String] = Map(
    "ev_latest_compact" ->
      """WITH r AS (SELECT user_id, event_type, value, ts,
        |  row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_type, value AS last_value, ts AS last_ts
        |FROM r WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "ev_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |  FROM events WHERE ts IS NOT NULL),
        |isl AS (SELECT user_id,
        |  day - CAST(row_number() OVER (PARTITION BY user_id
        |    ORDER BY day) AS INT) AS island
        |  FROM days),
        |runs AS (SELECT user_id, island, count(*) AS len
        |  FROM isl GROUP BY 1, 2)
        |SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak
        |FROM runs GROUP BY 1
        |ORDER BY longest_streak DESC, user_id LIMIT 10""".stripMargin,
    "ev_cohort_ltv" ->
      """WITH e AS (SELECT user_id,
        |  CAST(date_trunc('week', ts) AS DATE) AS wk,
        |  CASE WHEN event_type='purchase'
        |    THEN CAST(value AS DECIMAL(20,2))
        |    ELSE CAST(0 AS DECIMAL(20,2)) END AS v
        |  FROM events WHERE ts IS NOT NULL),
        |c AS (SELECT user_id, min(wk) AS cohort FROM e GROUP BY 1)
        |SELECT c.cohort,
        |  CAST(date_diff('day', c.cohort, e.wk) / 7 AS BIGINT) AS week_n,
        |  CAST(CAST(sum(e.v) AS DECIMAL(20,2)) AS DOUBLE) AS revenue,
        |  count(DISTINCT e.user_id) AS active_users
        |FROM e JOIN c ON c.user_id = e.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_bursts" ->
      """WITH h AS (SELECT date_trunc('hour', ts) AS hr, count(*) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS DECIMAL(38,0)) AS nh,
        |  CAST(sum(n) AS DECIMAL(38,0)) AS s,
        |  CAST(sum(n*n) AS DECIMAL(38,0)) AS sq FROM h)
        |SELECT hr, n,
        |  CAST(nh*n - s AS DOUBLE) / sqrt(CAST(nh*sq - s*s AS DOUBLE)) AS z
        |FROM h CROSS JOIN m
        |WHERE nh*n - s > 0 AND (nh*n - s)*(nh*n - s) > 9*(nh*sq - s*s)
        |ORDER BY hr""".stripMargin,
    "ev_anomaly_seasonal" ->
      """WITH hc AS (SELECT CAST(ts AS DATE) AS day,
        |  CAST(hour(ts) AS BIGINT) AS hod, CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT hod, n, row_number() OVER (PARTITION BY hod
        |    ORDER BY n) AS rn,
        |  count(*) OVER (PARTITION BY hod) AS cnt FROM hc),
        |c AS (SELECT hod, n AS center FROM r
        |  WHERE rn = greatest(1, (50*cnt + 99)//100)),
        |d AS (SELECT hc.hod, c.center, abs(hc.n - c.center) AS devn
        |  FROM hc JOIN c ON c.hod = hc.hod),
        |r2 AS (SELECT hod, devn, row_number() OVER (PARTITION BY hod
        |    ORDER BY devn) AS rn,
        |  count(*) OVER (PARTITION BY hod) AS cnt FROM d),
        |m AS (SELECT hod, devn AS mad FROM r2
        |  WHERE rn = greatest(1, (50*cnt + 99)//100))
        |SELECT d.hod, d.center, m.mad, count(*) AS n_cells,
        |  CAST(sum(CASE WHEN d.devn > 3*m.mad THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_anomalies
        |FROM d JOIN m ON m.hod = d.hod
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    "ev_seasonal_hour" ->
      """WITH hc AS (SELECT CAST(ts AS DATE) AS day, hour(ts) AS hod,
        |  count(*) AS n FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |b AS (SELECT hod, count(*) AS hod_cells,
        |  CAST(sum(n) AS BIGINT) AS hod_total FROM hc GROUP BY 1)
        |SELECT day, hod, n, hod_cells, hod_total,
        |  n * hod_cells > 2 * hod_total AS is_peak
        |FROM hc JOIN b USING (hod) ORDER BY day, hod""".stripMargin,
    "ev_ab_srm" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |g AS (SELECT CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0
        |    END) AS BIGINT) AS n_a,
        |  CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_b FROM u)
        |SELECT n_a, n_b,
        |  25 * (n_a - n_b) * (n_a - n_b) > 96 * (n_a + n_b)
        |    AS srm_detected
        |FROM g""".stripMargin,
    "ev_adoption_curve" ->
      """WITH f AS (SELECT event_type, user_id,
        |  min(CAST(ts AS DATE)) AS first_day
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |d AS (SELECT event_type, first_day AS day,
        |  CAST(count(*) AS BIGINT) AS n_new FROM f GROUP BY 1, 2)
        |SELECT event_type, day, n_new,
        |  CAST(sum(n_new) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_adopted
        |FROM d ORDER BY event_type, day""".stripMargin,
    "ev_ab_test" ->
      """WITH fp AS (SELECT user_id, value, row_number() OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events WHERE event_type='purchase'),
        |fv AS (SELECT user_id, value AS fv FROM fp WHERE rn = 1),
        |u AS (SELECT DISTINCT user_id FROM events),
        |conv AS (SELECT u.user_id % 2 AS grp,
        |  CASE WHEN fv.fv >= 50 THEN 1 ELSE 0 END AS c
        |  FROM u LEFT JOIN fv ON fv.user_id = u.user_id),
        |m AS (SELECT
        |  CAST(sum(CASE WHEN grp=0 THEN 1 ELSE 0 END) AS DECIMAL(38,0)) AS n_a,
        |  CAST(sum(CASE WHEN grp=0 THEN c ELSE 0 END) AS DECIMAL(38,0)) AS x_a,
        |  CAST(sum(CASE WHEN grp=1 THEN 1 ELSE 0 END) AS DECIMAL(38,0)) AS n_b,
        |  CAST(sum(CASE WHEN grp=1 THEN c ELSE 0 END) AS DECIMAL(38,0)) AS x_b
        |  FROM conv)
        |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(x_a AS BIGINT) AS x_a,
        |  CAST(n_b AS BIGINT) AS n_b, CAST(x_b AS BIGINT) AS x_b,
        |  CASE WHEN n_a*n_b*(x_a+x_b)*((n_a+n_b)-(x_a+x_b)) > 0 THEN
        |    CAST(x_a*n_b - x_b*n_a AS DOUBLE) * sqrt(CAST(n_a+n_b AS DOUBLE))
        |    / sqrt(CAST(n_a*n_b*(x_a+x_b)*((n_a+n_b)-(x_a+x_b)) AS DOUBLE))
        |  END AS z,
        |  625*(x_a*n_b - x_b*n_a)*(x_a*n_b - x_b*n_a)*(n_a+n_b)
        |    > 2401*n_a*n_b*(x_a+x_b)*((n_a+n_b)-(x_a+x_b)) AS significant
        |FROM m""".stripMargin,
    "ev_funnel_latency" ->
      """WITH per AS (SELECT user_id,
        |  min(CASE WHEN event_type='view' THEN ts END) AS tv,
        |  min(CASE WHEN event_type='purchase' THEN ts END) AS tp
        |  FROM events GROUP BY 1),
        |l AS (SELECT epoch_us(tp) - epoch_us(tv) AS lat FROM per
        |  WHERE tv IS NOT NULL AND tp IS NOT NULL AND tv < tp),
        |r AS (SELECT lat, row_number() OVER (ORDER BY lat) AS rn,
        |  count(*) OVER () AS n FROM l),
        |p AS (SELECT unnest([50, 90, 99]) AS pct)
        |SELECT CAST(pct AS BIGINT) AS pct, lat AS value
        |FROM r CROSS JOIN p WHERE rn = greatest(1, (pct*n + 99)//100)
        |ORDER BY 1""".stripMargin,
    "ev_value_bands" ->
      """WITH s AS (SELECT event_type, hour(ts) AS hod,
        |  CAST(CAST(value AS DECIMAL(12,2))*100 AS BIGINT) AS v
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |r AS (SELECT event_type, hod, v,
        |  row_number() OVER (PARTITION BY event_type, hod ORDER BY v)
        |    AS rn,
        |  count(*) OVER (PARTITION BY event_type, hod) AS n FROM s),
        |p AS (SELECT unnest([50, 90, 99]) AS pct)
        |SELECT event_type, hod, CAST(pct AS BIGINT) AS pct,
        |  CAST(v AS DOUBLE)/100.0 AS value
        |FROM r CROSS JOIN p
        |WHERE rn = greatest(1, (pct*n + 99) // 100)
        |ORDER BY 1, 2, 3""".stripMargin,
    "ev_twa" ->
      """WITH o AS (SELECT event_type,
        |  CAST(CAST(value AS DECIMAL(12,2))*100 AS BIGINT) AS vc,
        |  epoch_us(ts) AS t,
        |  lead(epoch_us(ts)) OVER (PARTITION BY event_type
        |    ORDER BY ts, event_id) AS nt
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL)
        |SELECT event_type,
        |  CAST(CAST(sum(CAST(vc*(nt-t) AS DECIMAL(38,0))) AS DECIMAL(38,0))
        |    AS DOUBLE)
        |  / (100.0 * CAST(CAST(sum(nt-t) AS BIGINT) AS DOUBLE)) AS twa
        |FROM o WHERE nt IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_trigrams" ->
      """WITH nx AS (SELECT event_type AS step1,
        |  lead(event_type, 1) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS step2,
        |  lead(event_type, 2) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS step3
        |  FROM events)
        |SELECT step1, step2, step3, count(*) AS n FROM nx
        |WHERE step2 IS NOT NULL AND step3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, step1, step2, step3 LIMIT 15""".stripMargin,
    "ev_concurrency" ->
      """WITH b AS (SELECT ts AS t, 1 AS d FROM events WHERE ts IS NOT NULL
        |  UNION ALL
        |  SELECT ts + INTERVAL 30 MINUTE, -1 FROM events
        |  WHERE ts IS NOT NULL),
        |sp AS (SELECT unnest(generate_series(
        |    date_trunc('hour', (SELECT min(t) FROM b)),
        |    date_trunc('hour', (SELECT max(t) FROM b)),
        |    INTERVAL 1 HOUR)) AS t, 0 AS d),
        |u AS (SELECT * FROM b UNION ALL SELECT * FROM sp),
        |r AS (SELECT t, sum(d) OVER (ORDER BY t, d
        |  ROWS UNBOUNDED PRECEDING) AS c FROM u)
        |SELECT date_trunc('hour', t) AS hr,
        |  CAST(max(c) AS BIGINT) AS max_concurrent
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_transitions" ->
      """WITH nx AS (SELECT event_type,
        |  lead(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS next_type
        |  FROM events)
        |SELECT event_type, next_type, count(*) AS n FROM nx
        |WHERE next_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_silent_users" ->
      """WITH h AS (SELECT max(epoch_us(ts)) - 30*60*1000000 AS cutoff
        |  FROM events)
        |SELECT user_id, max(epoch_us(ts)) AS last_us
        |FROM events, h GROUP BY user_id, cutoff
        |HAVING max(epoch_us(ts)) < cutoff ORDER BY user_id""".stripMargin,
    "ev_rollup_cascade" ->
      """SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |count(*) AS n,
        |CAST(sum(CAST(value AS DECIMAL(20,2))) * 100 AS BIGINT) AS v_cents
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_gapfill" ->
      """WITH sp AS (SELECT date_trunc('hour', min(ts)) AS lo,
        |  date_trunc('hour', max(ts)) AS hi FROM events),
        |grid AS (SELECT event_type,
        |  unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        |  FROM (SELECT DISTINCT event_type FROM events), sp),
        |sparse AS (SELECT event_type, date_trunc('hour', ts) AS bucket,
        |  count(*) AS n FROM events GROUP BY 1, 2)
        |SELECT g.event_type, g.bucket, coalesce(s.n, 0) AS n
        |FROM grid g LEFT JOIN sparse s
        |  ON g.event_type = s.event_type AND g.bucket = s.bucket
        |ORDER BY 1, 2""".stripMargin,
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
    "ev_variant_props" ->
      """WITH p AS (SELECT event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS k_sum,
        |  min(k) AS k_min, max(k) AS k_max
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_variant_stream" ->
      """WITH p AS (SELECT date_trunc('hour', ts) AS ws, event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT ws, event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS k_sum
        |FROM p GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "ev_retention" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |  CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort FROM a GROUP BY 1)
        |SELECT cohort, CAST(date_diff('day', cohort, wk)/7 AS BIGINT) AS week_n,
        |count(*) AS active_users
        |FROM a JOIN c USING (user_id) GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "ev_session_paths" ->
      """WITH e AS (SELECT user_id, ts, event_id, event_type
        |  FROM events WHERE ts IS NOT NULL),
        |f AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
        |    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTES
        |    THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts, event_id)),
        |g AS (SELECT *, sum(ns) OVER (PARTITION BY user_id
        |  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM f),
        |p AS (SELECT user_id, sid,
        |  string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM g GROUP BY 1, 2)
        |SELECT path, count(*) AS n FROM p GROUP BY 1
        |ORDER BY n DESC, path LIMIT 15""".stripMargin,
    "ev_mttr" ->
      """WITH e AS (SELECT user_id, ts, event_id, event_type FROM events
        |  WHERE ts IS NOT NULL),
        |f AS (SELECT *, min(CASE WHEN event_type <> 'error' THEN ts END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |    AS nxt_ok
        |  FROM e),
        |er AS (SELECT * FROM f WHERE event_type = 'error'),
        |g AS (SELECT CAST(epoch_us(nxt_ok) - epoch_us(ts) AS BIGINT)
        |    AS gap_us FROM er WHERE nxt_ok IS NOT NULL),
        |t AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM er)
        |    AS n_errors,
        |  (SELECT CAST(count(*) AS BIGINT) FROM g) AS n_recovered),
        |r AS (SELECT gap_us, row_number() OVER (ORDER BY gap_us) AS rn,
        |  count(*) OVER () AS cnt FROM g),
        |sel AS (SELECT CAST(50 AS BIGINT) AS pct, gap_us FROM r
        |  WHERE rn = greatest(1, (50*cnt + 99)//100)
        |UNION ALL SELECT CAST(90 AS BIGINT), gap_us FROM r
        |  WHERE rn = greatest(1, (90*cnt + 99)//100))
        |SELECT sel.pct, t.n_errors, t.n_recovered, sel.gap_us
        |FROM sel, t ORDER BY pct""".stripMargin,
    "ev_window_funnel" ->
      """WITH e AS (SELECT user_id, ts, event_type FROM events
        |  WHERE ts IS NOT NULL),
        |t1 AS (SELECT user_id, min(ts) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (SELECT e.user_id, t1.t1, min(e.ts) AS t2
        |  FROM e JOIN t1 ON e.user_id = t1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > t1.t1
        |    AND e.ts <= t1.t1 + INTERVAL 24 HOURS
        |  GROUP BY 1, 2),
        |t3 AS (SELECT e.user_id, min(e.ts) AS t3
        |  FROM e JOIN t2 ON e.user_id = t2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > t2.t2
        |    AND e.ts <= t2.t1 + INTERVAL 24 HOURS
        |  GROUP BY 1),
        |u AS (SELECT DISTINCT user_id FROM e),
        |lv AS (SELECT u.user_id,
        |  CASE WHEN t3.user_id IS NOT NULL THEN 3
        |    WHEN t2.user_id IS NOT NULL THEN 2
        |    WHEN t1.user_id IS NOT NULL THEN 1 ELSE 0 END AS level
        |  FROM u LEFT JOIN t1 ON u.user_id = t1.user_id
        |  LEFT JOIN t2 ON u.user_id = t2.user_id
        |  LEFT JOIN t3 ON u.user_id = t3.user_id)
        |SELECT CAST(level AS BIGINT) AS level,
        |  count(*) AS n_users
        |FROM lv GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_path_conversion" ->
      """WITH e AS (SELECT user_id, ts, event_id, event_type
        |  FROM events WHERE ts IS NOT NULL),
        |f AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
        |    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTES
        |    THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts, event_id)),
        |g AS (SELECT *, sum(ns) OVER (PARTITION BY user_id
        |  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM f),
        |p AS (SELECT user_id, sid,
        |  string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
        |  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    AS conv
        |  FROM g GROUP BY 1, 2),
        |t AS (SELECT path, CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(conv) AS BIGINT) AS n_converted
        |  FROM p GROUP BY 1
        |  ORDER BY n_sessions DESC, path LIMIT 15)
        |SELECT path, n_sessions, n_converted,
        |  (1000 * n_converted) // n_sessions AS conv_permille
        |FROM t ORDER BY n_sessions DESC, path""".stripMargin,
    "ev_load_error_corr" ->
      """WITH h AS (SELECT date_trunc('hour', ts) AS hr,
        |  CAST(count(*) AS BIGINT) AS x,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS y
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
        |  CAST(sum(x) AS DECIMAL(38,0)) AS sx,
        |  CAST(sum(y) AS DECIMAL(38,0)) AS sy,
        |  CAST(sum(x*y) AS DECIMAL(38,0)) AS sxy,
        |  CAST(sum(x*x) AS DECIMAL(38,0)) AS sxx,
        |  CAST(sum(y*y) AS DECIMAL(38,0)) AS syy FROM h)
        |SELECT CAST(n AS BIGINT) AS n_hours,
        |  CAST(sx AS BIGINT) AS total_events,
        |  CAST(sy AS BIGINT) AS total_errors,
        |  CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0 THEN
        |    CAST(n*sxy - sx*sy AS DOUBLE) /
        |      (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) *
        |       sqrt(CAST(n*syy - sy*sy AS DOUBLE))) END AS r,
        |  CASE WHEN n*sxx - sx*sx > 0 THEN
        |    CAST(n*sxy - sx*sy AS DOUBLE) /
        |      CAST(n*sxx - sx*sx AS DOUBLE) END AS slope
        |FROM m""".stripMargin,
    "ev_bounce_rate" ->
      """WITH e AS (SELECT user_id, ts, event_id
        |  FROM events WHERE ts IS NOT NULL),
        |f AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
        |    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTES
        |    THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts, event_id)),
        |g AS (SELECT user_id,
        |  sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM f),
        |p AS (SELECT user_id, sid, count(*) AS n_ev FROM g
        |  GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions,
        |  count(*) FILTER (WHERE n_ev = 1) AS n_bounce,
        |  CAST(count(*) FILTER (WHERE n_ev = 1) AS DOUBLE) / count(*)
        |    AS bounce_rate
        |FROM p GROUP BY 1 ORDER BY user_id""".stripMargin,
    "ev_attrib_linear" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, ts AS pt
        |  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL),
        |t AS (SELECT user_id AS t_user, ts AS tt, event_type AS ch
        |  FROM events WHERE event_type IN ('view', 'click')
        |    AND ts IS NOT NULL),
        |j AS (SELECT p.p_id, t.ch FROM p LEFT JOIN t
        |  ON p.user_id = t.t_user AND t.tt <= p.pt
        |    AND t.tt >= p.pt - INTERVAL 24 HOURS),
        |a AS (SELECT p_id, count(ch) AS n_touch,
        |  count(*) FILTER (WHERE ch = 'view') AS n_view,
        |  count(*) FILTER (WHERE ch = 'click') AS n_click
        |  FROM j GROUP BY 1)
        |SELECT p_id, n_touch, n_view, n_click,
        |  CASE WHEN n_touch > 0
        |    THEN CAST(n_view AS DOUBLE) / n_touch END AS view_credit,
        |  CASE WHEN n_touch > 0
        |    THEN CAST(n_click AS DOUBLE) / n_touch END AS click_credit
        |FROM a ORDER BY p_id""".stripMargin,
    "ev_cusum_shift" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total,
        |  count(*) AS nd FROM daily),
        |r AS (SELECT day, n,
        |  CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS k,
        |  CAST(sum(n) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS prefix
        |  FROM daily)
        |SELECT day, n, prefix, nd*prefix - k*total AS dev,
        |  abs(nd*prefix - k*total) * 10 > nd * total AS shift_flag
        |FROM r, t ORDER BY day""".stripMargin,
    "ev_rfm" ->
      """WITH p AS (SELECT user_id, CAST(max(ts) AS DATE) AS last_d,
        |  count(*) AS freq,
        |  CAST(sum(CAST(value AS DECIMAL(20,2))) * 100 AS BIGINT)
        |    AS m_cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |mx AS (SELECT CAST(max(ts) AS DATE) AS mxd FROM events
        |  WHERE event_type = 'purchase'),
        |f AS (SELECT user_id,
        |  CAST(date_diff('day', last_d, mxd) AS BIGINT) AS recency_days,
        |  freq, m_cents,
        |  CASE WHEN date_diff('day', last_d, mxd) <= 1 THEN 3
        |    WHEN date_diff('day', last_d, mxd) <= 4 THEN 2
        |    ELSE 1 END AS r_score,
        |  CASE WHEN freq >= 15 THEN 3 WHEN freq >= 10 THEN 2
        |    ELSE 1 END AS f_score,
        |  CASE WHEN m_cents >= 75000 THEN 3 WHEN m_cents >= 50000
        |    THEN 2 ELSE 1 END AS m_score
        |  FROM p, mx)
        |SELECT user_id, recency_days, freq, m_cents,
        |  CAST(r_score AS BIGINT) AS r_score,
        |  CAST(f_score AS BIGINT) AS f_score,
        |  CAST(m_score AS BIGINT) AS m_score,
        |  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) ||
        |    CAST(m_score AS VARCHAR) AS segment
        |FROM f ORDER BY user_id""".stripMargin,
    "ev_dau_wau" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |  FROM events WHERE ts IS NOT NULL),
        |b AS (SELECT max(day) AS hi FROM ud),
        |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ud
        |  GROUP BY 1),
        |fan AS (SELECT user_id, day + CAST(k AS INT) AS day
        |  FROM ud, unnest(range(0, 7)) AS t(k)),
        |wau AS (SELECT day, count(DISTINCT user_id) AS wau
        |  FROM fan, b WHERE day <= hi GROUP BY 1)
        |SELECT day, dau, wau, CAST(dau AS DOUBLE) / wau AS stickiness
        |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin,
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
        |FROM u""".stripMargin,
    "ev_asof_view" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id, ts
        |  FROM events WHERE event_type='purchase'),
        |v AS (SELECT user_id, ts, max(event_id) AS view_id
        |  FROM events WHERE event_type='view' GROUP BY 1,2)
        |SELECT p.purchase_id, p.user_id, v.view_id,
        |  date_diff('microsecond', v.ts, p.ts) AS gap_us
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY purchase_id""".stripMargin,
    "ev_asof_native" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id, ts
        |  FROM events WHERE event_type='purchase'),
        |v AS (SELECT user_id, ts, max(event_id) AS view_id
        |  FROM events WHERE event_type='view' GROUP BY 1,2)
        |SELECT p.purchase_id, p.user_id, v.view_id,
        |  date_diff('microsecond', v.ts, p.ts) AS gap_us
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY purchase_id""".stripMargin,
    "ev_asof_tolerance" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id, ts
        |  FROM events WHERE event_type='purchase'),
        |v AS (SELECT user_id, ts, max(event_id) AS view_id
        |  FROM events WHERE event_type='view' GROUP BY 1,2),
        |j AS (SELECT p.purchase_id, p.user_id, v.view_id,
        |  date_diff('microsecond', v.ts, p.ts) AS gap_us
        |  FROM p ASOF LEFT JOIN v
        |    ON p.user_id = v.user_id AND p.ts >= v.ts)
        |SELECT purchase_id, user_id,
        |  CASE WHEN gap_us <= 600000000 THEN view_id END AS view_id,
        |  CASE WHEN gap_us <= 600000000 THEN gap_us END AS gap_us
        |FROM j ORDER BY purchase_id""".stripMargin,
    "ev_attribution" ->
      """WITH v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
        |  FROM events WHERE event_type='view'),
        |c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
        |  FROM events WHERE event_type='click')
        |SELECT v.user_id, v.view_id, c.click_id,
        |  date_diff('microsecond', v.view_ts, c.click_ts) AS gap_us
        |FROM v JOIN c ON v.user_id = c.user_id
        |  AND c.click_ts >= v.view_ts
        |  AND c.click_ts < v.view_ts + INTERVAL 30 MINUTE
        |ORDER BY view_id, click_id""".stripMargin,
    "ev_attribution_outer" ->
      """WITH v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
        |  FROM events WHERE event_type='view'),
        |c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
        |  FROM events WHERE event_type='click')
        |SELECT v.user_id, v.view_id, c.click_id,
        |  date_diff('microsecond', v.view_ts, c.click_ts) AS gap_us
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |  AND c.click_ts >= v.view_ts
        |  AND c.click_ts < v.view_ts + INTERVAL 30 MINUTE
        |ORDER BY view_id, click_id NULLS FIRST""".stripMargin,
    "ev_rolling_1h" ->
      """SELECT event_id, count(*) OVER w AS n_1h,
        |  CAST(sum(CAST(value AS DECIMAL(20,2))) OVER w AS DOUBLE)
        |    / (count(*) OVER w) AS avg_1h
        |FROM (SELECT *, epoch_us(ts) AS us FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "ev_zscore" ->
      """WITH st AS (SELECT event_type,
        |  sum(CAST(value AS DECIMAL(20,2))) AS s,
        |  sum(CAST(value AS DECIMAL(20,2))*CAST(value AS DECIMAL(20,2))) AS sq,
        |  count(*) AS n FROM events GROUP BY 1),
        |m AS (SELECT event_type, CAST(s AS DOUBLE)/n AS mean,
        |  CAST(sq AS DOUBLE)/n - (CAST(s AS DOUBLE)/n)*(CAST(s AS DOUBLE)/n) AS vr
        |  FROM st)
        |SELECT e.event_id, (e.value - m.mean)/sqrt(m.vr) AS z
        |FROM events e JOIN m USING (event_type)
        |ORDER BY e.event_id""".stripMargin,
    "ev_range_campaign" ->
      """WITH c AS (SELECT r_regionkey AS seg,
        |  TIMESTAMP '2024-01-01' + INTERVAL (r_regionkey*5) DAY AS c_start,
        |  TIMESTAMP '2024-01-01' + INTERVAL (r_regionkey*5+7) DAY AS c_end
        |  FROM region),
        |e AS (SELECT ts, value, user_id % 5 AS seg FROM events)
        |SELECT seg, count(*) AS n_events,
        |  round(sum(value),4)/count(*) AS avg_value
        |FROM e JOIN c USING (seg)
        |WHERE ts >= c_start AND ts < c_end
        |GROUP BY seg ORDER BY seg""".stripMargin,
    "ev_markov_next" ->
      """WITH p AS (SELECT ts, event_type,
        |  lead(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS next_type,
        |  lead(ts) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS next_ts
        |  FROM events WHERE ts IS NOT NULL),
        |pp AS (SELECT * FROM p WHERE next_type IS NOT NULL),
        |tr AS (SELECT event_type, next_type, count(*) AS n FROM pp
        |  WHERE next_ts < TIMESTAMP '2024-01-21 00:00:00'
        |  GROUP BY 1, 2),
        |md AS (SELECT event_type, next_type AS predicted FROM
        |  (SELECT event_type, next_type, row_number() OVER (
        |     PARTITION BY event_type ORDER BY n DESC, next_type) AS rn
        |   FROM tr) WHERE rn = 1)
        |SELECT pp.event_type, md.predicted,
        |  CAST(count(*) AS BIGINT) AS n_eval,
        |  CAST(sum(CASE WHEN pp.next_type = md.predicted
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
        |  CAST(sum(CASE WHEN pp.next_type = md.predicted
        |    THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    AS accuracy
        |FROM pp LEFT JOIN md ON pp.event_type = md.event_type
        |WHERE pp.ts >= TIMESTAMP '2024-01-21 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "ev_ewma" -> {
      val terms = (0 to 7).map { i =>
        val wt = 1L << (7 - i)
        val c = if (i == 0) "n" else s"lag(n, $i) OVER w"
        (s"CASE WHEN $c IS NOT NULL THEN $c * $wt ELSE 0 END",
         s"CASE WHEN $c IS NOT NULL THEN $wt ELSE 0 END")
      }
      val num = terms.map(_._1).mkString(" + ")
      val den = terms.map(_._2).mkString(" + ")
      s"""WITH g AS (SELECT event_type, CAST(ts AS DATE) AS day,
         |  CAST(count(*) AS BIGINT) AS n FROM events
         |  WHERE ts IS NOT NULL GROUP BY 1, 2)
         |SELECT event_type, day, n,
         |  CAST($num AS DOUBLE) / CAST($den AS DOUBLE) AS ewma
         |FROM g WINDOW w AS (PARTITION BY event_type ORDER BY day)
         |ORDER BY event_type, day""".stripMargin
    },
    "ev_audience_overlap" ->
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
        |sz AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM tu GROUP BY 1),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  CAST(count(*) AS BIGINT) AS n_both
        |  FROM tu a JOIN tu b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT p.type_a, p.type_b, sa.n AS n_a, sb.n AS n_b, p.n_both,
        |  CAST(p.n_both AS DOUBLE)
        |    / CAST(sa.n + sb.n - p.n_both AS DOUBLE) AS jaccard,
        |  CAST(p.n_both AS DOUBLE)
        |    / CAST(least(sa.n, sb.n) AS DOUBLE) AS overlap
        |FROM p JOIN sz sa ON p.type_a = sa.event_type
        |JOIN sz sb ON p.type_b = sb.event_type
        |ORDER BY 1, 2""".stripMargin,
    "ev_growth_accounting" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |  CAST(date_trunc('week', ts) AS DATE) AS wk
        |  FROM events WHERE ts IS NOT NULL),
        |lg AS (SELECT user_id, wk,
        |  lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev,
        |  lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS nxt
        |  FROM uw),
        |act AS (SELECT wk,
        |  CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_new,
        |  CAST(sum(CASE WHEN date_diff('day', prev, wk) = 7
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |  CAST(sum(CASE WHEN prev IS NOT NULL
        |      AND date_diff('day', prev, wk) > 7
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        |  FROM lg GROUP BY 1),
        |mx AS (SELECT max(wk) AS m FROM uw),
        |ch AS (SELECT wk + 7 AS wk, CAST(count(*) AS BIGINT)
        |    AS n_churned
        |  FROM lg, mx
        |  WHERE (nxt IS NULL OR date_diff('day', wk, nxt) > 7)
        |    AND wk + 7 <= m
        |  GROUP BY 1)
        |SELECT coalesce(act.wk, ch.wk) AS wk,
        |  coalesce(n_new, 0) AS n_new,
        |  coalesce(n_retained, 0) AS n_retained,
        |  coalesce(n_resurrected, 0) AS n_resurrected,
        |  coalesce(n_churned, 0) AS n_churned
        |FROM act FULL JOIN ch ON act.wk = ch.wk ORDER BY 1""".stripMargin,
    "ev_anomaly_iqr" ->
      """WITH g AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |  CAST(count(*) AS BIGINT) AS n FROM events
        |  WHERE ts IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT event_type, n,
        |  row_number() OVER (PARTITION BY event_type ORDER BY n) AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS cnt FROM g),
        |q AS (SELECT event_type,
        |  min(CASE WHEN rn = greatest(1, (25*cnt+99)//100) THEN n END)
        |    AS q1,
        |  min(CASE WHEN rn = greatest(1, (75*cnt+99)//100) THEN n END)
        |    AS q3
        |  FROM r GROUP BY 1)
        |SELECT g.event_type, g.day, g.n, q.q1, q.q3,
        |  (2*g.n < 2*q.q1 - 3*(q.q3 - q.q1)
        |   OR 2*g.n > 2*q.q3 + 3*(q.q3 - q.q1)) AS is_outlier
        |FROM g JOIN q USING (event_type) ORDER BY 1, 2""".stripMargin,
    "ev_attrib_decay" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, ts AS pt
        |  FROM events WHERE ts IS NOT NULL AND event_type = 'purchase'),
        |t AS (SELECT user_id AS t_user, ts AS tt, event_type AS ch
        |  FROM events WHERE ts IS NOT NULL
        |    AND event_type IN ('view', 'click')),
        |j AS (SELECT p.p_id, t.ch,
        |  CAST(1 AS BIGINT) << CAST(23 -
        |    (epoch_us(p.pt) - epoch_us(t.tt)) // 3600000000 AS INT)
        |    AS w
        |  FROM p LEFT JOIN t ON p.user_id = t.t_user
        |    AND t.tt <= p.pt AND t.tt > p.pt - INTERVAL 24 HOURS)
        |SELECT p_id, count(ch) AS n_touch,
        |  CAST(sum(CASE WHEN ch = 'view' THEN w ELSE 0 END) AS BIGINT)
        |    AS w_view,
        |  CAST(sum(CASE WHEN ch = 'click' THEN w ELSE 0 END) AS BIGINT)
        |    AS w_click,
        |  CASE WHEN count(ch) > 0 THEN
        |    CAST(sum(CASE WHEN ch = 'view' THEN w ELSE 0 END) AS DOUBLE)
        |      / CAST(sum(w) AS DOUBLE) END AS view_credit,
        |  CASE WHEN count(ch) > 0 THEN
        |    CAST(sum(CASE WHEN ch = 'click' THEN w ELSE 0 END) AS DOUBLE)
        |      / CAST(sum(w) AS DOUBLE) END AS click_credit
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_lag_correlation" ->
      """WITH g AS (SELECT CAST(ts AS DATE) AS day, event_type,
        |  CAST(count(*) AS BIGINT) AS n FROM events
        |  WHERE ts IS NOT NULL GROUP BY 1, 2),
        |x AS (SELECT day, n AS x FROM g WHERE event_type = 'error'),
        |y AS (SELECT day AS yday, n AS y FROM g
        |  WHERE event_type = 'purchase'),
        |l AS (SELECT unnest([-3,-2,-1,0,1,2,3]) AS lag),
        |m AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_days,
        |  sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |  sum(CAST(x AS HUGEINT)*x) AS sxx,
        |  sum(CAST(y AS HUGEINT)*y) AS syy,
        |  sum(CAST(x AS HUGEINT)*y) AS sxy
        |  FROM x CROSS JOIN l JOIN y ON yday = x.day + lag
        |  GROUP BY 1)
        |SELECT CAST(lag AS INT) AS lag, n_days,
        |  CASE WHEN CAST(n_days*sxx - sx*sx AS DOUBLE) > 0
        |        AND CAST(n_days*syy - sy*sy AS DOUBLE) > 0
        |    THEN round(CAST(n_days*sxy - sx*sy AS DOUBLE)
        |      / sqrt(CAST(n_days*sxx - sx*sx AS DOUBLE)
        |           * CAST(n_days*syy - sy*sy AS DOUBLE)), 12)
        |  END AS r
        |FROM m ORDER BY 1""".stripMargin,
    "ev_error_pchart" ->
      """WITH g AS (SELECT CAST(ts AS DATE) AS day,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS e
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |  CAST(sum(e) AS BIGINT) AS ee FROM g)
        |SELECT day, n, e,
        |  CAST(e AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
        |  CAST(ee AS DOUBLE) / CAST(nn AS DOUBLE) AS rate_bar,
        |  (CAST(e AS HUGEINT)*nn - CAST(ee AS HUGEINT)*n)
        |    * (CAST(e AS HUGEINT)*nn - CAST(ee AS HUGEINT)*n)
        |    > 9 * CAST(ee AS HUGEINT) * (nn - ee) * n AS out_of_control
        |FROM g, t ORDER BY day""".stripMargin,
    "ev_new_vs_returning" ->
      """WITH e AS (SELECT user_id, ts, event_type, value FROM events
        |  WHERE ts IS NOT NULL),
        |fd AS (SELECT user_id, min(CAST(ts AS DATE)) AS first_day
        |  FROM e GROUP BY 1),
        |p AS (SELECT e.user_id, CAST(e.ts AS DATE) AS day,
        |  CAST(CAST(e.value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
        |  fd.first_day
        |  FROM e JOIN fd ON e.user_id = fd.user_id
        |  WHERE e.event_type = 'purchase')
        |SELECT day, CAST(count(*) AS BIGINT) AS n_purchases,
        |  CAST(sum(CASE WHEN day = first_day THEN cents ELSE 0 END)
        |    AS DOUBLE) / 100.0 AS new_revenue,
        |  CAST(sum(CASE WHEN day <> first_day THEN cents ELSE 0 END)
        |    AS DOUBLE) / 100.0 AS returning_revenue
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_forecast_backtest" ->
      """WITH p AS (SELECT CAST(ts AS DATE) AS day,
        |  CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE ts IS NOT NULL AND event_type = 'purchase'
        |    AND value >= 0),
        |dly AS (SELECT day, CAST(sum(cents) AS BIGINT) AS cents
        |  FROM p GROUP BY 1),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM dly),
        |spine AS (SELECT CAST(unnest(generate_series(lo, hi,
        |  INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        |dense AS (SELECT s.day, coalesce(d.cents, 0) AS cents
        |  FROM spine s LEFT JOIN dly d ON s.day = d.day),
        |r AS (SELECT day, cents,
        |  row_number() OVER (ORDER BY day) AS rn,
        |  lag(cents, 7) OVER (ORDER BY day) AS naive7,
        |  (sum(cents) OVER (ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)) // 7 AS ma7
        |  FROM dense),
        |sc AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(abs(cents - naive7)) AS BIGINT) AS sae_naive,
        |  CAST(sum(abs(cents - ma7)) AS BIGINT) AS sae_ma
        |  FROM r WHERE rn > 7)
        |SELECT 'seasonal_naive' AS model, n_days,
        |  sae_naive AS sae_cents, sae_naive // n_days AS mae_cents
        |  FROM sc
        |UNION ALL
        |SELECT 'trailing_mean_7', n_days, sae_ma, sae_ma // n_days
        |  FROM sc
        |ORDER BY model""".stripMargin,
    "ev_power_curve" ->
      """WITH mx AS (SELECT CAST(max(ts) AS DATE) AS mxd FROM events
        |  WHERE ts IS NOT NULL),
        |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |  FROM events, mx
        |  WHERE ts IS NOT NULL AND CAST(ts AS DATE) >= mxd - 6),
        |u AS (SELECT user_id, count(*) AS days_active FROM a GROUP BY 1),
        |h AS (SELECT CAST(days_active AS BIGINT) AS days_active,
        |  CAST(count(*) AS BIGINT) AS n_users FROM u GROUP BY 1)
        |SELECT days_active, n_users,
        |  (1000 * n_users) // CAST(sum(n_users) OVER () AS BIGINT)
        |    AS pct_permille
        |FROM h ORDER BY 1""".stripMargin,
    "ev_interarrival_median" ->
      """WITH g AS (SELECT event_type,
        |  epoch_us(lead(ts) OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts, event_id)) - epoch_us(ts) AS gap_us
        |  FROM events WHERE ts IS NOT NULL),
        |gg AS (SELECT event_type, CAST(gap_us AS BIGINT) AS gap_us
        |  FROM g WHERE gap_us IS NOT NULL),
        |r AS (SELECT event_type, gap_us,
        |  row_number() OVER (PARTITION BY event_type ORDER BY gap_us)
        |    AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS cnt FROM gg)
        |SELECT event_type,
        |  min(CASE WHEN rn = greatest(1, (50*cnt+99)//100)
        |    THEN gap_us END) AS p50_us,
        |  min(CASE WHEN rn = greatest(1, (90*cnt+99)//100)
        |    THEN gap_us END) AS p90_us,
        |  CAST(min(CASE WHEN rn = greatest(1, (50*cnt+99)//100)
        |    THEN gap_us END) AS DOUBLE) / 1000000.0 AS p50_sec
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_session_depth" ->
      """WITH e AS (SELECT user_id, ts, event_id
        |  FROM events WHERE ts IS NOT NULL),
        |f AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
        |    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTES
        |    THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts, event_id)),
        |g AS (SELECT *, sum(ns) OVER (PARTITION BY user_id
        |  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM f),
        |s AS (SELECT user_id, sid, CAST(count(*) AS BIGINT) AS depth
        |  FROM g GROUP BY 1, 2)
        |SELECT CAST(length(printf('%b', depth)) - 1 AS BIGINT)
        |    AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_sessions,
        |  min(depth) AS min_depth, max(depth) AS max_depth,
        |  CAST(sum(depth) AS BIGINT) AS n_events
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_attrib_first" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, ts AS pt
        |  FROM events WHERE ts IS NOT NULL AND event_type = 'purchase'),
        |t AS (SELECT user_id AS t_user, ts AS tt, event_id AS t_id,
        |  event_type AS ch FROM events
        |  WHERE ts IS NOT NULL AND event_type IN ('view', 'click')),
        |j AS (SELECT p.p_id, t.tt, t.t_id, t.ch
        |  FROM p JOIN t ON p.user_id = t.t_user
        |    AND t.tt <= p.pt AND t.tt >= p.pt - INTERVAL 24 HOURS),
        |f AS (SELECT p_id, ch, row_number() OVER (PARTITION BY p_id
        |  ORDER BY tt, t_id) AS rn FROM j)
        |SELECT ch AS first_channel,
        |  CAST(count(*) AS BIGINT) AS n_purchases
        |FROM f WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_cart_abandonment" ->
      """WITH v AS (SELECT event_id AS v_id, user_id, ts AS vt
        |  FROM events WHERE ts IS NOT NULL AND event_type = 'view'),
        |p AS (SELECT user_id AS p_user, ts AS pt FROM events
        |  WHERE ts IS NOT NULL AND event_type = 'purchase'),
        |c AS (SELECT DISTINCT v.v_id FROM v JOIN p
        |  ON v.user_id = p.p_user AND p.pt >= v.vt
        |    AND p.pt <= v.vt + INTERVAL 24 HOURS)
        |SELECT CAST(v.vt AS DATE) AS day,
        |  CAST(count(*) AS BIGINT) AS n_views,
        |  CAST(sum(CASE WHEN c.v_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_converted,
        |  CAST(count(*) - sum(CASE WHEN c.v_id IS NOT NULL
        |    THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    AS abandon_rate
        |FROM v LEFT JOIN c ON v.v_id = c.v_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_user_diversity" ->
      """WITH g AS (SELECT user_id, event_type,
        |  CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
        |  CAST(count(*) AS BIGINT) AS n_types,
        |  CAST(sum(c*c) AS BIGINT) AS sum_c2,
        |  1.0 - CAST(sum(c*c) AS DOUBLE)
        |    / CAST(sum(c) * sum(c) AS DOUBLE) AS diversity
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_apdex" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN value <= 50.0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_satisfied,
        |  CAST(sum(CASE WHEN value > 50.0 AND value <= 200.0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_tolerating,
        |  CAST(2 * sum(CASE WHEN value <= 50.0 THEN 1 ELSE 0 END)
        |    + sum(CASE WHEN value > 50.0 AND value <= 200.0
        |      THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(2 * count(*) AS DOUBLE) AS apdex
        |FROM events WHERE value IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_heatmap" ->
      """WITH g AS (SELECT
        |  CAST((epoch_us(ts) // 86400000000 + 3) % 7 AS BIGINT) AS dow,
        |  CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hod,
        |  CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM g)
        |SELECT dow, hod, n,
        |  CAST(n AS DOUBLE) / CAST(nt AS DOUBLE) AS share
        |FROM g, t ORDER BY dow, hod""".stripMargin,
    "ev_session_gap_sweep" ->
      """WITH e AS (SELECT user_id, ts, event_id FROM events
        |  WHERE ts IS NOT NULL),
        |o AS (SELECT epoch_us(ts) - epoch_us(lag(ts) OVER
        |  (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
        |  FROM e),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN gap_us IS NULL
        |    OR gap_us >= 15*60*CAST(1000000 AS BIGINT) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS s15,
        |  CAST(sum(CASE WHEN gap_us IS NULL
        |    OR gap_us >= 30*60*CAST(1000000 AS BIGINT) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS s30,
        |  CAST(sum(CASE WHEN gap_us IS NULL
        |    OR gap_us >= 60*60*CAST(1000000 AS BIGINT) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS s60 FROM o)
        |SELECT CAST(15 AS BIGINT) AS gap_minutes, s15 AS n_sessions,
        |  n_events, (1000 * n_events) // s15
        |    AS events_per_session_permille FROM a
        |UNION ALL SELECT 30, s30, n_events, (1000 * n_events) // s30
        |  FROM a
        |UNION ALL SELECT 60, s60, n_events, (1000 * n_events) // s60
        |  FROM a
        |ORDER BY gap_minutes""".stripMargin,
    "ev_attrib_window_sweep" ->
      """WITH e AS (SELECT user_id, ts, event_id, event_type FROM events
        |  WHERE ts IS NOT NULL),
        |f AS (SELECT *, max(CASE WHEN event_type IN ('view', 'click')
        |    THEN epoch_us(ts) END) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS touch_us
        |  FROM e),
        |p AS (SELECT epoch_us(ts) - touch_us AS gap_us FROM f
        |  WHERE event_type = 'purchase'),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_purchases,
        |  CAST(sum(CASE WHEN gap_us IS NOT NULL
        |    AND gap_us <= 1*3600*CAST(1000000 AS BIGINT) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS a1,
        |  CAST(sum(CASE WHEN gap_us IS NOT NULL
        |    AND gap_us <= 6*3600*CAST(1000000 AS BIGINT) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS a6,
        |  CAST(sum(CASE WHEN gap_us IS NOT NULL
        |    AND gap_us <= 24*3600*CAST(1000000 AS BIGINT) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS a24 FROM p)
        |SELECT CAST(1 AS BIGINT) AS window_hours, a1 AS n_attributed,
        |  n_purchases, (1000 * a1) // n_purchases AS attributed_permille
        |  FROM a
        |UNION ALL SELECT 6, a6, n_purchases, (1000 * a6) // n_purchases
        |  FROM a
        |UNION ALL SELECT 24, a24, n_purchases,
        |  (1000 * a24) // n_purchases FROM a
        |ORDER BY window_hours""".stripMargin,
    "ev_dwell_time" ->
      """WITH e AS (SELECT user_id, ts, event_id, event_type FROM events
        |  WHERE ts IS NOT NULL),
        |f AS (SELECT event_type, epoch_us(lead(ts) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id)) - epoch_us(ts)
        |    AS dwell_us
        |  FROM e),
        |g AS (SELECT event_type, dwell_us FROM f
        |  WHERE dwell_us IS NOT NULL
        |    AND dwell_us < 30*60*CAST(1000000 AS BIGINT)),
        |r AS (SELECT event_type, dwell_us,
        |  row_number() OVER (PARTITION BY event_type ORDER BY dwell_us)
        |    AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS n FROM g),
        |p AS (SELECT unnest([50, 90]) AS pct)
        |SELECT event_type, CAST(pct AS BIGINT) AS pct,
        |  dwell_us AS value
        |FROM r CROSS JOIN p WHERE rn = greatest(1, (pct*n + 99)//100)
        |ORDER BY 1, 2""".stripMargin,
    "ev_error_budget" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS day,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_errors
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |c AS (SELECT day, n_events, n_errors,
        |  CAST(sum(n_events) OVER (ORDER BY day
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_events,
        |  CAST(sum(n_errors) OVER (ORDER BY day
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_errors
        |  FROM d)
        |SELECT day, n_events, n_errors, cum_events, cum_errors,
        |  (1000 * 5 * cum_errors) // cum_events AS burn_permille,
        |  cum_errors * 5 > cum_events AS over_budget
        |FROM c ORDER BY day""".stripMargin
  )
}
