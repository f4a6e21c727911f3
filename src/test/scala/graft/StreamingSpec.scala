package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventPipeline

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double, props: String)

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  private val events = Seq(
    Ev(1, t(5), 1, "click", 1.0, """{"k": 1}"""),
    Ev(2, t(10), 1, "click", 2.0, """{"k": 2}"""),
    Ev(3, t(70), 1, "view", 3.0, """{"k": 3}"""),   // new hour, new session
    Ev(4, t(75), 2, "click", 4.0, """{"k": 4}"""),
    Ev(5, t(200), 2, "click", 5.0, """{"k": 5}""")) // gap > 30min

  test("windowedAgg over a real stream matches the batch run") {
    val input = MemoryStream[Ev](spark)
    val q = EventPipeline.windowedAgg(input.toDF())
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      input.addData(events)
      q.processAllAvailable()
      val streamed = spark.table("win_out")
        .select($"ws", $"event_type", $"cnt", $"avg_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      val batch = EventPipeline.windowedAgg(events.toDF())
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(streamed == batch)
      assert(batch.exists { case (ws, et, cnt, avg) =>
        ws == t(0) && et == "click" && cnt == 2 && avg == 1.5 })
    } finally q.stop()
  }

  test("variantHourlyAgg over a real stream matches the batch run") {
    val input = MemoryStream[Ev](spark)
    val q = EventPipeline.variantHourlyAgg(input.toDF())
      .writeStream.format("memory").queryName("variant_out")
      .outputMode("complete").start()
    try {
      input.addData(events)
      q.processAllAvailable()
      val streamed = spark.table("variant_out")
        .select($"ws", $"event_type", $"n", $"k_sum")
        .as[(Timestamp, String, Long, Long)].collect().toSet
      val batch = EventPipeline.variantHourlyAgg(events.toDF())
        .as[(Timestamp, String, Long, Long)].collect().toSet
      assert(streamed == batch)
      // hour 0 has clicks k=1,2; hour 1 has click k=4 and view k=3;
      // hour 3 has click k=5 — the variant extraction must type them
      // as bigints and the window must bucket by event-time hour.
      assert(batch == Set(
        (t(0), "click", 2L, 3L),
        (t(60), "click", 1L, 4L),
        (t(60), "view", 1L, 3L),
        (t(180), "click", 1L, 5L)))
    } finally q.stop()
  }

  test("variantHourlyAgg appends watermark-closed windows only") {
    // The COVERAGE claim for the VARIANT landing job — "watermark-
    // bounded state, append-mode emission as the watermark passes each
    // window" — exercised for real (ADVICE r8: it was asserted only in
    // prose): the same 1-hour watermark readEventStream applies, append
    // output, three micro-batches. A window may appear in the sink ONLY
    // after the watermark (max event time − 1 h, as of the PREVIOUS
    // batch) passes its end; open windows stay in state, unemitted.
    val input = MemoryStream[Ev](spark)
    val q = EventPipeline.variantHourlyAgg(
        input.toDF().withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("variant_append_out")
      .outputMode("append").start()
    try {
      // Batch 1: hours 0 and 1. Watermark after it: 01:15 − 1h = 00:15 —
      // nothing closed, nothing emitted.
      input.addData(events.take(4))
      q.processAllAvailable()
      assert(spark.table("variant_append_out").isEmpty)
      // Batch 2: hour 3 arrives (03:20). This batch still evaluates at
      // watermark 00:15; the NEXT one sees 02:20.
      input.addData(Seq(events(4)))
      q.processAllAvailable()
      // Batch 3: at watermark 02:20 the hour-0 and hour-1 windows are
      // past; they append. The hour-3 and hour-4 windows stay open in
      // state — append mode must NOT leak them early.
      input.addData(Seq(Ev(6, t(260), 3, "view", 6.0, """{"k": 6}""")))
      q.processAllAvailable()
      val appended = spark.table("variant_append_out")
        .select($"ws", $"event_type", $"n", $"k_sum")
        .as[(Timestamp, String, Long, Long)].collect().toSet
      assert(appended == Set(
        (t(0), "click", 2L, 3L),
        (t(60), "click", 1L, 4L),
        (t(60), "view", 1L, 3L)))
    } finally q.stop()
  }

  test("sessionStats: 30-minute gap splits sessions per user") {
    // user 1: events at 5,10 (one session) and 70 (new) -> 2 sessions
    // user 2: events at 75 and 200 (gap 125min) -> 2 sessions
    val full = EventPipeline.sessionStats(events.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(full.toSet == Set((1L, 2L, 3L), (2L, 2L, 2L)))
  }

  test("withJsonProp extracts typed values") {
    val out = EventPipeline.withJsonProp(events.toDF(), "k", "k_val")
      .select($"event_id", $"k_val").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
  }

  test("dedupStream drops duplicate ids across micro-batches") {
    val input = MemoryStream[Ev](spark)
    val q = EventPipeline.dedupStream(input.toDF(), Seq("event_id"))
      .select($"event_id")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // batch 1: events at t5..t75 plus an in-batch dup; watermark after
      // this batch = t75 - 1h (so nothing below is late-dropped)
      input.addData(events.take(4) :+ Ev(1, t(6), 9, "dup", 9.9, "{}"))
      q.processAllAvailable()
      input.addData(Seq(Ev(2, t(20), 9, "dup", 9.9, "{}"), // dup of batch 1
        Ev(6, t(80), 3, "click", 6.0, "{}")))              // genuinely new
      q.processAllAvailable()
      val ids = spark.table("dedup_out").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L, 4L, 6L))
    } finally q.stop()
  }

  test("sessionStatsWithState matches the declarative sessionStats") {
    val declarative = EventPipeline.sessionStats(events.toDF())
      .as[(Long, Long, Long)].collect().toSet
    val custom = EventPipeline.sessionStatsWithState(events.toDF())
      .as[(Long, Long, Long)].collect().toSet
    assert(custom == declarative)
  }

  test("sessionStatsWithState carries state across micro-batches") {
    val input = MemoryStream[Ev](spark)
    val q = EventPipeline.sessionStatsWithState(input.toDF())
      .writeStream.format("memory").queryName("state_out")
      .outputMode("update").start()
    try {
      input.addData(events.take(2))        // user 1: one session so far
      q.processAllAvailable()
      input.addData(Seq(events(2)))        // user 1 at t70: new session
      q.processAllAvailable()
      val latest = spark.table("state_out")
        .as[(Long, Long, Long)].collect()
        .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._3) }
      assert(latest(1L) == ((1L, 2L, 3L)))
    } finally q.stop()
  }

  test("availableNow file pipeline processes a directory exactly once") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream")
    val src = tmp.resolve("src").toString
    val ckp = tmp.resolve("ckp").toString
    events.toDF().write.parquet(src)
    val stream = EventPipeline.readEventStream(spark, src)
    val q = EventPipeline.availableNowWriter(
      stream.select($"event_id", $"event_type"), ckp)
      .format("memory").queryName("an_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("an_out").count() == 5)
    } finally q.stop()
  }

  test("attributeClicks: stream-stream interval join matches batch, " +
    "pairs across micro-batches") {
    val viewsIn = MemoryStream[Ev](spark)
    val clicksIn = MemoryStream[Ev](spark)
    val views = Seq(
      Ev(100, t(10), 1, "view", 0, "{}"),
      Ev(101, t(60), 2, "view", 0, "{}"))
    val clicks = Seq(
      Ev(200, t(20), 1, "click", 0, "{}"),  // within 30m of view 100
      Ev(201, t(55), 1, "click", 0, "{}"),  // 45m after view 100: outside
      Ev(202, t(70), 2, "click", 0, "{}"))  // within 30m of view 101
    val q = EventPipeline.attributeClicks(
        viewsIn.toDF().withWatermark("ts", "1 hour"),
        clicksIn.toDF().withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      // views land a batch BEFORE their clicks: the join must buffer the
      // view side's state across micro-batches to pair them.
      viewsIn.addData(views)
      q.processAllAvailable()
      clicksIn.addData(clicks)
      q.processAllAvailable()
      // append-mode results flush as the watermark passes; push both
      // watermarks far forward to drain the buffered matches.
      viewsIn.addData(Seq(Ev(999, t(600), 99, "view", 0, "{}")))
      clicksIn.addData(Seq(Ev(998, t(600), 98, "click", 0, "{}")))
      q.processAllAvailable()
      val streamed = spark.table("attr_out")
        .select($"view_id", $"click_id", $"gap_us")
        .as[(Long, Long, Long)].collect().toSet
      val batch = EventPipeline.attributeClicks(
          views.toDF(), clicks.toDF())
        .select($"view_id", $"click_id", $"gap_us")
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == batch)
      assert(batch == Set(
        (100L, 200L, 10L * 60 * 1000000),
        (101L, 202L, 10L * 60 * 1000000)))
    } finally q.stop()
  }

  test("attributeClicksOuter: unmatched views emit null rows once the " +
    "watermark clears their horizon, and match batch") {
    val viewsIn = MemoryStream[Ev](spark)
    val clicksIn = MemoryStream[Ev](spark)
    val views = Seq(
      Ev(100, t(10), 1, "view", 0, "{}"),  // matched by click 200
      Ev(102, t(15), 3, "view", 0, "{}"))  // no click ever: null row
    val clicks = Seq(Ev(200, t(20), 1, "click", 0, "{}"))
    val q = EventPipeline.attributeClicksOuter(
        viewsIn.toDF().withWatermark("ts", "10 minutes"),
        clicksIn.toDF().withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("attr_outer_out")
      .outputMode("append").start()
    try {
      viewsIn.addData(views)
      clicksIn.addData(clicks)
      q.processAllAvailable()
      // The unmatched view's null row may only flush after BOTH
      // watermarks pass its horizon end (t+30m): advance far forward.
      viewsIn.addData(Seq(Ev(999, t(600), 99, "view", 0, "{}")))
      clicksIn.addData(Seq(Ev(998, t(600), 98, "click", 0, "{}")))
      q.processAllAvailable()
      val streamed = spark.table("attr_outer_out")
        .select($"view_id", $"click_id", $"gap_us")
        .as[(Long, Option[Long], Option[Long])].collect().toSet
      val batch = EventPipeline.attributeClicksOuter(
          views.toDF(), clicks.toDF())
        .select($"view_id", $"click_id", $"gap_us")
        .as[(Long, Option[Long], Option[Long])].collect().toSet
      assert(batch == Set(
        (100L, Some(200L), Some(10L * 60 * 1000000)),
        (102L, None, None)))
      // The late probe view (999) is unmatched but its horizon has not
      // been cleared by the final watermark, so it may legitimately be
      // absent from the streamed set; everything else must agree.
      assert(streamed.filter(_._1 != 999L) == batch)
    } finally q.stop()
  }

  test("watermark drops late events: closed windows never reopen") {
    val input = MemoryStream[Ev](spark)
    val q = EventPipeline.windowedAgg(
        input.toDF().withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    try {
      // two events in the [0:00, 1:00) window
      input.addData(Seq(Ev(1, t(5), 1, "view", 1.0, "{}"),
        Ev(2, t(10), 1, "view", 2.0, "{}")))
      q.processAllAvailable()
      // advance the watermark past the window end (3:20 - 1h = 2:20):
      // the window closes and flushes to the append sink
      input.addData(Seq(Ev(3, t(200), 1, "view", 3.0, "{}")))
      q.processAllAvailable()
      val closed = spark.table("late_out")
        .select($"ws", $"cnt").as[(Timestamp, Long)].collect().toMap
      assert(closed(t(0)) == 2L)
      // a LATE event inside the closed window arrives: it must be
      // dropped, not reopen or duplicate the emitted window
      input.addData(Seq(Ev(4, t(15), 1, "view", 9.0, "{}")))
      q.processAllAvailable()
      val after = spark.table("late_out")
        .select($"ws", $"cnt").as[(Timestamp, Long)].collect()
        .filter(_._1 == t(0))
      assert(after.toSeq == Seq((t(0), 2L)),
        s"late event must be dropped, got ${after.toSeq}")
    } finally q.stop()
  }

  test("stream-static broadcast join enriches events with a dimension") {
    // The production enrichment pattern: a streamed fact side joined to a
    // static (batch) dimension — the dim broadcasts once per micro-batch,
    // no stream state at all (unlike stream-stream joins).
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[Ev](spark)
    val q = input.toDF()
      .join(org.apache.spark.sql.functions.broadcast(dim),
        Seq("user_id"), "left")
      .select($"event_id", $"tier")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      input.addData(events) // users 1 and 2
      q.processAllAvailable()
      input.addData(Seq(Ev(9, t(300), 7, "view", 0, "{}"))) // no dim row
      q.processAllAvailable()
      val out = spark.table("enrich_out")
        .as[(Long, Option[String])].collect().toMap
      assert(out(1L).contains("gold") && out(3L).contains("gold"))
      assert(out(4L).contains("basic") && out(5L).contains("basic"))
      assert(out(9L).isEmpty, "unmatched stream row must keep null tier")
    } finally q.stop()
  }

  test("detectSilence alerts exactly the keys that went quiet, once") {
    val input = MemoryStream[Ev](spark)
    val q = EventPipeline.detectSilence(
        input.toDF().withWatermark("ts", "10 minutes"),
        silenceMinutes = 30)
      .writeStream.format("memory").queryName("silence_out")
      .outputMode("append").start()
    try {
      // Users 1 and 2 both seen at t0.
      input.addData(Seq(Ev(1, t(0), 1, "view", 0, "{}"),
        Ev(2, t(0), 2, "view", 0, "{}")))
      q.processAllAvailable()
      // User 2 keeps heartbeating; user 1 goes dark. The watermark
      // ride-along events push event time forward.
      input.addData(Seq(Ev(3, t(50), 2, "view", 0, "{}")))
      q.processAllAvailable()
      input.addData(Seq(Ev(4, t(70), 2, "view", 0, "{}")))
      q.processAllAvailable()
      input.addData(Seq(Ev(5, t(95), 2, "view", 0, "{}")))
      q.processAllAvailable()
      val alerts = spark.table("silence_out")
        .as[(Long, java.sql.Timestamp)].collect().toSeq
      // Only user 1 timed out (silent since t0, horizon 30m, watermark
      // well past t30); user 2 re-armed before every deadline. Exactly
      // one alert — state is removed on firing.
      assert(alerts == Seq((1L, t(0))))
    } finally q.stop()
  }

  test("funnel requires strictly ordered first event times") {
    val evs = Seq(
      // user 1: full ordered funnel view(5) < click(10) < purchase(15)
      Ev(10, t(5), 1, "view", 0, "{}"),
      Ev(11, t(10), 1, "click", 0, "{}"),
      Ev(12, t(15), 1, "purchase", 0, "{}"),
      // user 2: click BEFORE first view — reaches view only
      Ev(20, t(5), 2, "click", 0, "{}"),
      Ev(21, t(10), 2, "view", 0, "{}"),
      // user 3: view then click, no purchase
      Ev(30, t(5), 3, "view", 0, "{}"),
      Ev(31, t(10), 3, "click", 0, "{}"),
      // user 4: never viewed — reaches nothing
      Ev(40, t(5), 4, "purchase", 0, "{}"))
    val out = EventPipeline.funnel(evs.toDF(),
      Seq("view", "click", "purchase"))
      .as[(Long, Long, Long)].collect().head
    assert(out == ((3L, 2L, 1L)))
  }

  test("cohortRetention: week offsets count distinct active users") {
    def d(day: Int, hour: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")
    // 2024-01-01 is a Monday: weeks are Jan 1, Jan 8, Jan 15.
    val evs = Seq(
      Ev(1, d(1, 1), 1, "view", 0, "{}"),   // u1 cohort w0
      Ev(2, d(2, 1), 1, "view", 0, "{}"),   // same week, deduped
      Ev(3, d(9, 1), 1, "view", 0, "{}"),   // u1 active w1
      Ev(4, d(3, 1), 2, "view", 0, "{}"),   // u2 cohort w0, never returns
      Ev(5, d(10, 1), 3, "view", 0, "{}"),  // u3 cohort w1
      Ev(6, d(16, 1), 3, "view", 0, "{}"))  // u3 active w1+1
    val out = EventPipeline.cohortRetention(evs.toDF())
      .as[(java.sql.Date, Long, Long)].collect()
      .map { case (c, w, n) => (c.toString, w, n) }.toSet
    assert(out == Set(
      ("2024-01-01", 0L, 2L), ("2024-01-01", 1L, 1L),
      ("2024-01-08", 0L, 1L), ("2024-01-08", 1L, 1L)))
  }

  test("count-min grid streams: streamed counters equal the batch grid") {
    // The sketch is a plain grouped count, so the SAME cmsGrid definition
    // runs as a streaming aggregate and the counters are batching-
    // invariant — the counter-wise mergeability the 100 TB design leans
    // on, exercised through Structured Streaming's own merge path.
    val input = MemoryStream[Ev](spark)
    val q = graft.operators.Sketches.cmsGrid(input.toDF(), "user_id",
        depth = 3, prefixLen = 2)
      .writeStream.format("memory").queryName("cms_out")
      .outputMode("complete").start()
    try {
      input.addData(events.take(2)); q.processAllAvailable()
      input.addData(events.drop(2)); q.processAllAvailable()
      val streamed = spark.table("cms_out")
        .as[(Int, String, Long)].collect().toSet
      val batch = graft.operators.Sketches.cmsGrid(events.toDF(), "user_id",
          depth = 3, prefixLen = 2)
        .as[(Int, String, Long)].collect().toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }
}
