package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TimeSeries

class SweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Hour-aligned epoch base so minute offsets map cleanly onto hours.
  private val Base = 1700000000000L - (1700000000000L % 3600000L)
  private def ts(min: Long): Timestamp = new Timestamp(Base + min * 60000L)

  /** Independent reference: sample the step function at EVERY minute of
    * the covered span and take the max per hour — true sup semantics,
    * including levels carried across hour boundaries.
    */
  private def brute(starts: Seq[Long], dur: Long): Map[Timestamp, Long] = {
    val lo = (starts.min / 60) * 60
    val hi = starts.max + dur
    (lo to hi).groupBy(m => ts((m / 60) * 60)).map { case (h, ms) =>
      h -> ms.map(m => starts.count(s => s <= m && m < s + dur).toLong).max
    }
  }

  test("hand-built overlap: half-open boundaries do not overlap") {
    // [0,30) [10,40) [30,60): at t=30 the first closes as the third
    // opens — max concurrency is 2, never 3.
    val starts = Seq(0L, 10L, 30L)
    val out = TimeSeries.maxConcurrent(
        starts.map(m => Tuple1(ts(m))).toDF("ts"), "ts", 30)
      .as[(Timestamp, Long)].collect().toMap
    assert(out.values.max === 2L)
    assert(out === brute(starts, 30L))
  }

  test("levels carried across hour boundaries are reported (gap hours)") {
    // One interval [55, 205): hours 1–2 have NO boundary at all but hold
    // a live session — the spine rows must report level 1 there.
    val out = TimeSeries.maxConcurrent(
        Seq(Tuple1(ts(55))).toDF("ts"), "ts", 150)
      .as[(Timestamp, Long)].collect().toMap
    assert(out === brute(Seq(55L), 150L))
    assert(out(ts(60)) === 1L && out(ts(120)) === 1L)
  }

  test("matches the minute-sampled reference on a random burst pattern") {
    val rnd = new scala.util.Random(37)
    val starts = Seq.fill(400)(rnd.nextInt(600).toLong)
    val out = TimeSeries.maxConcurrent(
        starts.map(m => Tuple1(ts(m))).toDF("ts"), "ts", 30)
      .as[(Timestamp, Long)].collect().toMap
    assert(out === brute(starts, 30L))
  }

  test("single event with nulls excluded") {
    val df = Seq(Some(ts(5)), None).toDF("ts")
    val out = TimeSeries.maxConcurrent(df, "ts", 30)
      .as[(Timestamp, Long)].collect().toMap
    assert(out(ts(0)) === 1L)
  }
}
