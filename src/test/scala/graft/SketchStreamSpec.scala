package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.SketchStream

/** Streamed HLL distinct maintenance: batching-invariance (streamed
  * registers ≡ one-shot batch sketch), replay idempotence, and the
  * overlap case exact countDistinct state cannot bound.
  */
class SketchStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(min: Int): Timestamp = new Timestamp(min * 60000L)

  private def evs(tpe: String, users: Range): Seq[Ev] =
    users.map(u => Ev(u.toLong * 7919, t(u % 50), u.toLong, tpe, 0, "{}"))

  test("streamed sketches equal the one-shot batch sketch exactly") {
    val dir = s"${sys.props("java.io.tmpdir")}/hll_spec_${System.nanoTime()}"
    val all = evs("view", 1 to 300) ++ evs("click", 100 to 200)
    val input = MemoryStream[Ev](spark)
    val q = SketchStream.distinctWriter(input.toDF(), s"$dir/state",
      s"$dir/chk", "event_type", "user_id").start()
    try {
      // Overlapping user sets across batches: the union must not
      // double-count users 100-200 of either type.
      input.addData(all.take(150))
      q.processAllAvailable()
      input.addData(all.drop(150))
      q.processAllAvailable()
      val streamed = SketchStream.estimates(spark, s"$dir/state",
        "event_type").as[(String, Long)].collect().toMap
      val oneShot = all.toDF().groupBy($"event_type")
        .agg(hll_sketch_estimate(hll_sketch_agg($"user_id"))
          .as("n_distinct"))
        .as[(String, Long)].collect().toMap
      assert(streamed == oneShot)
      // And the sketch contract holds vs the exact answer (300 / 101).
      assert(math.abs(streamed("view") - 300) <= 15)
      assert(math.abs(streamed("click") - 101) <= 6)
    } finally q.stop()
  }

  test("replaying an applied batch leaves the registers unchanged") {
    val dir = s"${sys.props("java.io.tmpdir")}/hll_replay_${System.nanoTime()}"
    val batch = evs("view", 1 to 80).toDF()
    SketchStream.applyBatch(batch, s"$dir/state", "event_type", "user_id")
    val first = SketchStream.estimates(spark, s"$dir/state", "event_type")
      .as[(String, Long)].collect().toMap
    SketchStream.applyBatch(batch, s"$dir/state", "event_type", "user_id")
    val second = SketchStream.estimates(spark, s"$dir/state", "event_type")
      .as[(String, Long)].collect().toMap
    assert(first == second)
  }
}
