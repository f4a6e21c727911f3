package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.KmvStream
import graft.operators.Sketches

/** Streamed KMV sketch maintenance: batching-invariance (streamed state ≡
  * one-shot batch sketch hash-for-hash), replay idempotence, and the
  * pairwise-overlap read face agreeing with the batch operator's estimate
  * on identical data.
  */
class KmvStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(min: Int): Timestamp = new Timestamp(min * 60000L)

  private def evs(tpe: String, users: Range): Seq[Ev] =
    users.map(u => Ev(u.toLong * 7919, t(u % 50), u.toLong, tpe, 0, "{}"))

  private val K = 32

  test("streamed sketch state equals the one-shot batch sketch hash-for-hash") {
    val dir = s"${sys.props("java.io.tmpdir")}/kmv_spec_${System.nanoTime()}"
    val all = evs("view", 1 to 300) ++ evs("click", 100 to 200)
    val input = MemoryStream[Ev](spark)
    val q = KmvStream.sketchWriter(input.toDF(), s"$dir/state",
      s"$dir/chk", "event_type", "user_id", K).start()
    try {
      // Overlapping user sets split across batches: the min-k merge must
      // neither double-count a re-seen user nor forget a smaller hash.
      input.addData(all.take(150))
      q.processAllAvailable()
      input.addData(all.drop(150))
      q.processAllAvailable()
      val streamed = spark.read.parquet(s"$dir/state")
        .as[(String, String)].collect().toSet
      val oneShot = all.toDF()
        .select($"event_type".as("g"),
          md5($"user_id".cast("string")).as("h")).distinct()
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"g").orderBy($"h")))
        .where($"rn" <= K).select($"g", $"h")
        .as[(String, String)].collect().toSet
      assert(streamed == oneShot)
      assert(streamed.count(_._1 == "view") == K)
    } finally q.stop()
  }

  test("replaying an applied batch leaves the sketch unchanged") {
    val dir = s"${sys.props("java.io.tmpdir")}/kmv_replay_${System.nanoTime()}"
    val batch = evs("view", 1 to 80).toDF()
    KmvStream.applyBatch(batch, s"$dir/state", "event_type", "user_id", K)
    val first = spark.read.parquet(s"$dir/state")
      .as[(String, String)].collect().toSet
    KmvStream.applyBatch(batch, s"$dir/state", "event_type", "user_id", K)
    val second = spark.read.parquet(s"$dir/state")
      .as[(String, String)].collect().toSet
    assert(first == second)
  }

  test("pairwise estimates from state match the batch operator's estimate") {
    val dir = s"${sys.props("java.io.tmpdir")}/kmv_pair_${System.nanoTime()}"
    val all = evs("view", 1 to 200) ++ evs("click", 50 to 250)
    // Stream in three uneven batches.
    KmvStream.applyBatch(all.take(70).toDF(), s"$dir/state",
      "event_type", "user_id", K)
    KmvStream.applyBatch(all.slice(70, 240).toDF(), s"$dir/state",
      "event_type", "user_id", K)
    KmvStream.applyBatch(all.drop(240).toDF(), s"$dir/state",
      "event_type", "user_id", K)
    val streamed = KmvStream.pairwiseEstimates(spark, s"$dir/state", K)
      .select("ga", "gb", "m", "k_used", "jaccard_est")
      .as[(String, String, Long, Long, Double)].head()
    val batch = Sketches.kmvPairwiseOverlap(all.toDF(),
        "event_type", "user_id", K)
      .select("ga", "gb", "m", "k_used", "jaccard_est")
      .as[(String, String, Long, Long, Double)].head()
    assert(streamed == batch)
  }
}
