package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Observe

/** `Observe.counters` contract: metrics ride the materializing action
  * (no separate job), report exact counts, and leave results unchanged.
  */
class ObserveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("counters report exact matches on the materializing pass") {
    val docs = Seq(
      (1L, "good text here", "en"), (2L, "", "en"),
      (3L, "short", "es"), (4L, "another fine doc", "en"),
      (5L, "", "es")).toDF("doc_id", "text", "lang")
    val (instrumented, obs) = Observe.counters(docs, "quality",
      Map("n_empty" -> (length(col("text")) === 0),
        "n_en" -> (col("lang") === "en")))

    // results unchanged by instrumentation
    val kept = instrumented.where(length(col("text")) > 0)
    assert(kept.count() == 3)

    // metrics materialized as a side effect of that same action
    val m = obs.get
    assert(m("n_rows") == 5L)
    assert(m("n_empty") == 2L)
    assert(m("n_en") == 3L)
  }

  test("metrics survive downstream transformations of the observed frame") {
    val df = Seq((1, 10), (2, 0), (3, 7)).toDF("k", "v")
    val (instrumented, obs) = Observe.counters(df, "gate",
      Map("n_zero" -> (col("v") === 0)))
    // aggregate ABOVE the observation still triggers it
    val total = instrumented.agg(sum(col("v"))).as[Long].head()
    assert(total == 17L)
    assert(obs.get("n_zero") == 1L && obs.get("n_rows") == 3L)
  }
}
