package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The DSv2 connector: row correctness vs a Spark-built reference,
  * split planning, and column-pruning pushdown into the reader.
  */
class SynthSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def synth(rows: Long, parts: Int) =
    spark.read.format("graft-synth")
      .option("rows", rows.toString).option("parts", parts.toString)
      .load()

  test("rows equal the id-function reference, across any split count") {
    val ref = spark.range(0, 100)
      .select($"id", md5($"id".cast("string")).as("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    for (parts <- Seq(1, 3, 8)) {
      val got = synth(100, parts).as[(Long, String)]
        .collect().toSeq.sortBy(_._1)
      assert(got == ref, s"parts=$parts")
    }
  }

  test("plans the requested number of input partitions") {
    assert(synth(1000, 8).rdd.getNumPartitions == 8)
  }

  test("column pruning reaches the reader's schema") {
    // DSv2 BatchScan renders the pruned output list inline:
    // `BatchScan graft_synth(1000)[id#N]` — `text` must be absent.
    val p = synth(1000, 4).select($"id")
      .queryExecution.executedPlan.toString
    assert("BatchScan graft_synth\\(1000\\)\\[id#\\d+L\\]".r
      .findFirstIn(p).isDefined && !p.contains("text#"),
      s"projection did not prune the scan:\n$p")
  }
}
