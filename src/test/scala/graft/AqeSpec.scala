package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** SCALE.md's "leave fact⋈fact skew to AQE" posture, proven live: a
  * runtime-skewed sort-merge join must come back with AQE's skew-split
  * reader in the FINAL adaptive plan. Thresholds are shrunk so the
  * in-test frame qualifies — the rewrite under test is the production
  * one. (Relational.saltedJoin/autoSaltedJoin stay the manual toolbox
  * for shapes AQE cannot split.)
  */
class AqeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("AQE splits the skewed side of a sort-merge join at runtime") {
    val saved = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false"
    ).map { case (k, v) =>
      val old = spark.conf.getOption(k); spark.conf.set(k, v); k -> old
    }
    try {
      // One hot key carrying ~50k rows vs 200 cold keys with 10 each.
      val large = spark.range(0, 52000)
        .select(when($"id" < 50000, 0L).otherwise($"id" % 200 + 1)
          .as("k"), concat(lit("payload-"), $"id").as("v"))
      val small = spark.range(0, 201).select($"id".as("k"),
        concat(lit("dim-"), $"id").as("d"))
      val joined = large.join(small, "k")
      // Execute THIS DataFrame's plan (count() would plan separately and
      // leave `joined`'s adaptive plan unfinalized).
      assert(joined.collect().length == 52000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("AQEShuffleRead") &&
        finalPlan.contains("skewed"),
        s"AQE did not skew-split the hot partition:\n$finalPlan")
    } finally saved.foreach { case (k, old) =>
      old.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}
