package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Scale-design proof: bucketed tables co-locate join keys at write time,
  * so a fact⋈fact equi-join on the bucket column plans with ZERO shuffle
  * exchanges — the at-rest partitioning strategy for 100 TB joins.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed co-located join plans without a shuffle exchange") {
    Tables.writeBucketed(Tables.load(spark, dir, "orders"),
      "b_orders", 8, "o_orderkey", "o_orderkey")
    Tables.writeBucketed(Tables.load(spark, dir, "lineitem"),
      "b_lineitem", 8, "l_orderkey", "l_orderkey")
    val oldBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val oldAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force the sort-merge path (what a 100 TB fact join uses) and a
      // static plan we can assert on
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      // and it still computes the right thing
      val n = joined.count()
      val expected = Tables.load(spark, dir, "lineitem")
        .join(Tables.load(spark, dir, "orders"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(n == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", oldAqe)
    }
  }
}
