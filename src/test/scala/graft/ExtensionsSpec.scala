package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Literal
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{CosineSimilarity, NativeFunctions}

/** The SparkSessionExtensions packaging of the native function surface. */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("GraftExtensions injects without error") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("cosine_sim builder produces the native expression, rejects bad arity") {
    val e = NativeFunctions.cosineSimBuilder(Seq(Literal(1), Literal(2)))
    assert(e.isInstanceOf[CosineSimilarity])
    intercept[IllegalArgumentException] {
      NativeFunctions.cosineSimBuilder(Seq(Literal(1)))
    }
  }

  test("registered cosine_sim is callable from SQL text") {
    NativeFunctions.register(spark)
    val v = spark.sql(
      """SELECT cosine_sim(
        |  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
  }

  test("kmv_mink keeps the k smallest distinct values in sorted order") {
    NativeFunctions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Duplicates, out-of-order inserts, multiple partitions: the
    // aggregate must return the 3 smallest DISTINCT strings ascending,
    // identically to sort-distinct-take on the driver.
    val vals = Seq("d", "b", "e", "b", "a", "f", "c", "a", "g")
    val got = vals.toDF("h").repartition(4)
      .agg(NativeFunctions.kmvMinK(col("h"), 3).as("hs"))
      .head().getSeq[String](0)
    assert(got == vals.distinct.sorted.take(3))
    // SQL surface + under-full buffer (fewer distinct values than k).
    val sql = spark.sql(
      "SELECT kmv_mink(h, 10) FROM VALUES ('z'),('y'),('z') AS t(h)")
      .head().getSeq[String](0)
    assert(sql == Seq("y", "z"))
    // Grouped form partial-aggregates per key.
    val grouped = Seq(("g1", "b"), ("g1", "a"), ("g2", "c"), ("g1", "c"))
      .toDF("g", "h").repartition(3)
      .groupBy($"g").agg(NativeFunctions.kmvMinK($"h", 2).as("hs"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(grouped("g1") == Seq("a", "b") && grouped("g2") == Seq("c"))
  }

  test("hamming_dist equals the chained-substring form and handles overhang") {
    NativeFunctions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      ("0000", "0000"), ("0101", "0000"), ("1111", "0000"),
      ("10", "1011")).toDF("a", "b")
    val declarative = (1 to 4).map(i =>
      when(substring($"a", i, 1) =!= substring($"b", i, 1) &&
        length($"a") >= i && length($"b") >= i, 1L).otherwise(0L))
      .reduce(_ + _) +
      abs(length($"a") - length($"b")).cast("long")
    val rows = df.select(
      NativeFunctions.hammingDist($"a", $"b").as("nat"),
      declarative.as("dec")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    val sql = spark.sql("SELECT hamming_dist('0101','1101') AS h")
      .head().getLong(0)
    assert(sql === 1L)
  }
}
