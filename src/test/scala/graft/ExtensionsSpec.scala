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

  test("centroid_cell/centroid_probe_cells: argmax, lowest-index ties, " +
    "and agreement between codegen and a Scala reference") {
    NativeFunctions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(5L)
    val cents = Array.fill(4)(Array.fill(8)(rnd.nextGaussian()))
    val vecs = (0 until 50).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat).toSeq))
    val df = vecs.toDF("id", "vec")
    val got = df.select(col("id"),
        NativeFunctions.centroidCell(col("vec"), cents).as("cell"),
        NativeFunctions.centroidProbeCells(col("vec"), cents).as("probe"))
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).sortBy(_._1)
    // Reference: sequential double fold, strict-> argmax, mask-and-rerun.
    def scores(v: Seq[Float]) = cents.map { c =>
      var acc = 0.0; var i = 0
      while (i < 8) { acc += v(i).toDouble * c(i); i += 1 }; acc
    }
    def amax(s: Array[Double]) = s.indices.reduceLeft((a, b) =>
      if (s(b) > s(a)) b else a)
    vecs.foreach { case (id, v) =>
      val s = scores(v)
      val first = amax(s)
      s(first) = Double.MinValue
      val second = amax(s)
      val (_, cell, probe) = got(id.toInt)
      assert(cell == first && probe == Seq(first, second),
        s"id=$id: got ($cell, $probe), want ($first, [$first,$second])")
    }
    // Exact tie: duplicated centroid -> the LOWEST index must win, and
    // the runner-up is the OTHER copy of the tied centroid.
    val tied = Array(Array(1.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0))
    val one = Seq((1L, Seq(1.0f, 0.0f))).toDF("id", "vec")
      .select(NativeFunctions.centroidCell(col("vec"), tied).as("cell"),
        NativeFunctions.centroidProbeCells(col("vec"), tied).as("probe"))
      .head()
    assert(one.getInt(0) == 0 && one.getSeq[Int](1) == Seq(0, 1))
  }
}
