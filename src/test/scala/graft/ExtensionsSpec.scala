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

  test("native argmax/probe/bits match the declarative HOF forms " +
    "bit-for-bit across shapes, exact ties, and zero vectors") {
    NativeFunctions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    // The pre-native declarative forms, reconstructed verbatim: the
    // native expressions' contract is bit-identity with THESE trees
    // (which the DuckDB oracles replay), not merely "close".
    def dotD(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    def declCell(vec: Column, cents: Array[Array[Double]]): Column = {
      val v = vec.cast("array<double>")
      val scores = cents.map(c => dotD(v, array(c.map(lit).toIndexedSeq: _*)))
      val mx = greatest(scores.toIndexedSeq: _*)
      scores.zipWithIndex.foldRight(lit(cents.length - 1): Column) {
        case ((sc, i), els) => when(sc === mx, lit(i)).otherwise(els)
      }
    }
    def declProbe(vec: Column, cents: Array[Array[Double]]): Column = {
      val v = vec.cast("array<double>")
      val scores = cents.map(c => dotD(v, array(c.map(lit).toIndexedSeq: _*)))
      val mx = greatest(scores.toIndexedSeq: _*)
      val first = scores.zipWithIndex
        .foldRight(lit(cents.length - 1): Column) {
          case ((sc, i), els) => when(sc === mx, lit(i)).otherwise(els)
        }
      val masked = scores.zipWithIndex.map { case (sc, i) =>
        when(lit(i) === first, lit(Double.MinValue)).otherwise(sc)
      }
      val mx2 = greatest(masked.toIndexedSeq: _*)
      val second = masked.zipWithIndex
        .foldRight(lit(cents.length - 1): Column) {
          case ((sc, i), els) => when(sc === mx2, lit(i)).otherwise(els)
        }
      array(first, second)
    }
    def declBits(vec: Column, planes: Array[Array[Double]]): Column = {
      val v = vec.cast("array<double>")
      concat(planes.map { pl =>
        when(dotD(v, array(pl.map(lit).toIndexedSeq: _*)) >= 0,
          lit("1")).otherwise(lit("0"))
      }.toIndexedSeq: _*)
    }
    for (((dim, k), seed) <- Seq((3, 2), (8, 5), (16, 8)).zipWithIndex) {
      val rnd = new scala.util.Random(100L + seed)
      val base = Array.fill(k)(Array.fill(dim)(rnd.nextGaussian()))
      // Duplicate the first centroid at the END: every vector ties
      // exactly between indices 0 and k, exercising both tie paths
      // (first = 0, runner-up = the duplicate).
      val cents = base :+ base(0).clone()
      val vecs = (0 until 40).map(i =>
        (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq)) :+
        (99L, Seq.fill(dim)(0.0f)) // zero vector: all scores tie at 0.0
      val bad = vecs.toDF("id", "vec").select(
          NativeFunctions.centroidCell(col("vec"), cents).as("nc"),
          declCell(col("vec"), cents).as("dc"),
          NativeFunctions.centroidProbeCells(col("vec"), cents).as("np"),
          declProbe(col("vec"), cents).as("dp"),
          NativeFunctions.projectionBits(col("vec"), cents).as("nb"),
          declBits(col("vec"), cents).as("db"))
        .where(col("nc") =!= col("dc") or col("np") =!= col("dp") or
          col("nb") =!= col("db"))
        .count()
      assert(bad == 0L, s"dim=$dim k=$k: native != declarative on $bad rows")
    }
  }
}
