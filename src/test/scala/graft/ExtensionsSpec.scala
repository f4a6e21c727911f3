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
}
