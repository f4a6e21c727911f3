package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.{Doc, TypedCorpus}

/** The typed facade: encoder round-trip, agreement with the untyped
  * registered query, and the no-opaque-lambdas claim (pushdown survives
  * the typed boundary).
  */
class TypedCorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("typed docs round-trip the table schema through the encoder") {
    val ds = TypedCorpus.docs(spark, dir)
    val first: Doc = ds.orderBy(org.apache.spark.sql.functions
      .col("doc_id")).head()
    assert(first.doc_id == 0L && first.text.nonEmpty)
    assert(ds.count() == spark.read
      .parquet(s"$dir/documents.parquet").count())
  }

  test("typed quality scores equal the registered untyped query") {
    import spark.implicits._
    val typed = TypedCorpus.scored(TypedCorpus.docs(spark, dir))
      .collect().map(s => s.doc_id -> s.quality).toMap
    val untyped = SparkEntry.queries("t_quality_score")(spark, dir)
      .select($"doc_id", $"quality").as[(Long, Double)]
      .collect().toMap
    assert(typed == untyped)
  }

  test("a typed filter still pushes down to the parquet scan") {
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val p = TypedCorpus.docs(spark, dir)
        .where(org.apache.spark.sql.functions.col("lang") === "en")
        .queryExecution.executedPlan.toString
      assert(p.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"),
        s"typed boundary blocked pushdown:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }
}
