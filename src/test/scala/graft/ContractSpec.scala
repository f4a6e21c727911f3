package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract (SparkEntry): these failures would
  * otherwise only surface as silent gaps in the driver's round report.
  */
class ContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Queries that intentionally register WITHOUT a DuckDB oracle (the
    * driver records a rows-only check): each must carry its own strong
    * spec. Additions here need a justification comment.
    */
  private val rowsOnly = Set.empty[String]

  test("every registered query has a DuckDB oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o -- rowsOnly).isEmpty,
      s"queries missing oracles: ${(q -- o -- rowsOnly).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without queries: ${(o -- q).toSeq.sorted}")
    assert((rowsOnly -- q).isEmpty && (rowsOnly & o).isEmpty,
      "rowsOnly entries must be registered queries without oracles")
  }

  test("every bench headline query is registered") {
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty,
      s"Bench would time failures for: ${missing.mkString(", ")}")
  }

  test("flagship entry returns rows on the smoke corpus") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL contains no characters the driver JSON dump can't carry") {
    // Verify.q escapes these, but flag accidental control chars early.
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.exists(c => c < ' ' && c != '\n' && c != '\t'),
        s"$name oracle has a control character")
    }
  }
}
