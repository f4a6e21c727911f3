package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pinned-value regression guard for the dashboard query surface: expected
  * outputs at sf0.001 computed once from the DuckDB oracle SQL (the same
  * statements the driver runs) and hard-coded, so a semantic regression is
  * caught by `sbt test` without the driver round-trip. Mirrors how the
  * reference's dashboard pins observable KPI values (BASELINE.md: 92,567
  * artists, lady gaga = 22 wins).
  */
class DashboardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Seq[Seq[Any]] =
    SparkEntry.queries(name)(spark, dir).collect().toSeq.map(_.toSeq)

  test("d2: number of artists") {
    assert(rows("d2_n_artists") == Seq(Seq(150L)))
  }

  test("d4: artists who have won") {
    assert(rows("d4_winning_artists") == Seq(Seq(145L)))
  }

  test("d9: top-5 artists by wins, deterministic tie order") {
    assert(rows("d9_top_artists") == Seq(
      Seq("Customer#000000036", 9L),
      Seq("Customer#000000054", 9L),
      Seq("Customer#000000081", 8L),
      Seq("Customer#000000139", 8L),
      Seq("Customer#000000140", 8L)))
  }

  test("d10: winning songs per genre") {
    assert(rows("d10_genre_wins") == Seq(
      Seq("EUROPE", 194L),
      Seq("MIDDLE EAST", 178L),
      Seq("AFRICA", 167L),
      Seq("AMERICA", 131L),
      Seq("ASIA", 131L)))
  }

  test("a7: corpus shape") {
    assert(rows("a7_count") == Seq(Seq(6000L)))
  }

  test("entry: flagship smoke produces the d9 result") {
    assert(SparkEntry.entry(spark).count() == 5L)
  }
}
