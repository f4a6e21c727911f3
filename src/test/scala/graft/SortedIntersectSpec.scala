package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.NativeFunctions

/** The native sorted-merge |A∩B| kernel behind every exact set-overlap
  * verify step (shingle Jaccard, PPJoin verify, winnow containment):
  * must agree with the built-in `size(array_intersect(a, b))` on every
  * input shape once both sides are sorted.
  */
class SortedIntersectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def native = NativeFunctions.sortedIntersectSize _

  test("matches size(array_intersect) on seeded random multisets") {
    val rnd = new scala.util.Random(7)
    val alphabet = Vector("a", "b", "bb", "c", "d", "e", "f", "zz", "", "é")
    val rows = Seq.fill(300) {
      def arr() = Seq.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.size)))
      (arr(), arr())
    }
    val df = rows.toDF("x", "y")
      .select(sort_array($"x").as("xs"), sort_array($"y").as("ys"),
        $"x", $"y")
    val out = df.select(native($"xs", $"ys"),
        size(array_intersect($"x", $"y")))
      .as[(Int, Int)].collect()
    out.foreach { case (got, want) => assert(got == want) }
  }

  test("duplicates count once; empties and disjoint sets count zero") {
    val df = Seq(
      (Seq("a", "a", "b", "b"), Seq("a", "b", "b", "c")), // dups -> 2
      (Seq.empty[String], Seq("a")),                      // empty -> 0
      (Seq("a", "b"), Seq("c", "d"))                      // disjoint -> 0
    ).toDF("x", "y")
    val out = df.select(native($"x", $"y")).as[Int].collect().toSeq
    assert(out == Seq(2, 0, 0))
  }

  test("null array propagates null; null elements never match") {
    val df = Seq(
      (Option(Seq(Option("a"), None, Option("b"))),
        Option(Seq(None, Option("b")))),
      (None: Option[Seq[Option[String]]], Option(Seq(Option("a"))))
    ).toDF("x", "y")
    // sort_array puts nulls first — the merge must skip them, matching
    // array_intersect's null-element behavior on non-null overlap.
    val out = df.select(native(sort_array($"x"), sort_array($"y")))
      .as[Option[Int]].collect().toSeq
    assert(out.head.contains(1) && out(1).isEmpty)
  }

  test("SQL form registers and evaluates") {
    val n = spark.sql(
      "SELECT sorted_intersect_size(array('a','b','c'), array('b','c','d'))")
      .as[Int].collect().head
    assert(n == 2)
  }
}
