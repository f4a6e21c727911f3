package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Itemsets

class ItemsetsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-computed baskets: supports, counts, and exact lift") {
    // b1={1,2,3,4} b2={1,2} b3={1,2,4} b4={3,4} → frequent pairs at
    // minSupport=2: (1,2)=3, (1,4)=2, (2,4)=2, (3,4)=2.
    val rows = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L),
      (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 2L), (30L, 4L),
      (40L, 3L), (40L, 4L)
    ).toDF("bk", "it")
    val out = Itemsets.frequentPairs(rows, "bk", "it", minSupport = 2L)
      .orderBy($"item_a", $"item_b")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      (1L, 2L, 3L, 3L, 3L, 3.0 * 4 / 9),
      (1L, 4L, 2L, 3L, 3L, 2.0 * 4 / 9),
      (2L, 4L, 2L, 3L, 3L, 2.0 * 4 / 9),
      (3L, 4L, 2L, 2L, 3L, 2.0 * 4 / 6)))
  }

  test("repeated lines in one basket count support once") {
    val rows = Seq(
      (1L, 7L), (1L, 7L), (1L, 8L),
      (2L, 7L), (2L, 8L)
    ).toDF("bk", "it")
    val out = Itemsets.frequentPairs(rows, "bk", "it", minSupport = 2L)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq((7L, 8L, 2L, 2L, 2L, 2.0 * 2 / 4)))
  }

  test("cosine top-k: hand-computed sims, symmetric neighborhoods") {
    // b1={1,2} b2={1,2} b3={1,3} → pairs at support 2: only (1,2).
    // sim(1,2) = 2/√(3·2); both directions rank it #1.
    val rows = Seq(
      (1L, 1L), (1L, 2L),
      (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L)).toDF("bk", "it")
    val out = Itemsets.cosineTopK(rows, "bk", "it", minSupport = 2L, k = 3)
      .as[(Long, Long, Long, Double, Long)].collect().toSet
    val sim = 2.0 / math.sqrt(3.0 * 2.0)
    assert(out === Set((1L, 2L, 2L, sim, 1L), (2L, 1L, 2L, sim, 1L)))
  }

  test("a-priori prune never changes the answer (≡ unpruned reference)") {
    // Random baskets; reference = plain self-join + HAVING with no item
    // prune. Monotonicity says the prune is lossless.
    val rnd = new scala.util.Random(11)
    val rows = (1 to 600).map(_ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(25).toLong)).toDF("bk", "it")
    val b = rows.distinct()
    val ref = b.as("a").join(b.as("b"),
        $"a.bk" === $"b.bk" && $"a.it" < $"b.it")
      .groupBy($"a.it".as("ia"), $"b.it".as("ib"))
      .agg(count(lit(1)).as("s"))
      .where($"s" >= 3)
      .as[(Long, Long, Long)].collect().toSet
    val out = Itemsets.frequentPairs(rows, "bk", "it", minSupport = 3L)
      .select($"item_a", $"item_b", $"support")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === ref)
  }
}
