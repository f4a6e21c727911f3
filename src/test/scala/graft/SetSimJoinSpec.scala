package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SetSimJoin

class SetSimJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Brute-force word-set Jaccard reference with the same exact-int
    * acceptance (i·tDen ≥ tNum·union).
    */
  private def brute(docs: Seq[(Long, String)], tNum: Int, tDen: Int)
      : Set[(Long, Long)] = {
    val sets = docs.filter(_._2.trim.nonEmpty)
      .map { case (id, t) =>
        (id, t.trim.toLowerCase.split("\\s+").toSet)
      }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      i = (sa & sb).size
      if i.toLong * tDen >= tNum.toLong * (sa.size + sb.size - i)
    } yield (ia, ib)).toSet
  }

  test("matches brute force on a seeded random corpus (lossless prefix)") {
    val rnd = new scala.util.Random(13)
    val vocab = (1 to 40).map(i => s"w$i")
    val docs = (1L to 120L).map { i =>
      val n = 3 + rnd.nextInt(10)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val out = SetSimJoin.prefixJaccardPairs(
        docs.toDF("doc_id", "text"), "doc_id", "text", 1, 2)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(out === brute(docs, 1, 2))
    assert(out.nonEmpty) // seed must actually exercise the join
  }

  test("identical, contained, and disjoint sets at the exact boundary") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),   // jac 1 with 1
      (3L, "alpha beta"),               // jac 2/4 = 1/2 with 1 — boundary
      (4L, "zeta eta theta"),           // disjoint
      (5L, "  ")                        // blank — excluded
    ).toDF("doc_id", "text")
    val out = SetSimJoin.prefixJaccardPairs(docs, "doc_id", "text", 1, 2)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("reported jac is the exact single division") {
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b c x")  // i=3, union=5
    ).toDF("doc_id", "text")
    val out = SetSimJoin.prefixJaccardPairs(docs, "doc_id", "text", 1, 2)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out === Seq((1L, 2L, 3.0 / 5)))
  }

  test("cross-relation join matches brute force (incremental near-dup)") {
    val rnd = new scala.util.Random(61)
    val vocab = (1 to 30).map(i => s"t$i")
    def doc(i: Long) = (i, Seq.fill(3 + rnd.nextInt(8))(
      vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val batch = (1L to 40L).map(doc)
    val corpus = (101L to 200L).map(doc) ++
      batch.take(5).map { case (i, t) => (i + 1000, t) } // planted copies
    val out = SetSimJoin.prefixJaccardJoin(
        batch.toDF("doc_id", "text"), corpus.toDF("doc_id", "text"),
        "doc_id", "text", 1, 2)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val ref = {
      def sets(ds: Seq[(Long, String)]) = ds.map { case (i, t) =>
        (i, t.split("\\s+").toSet) }
      (for {
        (ia, sa) <- sets(batch); (ib, sb) <- sets(corpus)
        i = (sa & sb).size
        if i.toLong * 2 >= (sa.size + sb.size - i)
      } yield (ia, ib)).toSet
    }
    assert(out === ref)
    // The planted exact copies must all be found.
    assert((1L to 5L).forall(i => out.contains((i, i + 1000))))
  }

  test("positional filter stays lossless at tight thresholds (9/10, 7/10)") {
    // Near-identical docs off a shared template: high-Jaccard pairs that
    // must survive the positional prune, plus boundary cases where the
    // overlap upper bound exactly equals α.
    val rnd = new scala.util.Random(97)
    val base = (1 to 12).map(i => s"b$i")
    val docs = (1L to 60L).map { i =>
      val drop = rnd.nextInt(3)         // remove 0-2 template tokens
      val extra = rnd.nextInt(3)        // add 0-2 private tokens
      val ws = rnd.shuffle(base).drop(drop) ++
        (1 to extra).map(e => s"u${i}_$e")
      (i, ws.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    for ((tN, tD) <- Seq((9, 10), (7, 10), (4, 5))) {
      val out = SetSimJoin.prefixJaccardPairs(df, "doc_id", "text", tN, tD)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      assert(out === brute(docs, tN, tD), s"threshold $tN/$tD")
    }
    // The corpus must contain pairs at 9/10 for the test to bite.
    assert(brute(docs, 9, 10).nonEmpty)
  }

  test("tighter threshold is a strict subset on the same corpus") {
    val rnd = new scala.util.Random(29)
    val vocab = (1 to 25).map(i => s"v$i")
    val docs = (1L to 80L).map { i =>
      (i, Seq.fill(4 + rnd.nextInt(8))(
        vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val loose = SetSimJoin.prefixJaccardPairs(docs, "doc_id", "text", 1, 2)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val tight = SetSimJoin.prefixJaccardPairs(docs, "doc_id", "text", 4, 5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(tight.subsetOf(loose))
  }
}
