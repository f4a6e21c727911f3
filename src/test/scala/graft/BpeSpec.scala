package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE merge induction: hand-computed rules on the classic fixture,
  * greedy non-overlapping rewrite semantics, determinism.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("learns the hand-computed merge sequence with frequency weighting") {
    // low:3 lower:2 newest:1 ⇒
    //  r1: (l,o)=5 ties (o,w)=5, lexicographic pick (l,o)
    //  r2: (lo,w)=5
    //  r3: (low,</w>)=3
    val df = Seq("low low low lower lower newest").toDF("t")
    val merges = Bpe.topMerges(df, "t", rounds = 3)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(merges == Seq(
      (1, "l", "o", 5L), (2, "lo", "w", 5L), (3, "low", "</w>", 3L)))
  }

  test("greedy merge is left-to-right non-overlapping") {
    val df = Seq(Tuple1(Seq("a", "a", "a"))).toDF("syms")
    val out = df.select(Bpe.mergePair(col("syms"), "a", "a").as("m"))
      .as[Seq[String]].collect().head
    assert(out == Seq("aa", "a"))
  }

  test("stops when a corpus is fully merged") {
    // One distinct word of 2 chars + terminal: 3 merges exhaust it; a
    // 10-round ask must return only the learnable rules.
    val df = Seq("ab ab").toDF("t")
    val merges = Bpe.topMerges(df, "t", rounds = 10)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(merges.size == 2)
    assert(merges.map(m => (m._2, m._3)) ==
      Seq(("a", "b"), ("ab", "</w>")))
  }

  test("encode applies the shipped rule list — hand-computed tokens") {
    val df = Seq("the key row", "aaa a", "sort").toDF("t")
    val out = df.select(Bpe.encode(col("t")).as("e"))
      .as[Seq[String]].collect().toSeq
    assert(out == Seq(
      Seq("the</w>", "key</w>", "row</w>"),
      Seq("a", "a", "a</w>", "a</w>"),
      Seq("s", "o", "r", "t", "</w>")))
  }

  test("encode never merges across a word boundary") {
    // (ke, y) must not fire between word "ke" and word "y": the terminal
    // symbol sits between them.
    val out = Seq("ke y").toDF("t")
      .select(Bpe.encode(col("t")).as("e"))
      .as[Seq[String]].collect().head
    assert(out == Seq("ke", "</w>", "y", "</w>"))
  }

  test("mergePair invariants on random sequences: content preserved, " +
    "no unmerged adjacent pair survives") {
    val rnd = new scala.util.Random(7)
    val cases = (1 to 200).map(_ =>
      Vector.fill(rnd.nextInt(12) + 1)(Seq("a", "b", "c")(rnd.nextInt(3))))
    val out = cases.toDF("syms")
      .select(col("syms"), Bpe.mergePair(col("syms"), "a", "b").as("m"))
      .as[(Seq[String], Seq[String])].collect()
    for ((in, m) <- out) {
      // The merge never loses or reorders characters...
      assert(m.mkString == in.mkString, s"content changed: $in -> $m")
      // ...and a greedy pass leaves no adjacent (a, b) unmerged.
      assert(!m.zip(m.drop(1)).contains(("a", "b")),
        s"unmerged pair survives: $in -> $m")
    }
  }

  test("merge list is deterministic on the synthetic corpus") {
    val docs = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "documents")
    val a = Bpe.topMerges(docs, "text", rounds = 5).collect().toSeq
    val b = Bpe.topMerges(docs, "text", rounds = 5).collect().toSeq
    assert(a == b && a.size == 5)
  }
}
