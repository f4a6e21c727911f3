package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions
import graft.operators.{Decontam, Dedup}

/** Corpus-curation operators: decontamination, repetition signals, PII
  * scrub, quality-aware near-dedup.
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decontam flags train docs sharing >=minOverlap eval n-grams") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // 4 shared trigrams
      (2L, "alpha beta gamma nothing else here"),  // 1 shared trigram
      (3L, "totally unrelated words live here now")).toDF("id", "t")
    val eval = Seq((100L, "alpha beta gamma delta epsilon zeta eta"))
      .toDF("id", "t")
    val out = Decontam.overlaps(train, eval, "id", "t",
      n = 3, minOverlap = 2, maxShingleDf = 10L)
      .select($"train_id", $"n_overlap").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 4L))
  }

  test("decontam stop-gram cap drops ubiquitous shingles") {
    // "common phrase here" appears in ALL train docs: with the cap at 2
    // it is pruned and no pair reaches minOverlap=1 through it alone.
    val train = (1L to 3L)
      .map(i => (i, s"common phrase here unique$i tail$i words$i"))
      .toDF("id", "t")
    val eval = Seq((9L, "common phrase here something else entirely x"))
      .toDF("id", "t")
    val capped = Decontam.overlaps(train, eval, "id", "t",
      n = 3, minOverlap = 1, maxShingleDf = 2L)
    assert(capped.isEmpty)
    val uncapped = Decontam.overlaps(train, eval, "id", "t",
      n = 3, minOverlap = 1, maxShingleDf = 100L)
    assert(uncapped.count() == 3L)
  }

  test("repetition signals: duplicate tokens and dominant bigram") {
    val df = Seq("a b a b a b", "u v w x y z").toDF("t")
    val out = df.select(
      TextFunctions.dupTokenFrac($"t"),
      TextFunctions.topNgramFrac($"t", 2)).as[(Double, Double)].collect()
    // "a b a b a b": 6 tokens, 2 distinct -> dup 4/6; bigrams
    // [ab,ba,ab,ba,ab] -> top "a b" 3 of 5.
    assert(math.abs(out(0)._1 - 4.0 / 6) < 1e-12)
    assert(math.abs(out(0)._2 - 3.0 / 5) < 1e-12)
    assert(out(1)._1 == 0.0)
    assert(math.abs(out(1)._2 - 1.0 / 5) < 1e-12)
  }

  test("pii scrub counts and redacts emails and phones") {
    val df = Seq("reach me at bob.smith@corp.io or 555-123-4567 ok")
      .toDF("t")
    val out = df.select(
      TextFunctions.piiCount($"t", TextFunctions.EmailRegex),
      TextFunctions.piiCount($"t", TextFunctions.PhoneRegex),
      TextFunctions.redactPii($"t")).as[(Long, Long, String)].collect().head
    assert(out._1 == 1L && out._2 == 1L)
    assert(out._3 == "reach me at <EMAIL> or <PHONE> ok")
  }

  test("quality-aware near-dedup keeps the best-scoring cluster member") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 30).map(i => if (i == 7) "CHANGED" else s"w$i")
      .mkString(" ")
    // id 5 and id 2 form one cluster; score prefers id 5 (higher score),
    // so the min-id keeper (2) must NOT survive but 5 must.
    val df = Seq((5L, base, 10.0), (2L, nearDup, 1.0), (9L, "lone doc", 5.0))
      .toDF("id", "t", "score")
    val kept = Dedup.nearDedupKeptBest(df, "id", "t", 0.5, col("score"))
      .select($"id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(5L, 9L))
  }
}
