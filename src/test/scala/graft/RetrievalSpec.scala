package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Chunking, Retrieval, Sketches}

/** Retrieval/sketch operators: sliding-window chunking, BM25 scoring,
  * count–min heavy hitters, bloom-pruned incremental dedup.
  */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chunk: exact windows, stride overlap, short tail, empty doc") {
    val df = Seq(
      (1L, "a b c d e f g"), // 7 tokens, size 3 stride 2 -> starts 0,2,4,6?
      (2L, "x y"),           // shorter than size -> 1 chunk
      (3L, "")               // empty -> 1 empty chunk
    ).toDF("id", "t")
    val out = Chunking.chunk(df, "id", "t", size = 3, stride = 2)
      .orderBy($"id", $"chunk_ix")
      .as[(Long, Long, Long, String)].collect()
    // 7 tokens: ceil((7-3)/2)+1 = 3 chunks at starts 0, 2, 4.
    assert(out.filter(_._1 == 1L).map(_._4).toSeq ==
      Seq("a b c", "c d e", "e f g"))
    assert(out.filter(_._1 == 1L).map(_._3).toSeq == Seq(3L, 3L, 3L))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 2L, "x y")))
    assert(out.filter(_._1 == 3L).toSeq == Seq((3L, 0L, 0L, "")))
  }

  test("chunk: every token is covered and overlap matches stride") {
    val df = Seq((1L, (1 to 23).map(i => s"w$i").mkString(" ")))
      .toDF("id", "t")
    val chunks = Chunking.chunk(df, "id", "t", size = 8, stride = 5)
      .orderBy($"chunk_ix").as[(Long, Long, Long, String)].collect()
    // ceil((23-8)/5)+1 = 4 chunks; reassembling with stride-5 advance
    // reproduces the document exactly.
    assert(chunks.length == 4)
    val rebuilt = chunks.head._4.split(" ") ++
      chunks.tail.flatMap(_._4.split(" ").drop(8 - 5))
    assert(rebuilt.toSeq == (1 to 23).map(i => s"w$i"))
  }

  test("bm25: matching docs outrank non-matching; idf favors rare terms") {
    val df = Seq(
      (1L, "rare word here plus filler filler"),
      (2L, "common common common word filler x"),
      (3L, "common word filler y z w"),
      (4L, "nothing relevant at all q r")).toDF("id", "t")
    val s = Retrieval.bm25(df, "id", "t", Seq("rare", "common"))
      .as[(Long, Double)].collect().toMap
    assert(s(4L) == 0.0)
    // doc 1 holds the rarer term (df=1 vs df=2) => higher score than 3.
    assert(s(1L) > s(3L) && s(3L) > 0.0)
    assert(s(2L) > s(3L)) // higher tf of "common", same dl
  }

  test("cms: estimate >= exact, exact for isolated keys, mergeable math") {
    val df = (1 to 1000).map(i => ("k" + i % 37)).toDF("user")
    val out = Sketches.cmsHeavyHitters(df, "user", k = 5,
      depth = 3, prefixLen = 2).as[(String, Long, Long, Long)].collect()
    assert(out.length == 5)
    assert(out.forall { case (_, exact, est, over) =>
      est >= exact && over == est - exact })
    // 37 keys into 256 buckets: at least one top key should estimate
    // exactly (no collision across all three rows is overwhelmingly
    // likely and deterministic for this fixed data).
    assert(out.exists { case (_, exact, est, _) => est == exact })
  }

  test("inverted index: DF band, distinct postings, long form") {
    val docs = Seq(
      (1L, "alpha beta beta gamma"),
      (2L, "alpha gamma"),
      (3L, "alpha delta"),
      (4L, "  ")).toDF("doc_id", "text")
    val idx = graft.operators.Retrieval
      .invertedIndex(docs, "doc_id", "text", minDf = 2, maxDf = 2)
      .orderBy($"term", $"doc_id")
      .as[(String, Long, Long)].collect().toSeq
    // alpha df=3 > maxDf (capped out); beta df=1 < minDf; gamma df=2 in;
    // delta df=1 out; repeated beta counts once.
    assert(idx === Seq(("gamma", 2L, 1L), ("gamma", 2L, 2L)))
  }

  test("conjunctive query through the index equals a direct scan") {
    val docs = Seq(
      (1L, "scan hash merge sort"),
      (2L, "scan hash"),
      (3L, "scan merge hash scan"),
      (4L, "merge hash")).toDF("doc_id", "text")
    val idx = graft.operators.Retrieval
      .invertedIndex(docs, "doc_id", "text", minDf = 1)
    val hits = graft.operators.Retrieval
      .conjunctiveQuery(idx, Seq("scan", "hash", "merge"))
      .as[Long].collect().toSet
    assert(hits === Set(1L, 3L))
  }

  test("bloom prune equals plain anti-join and prunes definite-new rows") {
    val corpus = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("id", "t")
    val batch = Seq((10L, "alpha"), (11L, "delta"), (12L, "beta"),
      (13L, "epsilon")).toDF("id", "t")
    val kept = Sketches.bloomPrunedNewRows(batch, corpus, "id", "t")
      .as[Long].collect().sorted.toSeq
    assert(kept == Seq(11L, 13L))
  }
}
