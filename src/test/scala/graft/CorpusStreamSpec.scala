package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.CorpusStream

case class Doc(doc_id: Long, text: String, lang: String, source: String,
               ingest_ts: Timestamp)

class CorpusStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(min: Int): Timestamp = new Timestamp(min * 60000L)
  private val good = "solid useful training text with enough words here"

  test("curateStream gates quality, scrubs pii, dedups across batches") {
    val input = MemoryStream[Doc](spark)
    val q = CorpusStream.curateStream(input.toDF())
      .select($"doc_id", $"text")
      .writeStream.format("memory").queryName("corpus_out")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        Doc(1, good, "en", "s0", t(5)),
        Doc(2, "x", "en", "s0", t(6)),                   // fails quality gate
        Doc(3, s"$good mail me bob@corp.io now", "en", "s1", t(7)),
        Doc(4, good, "en", "s2", t(8))))                 // in-batch dup of 1
      q.processAllAvailable()
      input.addData(Seq(
        Doc(5, good, "en", "s3", t(20)),                 // cross-batch dup
        Doc(6, s"$good but genuinely novel", "en", "s3", t(21))))
      q.processAllAvailable()
      val out = spark.table("corpus_out").as[(Long, String)].collect()
        .toMap
      assert(out.keySet == Set(1L, 3L, 6L))
      assert(out(3L) == s"$good mail me <EMAIL> now")
    } finally q.stop()
  }

  test("curateAndMixStream keeps exactly the batch mix's kept set") {
    val docs = (1 to 40).map(i =>
      Doc(i.toLong, s"$good variant $i", if (i % 2 == 0) "en" else "de",
        "s0", t(i)))
    val rates = Map("en" -> 0.5, "de" -> 0.25)
    val input = MemoryStream[Doc](spark)
    val q = CorpusStream.curateAndMixStream(input.toDF(), rates)
      .select($"doc_id")
      .writeStream.format("memory").queryName("mix_out")
      .outputMode("append").start()
    try {
      // Two micro-batches: the kept set must not depend on batching.
      input.addData(docs.take(20)); q.processAllAvailable()
      input.addData(docs.drop(20)); q.processAllAvailable()
      val streamed = spark.table("mix_out").as[Long].collect().toSet
      val batch = graft.operators.TrainingMix.weightedMix(
          docs.toDF(), "lang", "doc_id", rates)
        .select($"doc_id").as[Long].collect().toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty && streamed.size < 40)
    } finally q.stop()
  }

  test("chunk generator is stream-safe: streamed chunks equal batch chunks") {
    // Chunking is a pure per-row generator (explode over a computed
    // sequence), so the SAME operator composes onto a stream with no
    // state, and batching cannot change the output.
    val docs = Seq(
      Doc(1, (1 to 23).map(i => s"w$i").mkString(" "), "en", "s0", t(1)),
      Doc(2, "short doc", "en", "s0", t(2)))
    val input = MemoryStream[Doc](spark)
    val q = graft.operators.Chunking
      .chunk(input.toDF(), "doc_id", "text", size = 8, stride = 5)
      .writeStream.format("memory").queryName("chunks_out")
      .outputMode("append").start()
    try {
      input.addData(docs.take(1)); q.processAllAvailable()
      input.addData(docs.drop(1)); q.processAllAvailable()
      val streamed = spark.table("chunks_out")
        .as[(Long, Long, Long, String)].collect().toSet
      val batch = graft.operators.Chunking
        .chunk(docs.toDF(), "doc_id", "text", size = 8, stride = 5)
        .as[(Long, Long, Long, String)].collect().toSet
      assert(streamed === batch && streamed.size == 5)
    } finally q.stop()
  }

  test("jsonl corpus files stream exactly once via availableNow") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-corpus")
    val src = tmp.resolve("src").toString
    val ckp = tmp.resolve("ckp").toString
    Seq(Doc(1, good, "en", "s0", t(1)),
      Doc(2, s"$good with a second distinct body", "de", "s1", t(2)))
      .toDF().write.json(src)
    val stream = CorpusStream.readCorpusStream(spark, src)
    val q = graft.streaming.EventPipeline.availableNowWriter(
      CorpusStream.curateStream(stream).select($"doc_id", $"lang"), ckp)
      .format("memory").queryName("corpus_an_out").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("corpus_an_out").count() == 2)
    } finally q.stop()
  }
}
