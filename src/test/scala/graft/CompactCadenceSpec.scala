package graft

import java.io.File

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{BenfordStream, BloomStream, CmsStream,
  DriftStream, DupRateStream, KAnonStream}
import graft.operators.Benford

/** Writer-driven compaction cadence (round 12): every partial-state
  * stream writer folds its own partials every `compactEvery` batches
  * inside `foreachBatch` — bounded directory growth is a property of
  * the WRITER, not caller discipline. Each family test replays 200
  * micro-batches through the writer's `maintainBatch` (the exact
  * `foreachBatch` body) with NO explicit compact call and asserts
  * (a) the live directory count stays bounded by the cadence and
  * (b) the read face still equals the one-shot batch kernel — the
  * cadence fold changes file layout only, never contents.
  */
class CompactCadenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Batches = 200
  private val Cadence = 16

  private def freshDir(tag: String): String =
    s"${sys.props("java.io.tmpdir")}/cadence_${tag}_${System.nanoTime()}"

  /** Entries under the state root named `batch=*` — what a read has
    * to LIST; the thing the cadence must bound.
    */
  private def batchDirs(statePath: String): Int = {
    val fs = Option(new File(statePath).listFiles()).getOrElse(Array.empty)
    fs.count(f => f.isDirectory && f.getName.startsWith("batch="))
  }

  /** After 200 batches at cadence 16 the last fold ran at id 191, so
    * the live set is 1 compacted dir + ids 192..199 — the bound is
    * cadence + 1 regardless of batch count, NOT O(batches).
    */
  private def assertBounded(statePath: String): Unit = {
    val n = batchDirs(statePath)
    assert(n <= Cadence + 1, s"$n batch dirs after $Batches batches")
    assert(n == 1 + Batches % Cadence,
      s"expected 1 compacted + ${Batches % Cadence} tail dirs, saw $n")
  }

  // Three-row batches varied by batch index so the folded totals are
  // not trivially uniform; built once per family, parameterized by i.
  private def amountRows(i: Int): Seq[Double] =
    Seq(((i % 9) + 1) * 100.0, ((i % 5) + 1) * 10.0, 7.0)
  private def amounts(i: Int): DataFrame = amountRows(i).toDF("value")

  test("Benford digit writer folds on its own cadence") {
    val dir = freshDir("benford")
    (0 until Batches).foreach(i =>
      BenfordStream.maintainBatch(amounts(i), i.toLong, dir, "value",
        Cadence))
    assertBounded(dir)
    val streamed = BenfordStream.report(spark, dir)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    val all = (0 until Batches).flatMap(amountRows).toDF("value")
    val oneShot = Benford.reportFromCounts(
        Benford.firstDigitCounts(all, "value"))
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(streamed === oneShot)
    assert(streamed.map(_._2).sum === 3L * Batches)
  }

  test("Drift numeric-histogram writer folds on its own cadence") {
    val dir = freshDir("drift_num")
    (0 until Batches).foreach { i =>
      val batch = Seq(i.toLong % 97, (i * 7L) % 97, 96L).toDF("v")
      DriftStream.maintainBatch(batch, i.toLong, dir, "v", 0L, 96L, 8,
        Cadence)
    }
    assertBounded(dir)
    val total = DriftStream.currentHistogram(spark, dir)
      .agg(org.apache.spark.sql.functions.sum("n")).as[Long].head()
    assert(total === 3L * Batches)
  }

  test("Drift categorical writer folds on its own cadence") {
    val dir = freshDir("drift_cat")
    (0 until Batches).foreach { i =>
      val batch = Seq(s"lang${i % 4}", s"lang${(i + 1) % 4}", "en")
        .toDF("lang")
      DriftStream.maintainCategoryBatch(batch, i.toLong, dir, "lang",
        Cadence)
    }
    assertBounded(dir)
    val cats = DriftStream.currentCategories(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(cats.values.sum === 3L * Batches)
    assert(cats("en") === Batches.toLong)
  }

  test("CMS grid writer folds on its own cadence") {
    val dir = freshDir("cms")
    (0 until Batches).foreach { i =>
      val batch = Seq(s"k${i % 13}", s"k${i % 3}", "k0").toDF("k")
      CmsStream.maintainBatch(batch, i.toLong, dir, "k", 3, 4, Cadence)
    }
    assertBounded(dir)
    // Every depth row's counters sum to the full event count — grid
    // mass is conserved through every cadence fold.
    val byRow = CmsStream.currentGrid(spark, dir)
      .groupBy("s").agg(org.apache.spark.sql.functions.sum("c").as("t"))
      .as[(Int, Long)].collect().toMap
    assert(byRow.size === 3)
    byRow.values.foreach(t => assert(t === 3L * Batches))
  }

  test("k-anonymity QI writer folds on its own cadence") {
    val dir = freshDir("kanon")
    (0 until Batches).foreach { i =>
      val batch = Seq((s"z${i % 6}", (20 + i % 3).toString),
        (s"z${i % 6}", "20"), ("z0", "21")).toDF("zip", "age")
      KAnonStream.maintainBatch(batch, i.toLong, dir,
        Seq("zip", "age"), Cadence)
    }
    assertBounded(dir)
    val rep = KAnonStream.report(spark, dir, Seq("zip", "age"), k = 5)
      .as[(Long, Long, Long, Long)].head()
    assert(rep._1 > 0) // n_groups
    // Total rows across classes is conserved through the folds.
    val total = KAnonStream.currentCounts(spark, dir, Seq("zip", "age"))
      .agg(org.apache.spark.sql.functions.sum("n")).as[Long].head()
    assert(total === 3L * Batches)
  }

  test("dup-rate hash writer folds on its own cadence") {
    val dir = freshDir("duprate")
    (0 until Batches).foreach { i =>
      val batch = Seq(s"doc body ${i % 10}", s"doc body ${i % 25}",
        "the constant duplicate").toDF("body")
      DupRateStream.maintainBatch(batch, i.toLong, dir, "body", Cadence)
    }
    assertBounded(dir)
    val rep = DupRateStream.report(spark, dir)
      .as[(Long, Long, Long, Double)].head()
    assert(rep._1 === 3L * Batches) // n_docs conserved
    assert(rep._2 === 26L)          // i%10 bodies ⊂ i%25 bodies, +1 constant
  }

  test("bloom bit writer folds on its own cadence") {
    val dir = freshDir("bloom")
    (0 until Batches).foreach { i =>
      val batch = Seq(s"member ${i % 40}", "member always").toDF("body")
      BloomStream.maintainBatch(batch, i.toLong, dir, "body",
        BloomStream.DefaultBits, Cadence)
    }
    assertBounded(dir)
    // Zero false negatives survive every fold: every inserted text
    // probes positive from the compacted state.
    val probes = ((0 until 40).map(i => (i.toLong, s"member $i")) :+
      (99L, "member always")).toDF("id", "body")
    val verdicts = BloomStream.probe(spark, dir, probes, "id", "body")
      .as[(Long, Boolean)].collect()
    assert(verdicts.length === 41)
    assert(verdicts.forall(_._2))
  }
}
