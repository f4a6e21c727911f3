package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{NativeFunctions, TextFunctions}

/** Round-16 native gram kernels ([[graft.functions.WinnowFpSet]],
  * [[graft.functions.ShinglesArr]], [[graft.functions.MinhashSig]]) must
  * be VALUE-IDENTICAL to the declarative HOF forms they replaced — this
  * spec replays both implementations over the edge-case corpus (null,
  * empty, whitespace-only, sub-gram-length, duplicate-heavy, multi-space,
  * tab/newline separators, unicode, long repeated text) and over real
  * sf0.001 documents, comparing results row by row.
  */
class GramNativeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edgeDocs = Seq(
    (1L, null.asInstanceOf[String]),
    (2L, ""),
    (3L, "   "),
    (4L, "one"),
    (5L, "one two"),
    (6L, "one two three"),
    (7L, "one two three four"),
    (8L, "a a a a a a a a"),
    (9L, "  padded   with \t tabs\nand newlines  "),
    (10L, "Mixed CASE Tokens mixed case tokens"),
    (11L, "café straße 你好 café"),
    (12L, ("lorem ipsum dolor sit amet " * 20).trim),
    (13L, "x y z x y z x y z w"),
    (14L, "É É é")
  ).toDF("id", "text")

  private def realDocs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))

  /** Original (pre-r16) winnowSets pipeline, verbatim. */
  private def winnowSetsDeclarative(df: org.apache.spark.sql.DataFrame,
                                    k: Int, w: Int) = {
    val grams = df
      .select(col("id"),
        TextFunctions.winnowGramHashes(col("text"), k).as("_gs"))
      .select(col("id"), size(col("_gs")).as("_ng"),
        posexplode(col("_gs")).as(Seq("_pos", "_h")))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("_pos"))
      .rowsBetween(-(w - 1), 0)
    grams
      .withColumn("_wmin", min(col("_h")).over(win))
      .where(col("_pos") >= least(lit(w - 1), col("_ng") - 1))
      .select(col("id"), col("_wmin"))
  }

  private def checkWinnow(df: org.apache.spark.sql.DataFrame,
                          k: Int, w: Int): Unit = {
    NativeFunctions.register(spark)
    val native = df.select(col("id"), NativeFunctions
        .winnowFpSet(TextFunctions.tokens(col("text")), k, w).as("_fps"))
      .select(col("id"), explode(col("_fps")).as("_wmin"))
      .as[(Long, String)].collect().groupBy(_._1)
      .map { case (i, v) => i -> v.map(_._2).toSet }
    val decl = winnowSetsDeclarative(df, k, w)
      .as[(Long, String)].collect().groupBy(_._1)
      .map { case (i, v) => i -> v.map(_._2).filter(_ != null).toSet }
    val ids = df.select(col("id")).as[Long].collect()
    for (i <- ids) {
      assert(native.getOrElse(i, Set.empty) == decl.getOrElse(i, Set.empty),
        s"winnow set mismatch for id=$i (k=$k, w=$w)")
    }
  }

  test("winnow_fp_set == declarative window pipeline (edge cases)") {
    for ((k, w) <- Seq((3, 4), (1, 1), (2, 7), (5, 2)))
      checkWinnow(edgeDocs, k, w)
  }

  test("winnow_fp_set == declarative window pipeline (sf0.001 corpus)") {
    checkWinnow(realDocs, 3, 4)
  }

  test("winnow_fp_set output is sorted distinct; null text -> empty set") {
    NativeFunctions.register(spark)
    val rows = edgeDocs.select(col("id"), NativeFunctions
        .winnowFpSet(TextFunctions.tokens(col("text")), 3, 4).as("f"))
      .as[(Long, Seq[String])].collect().toMap
    assert(rows(1L).isEmpty)                       // null text
    rows.values.foreach { f =>
      assert(f == f.distinct.sorted)               // ascending, deduped
    }
    // empty/whitespace text: one gram = md5("")
    assert(rows(2L) == Seq("d41d8cd98f00b204e9800998ecf8427e"))
    assert(rows(3L) == rows(2L))
  }

  private def checkShingles(df: org.apache.spark.sql.DataFrame,
                            n: Int): Unit = {
    NativeFunctions.register(spark)
    // Unsorted native form: same element SET, same size (distinct), and
    // the sorted native form must equal sort_array of the declarative.
    val natUnsorted = df.select(col("id"),
        TextFunctions.shingles(col("text"), n).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    val natSorted = df.select(col("id"),
        TextFunctions.sortedShingles(col("text"), n).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    val decl = df.select(col("id"),
        TextFunctions.shinglesDeclarative(col("text"), n).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    val declSorted = df.select(col("id"),
        sort_array(TextFunctions.shinglesDeclarative(col("text"), n)).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    for ((i, d) <- decl) {
      assert(natUnsorted(i) == d,
        s"shingles mismatch (first-occurrence order) id=$i n=$n")
      assert(natSorted(i) == declSorted(i),
        s"sortedShingles mismatch id=$i n=$n")
    }
  }

  test("shingles_arr == declarative array_distinct/transform (edges)") {
    for (n <- Seq(1, 2, 3, 5, 8)) checkShingles(edgeDocs, n)
  }

  test("shingles_arr == declarative (sf0.001 corpus)") {
    checkShingles(realDocs, 3)
  }

  private def checkMinhash(df: org.apache.spark.sql.DataFrame,
                           n: Int, k: Int): Unit = {
    NativeFunctions.register(spark)
    val sh = df.select(col("id"),
      TextFunctions.sortedShingles(col("text"), n).as("sh"))
    val nat = sh.select(col("id"),
        TextFunctions.minhashFromShingles(col("sh"), k).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val decl = sh.select(col("id"),
        TextFunctions.minhashFromShinglesDeclarative(col("sh"), k).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    for ((i, d) <- decl)
      assert(nat(i) == d, s"minhash mismatch id=$i n=$n k=$k")
  }

  test("minhash_sig == declarative chained transforms (edges)") {
    for ((n, k) <- Seq((3, 12), (2, 1), (5, 16))) checkMinhash(edgeDocs, n, k)
  }

  test("minhash_sig == declarative (sf0.001 corpus)") {
    checkMinhash(realDocs, 3, 12)
  }

  test("winnowFingerprints matches the pre-r16 aggregate semantics") {
    // n_fp = countDistinct(_wmin), fp_min/max = min/max — replayed over
    // the declarative rows vs the new size/array_min/array_max form.
    NativeFunctions.register(spark)
    val now = graft.operators.Dedup
      .winnowFingerprints(edgeDocs, "id", "text", 3, 4)
      .as[(Long, Long, String, String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    val old = winnowSetsDeclarative(edgeDocs, 3, 4)
      .groupBy(col("id"))
      .agg(countDistinct(col("_wmin")).as("n_fp"),
        min(col("_wmin")).as("fp_min"), max(col("_wmin")).as("fp_max"))
      .as[(Long, Long, String, String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(now.keySet == old.keySet)
    for ((i, o) <- old) assert(now(i) == o, s"winnowFingerprints id=$i")
  }
}
