package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions
import graft.operators.{Dedup, Graph}

/** Round-4 additions: winnowing fingerprints, multi-source BFS,
  * containment dedup, Luhn gate, temperature mix, moving average.
  */
class Round4Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  // ---- winnowing -------------------------------------------------------

  test("winnowing: shared >= w+k-1-token passage shares a fingerprint") {
    // k=3, w=4: any common run of >= 6 tokens must share a window min.
    val passage = "alpha beta gamma delta epsilon zeta"
    val df = Seq(
      (1L, s"unrelated prefix words here $passage"),
      (2L, s"$passage completely different suffix tokens")).toDF("id", "t")
    val fps = df.select($"id",
        TextFunctions.winnowFingerprints($"t", 3, 4).as("fps"))
      .as[(Long, Seq[String])].collect().toMap
    assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty)
  }

  test("winnowing: fewer fingerprints than grams, deterministic") {
    val text = "one two three four five six seven eight nine ten " * 5
    val df = Seq(text).toDF("t")
    def run() = df.select(
      TextFunctions.winnowFingerprints($"t", 3, 4)).as[Seq[String]]
      .collect().head
    val a = run()
    assert(a == run())                     // deterministic
    val nGrams = text.trim.split("\\s+").length - 2
    assert(a.size < nGrams)                // ~2/(w+1) retention
  }

  // ---- BFS hops --------------------------------------------------------

  test("bfsHops: minimum hop wins when paths differ") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val out = Graph.bfsHops(edges, seeds, rounds = 3)
      .as[(Long, Long)].collect().toMap
    // 3 is reachable in 2 hops via 2, but 1 hop via the 1->3 shortcut.
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L))
  }

  test("bfsHops: bounded rounds leave far nodes absent; multi-seed min") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 3L))
      .toDF("src", "dst")
    val out = Graph.bfsHops(edges, Seq(1L, 9L).toDF("id"), rounds = 1)
      .as[(Long, Long)].collect().toMap
    // One round: 2 (from 1) and 3 (from 9, min over the 2-hop path).
    assert(out == Map(1L -> 0L, 9L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  // ---- containment -----------------------------------------------------

  test("blockedContainment: subset doc is contained, superset is not") {
    val short = "alpha beta gamma delta"
    val long = s"$short epsilon zeta eta theta iota kappa lambda mu"
    val df = Seq((1L, "en", "web", short), (2L, "en", "web", long),
      (3L, "de", "web", short)).toDF("doc_id", "lang", "source", "text")
    val out = Dedup.blockedContainment(df, "doc_id", "text",
        Seq("lang", "source"), pct = 80)
      .as[(Long, Long, Double)].collect()
    // All of short's shingles appear in long => containment 1.0; the
    // reverse direction is far below 80%; doc 3 blocks apart.
    assert(out.toSeq == Seq((1L, 2L, 1.0)))
  }

  // ---- Luhn gate -------------------------------------------------------

  test("dq_pii_luhn: valid plants pass, invalid plants fail the mod-10") {
    val row = SparkEntry.queries("dq_pii_luhn")(spark, dir).collect().head
    val (withCard, nCards, nValid, withValid) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(withCard > 0 && nValid > 0)
    assert(nValid < nCards)        // the %13 invalid plant is rejected
    assert(withValid <= withCard)
  }

  // ---- temperature mix -------------------------------------------------

  test("t_mix_temperature: integer-sqrt weights, shares sum to one") {
    val rows = SparkEntry.queries("t_mix_temperature")(spark, dir)
      .select($"n_docs", $"weight", $"share")
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, w, _) =>
      assert(w == math.floor(math.sqrt(n.toDouble * 1e6)).toLong)
    }
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-9)
  }

  // ---- moving average --------------------------------------------------

  test("w_moving_avg: first day equals its own daily average") {
    val first = SparkEntry.queries("w_moving_avg")(spark, dir)
      .limit(1).select($"n", $"avg_rev_7d").as[(Long, Double)]
      .collect().head
    assert(first._1 > 0 && first._2 > 0)
  }
}
