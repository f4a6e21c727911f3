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
    val fps = Dedup.winnowSets(df, "id", "t", 3, 4)
      .as[(Long, String)].collect().groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    assert(fps(1L).intersect(fps(2L)).nonEmpty)
  }

  test("winnowing: fewer fingerprints than grams, deterministic") {
    val text = "one two three four five six seven eight nine ten " * 5
    val df = Seq((1L, text)).toDF("id", "t")
    def run() = Dedup.winnowFingerprints(df, "id", "t", 3, 4)
      .select($"n_fp").as[Long].collect().head
    val a = run()
    assert(a == run())                     // deterministic
    val nGrams = text.trim.split("\\s+").length - 2
    assert(a < nGrams)                     // ~2/(w+1) retention
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

  // ---- winnow pairs ----------------------------------------------------

  test("t_winnow_pairs: near-identical docs pair with high n_shared") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq((1L, "en", "web", base),
      (2L, "en", "web", s"$base lambda"),
      (3L, "en", "web", "totally different words entirely here now"))
      .toDF("doc_id", "lang", "source", "text")
    val fps = Dedup.winnowSets(df, "doc_id", "text", 3, 4).distinct()
    val pairs = fps.as("a").join(fps.as("b"),
        $"a._wmin" === $"b._wmin" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id", $"b.doc_id").count()
      .as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 >= 2))
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L))
  }

  // ---- keywords --------------------------------------------------------

  test("t_keywords: df band respected, score matches closed form") {
    val rows = SparkEntry.queries("t_keywords")(spark, dir)
      .select($"tf", $"df", $"score").as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    rows.foreach { case (tf, df, score) =>
      assert(df >= 2 && df * 2 <= n)
      assert(score == (tf * (2 * n - 2 * df + 1)).toDouble / (2 * df + 1))
    }
  }

  // ---- MMR re-rank -----------------------------------------------------

  test("mmrRerank: first pick is max-rel; near-dup demoted below diverse") {
    // c2 is a near-copy of c1 (sim≈1) with high rel; c3 is orthogonal
    // with lower rel. MMR must pick c1 first, then prefer c3 over c2.
    val cands = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0.99),
      (2L, Array(0.999f, 0.01f, 0.0f), 0.98),
      (3L, Array(0.0f, 1.0f, 0.0f), 0.60)).toDF("n_id", "v", "rel")
    val out = graft.operators.Similarity
      .mmrRerank(cands, "n_id", "v", "rel", k = 3,
        lambda = 0.7, mu = 0.3)
      .orderBy($"rank").as[(Long, Long, Double)].collect()
    assert(out.map(_._2).toSeq == Seq(1L, 3L, 2L))
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

  // ---- RRF fusion ------------------------------------------------------

  test("t_rrf_fusion: both-ranking docs outscore single-ranking docs") {
    val rows = SparkEntry.queries("t_rrf_fusion")(spark, dir)
      .select($"r_bm", $"r_cos", $"rrf").as[(Long, Long, Double)]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (rb, rc, rrf) =>
      assert(math.abs(rrf - (1.0 / (rb + 60) + 1.0 / (rc + 60))) == 0.0)
    }
    // A doc present in both top-20s must beat one at the same single
    // rank with the 1000-penalty on the other side.
    val both = rows.filter(r => r._1 < 1000 && r._2 < 1000)
    val single = rows.filter(r => r._1 == 1000 || r._2 == 1000)
    if (both.nonEmpty && single.nonEmpty)
      assert(both.map(_._3).min > 0 && single.map(_._3).max < 2.0 / 61)
  }

  // ---- duplicated spans ------------------------------------------------

  test("t_dup_spans: fractions in [0,1]; planted dup shares spans") {
    val rows = SparkEntry.queries("t_dup_spans")(spark, dir)
      .select($"dup_frac").as[Double].collect()
    assert(rows.nonEmpty && rows.forall(f => f >= 0.0 && f <= 1.0))
  }

  // ---- winsorized mean -------------------------------------------------

  test("olap_winsorized: clipped mean sits inside the raw min/max") {
    val cents = spark.read.parquet(s"$dir/orders.parquet")
      .select($"o_orderstatus",
        ($"o_totalprice".cast("decimal(12,2)") * 100).cast("long")
          .as("c"))
    val raw = cents.groupBy($"o_orderstatus")
      .agg(min($"c").as("mn"), max($"c").as("mx"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val wins = SparkEntry.queries("olap_winsorized")(spark, dir)
      .select($"o_orderstatus", $"wins_mean").as[(String, Double)]
      .collect()
    wins.foreach { case (st, m) =>
      val (mn, mx) = raw(st)
      assert(m * 100 >= mn && m * 100 <= mx,
        s"$st winsorized mean $m outside [$mn,$mx] cents")
    }
  }
}
