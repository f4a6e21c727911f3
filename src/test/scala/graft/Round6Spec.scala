package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 session additions: invariants of the new curation gates,
  * line dedup, soft sampling, ABC classes, and session paths that the
  * oracles cannot express (cross-run determinism, monotonicity,
  * reconstruction properties).
  */
class Round6Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) =
    SparkEntry.queries(name)(spark, dir)

  // ---- line dedup ------------------------------------------------------

  test("line dedup: kept lines reconstruct a subsequence of the original") {
    // Every doc's text_kept must be its original pseudo-line sequence
    // with some lines removed — order preserved, nothing invented.
    val rows = q("t_line_dedup")
      .select($"doc_id", $"text_kept").as[(Long, String)]
      .collect().toMap
    val orig = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", lower(trim($"text")).as("t"))
      .as[(Long, String)].collect().toMap
    for ((id, kept) <- rows.take(50) if kept.nonEmpty) {
      val toks = orig(id).split("\\s+").filter(_.nonEmpty)
      val lines = toks.grouped(10).map(_.mkString(" ")).toSeq
      val keptLines = kept.split(" ").grouped(10).map(_.mkString(" "))
      // subsequence check against the doc's own line sequence
      var i = 0
      for (kl <- keptLines) {
        val j = lines.indexOf(kl, i)
        assert(j >= i, s"doc $id: kept line not in original order")
        i = j + 1
      }
    }
  }

  test("line dedup: total kept lines equals distinct line count") {
    // Exactly one survivor per distinct line text, corpus-wide.
    val kept = q("t_line_dedup").agg(sum($"n_kept")).as[Long].collect().head
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val distinctLines = docs
      .select($"doc_id", explode(expr(
        """transform(sequence(0, (size(filter(split(lower(trim(text)), '\\s+'), x -> length(x) > 0)) - 1) div 10),
          |i -> array_join(slice(filter(split(lower(trim(text)), '\\s+'), x -> length(x) > 0), i * 10 + 1, 10), ' '))"""
          .stripMargin)).as("line"))
      .select($"line").distinct().count()
    assert(kept == distinctLines)
  }

  // ---- soft sampling ---------------------------------------------------

  test("soft sampling: the max-score doc always survives; keep is monotone in score at fixed hash") {
    val rows = q("t_soft_sample")
      .select($"doc_id", $"score", $"h", $"keep")
      .as[(Long, Long, Long, Boolean)].collect()
    val smax = rows.map(_._2).max
    assert(rows.filter(_._2 == smax).forall(_._4),
      "a doc at the score max must always be kept (h < 2^31 strictly)")
    // Decision replay: keep ⇔ h·smax < max(score,0)·2^31.
    for ((_, s, h, k) <- rows)
      assert(k == (h * smax < math.max(s, 0L) * 2147483648L))
    // Zero-or-negative scores never survive.
    assert(rows.filter(_._2 <= 0).forall(!_._4))
  }

  // ---- ABC classes -----------------------------------------------------

  test("ABC classes are monotone down the revenue ranking") {
    val rows = q("olap_abc")
      .select($"cents", $"cum", $"cls")
      .as[(Long, Long, String)].collect()
      .sortBy(r => (-r._1, r._2)) // revenue desc = cum asc order
    val classes = rows.map(_._3)
    // Once the running share passes a cut, the class never goes back.
    val order = Map("A" -> 0, "B" -> 1, "C" -> 2)
    assert(classes.map(order).sliding(2).forall(w =>
      w.length < 2 || w(0) <= w(1)))
    // The A slice carries at most 80% + one part of total revenue.
    val total = rows.map(_._1).sum
    val aRev = rows.filter(_._3 == "A").map(_._1).sum
    assert(aRev * 100 <= total * 80 + rows.map(_._1).max * 100)
  }

  // ---- quality rank ----------------------------------------------------

  test("quality rank keeps at least half of every multi-doc source") {
    val perSource = q("t_quality_rank")
      .groupBy($"source")
      .agg(count(lit(1)).as("n"),
        sum(when($"keep", 1L).otherwise(0L)).as("k"))
      .as[(String, Long, Long)].collect()
    for ((src, n, k) <- perSource if n > 1) {
      // percent_rank >= 0.5 keeps the top half (rounded up at ties).
      assert(k * 2 >= n - 1, s"source $src kept $k of $n")
      assert(k < n || n == 1, s"source $src kept everything")
    }
  }

  // ---- session paths ---------------------------------------------------

  test("session paths cover every event exactly once") {
    // Σ (path length · count) over ALL sessions = event count.
    val e = spark.read.parquet(s"$dir/events.parquet")
      .where($"ts".isNotNull)
    val total = e.count()
    val paths = e
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .agg(sum($"n")).as[Long].collect().head
    assert(paths == total)
  }

  // ---- link prediction -------------------------------------------------

  test("link prediction never proposes an existing edge, and jaccard is in (0, 1]") {
    val pred = q("g_link_predict")
      .select($"node_a", $"node_b", $"jaccard")
      .as[(Long, Long, Double)].collect()
    assert(pred.nonEmpty)
    val edges = graft.operators.Itemsets.frequentPairs(
        graft.sources.Tables.load(spark, dir, "lineitem"),
        "l_orderkey", "l_partkey", minSupport = 2L)
      .select($"item_a", $"item_b").as[(Long, Long)].collect().toSet
    for ((a, b, j) <- pred) {
      assert(a < b, "pairs must be canonical a < b")
      assert(!edges.contains((a, b)), s"($a,$b) is already an edge")
      assert(j > 0.0 && j <= 1.0, s"jaccard $j out of range")
    }
    // Scores arrive ranked: non-increasing jaccard down the list.
    val js = pred.map(_._3)
    assert(js.zip(js.drop(1)).forall { case (x, y) => x >= y })
  }

  // ---- assortativity ---------------------------------------------------

  test("assortativity is a correlation: |r| <= 1 on the co-purchase graph") {
    val Array((m, r)) = q("g_assortativity")
      .as[(Long, Option[Double])].collect()
    assert(m > 0)
    assert(r.forall(v => v >= -1.0 && v <= 1.0))
  }

  // ---- proportional stratified sampling --------------------------------

  test("proportional sample: allocation sums to min(K, N) and no stratum overdraws") {
    val rows = q("t_proportional_sample")
      .select($"lang", $"n_i", $"k_i", $"doc_id")
      .as[(String, Long, Long, Long)].collect()
    val byLang = rows.groupBy(_._1)
    // Each stratum yields exactly min(k_i, n_i) rows, k_i never exceeds
    // what largest-remainder can grant (base + 1).
    for ((_, rs) <- byLang) {
      val (n_i, k_i) = (rs.head._2, rs.head._3)
      assert(rs.length == math.min(k_i, n_i).toInt)
      assert(rs.map(_._4).distinct.length == rs.length)
    }
    // The grant total is the full budget when the corpus can fill it.
    val n = byLang.values.map(_.head._2).sum
    val granted = byLang.values.map(_.head._3).sum
    assert(granted == 100L || n < 100L)
  }

  // ---- markov next-event accuracy --------------------------------------

  test("markov accuracy is a proper rate and eval pairs all post-date the split") {
    val rows = q("ev_markov_next")
      .select($"n_eval", $"n_correct", $"accuracy")
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    for ((ne, nc, acc) <- rows) {
      assert(nc >= 0 && nc <= ne)
      assert(acc == nc.toDouble / ne.toDouble)
    }
  }

  // ---- dyadic EWMA -----------------------------------------------------

  test("ewma stays inside its trailing window's range and equals n on the first row") {
    val rows = q("ev_ewma")
      .select($"event_type", $"day", $"n", $"ewma")
      .as[(String, java.sql.Date, Long, Double)].collect()
    for ((_, series) <- rows.groupBy(_._1)) {
      val s = series.sortBy(_._2.getTime)
      assert(s.head._4 == s.head._3.toDouble,
        "no history: ewma must equal the raw count")
      for (i <- s.indices) {
        val window = s.slice(math.max(0, i - 7), i + 1).map(_._3)
        assert(s(i)._4 >= window.min.toDouble &&
          s(i)._4 <= window.max.toDouble,
          s"ewma escapes its trailing window at index $i")
      }
    }
  }

  // ---- collocations ----------------------------------------------------

  test("collocations: counts are consistent and ranking is by lift") {
    val rows = q("t_collocations")
      .select($"c_ab", $"c_a", $"c_b", $"lift")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    for ((cab, ca, cb, lift) <- rows) {
      assert(cab >= 5 && cab <= ca && cab <= cb)
      assert(lift > 0.0)
    }
    val ls = rows.map(_._4)
    assert(ls.zip(ls.drop(1)).forall { case (x, y) => x >= y })
  }

  // ---- most-frequent-value profile ------------------------------------

  test("mfv profile: the mode's share is a proper fraction of a consistent total") {
    val rows = q("dq_mfv_profile")
      .select($"n_rows", $"n_distinct", $"top_n", $"top_share")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    for ((n, nd, tn, share) <- rows) {
      assert(nd >= 1 && tn >= 1 && tn <= n)
      assert(tn * nd >= n, "the mode must cover at least the mean share")
      assert(share == tn.toDouble / n.toDouble)
    }
  }

  // ---- range search ----------------------------------------------------

  test("range search agrees with brute-force top-k where they overlap") {
    // Every top-k hit whose score clears the radius must appear in the
    // range result with the same score, and vice versa for the top-k
    // depth — the two retrieval faces are views of one scored scan.
    val range = q("sim_range_search")
      .select($"q_id", $"n_id", $"cos").as[(Long, Long, Double)]
      .collect().map { case (a, b, c) => ((a, b), c) }.toMap
    val topk = q("sim_topk_brute")
      .select($"q_id", $"n_id", $"cos").as[(Long, Long, Double)]
      .collect()
    for ((qid, nid, cos) <- topk if cos >= 0.25)
      assert(range.get((qid, nid)).contains(cos),
        s"top-k hit ($qid,$nid) at $cos missing from range result")
    assert(range.values.forall(_ >= 0.25))
  }

  // ---- audience overlap ------------------------------------------------

  test("audience overlap: bounds and full matrix") {
    val rows = q("ev_audience_overlap")
      .select($"n_a", $"n_b", $"n_both", $"jaccard", $"overlap")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(rows.length == 10, "C(5,2) type pairs expected")
    for ((na, nb, nboth, j, o) <- rows) {
      assert(nboth <= math.min(na, nb))
      assert(j >= 0.0 && j <= o && o <= 1.0,
        "jaccard <= overlap coefficient <= 1 always")
    }
  }

  // ---- lexical richness ------------------------------------------------

  test("lexical richness: hapax <= types <= tokens per language") {
    val rows = q("t_lexical_richness")
      .select($"n_tokens", $"n_types", $"n_hapax", $"ttr", $"hapax_share")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    for ((tok, ty, hap, ttr, hs) <- rows) {
      assert(hap <= ty && ty <= tok)
      assert(ttr == ty.toDouble / tok.toDouble)
      assert(hs == hap.toDouble / ty.toDouble)
    }
  }

  // ---- growth accounting ----------------------------------------------

  test("growth accounting: actives decompose exactly and ledgers reconcile") {
    val rows = q("ev_growth_accounting")
      .select($"wk", $"n_new", $"n_retained", $"n_resurrected",
        $"n_churned")
      .as[(java.sql.Date, Long, Long, Long, Long)].collect()
      .sortBy(_._1.getTime)
    assert(rows.nonEmpty)
    // Total new across all weeks = total distinct users (each user is
    // new exactly once).
    val users = spark.read.parquet(s"$dir/events.parquet")
      .where($"ts".isNotNull).select($"user_id").distinct().count()
    assert(rows.map(_._2).sum == users)
    // Week-over-week ledger: actives(w) = retained(w+1) + churned-or-
    // dormant; retained(w+1) can never exceed actives(w).
    for (pair <- rows.sliding(2) if pair.length == 2 &&
        pair(1)._1.getTime - pair(0)._1.getTime == 7L * 86400000L) {
      val (a, b) = (pair(0), pair(1))
      val activesA = a._2 + a._3 + a._4
      assert(b._3 <= activesA, s"retained at ${b._1} exceeds actives")
      assert(b._5 + b._3 == activesA,
        s"churned+retained at ${b._1} must account for ${a._1} actives")
    }
  }

  // ---- IQR anomaly fences ---------------------------------------------

  test("IQR fences: quartiles are order statistics and flags match the fence") {
    val rows = q("ev_anomaly_iqr")
      .select($"event_type", $"n", $"q1", $"q3", $"is_outlier")
      .as[(String, Long, Long, Long, Boolean)].collect()
    for ((ty, series) <- rows.groupBy(_._1)) {
      val ns = series.map(_._2).sorted
      val (q1, q3) = (series.head._3, series.head._4)
      assert(ns.contains(q1) && ns.contains(q3),
        s"$ty: quartiles must be actual data values")
      assert(q1 <= q3)
      for ((_, n, a, b, flag) <- series)
        assert(flag == (2 * n < 2 * a - 3 * (b - a) ||
          2 * n > 2 * b + 3 * (b - a)))
    }
  }

  // ---- language-ID PRF -------------------------------------------------

  test("langid PRF: metrics reconcile with the confusion matrix") {
    val conf = q("t_lang_confusion")
      .select($"lang", $"lang_pred", $"n").as[(String, String, Long)]
      .collect()
    val prf = q("t_langid_prf")
      .select($"cls", $"n_actual", $"n_pred", $"tp")
      .as[(String, Long, Long, Long)].collect()
    for ((cls, na, np, tp) <- prf) {
      assert(na == conf.filter(_._1 == cls).map(_._3).sum)
      assert(np == conf.filter(_._2 == cls).map(_._3).sum)
      assert(tp == conf.filter(c => c._1 == cls && c._2 == cls)
        .map(_._3).sum)
    }
  }

  // ---- frequent triples ------------------------------------------------

  test("frequent triples: a-priori closure holds and support is bounded by sub-pairs") {
    // Recompute pairs at the triples' own support floor (fi_pairs ships
    // at minSupport=3; the triples mine at 2 to keep level 3 populated).
    val pairs = graft.operators.Itemsets.frequentPairs(
        graft.sources.Tables.load(spark, dir, "lineitem"),
        "l_orderkey", "l_partkey", minSupport = 2L)
      .select($"item_a", $"item_b", $"support")
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, s) => ((a, b), s) }.toMap
    val triples = q("fi_triples")
      .select($"item_a", $"item_b", $"item_c", $"support")
      .as[(Long, Long, Long, Long)].collect()
    assert(triples.nonEmpty, "templated baskets must yield some triple")
    for ((a, b, c, s) <- triples) {
      assert(a < b && b < c, "canonical order")
      val subs = Seq((a, b), (a, c), (b, c)).map(k =>
        pairs.getOrElse(k, fail(s"sub-pair $k of ($a,$b,$c) not frequent")))
      assert(s >= 2 && s <= subs.min,
        "triple support can never exceed any sub-pair's")
    }
  }

  // ---- time-decay attribution -----------------------------------------

  test("decay attribution: credits are a partition of one and purchases match linear") {
    val decay = q("ev_attrib_decay")
      .select($"p_id", $"n_touch", $"view_credit", $"click_credit")
      .as[(Long, Long, Option[Double], Option[Double])].collect()
    val linear = q("ev_attrib_linear").select($"p_id").as[Long]
      .collect().toSet
    assert(decay.map(_._1).toSet == linear,
      "both attribution models cover the same purchase set")
    for ((id, nt, v, c) <- decay) {
      if (nt == 0) assert(v.isEmpty && c.isEmpty)
      else {
        val s = v.get + c.get
        assert(math.abs(s - 1.0) < 1e-12, s"purchase $id credits sum $s")
      }
    }
  }

  // ---- lag correlation -------------------------------------------------

  test("lag correlation: r bounded, all seven lags reported") {
    val rows = q("ev_lag_correlation")
      .select($"lag", $"n_days", $"r")
      .as[(Int, Long, Option[Double])].collect()
    assert(rows.map(_._1).sorted.toSeq == (-3 to 3))
    for ((_, nd, r) <- rows) {
      assert(nd > 0)
      assert(r.forall(v => v >= -1.0 && v <= 1.0))
    }
  }

  // ---- p-chart ---------------------------------------------------------

  test("p-chart: integer flag agrees with the float fence and totals reconcile") {
    val rows = q("ev_error_pchart")
      .select($"n", $"e", $"rate", $"rate_bar", $"out_of_control")
      .as[(Long, Long, Double, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    val (nn, ee) = (rows.map(_._1).sum, rows.map(_._2).sum)
    for ((n, e, rate, rateBar, flag) <- rows) {
      assert(rate == e.toDouble / n.toDouble)
      assert(rateBar == ee.toDouble / nn.toDouble)
      // The exact integer test must agree with the real-valued fence
      // it encodes (float check is a sanity bound, not the gate).
      val sigma = math.sqrt(rateBar * (1 - rateBar) / n)
      val floatFlag = math.abs(rate - rateBar) > 3 * sigma
      assert(flag == floatFlag,
        s"integer and float fences disagree at n=$n e=$e")
    }
  }

  // ---- degree distribution --------------------------------------------

  test("degree distribution: dyadic buckets tile the degree range exactly") {
    val rows = q("g_degree_dist")
      .select($"bucket", $"n_nodes", $"min_deg", $"max_deg")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    var total = 0L
    for ((b, n, lo, hi) <- rows) {
      assert(lo >= (1L << b) && hi < (1L << (b + 1)),
        s"bucket $b range [$lo,$hi] escapes [2^$b, 2^${b + 1})")
      assert(lo <= hi && n > 0)
      total += n
    }
    // Node total equals the graph's vertex count.
    val edges = graft.operators.Itemsets.frequentPairs(
        graft.sources.Tables.load(spark, dir, "lineitem"),
        "l_orderkey", "l_partkey", minSupport = 2L)
      .select($"item_a", $"item_b").as[(Long, Long)].collect()
    assert(total == edges.flatMap(p => Seq(p._1, p._2)).distinct.length)
  }

  // ---- duplication rate ------------------------------------------------

  test("dup-rate report: counts reconcile and rate is exact") {
    val rows = q("dq_dup_rate_source")
      .select($"n_docs", $"n_distinct", $"n_dup_rows", $"dup_rate")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    for ((nd, nu, ndup, rate) <- rows) {
      assert(nu + ndup == nd, "distinct + duplicates = documents")
      assert(rate == ndup.toDouble / nd.toDouble)
    }
  }

  // ---- LSH bucket balance ---------------------------------------------

  test("bucket balance: shares sum to one and pair counts price the join") {
    val rows = q("sim_bucket_balance")
      .select($"n_vecs", $"share", $"n_pairs")
      .as[(Long, Double, Long)].collect()
    assert(rows.nonEmpty)
    val total = rows.map(_._1).sum
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-12)
    for ((n, share, pairs) <- rows) {
      assert(share == n.toDouble / total.toDouble)
      assert(pairs == n * (n - 1) / 2)
    }
    // The report's Σpairs is exactly the bucketed self-join's row count.
    val v = spark.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("bucket", graft.operators.Similarity.projectionBucket(
        $"embedding",
        graft.operators.Similarity.lshPlanes(dim = 64, nBits = 4,
          seed = 42L)))
    val joinRows = v.as("a").join(v.as("b"),
        $"a.bucket" === $"b.bucket" && $"a.vec_id" < $"b.vec_id").count()
    assert(rows.map(_._3).sum == joinRows)
  }

  // ---- basket stats ----------------------------------------------------

  test("basket stats: pair bill equals the frequent-pair join's input") {
    val rows = q("fi_basket_stats")
      .select($"n_baskets", $"min_size", $"max_size", $"n_pairs")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val b = spark.read.parquet(s"$dir/lineitem.parquet")
      .where($"l_orderkey".isNotNull && $"l_partkey".isNotNull)
      .select($"l_orderkey".as("bk"), $"l_partkey".as("it")).distinct()
    val pairJoinRows = b.as("a").join(b.as("c"),
        $"a.bk" === $"c.bk" && $"a.it" < $"c.it").count()
    assert(rows.map(_._4).sum == pairJoinRows,
      "Σ sz(sz−1)/2 must equal the basket self-join's row count")
    assert(rows.map(_._1).sum == b.select($"bk").distinct().count())
  }

  // ---- customer migration ---------------------------------------------

  test("customer migration: matrix covers exactly the year-one customers") {
    val rows = q("w_customer_migration")
      .select($"band_y1", $"band_y2", $"n_customers")
      .as[(String, String, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set("low", "mid", "high")(r._1)))
    assert(rows.forall(r => Set("low", "mid", "high", "none")(r._2)))
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val y0 = o.agg(min(year($"o_orderdate"))).as[Int].collect().head
    val y1Customers = o.where(year($"o_orderdate") === y0)
      .select($"o_custkey").distinct().count()
    assert(rows.map(_._3).sum == y1Customers)
  }

  // ---- CCNet buckets ---------------------------------------------------

  test("ccnet buckets: tercile cuts are order statistics and buckets are ordered") {
    val rows = q("t_ccnet_buckets")
      .select($"score_milli", $"t33", $"t67", $"bucket")
      .as[(Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    val (t33, t67) = (rows.head._2, rows.head._3)
    assert(t33 <= t67)
    val scores = rows.map(_._1)
    assert(scores.contains(t33) && scores.contains(t67),
      "cuts must be actual score values (nearest-rank)")
    for ((s, _, _, b) <- rows) b match {
      case "head"   => assert(s >= t67)
      case "middle" => assert(s >= t33 && s < t67)
      case "tail"   => assert(s < t33)
      case other    => fail(s"unknown bucket $other")
    }
    // Terciles split roughly in thirds (nearest-rank slack allowed).
    val n = rows.length
    assert(rows.count(_._4 == "tail") <= n / 2)
    assert(rows.count(_._4 == "head") >= n / 6)
  }

  // ---- near-dup profile ------------------------------------------------

  test("neardup profile: document mass is conserved across cluster sizes") {
    val rows = q("t_neardup_profile")
      .select($"cluster_size", $"n_clusters", $"n_docs")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    for ((sz, nc, ndocs) <- rows) assert(ndocs == sz * nc && nc > 0)
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_._3).sum == total,
      "every document lands in exactly one cluster-size row")
  }

  // ---- heatmap ---------------------------------------------------------

  test("heatmap: cells tile the event count and axes stay in range") {
    val rows = q("ev_heatmap")
      .select($"dow", $"hod", $"n", $"share")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 6))
    assert(rows.forall(r => r._2 >= 0 && r._2 <= 23))
    val total = spark.read.parquet(s"$dir/events.parquet")
      .where($"ts".isNotNull).count()
    assert(rows.map(_._3).sum == total)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9)
  }

  // ---- context fit -----------------------------------------------------

  test("context fit: cumulative share is monotone and ends at one") {
    val rows = q("t_context_fit")
      .select($"bucket", $"n_docs", $"n_tokens", $"fit_share")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    val shares = rows.map(_._4)
    assert(shares.zip(shares.drop(1)).forall { case (a, b) => a <= b })
    assert(shares.last == 1.0)
    for ((b, nd, nt, _) <- rows)
      assert(nt >= nd * (1L << b) && nt < nd * (1L << (b + 1)),
        s"bucket $b token mass outside its dyadic range")
  }

  // ---- apdex -----------------------------------------------------------

  test("apdex: bands partition and the score is the exact single division") {
    val rows = q("ev_apdex")
      .select($"n", $"n_satisfied", $"n_tolerating", $"apdex")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    for ((n, sat, tol, a) <- rows) {
      assert(sat + tol <= n)
      assert(a == (2 * sat + tol).toDouble / (2 * n).toDouble)
      assert(a >= 0.0 && a <= 1.0)
    }
  }

  // ---- user diversity --------------------------------------------------

  test("user diversity: bounded by the type count and zero for single-type users") {
    val rows = q("ev_user_diversity")
      .select($"n_events", $"n_types", $"sum_c2", $"diversity")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    for ((n, ty, c2, div) <- rows) {
      assert(div == 1.0 - c2.toDouble / (n * n).toDouble)
      if (ty == 1) assert(div == 0.0)
      // Simpson is maximized by the uniform mix: 1 − 1/k.
      assert(div >= 0.0 && div <= 1.0 - 1.0 / ty)
    }
  }

  // ---- gate ablation ---------------------------------------------------

  test("gate ablation: masks encode the bits and shares tile the corpus") {
    val rows = q("t_gate_ablation")
      .select($"mask", $"g_len", $"g_stop", $"g_rep", $"n_docs", $"share")
      .as[(Long, Boolean, Boolean, Boolean, Long, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 8)
    assert(rows.map(_._1).distinct.length == rows.length)
    for ((m, gl, gs, gr, _, _) <- rows)
      assert(m == (if (gl) 1 else 0) + (if (gs) 2 else 0) +
        (if (gr) 4 else 0))
    val total = rows.map(_._5).sum
    assert(total == spark.read.parquet(s"$dir/documents.parquet").count())
    assert(math.abs(rows.map(_._6).sum - 1.0) < 1e-12)
  }

  // ---- first-touch attribution ----------------------------------------

  test("first-touch channel mix covers exactly the touched purchases") {
    val first = q("ev_attrib_first")
      .select($"first_channel", $"n_purchases").as[(String, Long)]
      .collect()
    assert(first.nonEmpty)
    assert(first.forall(r => Set("view", "click")(r._1)))
    // Purchases with >=1 touch per the linear model = first-touch total
    // (both read the same 24h band; linear keeps touchless rows with
    // n_touch = 0, first-touch drops them).
    val touched = q("ev_attrib_linear")
      .select($"n_touch").as[Long].collect().count(_ > 0)
    assert(first.map(_._2).sum == touched)
  }

  // ---- cart abandonment ------------------------------------------------

  test("cart abandonment: converted never exceeds views and the rate is exact") {
    val rows = q("ev_cart_abandonment")
      .select($"n_views", $"n_converted", $"abandon_rate")
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    for ((v, c, r) <- rows) {
      assert(c <= v)
      assert(r == (v - c).toDouble / v.toDouble)
    }
  }

  // ---- dimension variance ----------------------------------------------

  test("dimension variance: 64 live dims, non-negative variance, full count") {
    val rows = q("sim_dim_variance")
      .select($"dim", $"n", $"variance").as[(Long, Long, Double)]
      .collect()
    assert(rows.map(_._1).sorted.toSeq == (0L until 64L))
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.forall(_._2 == vecs))
    assert(rows.forall(_._3 >= 0.0))
  }

  // ---- knn purity ------------------------------------------------------

  test("knn purity: neighbor ledger is consistent and purity bounded") {
    val rows = q("sim_knn_purity")
      .select($"n_queries", $"n_neighbors", $"n_same", $"purity")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    for ((nq, nn, ns, p) <- rows) {
      assert(nn <= nq * 3, "at most 3 neighbors per query")
      assert(ns <= nn)
      assert(p == ns.toDouble / nn.toDouble)
    }
  }

  // ---- cross-source overlap -------------------------------------------

  test("cross-source overlap is symmetric-canonical and capped shingles only") {
    val rows = q("t_cross_source_overlap")
      .select($"source_a", $"source_b", $"n_shared_shingles")
      .as[(String, String, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._1 < r._2), "canonical pair order")
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
    assert(rows.forall(_._3 > 0))
  }

  // ---- seasonality -----------------------------------------------------

  test("seasonality: indices average to one over the twelve months") {
    val rows = q("w_seasonality_index")
      .select($"mon", $"seasonality").as[(Long, Double)].collect()
    assert(rows.map(_._1).sorted.toSeq == (1L to 12L))
    // Σ (12·m/T) = 12 exactly when every month is present.
    assert(math.abs(rows.map(_._2).sum - 12.0) < 1e-9)
    assert(rows.forall(_._2 > 0))
  }

  // ---- delta contribution ---------------------------------------------

  test("delta contribution: shares decompose the total change exactly") {
    val rows = q("olap_delta_contribution")
      .select($"rev_y1", $"rev_y2", $"delta", $"share_of_change")
      .as[(Double, Double, Double, Option[Double])].collect()
    assert(rows.nonEmpty)
    for ((a, b, dl, _) <- rows)
      assert(math.abs(dl - (b - a)) < 1e-9)
    val totalDelta = rows.map(_._3).sum
    if (math.abs(totalDelta) > 1e-9)
      assert(math.abs(rows.flatMap(_._4).sum - 1.0) < 1e-9,
        "waterfall shares must sum to one")
  }

  // ---- label separation -----------------------------------------------

  test("label separation: full matrix of valid cosines") {
    val rows = q("sim_label_separation")
      .select($"label_a", $"label_b", $"centroid_cos")
      .as[(Long, Long, Double)].collect()
    assert(rows.length == 45, "C(10,2) label pairs")
    assert(rows.forall(r => r._1 < r._2))
    assert(rows.forall(r => r._3 >= -1.0 && r._3 <= 1.0))
  }

  // ---- id continuity ---------------------------------------------------

  test("id continuity: spans reconcile and dense tables report zero missing") {
    val rows = q("dq_id_continuity")
      .select($"table_name", $"min_id", $"max_id", $"n_ids", $"n_missing")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq ==
      Seq("documents", "events", "orders"))
    for ((tn, lo, hi, n, miss) <- rows) {
      assert(miss == hi - lo + 1 - n, s"$tn ledger broken")
      assert(miss >= 0 && n >= 1)
    }
  }

  // ---- dedup savings ---------------------------------------------------

  test("dedup savings reconciles with the keeper set and token totals") {
    val Array((nd, ndk, nt, ntk, dsv, tsv)) = q("t_dedup_savings")
      .as[(Long, Long, Long, Long, Double, Double)].collect()
    assert(ndk <= nd && ntk <= nt)
    val keptCount = q("t_neardup_kept").count()
    assert(ndk == keptCount)
    assert(dsv == (nd - ndk).toDouble / nd.toDouble)
    assert(tsv == (nt - ntk).toDouble / nt.toDouble)
  }

  // ---- ccnet fairness matrix ------------------------------------------

  test("ccnet-by-lang: per-language shares tile and totals match the split") {
    val rows = q("t_ccnet_by_lang")
      .select($"lang", $"bucket", $"n_docs", $"n_lang", $"share_of_lang")
      .as[(String, String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    for ((_, perLang) <- rows.groupBy(_._1)) {
      assert(perLang.map(_._3).sum == perLang.head._4)
      assert(math.abs(perLang.map(_._5).sum - 1.0) < 1e-12)
    }
    // Cross-check: bucket totals equal t_ccnet_buckets' split exactly.
    val byBucket = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum)
    val direct = q("t_ccnet_buckets").groupBy($"bucket").count()
      .as[(String, Long)].collect().toMap
    for ((b, n) <- byBucket) assert(direct(b) == n,
      s"bucket $b: fairness matrix $n vs direct split ${direct(b)}")
  }

  // ---- norm audit ------------------------------------------------------

  test("norm audit: flags partition and cover every vector") {
    val rows = q("sim_norm_audit")
      .select($"n_vecs", $"n_dead", $"n_exploding", $"flagged_share")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    for ((n, d, e, sh) <- rows) {
      assert(d + e <= n)
      assert(sh == (d + e).toDouble / n.toDouble)
    }
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.map(_._1).sum == vecs)
  }

  // ---- session depth ---------------------------------------------------

  test("session depth: event mass reconciles with the event log") {
    val rows = q("ev_session_depth")
      .select($"bucket", $"n_sessions", $"min_depth", $"max_depth",
        $"n_events")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    for ((b, ns, lo, hi, ne) <- rows) {
      assert(lo >= (1L << b) && hi < (1L << (b + 1)))
      assert(ne >= ns * lo && ne <= ns * hi)
    }
    val total = spark.read.parquet(s"$dir/events.parquet")
      .where($"ts".isNotNull).count()
    assert(rows.map(_._5).sum == total,
      "every event lands in exactly one session bucket")
  }

  // ---- epoch plan ------------------------------------------------------

  test("epoch plan: targets apportion the budget and epochs are exact") {
    val rows = q("mix_epoch_plan")
      .select($"n_tokens", $"w_milli", $"target_tokens", $"epochs_milli",
        $"epochs")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.length == 5)
    assert(rows.map(_._2).sum == 1000L, "mix weights sum to one")
    assert(rows.map(_._3).sum == 100000L, "targets fill the budget")
    for ((nt, _, tgt, em, e) <- rows) {
      assert(em == tgt * 1000 / nt)
      assert(e == em.toDouble / 1000.0)
    }
  }

  // ---- boilerplate lines ----------------------------------------------

  test("boilerplate lines: document frequencies are honest and ranked") {
    val rows = q("t_boilerplate_lines")
      .select($"line", $"df").as[(String, Long)].collect()
    assert(rows.nonEmpty)
    val dfs = rows.map(_._2)
    assert(dfs.zip(dfs.drop(1)).forall { case (a, b) => a >= b })
    assert(dfs.forall(_ >= 2))
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(dfs.forall(_ <= total))
  }

  // ---- inter-arrival percentiles --------------------------------------

  test("inter-arrival: p50 <= p90 and both are observed gaps") {
    val rows = q("ev_interarrival_median")
      .select($"event_type", $"p50_us", $"p90_us", $"p50_sec")
      .as[(String, Long, Long, Double)].collect()
    assert(rows.length == 5)
    for ((_, p50, p90, sec) <- rows) {
      assert(p50 <= p90 && p50 > 0)
      assert(sec == p50.toDouble / 1000000.0)
    }
  }

  // ---- new vs returning ------------------------------------------------

  test("new-vs-returning: revenue split reconciles with total purchase value") {
    val rows = q("ev_new_vs_returning")
      .select($"n_purchases", $"new_revenue", $"returning_revenue")
      .as[(Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    val split = rows.map(r => r._2 + r._3).sum
    val total = spark.read.parquet(s"$dir/events.parquet")
      .where($"ts".isNotNull && $"event_type" === "purchase")
      .agg(sum(($"value".cast("decimal(12,2)") * 100).cast("long")))
      .as[Long].collect().head
    assert(math.abs(split - total.toDouble / 100.0) < 1e-6,
      "every purchase lands in exactly one cohort column")
  }

  // ---- hub report ------------------------------------------------------

  test("hub report: ranked by degree and shares are honest fractions") {
    val rows = q("g_hub_report")
      .select($"deg", $"wedge_share").as[(Long, Double)].collect()
    assert(rows.length == 10)
    val ds = rows.map(_._1)
    assert(ds.zip(ds.drop(1)).forall { case (a, b) => a >= b })
    assert(rows.forall(r => r._2 > 0.0 && r._2 <= 1.0))
    assert(rows.map(_._2).sum <= 1.0 + 1e-12)
  }

  // ---- batch 30: fertility / power curve / reconcile / anisotropy ------

  test("tokenizer fertility: per-lang sums reconcile with t_text_stats") {
    // The grouped token totals must equal the per-doc token counts the
    // stats query reports, language by language.
    val fert = q("t_tokenizer_fertility")
      .select($"lang", $"tokens").as[(String, Long)].collect().toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val perDoc = q("t_text_stats").join(docs, "doc_id")
      .groupBy($"lang").agg(sum($"n_tokens").as("t"))
      .select($"lang", $"t").as[(String, Long)].collect().toMap
    assert(fert == perDoc)
    // fertility is a floor: rate * chars <= 1000 * tokens
    val rows = q("t_tokenizer_fertility")
      .select($"tokens", $"chars", $"tokens_per_kchar")
      .as[(Long, Long, Long)].collect()
    assert(rows.forall { case (t, c, r) =>
      r * c <= 1000L * t && (r + 1) * c > 1000L * t })
  }

  test("power curve: histogram partitions the trailing-week actives") {
    val rows = q("ev_power_curve")
      .select($"days_active", $"n_users", $"pct_permille")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.forall(r => r._1 >= 1 && r._1 <= 7))
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .where($"ts".isNotNull)
    val mxd = ev.agg(max($"ts".cast("date"))).collect().head.getDate(0)
    val actives = ev.select($"user_id", $"ts".cast("date").as("day"))
      .where($"day" >= date_sub(lit(mxd), 6))
      .select($"user_id").distinct().count()
    assert(rows.map(_._2).sum == actives,
      "every trailing-week active user lands in exactly one bucket")
    assert(rows.map(_._3).sum <= 1000, "floor shares never exceed 1000")
  }

  test("order reconcile: counts partition the order and line universes") {
    val r = q("dq_order_reconcile").collect().head
    val nOrders = r.getAs[Long]("n_orders")
    val withL = r.getAs[Long]("n_with_lines")
    val noL = r.getAs[Long]("n_no_lines")
    assert(withL + noL == nOrders)
    assert(nOrders ==
      spark.read.parquet(s"$dir/orders.parquet").count())
    assert(r.getAs[Long]("n_amount_equal") <= withL)
    assert(r.getAs[Long]("abs_delta_cents") >= 0L)
  }

  test("anisotropy: centroid identity matches the brute-force pair sum") {
    // ‖Σq‖² − Σ‖q‖² must equal the literal Σ_{i≠j}⟨q_i,q_j⟩ computed
    // the quadratic way on the tiny SF — the identity the operator
    // rides at scale.
    val r = q("sim_anisotropy").collect().head
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"embedding").as[Seq[Float]].collect()
      .map(_.map(x => math.floor(x.toDouble * 4096).toLong).toArray)
    val n = vecs.length.toLong
    assert(r.getAs[Long]("n") == n)
    val dims = vecs.head.length
    val sums = Array.ofDim[Long](dims)
    for (v <- vecs; i <- 0 until dims) sums(i) += v(i)
    val centroidDot = sums.map(s => s * s).sum
    val sumNorm2 = vecs.map(v => v.map(x => x * x).sum).sum
    assert(r.getAs[Long]("centroid_dot") == centroidDot)
    assert(r.getAs[Long]("sum_norm2") == sumNorm2)
    val brute = centroidDot - sumNorm2 // = Σ_{i≠j} dot by the identity
    assert(math.abs(r.getAs[Double]("mean_pair_dot") -
      brute.toDouble / (n * (n - 1)).toDouble) < 1e-9)
  }

  test("top-n-other: buckets partition total revenue; OTHER folds the tail") {
    val rows = q("olap_top_n_other")
      .select($"bucket", $"n_nations", $"revenue", $"share_permille")
      .as[(String, Long, Double, Long)].collect()
    assert(rows.count(_._1 != "OTHER") <= 5)
    assert(rows.filter(_._1 != "OTHER").forall(_._2 == 1L))
    assert(rows.map(_._4).sum <= 1000)
    // buckets partition the joined fact total exactly (cents are exact,
    // so the double sums are sums of exact cent values)
    val total = spark.read.parquet(s"$dir/orders.parquet")
      .join(spark.read.parquet(s"$dir/customer.parquet"),
        $"o_custkey" === $"c_custkey")
      .agg(sum(($"o_totalprice".cast("decimal(12,2)") * 100)
        .cast("long"))).as[Long].collect().head
    assert(rows.map(r => math.round(r._3 * 100)).sum == total)
    // every named bucket out-earns any nation folded into OTHER, so
    // n_nations of OTHER carries the rest of the nation universe
    val nNations = rows.map(_._2).sum
    val distinctNations = spark.read.parquet(s"$dir/orders.parquet")
      .join(spark.read.parquet(s"$dir/customer.parquet"),
        $"o_custkey" === $"c_custkey")
      .select($"c_nationkey").distinct().count()
    assert(nNations == distinctNations)
  }

  test("drawdown: the reported day is the deepest peak-to-day gap") {
    val r = q("w_drawdown").collect().head
    val peak = r.getAs[Long]("peak_cents")
    val cents = r.getAs[Long]("cents")
    val dd = r.getAs[Long]("dd_cents")
    assert(dd == peak - cents && dd >= 0L && peak >= cents)
    // recompute the max drawdown directly
    val daily = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(sum(($"o_totalprice".cast("decimal(12,2)") * 100)
        .cast("long")).as("cents"))
      .orderBy($"day")
      .select($"cents").as[Long].collect()
    var runMax = Long.MinValue; var best = 0L
    for (c <- daily) { runMax = math.max(runMax, c); best = math.max(best, runMax - c) }
    assert(dd == best)
  }

  // ---- batch 31: forecast / freshness / dup rows / langid margin -------

  test("forecast backtest: errors recompute from the dense daily series") {
    val rows = q("ev_forecast_backtest")
      .select($"model", $"n_days", $"sae_cents", $"mae_cents")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("seasonal_naive", "trailing_mean_7"))
    assert(rows.forall(r => r._4 == r._3 / r._2))
    // rebuild the zero-filled series and score both models directly
    val daily = spark.read.parquet(s"$dir/events.parquet")
      .where($"ts".isNotNull && $"event_type" === "purchase")
      .groupBy($"ts".cast("date").as("day"))
      .agg(sum(($"value".cast("decimal(12,2)") * 100).cast("long"))
        .as("cents"))
      .select($"day", $"cents").as[(java.sql.Date, Long)].collect()
      .map { case (dt, c) => (dt.toLocalDate, c) }.toMap
    val lo = daily.keys.min((a: java.time.LocalDate, b: java.time.LocalDate) => a.compareTo(b))
    val hi = daily.keys.max((a: java.time.LocalDate, b: java.time.LocalDate) => a.compareTo(b))
    val series = Iterator.iterate(lo)(_.plusDays(1)).takeWhile(!_.isAfter(hi))
      .map(dt => daily.getOrElse(dt, 0L)).toArray
    var saeN = 0L; var saeM = 0L; var n = 0L
    for (i <- 7 until series.length) {
      n += 1
      saeN += math.abs(series(i) - series(i - 7))
      val ma = (i - 7 until i).map(series).sum / 7
      saeM += math.abs(series(i) - ma)
    }
    assert(rows(0)._2 == n && rows(0)._3 == saeN)
    assert(rows(1)._2 == n && rows(1)._3 == saeM)
  }

  test("freshness: anchor is the global max and one table reads zero") {
    val rows = q("dq_freshness")
      .select($"tbl", $"staleness_hours").as[(String, Long)].collect()
    assert(rows.length == 3 && rows.forall(_._2 >= 0L))
    assert(rows.exists(_._2 == 0L),
      "the table holding the corpus max is zero-stale by construction")
  }

  test("duplicate rows: distinct never exceeds total; keyed tables clean") {
    val rows = q("dq_duplicate_rows")
      .select($"tbl", $"n_rows", $"n_distinct_rows", $"n_dup_rows")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.length == 4)
    assert(rows.forall(r => r._3 <= r._2 && r._4 == r._2 - r._3))
    for ((tbl, nr, _, _) <- rows)
      assert(nr == spark.read.parquet(s"$dir/$tbl.parquet").count())
  }

  test("langid margin: histogram covers the corpus and agrees with the classifier") {
    val rows = q("t_langid_margin")
      .select($"n_docs").as[Long].collect()
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.sum == total, "every doc lands in exactly one cell")
    // decisive docs (margin > 0 under the margin tie-break) must carry
    // the same label t_lang_id_ngram assigns: when there is no tie the
    // two tie-break orders coincide.
    val m = q("t_langid_margin")
    assert(m.columns.toSeq == Seq("lang_pred", "band", "n_docs"))
  }

  // ---- batch 32: seasonal anomaly / growth decomposition / temporal ----

  test("seasonal anomaly: centers and MADs are ladder-exact per hour") {
    val rows = q("ev_anomaly_seasonal")
      .select($"hod", $"center", $"mad", $"n_cells", $"n_anomalies")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.forall(r => r._1 >= 0 && r._1 <= 23))
    assert(rows.forall(r => r._5 <= r._4 && r._3 >= 0))
    // recompute one hour's center/MAD/flags sequentially
    val hc = spark.read.parquet(s"$dir/events.parquet")
      .where($"ts".isNotNull)
      .groupBy($"ts".cast("date").as("day"),
        hour($"ts").cast("long").as("hod"))
      .agg(count(lit(1)).as("n"))
      .select($"hod", $"n").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq)
    def ladder(v: IndexedSeq[Long]): Long =
      v(math.max(1, (50 * v.size + 99) / 100) - 1)
    for ((hod, center, mad, nCells, nAnom) <- rows) {
      val ns = hc(hod)
      assert(nCells == ns.size)
      assert(center == ladder(ns))
      val devs = ns.map(n => math.abs(n - center)).sorted
      assert(mad == ladder(devs))
      assert(nAnom == devs.count(_ > 3 * mad))
    }
  }

  test("growth decomposition: effects sum to the exact revenue delta") {
    val r = q("olap_growth_decomposition").collect().head
    val delta = r.getAs[Double]("delta")
    val vol = r.getAs[Double]("volume_effect")
    val vale = r.getAs[Double]("value_effect")
    assert(math.abs((vol + vale) - delta) < 1e-9,
      "the two effects tile the delta by construction")
    assert(r.getAs[Long]("y1") == r.getAs[Long]("y0") + 1)
    assert(r.getAs[Long]("n0") > 0)
  }

  test("temporal order: lag bounds bracket the flags") {
    val r = q("dq_temporal_order").collect().head
    val n = r.getAs[Long]("n_lines")
    assert(n == spark.read.parquet(s"$dir/lineitem.parquet").count(),
      "every lineitem has a parent order in this corpus")
    val before = r.getAs[Long]("n_ship_before_order")
    val late = r.getAs[Long]("n_late_90d")
    assert(before + late <= n)
    assert(r.getAs[Long]("min_lag_days") <= r.getAs[Long]("max_lag_days"))
    if (late > 0) assert(r.getAs[Long]("max_lag_days") > 90)
    // before-order is a TIMESTAMP test; a same-date violation still
    // day-diffs to 0, so the bound is ≤ 0, not < 0
    if (before > 0) assert(r.getAs[Long]("min_lag_days") <= 0)
  }

  // ---- batch 33: modularity / coverage curve ---------------------------

  test("modularity: degree and edge ledgers reconcile; Q is bounded") {
    val rows = q("g_modularity")
      .select($"n_nodes", $"e_in", $"deg_sum", $"m_edges", $"q_contrib")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val m = rows.head._4
    assert(rows.forall(_._4 == m), "m is a global constant")
    assert(rows.map(_._3).sum == 2 * m, "Σ deg_sum = 2m (handshake)")
    assert(rows.map(_._2).sum <= m, "internal edges never exceed m")
    val qTotal = rows.map(_._5).sum
    assert(qTotal >= -0.5 && qTotal <= 1.0, s"Q=$qTotal out of range")
    // communities must be the same partition g_communities reports
    val nNodes = rows.map(_._1).sum
    assert(nNodes == q("g_communities").count())
  }

  test("coverage curve: mass is monotone in k and bounded by the total") {
    val rows = q("t_ngram_coverage_curve")
      .select($"k", $"n_terms", $"mass", $"total_tokens",
        $"coverage_permille")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(10L, 100L, 1000L))
    val vocabHead = rows.last._2 // largest k sees the full (capped) vocab
    assert(rows.forall(r => r._2 == math.min(r._1, vocabHead)),
      "n_terms = min(k, vocab size)")
    val masses = rows.map(_._3)
    assert(masses.zip(masses.drop(1)).forall { case (a, b) => a <= b })
    assert(rows.forall(r => r._3 <= r._4 && r._5 <= 1000))
    assert(rows.forall(r => r._5 == 1000L * r._3 / r._4))
  }

  // ---- batch 34: path conversion / load-error correlation --------------

  test("path conversion: rates are honest and purchase paths convert") {
    val rows = q("ev_path_conversion")
      .select($"path", $"n_sessions", $"n_converted", $"conv_permille")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 15)
    assert(rows.forall(r => r._3 <= r._2 && r._4 <= 1000))
    assert(rows.forall(r => r._4 == 1000L * r._3 / r._2))
    // a path containing 'purchase' converts by definition; one
    // without can never convert
    for ((path, n, conv, _) <- rows)
      if (path.split(">").contains("purchase")) assert(conv == n)
      else assert(conv == 0L)
    // volumes agree with ev_session_paths on the shared top-15
    val sp = q("ev_session_paths")
      .select($"path", $"n").as[(String, Long)].collect().toMap
    assert(rows.forall(r => sp.get(r._1).forall(_ == r._2)))
  }

  test("load-error correlation: moments reconcile with the hourly cells") {
    val r = q("ev_load_error_corr").collect().head
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .where($"ts".isNotNull)
    assert(r.getAs[Long]("total_events") == ev.count())
    assert(r.getAs[Long]("total_errors") ==
      ev.where($"event_type" === "error").count())
    val corr = r.getAs[Double]("r")
    assert(corr >= -1.0 && corr <= 1.0)
    assert(r.getAs[Long]("n_hours") > 0)
  }

  // ---- batch 35: window funnel / chi-square drift ----------------------

  test("window funnel: levels partition users and depth is monotone") {
    val rows = q("ev_window_funnel")
      .select($"level", $"n_users").as[(Long, Long)].collect().toMap
    val users = spark.read.parquet(s"$dir/events.parquet")
      .where($"ts".isNotNull).select($"user_id").distinct().count()
    assert(rows.values.sum == users, "every user has exactly one level")
    assert(rows.keys.forall(l => l >= 0 && l <= 3))
    // strict-order semantics: reaching level k implies the level-(k-1)
    // population includes you, so cumulative counts are monotone
    val atLeast = (0L to 3L).map(k =>
      rows.filter(_._1 >= k).values.sum)
    assert(atLeast.zip(atLeast.drop(1)).forall { case (a, b) => a >= b })
  }

  test("chi-square drift: contributions reconcile with the split counts") {
    val rows = q("dq_drift_chisq")
      .select($"cat", $"n_a", $"n_b", $"contrib")
      .as[(String, Long, Long, Double)].collect()
    val ta = rows.map(_._2).sum; val tb = rows.map(_._3).sum
    assert(ta + tb ==
      spark.read.parquet(s"$dir/documents.parquet").count())
    for ((_, na, nb, contrib) <- rows) {
      val dd = (tb * na - ta * nb).toDouble
      val expect = dd * dd / (ta.toDouble * tb * (na + nb))
      assert(math.abs(contrib - expect) < 1e-12)
      assert(contrib >= 0.0)
    }
  }

  // ---- batch 36: diverse sample / MTTR ----------------------------------

  test("diverse sample: quotas respected and members belong to their cell") {
    val rows = q("sim_diverse_sample")
      .select($"cell", $"vec_id", $"rank").as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.groupBy(_._1).values.forall(_.length <= 5))
    assert(rows.forall(r => r._3 >= 1 && r._3 <= 5))
    // ranks are dense per cell and follow vec_id order
    for ((_, members) <- rows.groupBy(_._1)) {
      val sorted = members.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1L to sorted.length).toSeq)
      val ids = sorted.map(_._2)
      assert(ids.zip(ids.drop(1)).forall { case (a, b) => a < b })
    }
    // deterministic across runs (k-means is seeded)
    val again = q("sim_diverse_sample").collect().toSeq
    assert(again == q("sim_diverse_sample").collect().toSeq)
  }

  test("mttr: recovery gaps are observed values and p50 <= p90") {
    val rows = q("ev_mttr")
      .select($"pct", $"n_errors", $"n_recovered", $"gap_us")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(50L, 90L))
    assert(rows(0)._4 <= rows(1)._4, "p50 <= p90")
    assert(rows.forall(r => r._3 <= r._2 && r._4 > 0))
    val errors = spark.read.parquet(s"$dir/events.parquet")
      .where($"ts".isNotNull && $"event_type" === "error").count()
    assert(rows.head._2 == errors)
  }

  // ---- batch 37: SRM / adoption curve / domain conformance -------------

  test("srm: counts partition the user universe; flag matches the math") {
    val r = q("ev_ab_srm").collect().head
    val na = r.getAs[Long]("n_a"); val nb = r.getAs[Long]("n_b")
    val users = spark.read.parquet(s"$dir/events.parquet")
      .select($"user_id").distinct().count()
    assert(na + nb == users)
    assert(r.getAs[Boolean]("srm_detected") ==
      (25L * (na - nb) * (na - nb) > 96L * (na + nb)))
  }

  test("adoption curve: cumulative counts are monotone and cap at users") {
    val rows = q("ev_adoption_curve")
      .select($"event_type", $"day", $"n_new", $"n_adopted")
      .as[(String, java.sql.Date, Long, Long)].collect()
    for ((_, series) <- rows.groupBy(_._1)) {
      val s2 = series.sortBy(_._2.toLocalDate.toEpochDay)
      var cum = 0L
      for ((_, _, nNew, nAdopted) <- s2) {
        cum += nNew
        assert(nAdopted == cum, "running total reconstructs from n_new")
      }
      val users = spark.read.parquet(s"$dir/events.parquet")
        .where($"ts".isNotNull).select($"user_id").distinct().count()
      assert(cum <= users)
    }
  }

  test("domain conformance: the synthetic corpus is fully in-domain") {
    val rows = q("dq_domain_conformance")
      .select($"column", $"n_rows", $"n_out_of_domain")
      .as[(String, Long, Long)].collect()
    assert(rows.length == 3)
    assert(rows.forall(_._3 == 0L),
      "declared domains must cover the generated values")
    assert(rows.forall(_._2 > 0L))
  }

  // ---- batch 38: gate agreement / cell balance --------------------------

  test("gate agreement: cells tile the corpus and margins match the gates") {
    val rows = q("t_gate_agreement")
      .select($"keep_gopher", $"keep_logistic", $"keep_blocklist",
        $"n_docs")
      .as[(Boolean, Boolean, Boolean, Long)].collect()
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_._4).sum == total)
    // each gate's marginal from the matrix equals its own query's kept set
    def marginal(pick: ((Boolean, Boolean, Boolean, Long)) => Boolean) =
      rows.filter(pick).map(_._4).sum
    assert(marginal(_._1) ==
      q("t_quality_gopher").where($"keep").count())
    assert(marginal(_._2) ==
      q("t_quality_logistic").where($"keep").count())
    assert(marginal(_._3) ==
      q("t_blocklist_filter").where($"keep").count())
  }

  test("cell balance: populations cover the corpus; pair bill is exact") {
    val rows = q("sim_cell_balance")
      .select($"cell", $"n_vecs", $"pairs")
      .as[(Long, Long, Long)].collect()
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.map(_._2).sum == n)
    assert(rows.forall(r => r._3 == r._2 * (r._2 - 1) / 2))
    // balance diagnostic ≡ the sample's cells: same trained quantizer
    val cells = q("sim_diverse_sample").select($"cell").distinct()
      .as[Long].collect().toSet
    assert(cells.subsetOf(rows.map(_._1).toSet))
  }

  // ---- batch 39: temperature sweep / two-hop reach ----------------------

  test("temperature sweep: flatter tau flattens shares; tiles per tau") {
    val rows = q("t_mix_temperature_sweep")
      .select($"tau_centi", $"lang", $"n_docs", $"weight", $"share")
      .as[(Long, String, Long, Long, Double)].collect()
    assert(rows.map(_._1).distinct.sorted.toSeq == Seq(25L, 50L, 75L))
    for ((_, grp) <- rows.groupBy(_._1))
      assert(math.abs(grp.map(_._5).sum - 1.0) < 1e-9,
        "shares tile to 1 within each temperature")
    // lower tau compresses the spread: max/min share ratio shrinks
    def spread(tau: Long) = {
      val g = rows.filter(_._1 == tau).map(_._5)
      g.max / g.min
    }
    assert(spread(25) <= spread(50) && spread(50) <= spread(75))
    // weight law: floor(n^tau * 1e6) for the sqrt compositions
    for ((tau, _, n, w, _) <- rows) {
      val f = tau match {
        case 25L => math.sqrt(math.sqrt(n.toDouble))
        case 50L => math.sqrt(n.toDouble)
        case _   => math.sqrt(n.toDouble) * math.sqrt(math.sqrt(n.toDouble))
      }
      assert(w == math.floor(f * 1e6).toLong)
    }
  }

  test("two-hop reach: bounded by graph order, at least the degree") {
    val rows = q("g_two_hop_reach")
      .select($"node", $"deg", $"reach_2hop")
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 10)
    val degs = rows.map(_._2)
    assert(degs.zip(degs.drop(1)).forall { case (a, b) => a >= b })
    // 1-hop neighbours are a subset of the 2-hop reach (e2 has no
    // self-loops), so reach >= deg for every hub
    assert(rows.forall(r => r._3 >= r._2))
  }

  // ---- batch 40: daily fingerprints / shard stability --------------------

  test("daily fingerprints: rows tile the table; digests are stable") {
    val rows = q("dq_fingerprint_daily")
      .select($"day", $"n_rows", $"fingerprint")
      .as[(java.sql.Date, Long, String)].collect()
    assert(rows.map(_._2).sum ==
      spark.read.parquet(s"$dir/orders.parquet").count())
    assert(rows.forall(_._3.nonEmpty))
    val again = q("dq_fingerprint_daily")
      .select($"fingerprint").as[String].collect()
    assert(again.toSeq == rows.map(_._3).toSeq, "digests are deterministic")
  }

  test("shard stability: rendezvous moves ~2/10, mod moves ~8/10") {
    val rows = q("t_shard_stability")
      .select($"scheme", $"n_docs", $"n_moved", $"moved_permille")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.values.forall(_._2 == total))
    val modMoved = rows("mod")._4
    val rvMoved = rows("rendezvous")._4
    // mod-N remaps whenever h%8 != h%10 (expect ~800 permille);
    // rendezvous moves only docs one of the two NEW buckets wins
    // (expect ~200 permille). Wide 3-sigma bands for the small SF.
    assert(rvMoved < modMoved,
      "rendezvous must beat naive modulo on resharding cost")
    assert(modMoved >= 550, s"mod moved only $modMoved permille")
    assert(rvMoved <= 450, s"rendezvous moved $rvMoved permille")
  }

  // ---- batch 41: knob sweeps / frequency spectrum ----------------------

  test("session gap sweep: sessions shrink, events/session grows with τ") {
    val rows = q("ev_session_gap_sweep")
      .select($"gap_minutes", $"n_sessions", $"n_events",
        $"events_per_session_permille")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(15L, 30L, 60L))
    val total = spark.read.parquet(s"$dir/events.parquet")
      .where($"ts".isNotNull).count()
    assert(rows.forall(_._3 == total), "n_events must be the corpus size")
    // a 60-minute gap can only MERGE sessions a 15-minute gap splits
    assert(rows(0)._2 >= rows(1)._2 && rows(1)._2 >= rows(2)._2,
      "session count must be nonincreasing in the gap")
    assert(rows(0)._4 <= rows(1)._4 && rows(1)._4 <= rows(2)._4,
      "events/session must be nondecreasing in the gap")
    // the 30-minute row must agree with the shipped sessionizer
    val direct = q("ev_sessions").agg(sum($"n_sessions")).as[Long].head()
    assert(rows(1)._2 == direct,
      s"sweep 30m row ${rows(1)._2} != ev_sessions total $direct")
  }

  test("attribution window sweep: coverage is cumulative in the window") {
    val rows = q("ev_attrib_window_sweep")
      .select($"window_hours", $"n_attributed", $"n_purchases",
        $"attributed_permille")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 6L, 24L))
    val purchases = spark.read.parquet(s"$dir/events.parquet")
      .where($"ts".isNotNull && $"event_type" === "purchase").count()
    assert(rows.forall(_._3 == purchases))
    assert(rows.forall(r => r._2 <= r._3), "attributed ≤ purchases")
    assert(rows(0)._2 <= rows(1)._2 && rows(1)._2 <= rows(2)._2,
      "a wider window can only attribute MORE purchases")
    assert(rows.forall(r => r._4 == 1000 * r._2 / r._3))
  }

  test("freq spectrum: buckets tile the token stream; bounds are dyadic") {
    val rows = q("t_freq_spectrum")
      .select($"bucket", $"n_tokens", $"n_occurrences", $"min_count",
        $"max_count")
      .as[(Long, Long, Long, Long, Long)].collect()
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(lower(trim($"text")), "\\s+")).as("t"))
      .where(length($"t") > 0)
    assert(rows.map(_._3).sum == toks.count(),
      "occurrences must tile the token stream")
    assert(rows.map(_._2).sum == toks.distinct().count(),
      "token counts must tile the vocabulary")
    for ((b, _, _, lo, hi) <- rows) {
      assert(lo >= (1L << b) && hi < (2L << b),
        s"bucket $b bounds [$lo,$hi] escape [2^$b, 2^${b + 1})")
    }
  }

  // ---- batch 42: band sweep / dwell time / closure ---------------------

  test("LSH band sweep: pair bill grows with bands; 6x2 covers candidates") {
    val rows = q("t_lsh_band_sweep")
      .select($"bands", $"rows_per_band", $"n_buckets_multi", $"pair_bill")
      .as[(Long, Long, Long, Long)].collect().sortBy(-_._1)
    assert(rows.map(r => (r._1, r._2)).toSeq ==
      Seq((12L, 1L), (6L, 2L), (3L, 4L)))
    // shorter band keys collide more: recall (and cost) is monotone
    assert(rows(0)._4 >= rows(1)._4 && rows(1)._4 >= rows(2)._4,
      "pair bill must be nonincreasing as band keys lengthen")
    // the production 6x2 bill upper-bounds its DISTINCT candidate pairs
    val cands = graft.operators.Dedup.minhashCandidates(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
      .count()
    assert(rows(1)._4 >= cands,
      s"6x2 bill ${rows(1)._4} < distinct candidates $cands")
  }

  test("dwell time: per-type p50 <= p90, all inside the session bound") {
    val rows = q("ev_dwell_time")
      .select($"event_type", $"pct", $"value")
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._3 > 0 && r._3 < 30L * 60L * 1000000L),
      "dwell must sit inside (0, 30min)")
    val byType = rows.groupBy(_._1).map { case (t, rs) =>
      t -> rs.map(r => r._2 -> r._3).toMap
    }
    for ((t, m) <- byType)
      assert(m(50L) <= m(90L), s"$t: p50 ${m(50L)} > p90 ${m(90L)}")
  }

  test("closure by degree: wedges bound triangles; corners sum to 3T") {
    val rows = q("g_closure_by_degree")
      .select($"bucket", $"n_nodes", $"n_closed", $"n_wedges")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.forall(r => r._3 <= r._4),
      "closed wedges can never exceed the wedge bill")
    val totalNodes = q("g_degree_dist")
      .agg(sum($"n_nodes")).as[Long].head()
    assert(rows.map(_._2).sum == totalNodes,
      "closure buckets must tile the vertex set")
    val triangles = q("g_triangles")
      .select($"n_triangles").as[Long].head()
    assert(rows.map(_._3).sum == 3 * triangles,
      "per-vertex triangle credits must sum to 3 x census")
  }

  // ---- batch 43: error budget / score calibration ----------------------

  test("error budget: running sums reconcile; flag matches cross-mult") {
    val rows = q("ev_error_budget")
      .select($"day", $"n_events", $"n_errors", $"cum_events",
        $"cum_errors", $"burn_permille", $"over_budget")
      .as[(java.sql.Date, Long, Long, Long, Long, Long, Boolean)]
      .collect()
    var (ce, cr) = (0L, 0L)
    for (r <- rows) {
      ce += r._2; cr += r._3
      assert(r._4 == ce && r._5 == cr,
        s"${r._1}: cumulative drifted from prefix sum")
      assert(r._6 == 5000L * cr / ce)
      assert(r._7 == (5L * cr > ce))
    }
    val (te, tr) = (spark.read.parquet(s"$dir/events.parquet")
      .where($"ts".isNotNull).count(),
      spark.read.parquet(s"$dir/events.parquet")
        .where($"ts".isNotNull && $"event_type" === "error").count())
    assert(ce == te && cr == tr, "last row must cover the whole month")
  }

  test("quality calibration: quintiles tile the corpus near-evenly") {
    val rows = q("t_quality_calibration")
      .select($"quintile", $"n_docs", $"n_dup_docs", $"dup_permille",
        $"chars_per_doc")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_._2).sum == total, "quintiles must tile the corpus")
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1,
      "exact global rank must yield near-equal quintiles")
    assert(rows.forall(r => r._3 <= r._2 && r._5 > 0))
    assert(rows.forall(r => r._4 == 1000 * r._3 / r._2))
  }

  // ---- batch 44: threshold sweep / rule stability ----------------------

  test("jaccard threshold sweep: kept pairs shrink as the bar rises") {
    val rows = q("t_jaccard_threshold_sweep")
      .select($"threshold_pct", $"n_kept", $"n_candidates",
        $"kept_permille")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(50L, 70L, 90L))
    assert(rows.map(_._3).distinct.size == 1,
      "candidate population must be threshold-independent")
    assert(rows(0)._2 >= rows(1)._2 && rows(1)._2 >= rows(2)._2,
      "a higher bar can only keep FEWER pairs")
    // the 0.5 row must be exactly the shipped near-dup pair count
    val shipped = q("t_neardup_pairs").count()
    assert(rows(0)._2 == shipped,
      s"sweep 0.5 row ${rows(0)._2} != t_neardup_pairs $shipped")
  }

  test("rule stability: overlap bounded by both halves") {
    val r = q("fi_rule_stability")
      .select($"n_early", $"n_late", $"n_common", $"jaccard_permille")
      .as[(Long, Long, Long, Long)].head()
    assert(r._1 > 0 && r._2 > 0, "both halves must mine SOME rules")
    assert(r._3 <= math.min(r._1, r._2))
    assert(r._4 == 1000 * r._3 / (r._1 + r._2 - r._3))
  }

  // ---- determinism sweep ----------------------------------------------

  test("new gates are bit-deterministic across runs") {
    for (name <- Seq("t_quality_logistic", "t_blocklist_filter",
      "t_soft_sample", "ev_rfm", "dq_fd_audit",
      "g_link_predict", "t_proportional_sample", "ev_markov_next")) {
      val a = q(name).collect().toSeq
      val b = q(name).collect().toSeq
      assert(a == b, s"$name differs run-to-run")
    }
  }
}
