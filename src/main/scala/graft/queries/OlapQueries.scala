package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multi-level OLAP aggregates (ROLLUP / CUBE / GROUPING SETS) and
  * analytic window queries — the subtotal/ranking surface a BI layer
  * builds on top of the warehouse. The reference serves these shapes
  * interactively (Metabase cards slice the DW by region/year —
  * `Metabase - workshop2dashboard.pdf`; the DW build groups at several
  * granularities in `dags/merge_to_dw.py:124-325`); here each multi-level
  * result is ONE grouping pass, not one query per level.
  *
  * Scale notes:
  *   - Rollup/cube/grouping-sets run as a single Expand + hash aggregate:
  *     the fact table is scanned once and each row fans out only to the
  *     grouping sets it belongs to. Partial (map-side) aggregation still
  *     applies, so the shuffle carries per-set partials, not facts.
  *   - Every window here runs AFTER an aggregation, so the window input
  *     is group-sized (regions × artists, or years), never fact-sized.
  *     The unpartitioned windows (`w_yoy_delta`) see only the per-year
  *     aggregate — a handful of rows by construction, safe at any SF.
  *   - Dims (customer, nation, region) broadcast; the only base-table
  *     shuffle is the aggregation itself.
  */
object OlapQueries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** orders ⋈ customer ⋈ nation ⋈ region with all dims broadcast. */
  private def ordersGeo(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))

  /** Exact revenue: o_totalprice is cent-discrete, so summing as
    * decimal(20,2) is order-independent and the final double cast is
    * bit-reproducible across engines (same pattern as ev_zscore).
    */
  private val revenue =
    sum(col("o_totalprice").cast("decimal(20,2)")).cast("double")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ROLLUP over the region → nation hierarchy: per-nation rows, per-
    // region subtotals, and a grand total in one grouping pass.
    // grouping_id() disambiguates a real group from a rolled-up level
    // (no nation is named 'ALL', but the id is the contract).
    "olap_rollup" -> ((s, d) =>
      ordersGeo(s, d)
        .rollup(col("r_name"), col("n_name"))
        .agg(grouping_id().cast("int").as("gid"),
          count(lit(1)).as("n_orders"), revenue.as("revenue"))
        .select(
          coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("gid"), col("n_orders"), col("revenue"))
        .orderBy(col("region"), col("nation"))),

    // Share-of-parent from ONE rollup pass: nation rows join their
    // region subtotal out of the SAME Expand+aggregate (staged — it is
    // group-sized), so the facts are scanned once for both levels; the
    // share divides two decimal-exact revenues (bit-reproducible).
    "olap_share_of_parent" -> ((s, d) => {
      val roll = ordersGeo(s, d)
        .rollup(col("r_name"), col("n_name"))
        .agg(grouping_id().cast("int").as("gid"), revenue.as("revenue"))
        .localCheckpoint()
      val nations = roll.where(col("gid") === 0)
        .select(col("r_name"), col("n_name"), col("revenue").as("nrev"))
      val regions = roll.where(col("gid") === 1)
        .select(col("r_name"), col("revenue").as("rrev"))
      nations.join(broadcast(regions), Seq("r_name"))
        .select(col("r_name").as("region"), col("n_name").as("nation"),
          col("nrev").as("revenue"),
          (col("nrev") / col("rrev")).as("share_of_region"))
        .orderBy(col("region"), col("nation"))
    }),

    // CUBE over (year, order status): every marginal of the 2-D
    // contingency table — the slice-and-dice backing a year×status card.
    "olap_cube" -> ((s, d) =>
      t(s, d, "orders")
        .withColumn("yr", year(col("o_orderdate")).cast("long"))
        .cube(col("yr"), col("o_orderstatus"))
        .agg(grouping_id().cast("int").as("gid"), count(lit(1)).as("n"))
        .select(
          coalesce(col("yr").cast("string"), lit("ALL")).as("yr"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("gid"), col("n"))
        .orderBy(col("yr"), col("status"), col("gid"))),

    // GROUPING SETS — two independent one-column groupings plus the
    // grand total, one scan (the general form rollup/cube sugar over).
    "olap_grouping_sets" -> ((s, d) =>
      ordersGeo(s, d)
        .groupingSets(
          Seq(Seq(col("r_name")), Seq(col("o_orderstatus")), Seq.empty),
          col("r_name"), col("o_orderstatus"))
        .agg(grouping_id().cast("int").as("gid"),
          count(lit(1)).as("n_orders"))
        .select(
          coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("gid"), col("n_orders"))
        .orderBy(col("gid"), col("region"), col("status"))),

    // Top-3 artists per region by wins — the canonical top-n-per-group.
    // dense_rank runs over the PRE-AGGREGATED (region, artist, wins)
    // rows: the window input is artist-count-sized and each of the 5
    // region partitions holds at most |customer| rows, never facts.
    "w_rank_region" -> ((s, d) => {
      val wins = ordersGeo(s, d)
        .where(col("o_orderstatus") === "F")
        .groupBy(col("r_name"), col("c_name"))
        .agg(countDistinct(col("o_orderkey")).as("wins"))
      val w = Window.partitionBy(col("r_name"))
        .orderBy(desc("wins"), col("c_name"))
      wins
        .withColumn("rnk", dense_rank().over(w).cast("long"))
        .where(col("rnk") <= 3)
        .select(col("r_name").as("region"), col("c_name"), col("wins"),
          col("rnk"))
        .orderBy(col("region"), col("rnk"), col("c_name"))
    }),

    // Year-over-year nomination delta — lag over the per-year aggregate.
    // The unpartitioned window is safe BECAUSE its input is the yearly
    // rollup (single-digit rows at any SF); the heavy lifting is the
    // ordinary groupBy before it.
    // Distribution windows (percent_rank / cume_dist) over the per-
    // nation revenue rollup — the "where does this market stand"
    // analytic. Window input is the |nations| aggregate, never facts
    // (same posture as every analytic window here); both measures are
    // exact rationals of rank integers, so doubles replay bitwise.
    "w_cume_dist" -> ((s, d) => {
      val perNation = ordersGeo(s, d)
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n"), revenue.as("revenue"))
      val w = Window.orderBy(col("revenue"), col("n_name"))
      perNation
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
        .select(col("n_name"), col("n"), col("revenue"),
          col("pct_rank"), col("cume"))
        .orderBy(col("n_name"))
    }),

    "w_yoy_delta" -> ((s, d) => {
      val perYear = t(s, d, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .agg(count(lit(1)).as("n"), revenue.as("revenue"))
      val w = Window.orderBy(col("yr"))
      perYear
        .withColumn("n_prev", lag(col("n"), 1).over(w))
        .withColumn("delta", col("n") - col("n_prev"))
        .withColumn("cum_n", sum(col("n")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy(col("yr"))
    }),

    // 7-day moving average of daily order revenue — the trend-smoothing
    // window every metrics dashboard draws. The window runs over the
    // DAY-GRAIN aggregate (|distinct days| rows — bounded at any fact
    // volume), never over raw orders; revenue rides as exact decimal
    // cents and the average is ONE division (sum_cents / (100·n)), so
    // both engines agree bit-for-bit.
    "w_moving_avg" -> ((s, d) => {
      val daily = t(s, d, "orders")
        .groupBy(col("o_orderdate").as("day"))
        .agg(count(lit(1)).as("n"),
          (sum(col("o_totalprice").cast("decimal(20,2)")) * 100)
            .cast("long").as("_cents"))
      val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
      daily.select(col("day"), col("n"),
          (sum(col("_cents")).over(w).cast("double") /
            (lit(100.0) * count(lit(1)).over(w))).as("avg_rev_7d"))
        .orderBy(col("day"))
    }),

    // Cumulative distinct customers by month — the "running distinct"
    // a window function cannot express directly at scale (no
    // count(DISTINCT) over a running frame): instead each customer
    // collapses to their FIRST month (one grouped min), and the
    // cumulative count is a window over the |months| aggregate. The
    // active-user growth curve, computed without ever carrying a
    // distinct-set through a window.
    "olap_running_distinct" -> ((s, d) => {
      val firstSeen = t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(min(trunc(col("o_orderdate"), "month")).as("first_mo"))
      val perMo = firstSeen.groupBy(col("first_mo"))
        .agg(count(lit(1)).as("new_customers"))
      val w = Window.orderBy(col("first_mo"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perMo
        .withColumn("cum_customers",
          sum(col("new_customers")).over(w).cast("long"))
        .orderBy(col("first_mo"))
    }),

    // Winsorized mean — the robust aggregate: order totals clipped to
    // their per-status [p10, p90] before averaging, so a handful of
    // extreme rows can't swing the statistic (the outlier-tolerant twin
    // of dq_outliers_mad's detection). Quantiles come from the two-pass
    // exact histogram ladder (Median.groupQuantilesLong — no per-group
    // sort); the clip bounds broadcast back over one linear pass, and
    // the mean is ONE division of exact integers.
    "olap_winsorized" -> ((s, d) => {
      val cents = t(s, d, "orders")
        .select(col("o_orderstatus"),
          (col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long").as("cents"))
      val bounds = graft.operators.Median.groupQuantilesLong(
          cents, Seq("o_orderstatus"), "cents", Seq(10, 90))
        .groupBy(col("o_orderstatus"))
        .agg(min(when(col("pct") === 10, col("value"))).as("lo"),
          min(when(col("pct") === 90, col("value"))).as("hi"))
      cents.join(broadcast(bounds), "o_orderstatus")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(least(greatest(col("cents"), col("lo")), col("hi")))
            .cast("long").as("_sum"))
        .select(col("o_orderstatus"), col("n"),
          (col("_sum").cast("double") / (col("n") * 100)).as("wins_mean"))
        .orderBy(col("o_orderstatus"))
    }),

    // Pareto frontier of the part catalog (minimize size, minimize
    // price): per-x min + distributed strict-prefix min — never the
    // quadratic dominance anti-join the oracle states declaratively.
    "olap_skyline" -> ((s, d) =>
      graft.operators.Skyline.paretoMin2d(
          t(s, d, "part"), "p_size", "p_retailprice")
        .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
        .orderBy(col("p_size"), col("p_retailprice"), col("p_partkey"))),

    // Frequent co-ordered part pairs (market basket over lineitem):
    // a-priori item prune → basket self-join → support filter; lift is a
    // single exact-int division.
    "fi_pairs" -> ((s, d) =>
      graft.operators.Itemsets.frequentPairs(
          t(s, d, "lineitem"), "l_orderkey", "l_partkey", minSupport = 3L)
        .orderBy(col("item_a"), col("item_b"))),

    // Rule STABILITY across time — are the mined associations durable
    // enough to act on? Mine frequent pairs independently on the early
    // (< 1998-05) and late (≥ 1998-05) order halves and report the
    // overlap:
    // a rule set whose halves barely intersect is seasonal noise, not
    // merchandising signal. Two a-priori-pruned runs over DISJOINT
    // slices (combined fact volume = one full run), full-outer joined
    // on the pair key, collapsed to a 1-row Jaccard report in exact
    // integers — the set-stability face of dq_drift's distribution
    // checks.
    "fi_rule_stability" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val od = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderdate"))
      val j = li.join(od, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_partkey"), col("o_orderdate"))
      def mine(f: DataFrame) =
        graft.operators.Itemsets.frequentPairsRaw(
            f, "l_orderkey", "l_partkey", minSupport = 2L)
          .select(col("item_a"), col("item_b"))
      val early = mine(j.where(col("o_orderdate") < "1998-05-01"))
        .withColumn("in_a", lit(1L))
      val late = mine(j.where(col("o_orderdate") >= "1998-05-01"))
        .withColumn("in_b", lit(1L))
      early.join(late, Seq("item_a", "item_b"), "full_outer")
        .agg(sum(coalesce(col("in_a"), lit(0L))).cast("long")
            .as("n_early"),
          sum(coalesce(col("in_b"), lit(0L))).cast("long").as("n_late"),
          sum(when(col("in_a").isNotNull && col("in_b").isNotNull, 1L)
            .otherwise(0L)).cast("long").as("n_common"))
        .select(col("n_early"), col("n_late"), col("n_common"),
          when(col("n_early") + col("n_late") - col("n_common") > 0,
            expr("(1000 * n_common) div (n_early + n_late - n_common)"))
            .otherwise(lit(0L)).as("jaccard_permille"))
    }),

    // Association RULES from the frequent pairs — the step after
    // fi_pairs a recommender/merchandiser actually reads: each frequent
    // pair in BOTH directions with confidence(a→b) = sup_ab/sup_a (one
    // exact-int division — its double is bit-identical cross-engine,
    // so ranking on it is deterministic with the (ante, cons)
    // tie-break) and conviction = sup_a·(N−sup_b) / (N·(sup_a−sup_ab))
    // (one division of two exact integer products; NULL at
    // confidence 1 where the denominator vanishes). Costs fi_pairs
    // plus a row-doubling projection and a 1-row broadcast.
    "fi_rules" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val pairs = graft.operators.Itemsets.frequentPairs(
        li, "l_orderkey", "l_partkey", minSupport = 3L)
      val nb = li.where(col("l_orderkey").isNotNull &&
          col("l_partkey").isNotNull)
        .agg(countDistinct(col("l_orderkey")).as("nbk"))
      val fwd = pairs.select(col("item_a").as("ante"),
        col("item_b").as("cons"), col("support"),
        col("n_a").as("n_ante"), col("n_b").as("n_cons"))
      val bwd = pairs.select(col("item_b").as("ante"),
        col("item_a").as("cons"), col("support"),
        col("n_b").as("n_ante"), col("n_a").as("n_cons"))
      fwd.unionByName(bwd).crossJoin(broadcast(nb))
        .withColumn("confidence",
          col("support").cast("double") / col("n_ante"))
        .withColumn("conviction",
          when(col("n_ante") =!= col("support"),
            (col("n_ante") * (col("nbk") - col("n_cons")))
              .cast("double") /
              (col("nbk") * (col("n_ante") - col("support")))))
        .select(col("ante"), col("cons"), col("support"),
          col("n_ante"), col("n_cons"), col("confidence"),
          col("conviction"))
        .orderBy(desc("confidence"), col("ante"), col("cons"))
        .limit(20)
    }),

    // Exact per-group median WITHOUT a per-group sort: 4096-bucket
    // histogram locates the two middle ranks, a targeted second pass
    // reads only the located buckets. Exact integers to the single
    // (a+b)/200 division.
    "olap_group_median" -> ((s, d) =>
      graft.operators.Median.groupMedianCents(
          t(s, d, "lineitem"), Seq("l_returnflag"), "l_extendedprice")
        .orderBy(col("l_returnflag"))),

    // Estimate-vs-truth calibration for the ONE-pass histogram median:
    // the midpoint estimate (half the scans) beside the exact
    // lower-median order statistic it bounds, with the measured error
    // and the guaranteed bound (bucket width / 2). The t_minhash_est /
    // t_cms_heavy posture for quantiles.
    "olap_median_calib" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val exact = graft.operators.Median.groupQuantilesCents(
          li, Seq("l_returnflag"), "l_extendedprice", percents = Seq(50))
        .select(col("l_returnflag"), col("value").as("p50"))
      val approx = graft.operators.Median.approxMedianCents(
        li, Seq("l_returnflag"), "l_extendedprice")
      exact.join(approx, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("p50"), col("approx_median"),
          abs(col("approx_median") - col("p50")).as("abs_err"),
          col("width"))
        .orderBy(col("l_returnflag"))
    }),

    // Exact decile ladder per group — NINE order statistics through the
    // SAME one-histogram-pass + one-target-pass machinery; every value
    // is a real data value (lower order statistic, no interpolation).
    "olap_group_deciles" -> ((s, d) =>
      graft.operators.Median.groupQuantilesCents(
          t(s, d, "lineitem"), Seq("l_returnflag"), "l_extendedprice")
        .orderBy(col("l_returnflag"), col("pct"))),

    // Transitive FK-chain integrity: per hop of lineitem → orders →
    // customer → nation, how many child rows lose their parent — the
    // warehouse referential report beyond dq_constraints' single-edge
    // checks. Each hop is one broadcastable anti-join count.
    "dq_fk_chain" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_orderkey"))
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val c = t(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val n = t(s, d, "nation").select(col("n_nationkey"))
      def orphans(child: DataFrame, key: org.apache.spark.sql.Column,
                  parent: DataFrame, pkey: org.apache.spark.sql.Column,
                  hop: String) =
        child.join(parent, key === pkey, "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
          .select(lit(hop).as("hop"), col("n_orphans"))
      orphans(li, col("l_orderkey"), o, col("o_orderkey"),
          "lineitem->orders")
        .unionByName(orphans(o, col("o_custkey"), c, col("c_custkey"),
          "orders->customer"))
        .unionByName(orphans(c, col("c_nationkey"), n, col("n_nationkey"),
          "customer->nation"))
        .orderBy(col("hop"))
    }),

    // Market-concentration metrics per region: Gini coefficient via the
    // sorted-rank identity Σ(2i−n−1)v = 2Σ(i·v) − (n+1)Σv and the
    // Herfindahl index Σv²/(Σv)² — both SINGLE divisions of exact
    // integer aggregates. The rank window runs over the per-customer
    // revenue AGGREGATE (region-partitioned, |customers| rows), never
    // order rows; equal revenues contribute identically under any tie
    // order, so the statistic is deterministic. The integer aggregates
    // themselves are exact, but sv*sv (~1e18 in cents²) exceeds 2^53, so
    // the final decimal→double conversion rounds — and Spark and DuckDB
    // landed one ulp apart on it at sf0.001. Both statistics are rounded
    // to 12 digits on BOTH sides: a last-ulp (~1e-17) divergence cannot
    // survive a 1e-12 round, and 12 digits is far beyond any analytical
    // use of a concentration index.
    "olap_concentration" -> ((s, d) => {
      val perCust = ordersGeo(s, d)
        .groupBy(col("r_name"), col("c_custkey"))
        .agg(sum((col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("long")).cast("long").as("v"))
      val w = Window.partitionBy(col("r_name"))
        .orderBy(col("v"), col("c_custkey"))
      perCust
        .withColumn("rn", row_number().over(w).cast("long"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n"),
          sum(col("v")).cast("decimal(38,0)").as("sv"),
          sum((col("rn") * col("v")).cast("decimal(38,0)")).as("siv"),
          sum((col("v") * col("v")).cast("decimal(38,0)")).as("sv2"))
        .select(col("r_name").as("region"), col("n"),
          round((lit(2) * col("siv") - (col("n") + 1) * col("sv"))
            .cast("double") / (col("n") * col("sv")).cast("double"), 12)
            .as("gini"),
          round(col("sv2").cast("double") /
            (col("sv") * col("sv")).cast("double"), 12).as("hhi"))
        .orderBy(col("region"))
    }),

    // "TOP-5 + OTHER" rollup — the BI pie-chart contract: the five
    // highest-revenue nations keep their names, the long tail folds
    // into one OTHER bucket, and every bucket carries its exact
    // permille share. The rank runs on the ~25-row nation AGGREGATE
    // (row_number over (cents DESC, name) — deterministic under
    // ties), cents stay BIGINT end-to-end, the share is integer floor
    // division over a window on the ≤6-row bucket table, and the one
    // display division is the last step.
    "olap_top_n_other" -> ((s, d) => {
      val agg = ordersGeo(s, d)
        .groupBy(col("n_name"))
        .agg(sum((col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("long")).cast("long").as("cents"))
      val w = Window.orderBy(col("cents").desc, col("n_name"))
      agg.withColumn("rn", row_number().over(w))
        .withColumn("bucket",
          when(col("rn") <= 5, col("n_name")).otherwise(lit("OTHER")))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).cast("long").as("n_nations"),
          sum(col("cents")).cast("long").as("revenue_cents"))
        .withColumn("share_permille",
          expr("(1000 * revenue_cents) div sum(revenue_cents) over ()"))
        .select(col("bucket"), col("n_nations"),
          (col("revenue_cents").cast("double") / 100.0).as("revenue"),
          col("share_permille"))
        .orderBy(col("revenue").desc, col("bucket"))
    }),

    // Running-max DRAWDOWN — "how far below its best day has daily
    // revenue fallen, and when": the series-health card behind
    // regression detection on any revenue/SLA/throughput series. Both
    // windows run over the ~|days| DAILY aggregate (running max, then
    // the argmax pick by (depth DESC, day) row_number — deterministic
    // under ties), never over facts; cents stay BIGINT; the output is
    // the single worst day.
    "w_drawdown" -> ((s, d) => {
      val daily = t(s, d, "orders")
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum((col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("long")).cast("long").as("cents"))
      val wRun = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wPick = Window.orderBy(col("dd_cents").desc, col("day"))
      daily
        .withColumn("peak_cents", max(col("cents")).over(wRun))
        .withColumn("dd_cents", col("peak_cents") - col("cents"))
        .withColumn("rn", row_number().over(wPick))
        .where(col("rn") === 1)
        .select(col("day"), col("peak_cents"), col("cents"),
          col("dd_cents"))
    }),

    // Rank-change movers ("who climbed the league table"): per-year
    // nation revenue ranks with the previous year's rank and the delta
    // — the BI movers-and-shakers card. Rank = row_number over the
    // (year, revenue DESC, nation) total order (deterministic under
    // ties); prev via lag over the nation's year series. BOTH windows
    // run on the per-(year, nation) AGGREGATE — |years|·|nations| rows
    // — never on facts, so the plan is one grouping pass plus two
    // tiny windows at any fact-table size.
    "w_rank_change" -> ((s, d) => {
      val agg = ordersGeo(s, d)
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
          col("n_name"))
        .agg(revenue.as("revenue"))
      val wRank = Window.partitionBy(col("yr"))
        .orderBy(col("revenue").desc, col("n_name"))
      val wLag = Window.partitionBy(col("n_name")).orderBy(col("yr"))
      agg.withColumn("rk", row_number().over(wRank).cast("long"))
        .withColumn("prev_rk", lag(col("rk"), 1).over(wLag))
        .withColumn("delta", col("prev_rk") - col("rk"))
        .orderBy(col("yr"), col("n_name"))
    }),

    // ABC / Pareto classification of parts by revenue — the inventory
    // analytics staple ("which 20% of SKUs carry 80% of revenue"):
    // per-part exact revenue cents, globally ranked desc, running total
    // via the DISTRIBUTED two-phase prefix sum (TrainingMix
    // .withRunningTotal — range partition + per-partition window +
    // broadcast offsets; the naive `sum() OVER (ORDER BY ...)` would
    // sort the whole SKU table in one task). Class cut at 80% / 95% of
    // total by HUGEINT-safe cross-multiplication in decimal(38,0) —
    // the cum·100 product overflows BIGINT on a 100 TB fact table.
    "olap_abc" -> ((s, d) => {
      val cents = t(s, d, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum((col("l_extendedprice").cast("decimal(12,2)") * 100)
          .cast("long")).cast("long").as("cents"))
      val tot = cents.agg(sum(col("cents")).cast("long").as("total"))
      graft.operators.TrainingMix.withRunningTotal(cents, Seq.empty,
          Seq(col("cents").desc, col("l_partkey")), col("cents"), "cum")
        .crossJoin(broadcast(tot))
        .withColumn("cls",
          when(col("cum").cast("decimal(38,0)") * 100 <=
            col("total").cast("decimal(38,0)") * 80, "A")
            .when(col("cum").cast("decimal(38,0)") * 100 <=
              col("total").cast("decimal(38,0)") * 95, "B")
            .otherwise("C"))
        .select(col("l_partkey"), col("cents"), col("cum"), col("cls"))
        .orderBy(col("l_partkey"))
    }),

    // Per-customer recommendations — the full recommender composition:
    // owned parts (orders ⋈ lineitem) → co-occurrence neighbors →
    // INTEGER score (Σ supports with owned items — exact, no float-sum
    // order sensitivity) → anti-join owned → top-3 per customer.
    "fi_recs_user" -> ((s, d) => {
      val owned = t(s, d, "orders").where(col("o_custkey") < 4)
        .join(t(s, d, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_partkey").as("item"))
        .distinct()
        .localCheckpoint() // read for scoring AND the owned anti-join
      val p = graft.operators.Itemsets.frequentPairs(
        t(s, d, "lineitem"), "l_orderkey", "l_partkey", minSupport = 2L)
      val sym = p.select(col("item_a").as("item"),
          col("item_b").as("rec"), col("support"))
        .unionByName(p.select(col("item_b").as("item"),
          col("item_a").as("rec"), col("support")))
      val scored = owned.join(sym, Seq("item"))
        .groupBy(col("cust"), col("rec"))
        .agg(sum(col("support")).cast("long").as("score"))
        .join(owned.select(col("cust"), col("item").as("rec")),
          Seq("cust", "rec"), "left_anti")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cust")).orderBy(col("score").desc, col("rec"))
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= 3)
        .orderBy(col("cust"), col("rank"))
    }),

    // "Customers also bought": item-item co-occurrence cosine top-3 —
    // exact-int counts under ONE √ and ONE division, ranked per item
    // over PAIR rows (a-priori bounded), never baskets.
    "fi_cosine_topk" -> ((s, d) =>
      graft.operators.Itemsets.cosineTopK(
          t(s, d, "lineitem"), "l_orderkey", "l_partkey",
          minSupport = 3L, k = 3)
        .orderBy(col("item"), col("rank"))),

    // Exact-moment correlation + OLS trend (price ~ quantity per flag):
    // one aggregate pass of integer moments; slope/intercept are single
    // divisions of exact integers, r mirrors √·√ ops bit-for-bit —
    // unlike corr()/covar_samp whose shuffle-order double streaming no
    // oracle could replay.
    "olap_corr_ols" -> ((s, d) =>
      graft.operators.Stats.corrOls(
          t(s, d, "lineitem"), Seq("l_returnflag"),
          "l_quantity", "l_extendedprice")
        .orderBy(col("l_returnflag"))),

    // Robust outlier gate: median-absolute-deviation flags (center and
    // spread from ORDER STATISTICS, so a heavy tail cannot drag the
    // gate the way it drags a z-score's mean/σ). Two composed exact
    // integer-quantile passes — cents throughout, the 3·MAD compare is
    // an integer compare, doubles only in the reported center/mad.
    "dq_outliers_mad" -> ((s, d) => {
      val cents = t(s, d, "lineitem")
        .where(col("l_extendedprice").isNotNull)
        .select(col("l_returnflag"),
          (col("l_extendedprice").cast("decimal(12,2)") * 100)
            .cast("long").as("vc"))
        .localCheckpoint() // center pass + deviation pass + flag count
      val c = graft.operators.Median.groupQuantilesLong(
          cents, Seq("l_returnflag"), "vc", Seq(50))
        .select(col("l_returnflag"), col("value").as("center"))
      val dev = cents.join(broadcast(c), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("center"),
          abs(col("vc") - col("center")).as("devc"))
        .localCheckpoint() // MAD pass + flag count
      val mad = graft.operators.Median.groupQuantilesLong(
          dev, Seq("l_returnflag"), "devc", Seq(50))
        .select(col("l_returnflag"), col("value").as("mad"))
      dev.join(broadcast(mad), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"), col("center"), col("mad"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("devc") > lit(3) * col("mad"), 1L).otherwise(0L))
            .cast("long").as("n_outliers"))
        .select(col("l_returnflag"),
          (col("center").cast("double") / 100.0).as("center"),
          (col("mad").cast("double") / 100.0).as("mad"),
          col("n"), col("n_outliers"))
        .orderBy(col("l_returnflag"))
    }),

    // Majority-vote label-propagation communities over the co-purchase
    // graph — coarser than connected components; 4 fixed deterministic
    // vote rounds, oracle unrolls them (MATERIALIZED).
    "g_communities" -> ((s, d) =>
      graft.operators.Graph.labelPropagation(
        graft.operators.Itemsets.frequentPairs(
            t(s, d, "lineitem"), "l_orderkey", "l_partkey", minSupport = 2L)
          .select(col("item_a"), col("item_b")),
        "item_a", "item_b", rounds = 4)
        .orderBy(col("node"))),

    // Two-hop REACH of the top hubs — "how much of the graph can the
    // ten busiest items influence within two co-purchase steps": the
    // seeded reach/influence metric. Seeding from the TakeOrdered
    // top-10 keeps the frontier joins bounded (10 rows × degree, then
    // frontier × degree — the Σdeg² wedge bound applies only to ten
    // vertices, never to the whole graph). Reach = distinct 2-hop
    // neighborhood excluding the hub itself.
    "g_two_hop_reach" -> ((s, d) => {
      val fp = graft.operators.Itemsets.frequentPairsRaw(
          t(s, d, "lineitem"), "l_orderkey", "l_partkey", minSupport = 2L)
        .select(col("item_a"), col("item_b"))
      val e2 = fp.select(col("item_a").as("src"), col("item_b").as("dst"))
        .unionByName(
          fp.select(col("item_b").as("src"), col("item_a").as("dst")))
        .where(col("src") =!= col("dst"))
        .distinct()
        .localCheckpoint()
      val deg = e2.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
      val hubs = deg.orderBy(desc("deg"), col("node")).limit(10)
      val hop1 = e2.join(broadcast(hubs), col("src") === col("node"))
        .select(col("node"), col("deg"), col("dst"))
      val hop2 = hop1.select(col("node"), col("dst").as("mid"))
        .join(e2.select(col("src").as("mid"), col("dst").as("dst2")),
          Seq("mid"))
        .select(col("node"), col("dst2").as("dst"))
      hop1.select(col("node"), col("dst"))
        .unionByName(hop2)
        .where(col("dst") =!= col("node"))
        .distinct()
        .groupBy(col("node")).agg(count(lit(1)).as("reach_2hop"))
        .join(broadcast(hubs), Seq("node"))
        .select(col("node"), col("deg"), col("reach_2hop"))
        .orderBy(desc("deg"), col("node"))
    }),

    // Community-partition QUALITY — Newman modularity of the label-
    // propagation communities over the co-purchase graph: Q =
    // Σ_c [e_c/m − (d_c/2m)²]. Every count (directed internal edges
    // in_c, degree sums d_c, edge total m) is an exact integer from
    // label-keyed aggregates; the per-community contribution is then
    // in_c/(2m) − (d_c/(2m))² — identical float ops in identical
    // order in both engines, no pow(). The frequent-pair edge table
    // is STAGED once and feeds label prop, the degree table, and the
    // internal-edge count, so the basket self-join runs one time.
    "g_modularity" -> ((s, d) => {
      val fp = graft.operators.Itemsets.frequentPairsRaw(
          t(s, d, "lineitem"), "l_orderkey", "l_partkey", minSupport = 2L)
        .select(col("item_a"), col("item_b"))
        .localCheckpoint()
      val e2 = fp.select(col("item_a").as("src"), col("item_b").as("dst"))
        .unionByName(
          fp.select(col("item_b").as("src"), col("item_a").as("dst")))
        .where(col("src") =!= col("dst"))
        .distinct()
        .localCheckpoint()
      val comm = graft.operators.Graph.labelPropagation(
        fp, "item_a", "item_b", rounds = 4) // (node, community)
      val mdf = e2.agg(count(lit(1)).as("cd"))
        .select(expr("cd div 2").as("m"))
      val deg = e2.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
      val inn = e2
        .join(comm.select(col("node").as("src"),
          col("community").as("ca")), "src")
        .join(comm.select(col("node").as("dst"),
          col("community").as("cb")), "dst")
        .where(col("ca") === col("cb"))
        .groupBy(col("ca").as("community"))
        .agg(count(lit(1)).as("in_directed"))
      comm.join(deg, "node")
        .groupBy(col("community"))
        .agg(count(lit(1)).as("n_nodes"),
          sum(col("deg")).cast("long").as("deg_sum"))
        .join(inn, Seq("community"), "left")
        .select(col("community"), col("n_nodes"),
          coalesce(col("in_directed"), lit(0L)).as("ind"),
          col("deg_sum"))
        .crossJoin(broadcast(mdf))
        .select(col("community"), col("n_nodes"),
          expr("ind div 2").as("e_in"), col("deg_sum"),
          col("m").as("m_edges"),
          (col("ind").cast("double") / (lit(2) * col("m")).cast("double")
            - (col("deg_sum").cast("double") /
                (lit(2) * col("m")).cast("double")) *
              (col("deg_sum").cast("double") /
                (lit(2) * col("m")).cast("double"))).as("q_contrib"))
        .orderBy(col("community"))
    }),

    // Support-weighted PageRank over the symmetric co-purchase graph:
    // rank mass follows co-purchase strength, not edge count. Integer
    // micro-units; the oracle unrolls all 3 rounds bit-for-bit. The
    // pair graph is STAGED once — edges (both directions) and the node
    // set all derive from it, so the lineitem basket self-join runs one
    // time, not once per derivation (at the lake this is the staged
    // co-occurrence edge table every graph query reads).
    "g_pagerank_weighted" -> ((s, d) => {
      val p = graft.operators.Itemsets.frequentPairs(
        t(s, d, "lineitem"), "l_orderkey", "l_partkey", minSupport = 2L)
        .localCheckpoint()
      val e = p.select(col("item_a").as("src"), col("item_b").as("dst"),
          col("support").as("w"))
        .unionByName(p.select(col("item_b").as("src"),
          col("item_a").as("dst"), col("support").as("w")))
      graft.operators.Graph.pagerankWeightedInt(e,
          e.select(col("src").as("id")).distinct(), iters = 3)
        .orderBy(col("id"))
    }),

    // 2-core of the co-purchase graph: iterative peeling (8 fixed
    // rounds — the oracle unrolls the identical peels; `converged`
    // computed from data keeps the contract honest if rounds ever
    // under-run).
    "g_kcore" -> ((s, d) =>
      graft.operators.Graph.kCore(
        graft.operators.Itemsets.frequentPairs(
            t(s, d, "lineitem"), "l_orderkey", "l_partkey", minSupport = 2L)
          .select(col("item_a"), col("item_b")),
        "item_a", "item_b", k = 2, rounds = 8)
        .orderBy(col("node"))),

    // Triangle census of the co-purchase graph (edges = frequent pairs at
    // support ≥ 2): degree-ordered orientation bounds the wedge join at
    // Σ outdeg² ≤ O(|E|^1.5) — the hub-proof recipe, never neighbors².
    "g_triangles" -> ((s, d) =>
      graft.operators.Graph.triangleCount(
        graft.operators.Itemsets.frequentPairs(
            t(s, d, "lineitem"), "l_orderkey", "l_partkey", minSupport = 2L)
          .select(col("item_a"), col("item_b")),
        "item_a", "item_b")),

    // EXACT connected components of the co-purchase graph — the exact
    // dual of g_communities' majority vote: 6 fixed min-label rounds
    // (each ONE node-keyed join + ONE map-side-combinable min), with
    // `converged` computed FROM THE DATA (no edge straddles two labels)
    // so the contract stays honest if rounds under-run the diameter.
    // The oracle unrolls the identical rounds as MATERIALIZED CTEs.
    "g_concomp" -> ((s, d) =>
      graft.operators.Graph.connectedComponents(
        graft.operators.Itemsets.frequentPairs(
            t(s, d, "lineitem"), "l_orderkey", "l_partkey", minSupport = 2L)
          .select(col("item_a"), col("item_b")),
        "item_a", "item_b", rounds = 6)
        .orderBy(col("node"))),

    // Frequent TRIPLES — the a-priori level the pair queries stop at:
    // candidate (a,b,c) exists only when ALL THREE sub-pairs are
    // frequent (the level-wise closure prune), and support counts
    // baskets containing the whole triple. Occurrence rows build
    // incrementally: frequent-pair occurrences (the same basket
    // self-join bound as frequentPairs, semi-joined to the surviving
    // pair list before any third item attaches) extend by one
    // basket-keyed join, with the (a,c)/(b,c) closure joins pruning
    // candidates BEFORE the count — at no point does an unpruned
    // 3-way basket product exist. All counts exact BIGINTs.
    "fi_triples" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val b = li.where(col("l_orderkey").isNotNull &&
          col("l_partkey").isNotNull)
        .select(col("l_orderkey").as("bk"), col("l_partkey").as("it"))
        .distinct().localCheckpoint()
      val pairs = graft.operators.Itemsets.frequentPairs(
          li, "l_orderkey", "l_partkey", minSupport = 2L)
        .select(col("item_a"), col("item_b")).localCheckpoint()
      val pocc = b.as("x").join(b.as("y"),
          col("x.bk") === col("y.bk") && col("x.it") < col("y.it"))
        .select(col("x.bk").as("bk"), col("x.it").as("a"),
          col("y.it").as("b"))
        .join(pairs.select(col("item_a").as("a"),
          col("item_b").as("b")), Seq("a", "b"))
      pocc.join(b.select(col("bk"), col("it").as("c")), Seq("bk"))
        .where(col("c") > col("b"))
        .join(pairs.select(col("item_a").as("a"),
          col("item_b").as("c")), Seq("a", "c"))
        .join(pairs.select(col("item_a").as("b"),
          col("item_b").as("c")), Seq("b", "c"))
        .groupBy(col("a"), col("b"), col("c"))
        .agg(count(lit(1)).cast("long").as("support"))
        .where(col("support") >= 2)
        .select(col("a").as("item_a"), col("b").as("item_b"),
          col("c").as("item_c"), col("support"))
        .orderBy(col("item_a"), col("item_b"), col("item_c"))
    }),

    // Link prediction over the co-purchase graph: top-20 NON-adjacent
    // pairs by common-neighbor Jaccard |Γ(u)∩Γ(v)| / |Γ(u)∪Γ(v)| —
    // the classic "products likely to be co-purchased next" / related-
    // item discovery primitive. Common neighbors come from ONE wedge
    // self-join of the symmetric adjacency (cost Σ_m deg(m)², the same
    // hub bound as the triangle census; min-support 2 already prunes
    // incidental hubs), existing edges leave by LEFT ANTI join, and the
    // score is one double division of exact integers (IEEE division is
    // correctly rounded, so both engines agree bitwise). Top-20 runs as
    // TakeOrderedAndProject with a full (score, u, v) tie order — no
    // global sort materializes. The staged pair graph feeds adjacency,
    // degrees, AND the exclusion anti-join from one localCheckpoint.
    "g_link_predict" -> ((s, d) => {
      val e = graft.operators.Itemsets.frequentPairs(
          t(s, d, "lineitem"), "l_orderkey", "l_partkey", minSupport = 2L)
        .select(col("item_a"), col("item_b")).localCheckpoint()
      val adj = e.select(col("item_a").as("node"), col("item_b").as("nbr"))
        .unionByName(
          e.select(col("item_b").as("node"), col("item_a").as("nbr")))
      val deg = adj.groupBy(col("node"))
        .agg(count(lit(1)).cast("long").as("deg"))
      val cand = adj.select(col("node").as("u"), col("nbr").as("m"))
        .join(adj.select(col("node").as("v"), col("nbr").as("m2")),
          col("m") === col("m2") && col("u") < col("v"))
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).cast("long").as("cn"))
      cand
        .join(e, cand("u") === e("item_a") && cand("v") === e("item_b"),
          "left_anti")
        .join(deg.select(col("node").as("u"), col("deg").as("deg_a")),
          Seq("u"))
        .join(deg.select(col("node").as("v"), col("deg").as("deg_b")),
          Seq("v"))
        .withColumn("jaccard", col("cn").cast("double") /
          (col("deg_a") + col("deg_b") - col("cn")).cast("double"))
        .select(col("u").as("node_a"), col("v").as("node_b"), col("cn"),
          col("deg_a"), col("deg_b"), col("jaccard"))
        .orderBy(col("jaccard").desc, col("node_a"), col("node_b"))
        .limit(20)
    }),

    // Month-of-year SEASONALITY index: each calendar month's share of
    // total revenue relative to the uniform 1/12 — index 1.2 means "a
    // 20% hot month", the demand-planning card. Exact cent sums; the
    // index is computed as the single expression (12·month_rev)/total
    // so the 1/12 never exists as a float. One month aggregate + a
    // broadcast total.
    "w_seasonality_index" -> ((s, d) => {
      val g = t(s, d, "orders")
        .groupBy(month(col("o_orderdate")).cast("long").as("mon"))
        .agg(sum((col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("long")).cast("decimal(38,0)").as("rev"))
      g.crossJoin(broadcast(
          g.agg(sum(col("rev")).cast("decimal(38,0)").as("tot"))))
        .select(col("mon"),
          (col("rev").cast("double") / 100.0).as("revenue"),
          ((col("rev") * 12).cast("double") / col("tot").cast("double"))
            .as("seasonality"))
        .orderBy(col("mon"))
    }),

    // YoY DELTA CONTRIBUTION — "which nations drove the change":
    // per-nation revenue delta between the corpus's first two years,
    // with each nation's share of the TOTAL delta (the waterfall-chart
    // decomposition; shares sum to 1 by construction, negative movers
    // carry negative shares). Deltas are exact cent integers; the
    // share is one IEEE division by the broadcast total. Nations
    // absent in a year contribute that year as zero via the FULL join
    // + coalesce.
    "olap_delta_contribution" -> ((s, d) => {
      val o = ordersGeo(s, d)
      val yr = year(col("o_orderdate")).cast("long")
      val per = o.select(col("n_name"), yr.as("yr"),
          (col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long").as("c"))
        .crossJoin(broadcast(o.agg(min(yr).as("y0"))))
        .where(col("yr") === col("y0") || col("yr") === col("y0") + 1)
        .groupBy(col("n_name"), (col("yr") === col("y0")).as("is_y1"))
        .agg(sum(col("c")).cast("long").as("rev"))
      val a = per.where(col("is_y1"))
        .select(col("n_name"), col("rev").as("rev_y1"))
      val b = per.where(!col("is_y1"))
        .select(col("n_name").as("n2"), col("rev").as("rev_y2"))
      val delta = a.join(b, col("n_name") === col("n2"), "full")
        .select(coalesce(col("n_name"), col("n2")).as("nation"),
          coalesce(col("rev_y1"), lit(0L)).as("rev_y1"),
          coalesce(col("rev_y2"), lit(0L)).as("rev_y2"))
        .withColumn("delta", col("rev_y2") - col("rev_y1"))
      delta.crossJoin(broadcast(
          delta.agg(sum(col("delta")).cast("long").as("td"))))
        .select(col("nation"),
          (col("rev_y1").cast("double") / 100.0).as("rev_y1"),
          (col("rev_y2").cast("double") / 100.0).as("rev_y2"),
          (col("delta").cast("double") / 100.0).as("delta"),
          when(col("td") =!= 0, col("delta").cast("double") /
            col("td").cast("double")).as("share_of_change"))
        .orderBy(col("nation"))
    }),

    // Price-volume GROWTH DECOMPOSITION — "did revenue move because we
    // took more orders or bigger orders": ΔR split into the volume
    // effect ΔN·AOV₀ (order-count change at year-0 value) and the
    // value effect (the remainder — per-order value change plus mix).
    // One grouped pass over the first two years (min-year broadcast,
    // the olap_delta_contribution anchor); every sum is BIGINT cents
    // and the two effects are single divisions of exact integers, so
    // both engines do the identical float ops in the identical order.
    "olap_growth_decomposition" -> ((s, d) => {
      val o = t(s, d, "orders")
      val yr = year(col("o_orderdate")).cast("long")
      o.select(yr.as("yr"),
          (col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long").as("c"))
        .crossJoin(broadcast(o.agg(min(yr).as("y0"))))
        .where(col("yr") === col("y0") || col("yr") === col("y0") + 1)
        .groupBy(col("y0"))
        .agg(
          sum(when(col("yr") === col("y0"), 1L).otherwise(0L))
            .cast("long").as("n0"),
          sum(when(col("yr") === col("y0") + 1, 1L).otherwise(0L))
            .cast("long").as("n1"),
          sum(when(col("yr") === col("y0"), col("c")).otherwise(0L))
            .cast("long").as("r0"),
          sum(when(col("yr") === col("y0") + 1, col("c")).otherwise(0L))
            .cast("long").as("r1"))
        .select(col("y0"), (col("y0") + 1).as("y1"), col("n0"),
          col("n1"),
          (col("r0").cast("double") / 100.0).as("rev_y0"),
          (col("r1").cast("double") / 100.0).as("rev_y1"),
          ((col("r1") - col("r0")).cast("double") / 100.0).as("delta"),
          (((col("n1") - col("n0")) * col("r0")).cast("double") /
            (col("n0") * 100L).cast("double")).as("volume_effect"),
          (((col("r1") - col("r0")).cast("double") / 100.0) -
            (((col("n1") - col("n0")) * col("r0")).cast("double") /
              (col("n0") * 100L).cast("double"))).as("value_effect"))
    }),

    // Basket-size profile in dyadic buckets, with each bucket's exact
    // within-basket pair count Σ sz(sz−1)/2 — the number that PRICES
    // the frequent-pair self-join (its cost is exactly this sum), so
    // the market-basket pipeline can read its own bill before running.
    // Same binary-digit-count bucketing as g_degree_dist (no float
    // log); one basket-size aggregate + one ≤64-row bucket count.
    "fi_basket_stats" -> ((s, d) =>
      t(s, d, "lineitem")
        .where(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
        .select(col("l_orderkey").as("bk"), col("l_partkey").as("it"))
        .distinct()
        .groupBy(col("bk")).agg(count(lit(1)).cast("long").as("sz"))
        .withColumn("bucket",
          expr("cast(length(conv(sz, 10, 2)) - 1 as bigint)"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).cast("long").as("n_baskets"),
          min(col("sz")).as("min_size"), max(col("sz")).as("max_size"),
          sum(expr("sz * (sz - 1) div 2")).cast("long").as("n_pairs"))
        .orderBy(col("bucket"))),

    // Customer-band MIGRATION matrix between the corpus's first two
    // years — "who moved up, who lapsed": per-customer first-year and
    // second-year revenue (exact cents) banded by PINNED literal
    // thresholds (low < $200k ≤ mid < $600k ≤ high — no data-derived
    // quantile can drift between engines), with customers absent in
    // year two reported as 'none'. One customer-keyed aggregate + a
    // broadcast min-year scalar; the matrix is a ≤12-row count.
    "w_customer_migration" -> ((s, d) => {
      val o = t(s, d, "orders")
      val yr = year(col("o_orderdate")).cast("long")
      val per = o.select(col("o_custkey"), yr.as("yr"),
          (col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long").as("c"))
        .crossJoin(broadcast(o.agg(min(yr).as("y0"))))
        .where(col("yr") === col("y0") || col("yr") === col("y0") + 1)
        .groupBy(col("o_custkey"), (col("yr") === col("y0")).as("is_y1"))
        .agg(sum(col("c")).cast("long").as("rev"))
      val band = when(col("rev") < 20000000L, "low")
        .when(col("rev") < 60000000L, "mid").otherwise("high")
      per.where(col("is_y1"))
        .select(col("o_custkey"), band.as("band_y1"))
        .join(per.where(!col("is_y1"))
          .select(col("o_custkey"), band.as("band_y2")),
          Seq("o_custkey"), "left")
        .groupBy(col("band_y1"),
          coalesce(col("band_y2"), lit("none")).as("band_y2"))
        .agg(count(lit(1)).cast("long").as("n_customers"))
        .orderBy(col("band_y1"), col("band_y2"))
    }),

    // Degree DISTRIBUTION of the co-purchase graph in dyadic buckets
    // (bucket k holds degrees in [2^k, 2^(k+1))) — the heavy-tail
    // profile every graph plan here depends on (the Σdeg² wedge bounds
    // of the triangle/link-prediction joins are priced by exactly this
    // histogram). Bucket = floor(log2 deg) computed as the BINARY
    // DIGIT COUNT minus one (conv/printf '%b' — pure integer string
    // length, no float log whose last-ulp error could misbucket an
    // exact power of two). One degree aggregate + one ≤64-row bucket
    // count.
    "g_degree_dist" -> ((s, d) => {
      val e = graft.operators.Itemsets.frequentPairs(
          t(s, d, "lineitem"), "l_orderkey", "l_partkey", minSupport = 2L)
        .select(col("item_a"), col("item_b"))
      val adj = e.select(col("item_a").as("node"), col("item_b").as("nbr"))
        .unionByName(
          e.select(col("item_b").as("node"), col("item_a").as("nbr")))
      adj.groupBy(col("node"))
        .agg(count(lit(1)).cast("long").as("deg"))
        .withColumn("bucket",
          expr("cast(length(conv(deg, 10, 2)) - 1 as bigint)"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).cast("long").as("n_nodes"),
          min(col("deg")).as("min_deg"), max(col("deg")).as("max_deg"))
        .orderBy(col("bucket"))
    }),

    // Local CLOSURE by degree class — does clustering concentrate in
    // the low-degree long tail or survive at the hubs? Per-vertex
    // triangle counts (g_triangles' ordered a<b<c enumeration, each
    // triangle crediting its three corners) against the per-vertex
    // wedge bill C(deg,2), aggregated into g_degree_dist's dyadic
    // buckets: Σtri/Σwedges per bucket as an exact integer permille.
    // The hub-closure drop-off this reveals is the standard argument
    // for degree-aware sampling before an O(Σdeg²) wedge pass. The
    // triangle joins are the census's equi-joins (left_semi close
    // check, no product); everything after is aggregate-sized.
    "g_closure_by_degree" -> ((s, d) => {
      val e = graft.operators.Itemsets.frequentPairsRaw(
          t(s, d, "lineitem"), "l_orderkey", "l_partkey", minSupport = 2L)
        .select(col("item_a").as("a"), col("item_b").as("b"))
        .localCheckpoint()
      val tri = e.as("e1")
        .join(e.as("e2"),
          col("e2.a") === col("e1.a") && col("e2.b") > col("e1.b"))
        .select(col("e1.a").as("ta"), col("e1.b").as("tb"),
          col("e2.b").as("tc"))
        .join(e.as("e3"),
          col("tb") === col("e3.a") && col("tc") === col("e3.b"),
          "left_semi")
      val triPerV = tri
        .select(explode(array(col("ta"), col("tb"), col("tc"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).cast("long").as("tri"))
      val deg = e.select(col("a").as("node"))
        .unionByName(e.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).cast("long").as("deg"))
      deg.join(triPerV, Seq("node"), "left")
        .select(col("deg"), coalesce(col("tri"), lit(0L)).as("tri"))
        .withColumn("bucket",
          expr("cast(length(conv(deg, 10, 2)) - 1 as bigint)"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).cast("long").as("n_nodes"),
          sum(col("tri")).cast("long").as("n_closed"),
          sum(expr("deg * (deg - 1) div 2")).cast("long").as("n_wedges"))
        .withColumn("closure_permille",
          when(col("n_wedges") > 0,
            expr("(1000 * n_closed) div n_wedges"))
            .otherwise(lit(null).cast("long")))
        .orderBy(col("bucket"))
    }),

    // HUB report — the "which nodes to cap" companion to
    // g_degree_dist: the top-10 co-purchase vertices by degree with
    // each hub's share of Σdeg², i.e. its share of the wedge-join
    // bill. The capping decision (drop or sample hub neighborhoods
    // before a triangle/link-prediction pass) reads exactly this
    // column. Degree table + broadcast Σdeg² scalar + TakeOrdered;
    // the share is one IEEE division of exact integers.
    "g_hub_report" -> ((s, d) => {
      val e = graft.operators.Itemsets.frequentPairs(
          t(s, d, "lineitem"), "l_orderkey", "l_partkey", minSupport = 2L)
        .select(col("item_a"), col("item_b"))
      val deg = e.select(col("item_a").as("node"), col("item_b").as("nbr"))
        .unionByName(
          e.select(col("item_b").as("node"), col("item_a").as("nbr")))
        .groupBy(col("node"))
        .agg(count(lit(1)).cast("long").as("deg"))
      deg.crossJoin(broadcast(deg.agg(
          sum((col("deg") * col("deg")).cast("decimal(38,0)"))
            .as("sd2"))))
        .select(col("node"), col("deg"),
          ((col("deg") * col("deg")).cast("double") /
            col("sd2").cast("double")).as("wedge_share"))
        .orderBy(col("deg").desc, col("node"))
        .limit(10)
    }),

    // Degree assortativity of the co-purchase graph: Pearson r of
    // (deg(u), deg(v)) over the DIRECTED edge list (both directions of
    // every undirected edge, the standard convention) — "do popular
    // products co-purchase with popular products?", the one-number
    // mixing diagnostic. All five moments accumulate as EXACT
    // decimal(38,0) sums of integers; floats appear only in the final
    // r = cov/√(varx·vary) (two correctly-rounded casts, one √, one
    // division, rounded to 12 digits on both sides — the
    // olap_concentration precedent for >2^53 decimal→double). Zero
    // variance (regular graph) yields NULL, not a crash. Cost: two
    // node-keyed joins of the edge list against the |V|-row degree
    // table plus one scalar aggregate — nothing all-pairs.
    "g_assortativity" -> ((s, d) => {
      val e = graft.operators.Itemsets.frequentPairs(
          t(s, d, "lineitem"), "l_orderkey", "l_partkey", minSupport = 2L)
        .select(col("item_a"), col("item_b")).localCheckpoint()
      val adj = e.select(col("item_a").as("src"), col("item_b").as("dst"))
        .unionByName(
          e.select(col("item_b").as("src"), col("item_a").as("dst")))
      val deg = adj.groupBy(col("src").as("node"))
        .agg(count(lit(1)).cast("long").as("deg"))
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      adj
        .join(deg.select(col("node").as("src"), col("deg").as("dx")),
          Seq("src"))
        .join(deg.select(col("node").as("dst"), col("deg").as("dy")),
          Seq("dst"))
        .agg(count(lit(1)).cast("long").as("m"),
          sum(dec(col("dx"))).as("sx"), sum(dec(col("dy"))).as("sy"),
          sum(dec(col("dx") * col("dx"))).as("sxx"),
          sum(dec(col("dy") * col("dy"))).as("syy"),
          sum(dec(col("dx") * col("dy"))).as("sxy"))
        .withColumn("cov",
          (dec(col("m")) * col("sxy") - col("sx") * col("sy"))
            .cast("double"))
        .withColumn("varx",
          (dec(col("m")) * col("sxx") - col("sx") * col("sx"))
            .cast("double"))
        .withColumn("vary",
          (dec(col("m")) * col("syy") - col("sy") * col("sy"))
            .cast("double"))
        .select(col("m").as("m_edges"),
          when(col("varx") > 0 && col("vary") > 0,
            round(col("cov") / sqrt(col("varx") * col("vary")), 12))
            .as("assortativity"))
    })
  )

  val oracles: Map[String, String] = Map(
    "olap_skyline" ->
      """SELECT p_partkey, p_size, p_retailprice FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM part q
        |  WHERE q.p_size <= p.p_size
        |    AND q.p_retailprice <= p.p_retailprice
        |    AND (q.p_size < p.p_size OR q.p_retailprice < p.p_retailprice))
        |ORDER BY p_size, p_retailprice, p_partkey""".stripMargin,
    "fi_rule_stability" ->
      """WITH f AS (SELECT l_orderkey AS bk, l_partkey AS it, o_orderdate
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |ba AS (SELECT DISTINCT bk, it FROM f
        |  WHERE o_orderdate < DATE '1998-05-01'),
        |bb AS (SELECT DISTINCT bk, it FROM f
        |  WHERE o_orderdate >= DATE '1998-05-01'),
        |pa AS (SELECT a.it AS item_a, c.it AS item_b FROM ba a
        |  JOIN ba c ON a.bk = c.bk AND a.it < c.it
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |pb AS (SELECT a.it AS item_a, c.it AS item_b FROM bb a
        |  JOIN bb c ON a.bk = c.bk AND a.it < c.it
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |fo AS (SELECT coalesce(pa.item_a, pb.item_a) AS item_a,
        |  CASE WHEN pa.item_a IS NOT NULL THEN 1 ELSE 0 END AS in_a,
        |  CASE WHEN pb.item_a IS NOT NULL THEN 1 ELSE 0 END AS in_b
        |  FROM pa FULL OUTER JOIN pb
        |    ON pa.item_a = pb.item_a AND pa.item_b = pb.item_b),
        |a AS (SELECT CAST(sum(in_a) AS BIGINT) AS n_early,
        |  CAST(sum(in_b) AS BIGINT) AS n_late,
        |  CAST(sum(in_a * in_b) AS BIGINT) AS n_common FROM fo)
        |SELECT n_early, n_late, n_common,
        |  CASE WHEN n_early + n_late - n_common > 0
        |    THEN (1000 * n_common) // (n_early + n_late - n_common)
        |    ELSE 0 END AS jaccard_permille
        |FROM a""".stripMargin,
    "fi_pairs" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
        |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |n AS (SELECT it, count(*) AS ni FROM b GROUP BY 1),
        |tot AS (SELECT count(DISTINCT bk) AS nbk FROM b),
        |pr AS (SELECT a.it AS ia, c.it AS ib, count(*) AS s
        |  FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it GROUP BY 1, 2)
        |SELECT pr.ia AS item_a, pr.ib AS item_b,
        |  CAST(pr.s AS BIGINT) AS support,
        |  CAST(na.ni AS BIGINT) AS n_a, CAST(nc.ni AS BIGINT) AS n_b,
        |  CAST(pr.s * tot.nbk AS DOUBLE) / (na.ni * nc.ni) AS lift
        |FROM pr JOIN n na ON na.it = pr.ia JOIN n nc ON nc.it = pr.ib
        |CROSS JOIN tot
        |WHERE pr.s >= 3 ORDER BY item_a, item_b""".stripMargin,
    "fi_rules" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
        |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |n AS (SELECT it, count(*) AS ni FROM b GROUP BY 1),
        |tot AS (SELECT count(DISTINCT bk) AS nbk FROM b),
        |pr AS (SELECT a.it AS ia, c.it AS ib, count(*) AS s
        |  FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it GROUP BY 1, 2),
        |pp AS (SELECT ia, ib, s, na.ni AS n_a, nc.ni AS n_b
        |  FROM pr JOIN n na ON na.it = pr.ia JOIN n nc ON nc.it = pr.ib
        |  WHERE s >= 3),
        |r AS (SELECT ia AS ante, ib AS cons, s, n_a AS n_ante,
        |    n_b AS n_cons FROM pp
        |  UNION ALL
        |  SELECT ib, ia, s, n_b, n_a FROM pp)
        |SELECT ante, cons, CAST(s AS BIGINT) AS support,
        |  CAST(n_ante AS BIGINT) AS n_ante,
        |  CAST(n_cons AS BIGINT) AS n_cons,
        |  CAST(s AS DOUBLE) / n_ante AS confidence,
        |  CASE WHEN n_ante <> s THEN
        |    CAST(n_ante * (tot.nbk - n_cons) AS DOUBLE)
        |      / (tot.nbk * (n_ante - s)) END AS conviction
        |FROM r, tot
        |ORDER BY confidence DESC, ante, cons LIMIT 20""".stripMargin,
    "olap_group_median" ->
      """WITH s AS (SELECT l_returnflag AS g,
        |  CAST(CAST(l_extendedprice AS DECIMAL(12,2))*100 AS BIGINT) AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
        |  count(*) OVER (PARTITION BY g) AS n FROM s)
        |SELECT g AS l_returnflag,
        |  CAST(sum(CASE WHEN rn=(n+1)//2 THEN v ELSE 0 END)
        |     + sum(CASE WHEN rn=(n+2)//2 THEN v ELSE 0 END) AS DOUBLE)/200.0
        |  AS median
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "olap_median_calib" ->
      """WITH s AS (SELECT l_returnflag AS g,
        |  CAST(CAST(l_extendedprice AS DECIMAL(12,2))*100 AS BIGINT) AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |b AS (SELECT g, min(v) AS lo, max(v) AS hi, count(*) AS n
        |  FROM s GROUP BY 1),
        |h AS (SELECT s.g,
        |  least(4095, ((greatest(v, lo) - lo) * 4096) // (hi - lo + 1)) AS bk,
        |  count(*) AS bn FROM s JOIN b ON b.g = s.g GROUP BY 1, 2),
        |c AS (SELECT g, bk, bn,
        |  sum(bn) OVER (PARTITION BY g ORDER BY bk) AS cum FROM h),
        |l AS (SELECT c.g, bk FROM c JOIN b ON b.g = c.g
        |  WHERE cum - bn < (n+1)//2 AND (n+1)//2 <= cum),
        |e AS (SELECT l.g,
        |  lo + (bk*(hi-lo+1) + 4095)//4096 AS elo,
        |  lo + ((bk+1)*(hi-lo+1) + 4095)//4096 AS ehi
        |  FROM l JOIN b ON b.g = l.g),
        |r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
        |  count(*) OVER (PARTITION BY g) AS n FROM s),
        |ex AS (SELECT g, CAST(v AS DOUBLE)/100.0 AS p50
        |  FROM r WHERE rn = greatest(1, (50*n + 99)//100))
        |SELECT ex.g AS l_returnflag, ex.p50,
        |  CAST(e.elo + e.ehi AS DOUBLE)/200.0 AS approx_median,
        |  abs(CAST(e.elo + e.ehi AS DOUBLE)/200.0 - ex.p50) AS abs_err,
        |  CAST(e.ehi - e.elo AS DOUBLE)/100.0 AS width
        |FROM ex JOIN e ON e.g = ex.g ORDER BY 1""".stripMargin,
    "olap_group_deciles" ->
      """WITH s AS (SELECT l_returnflag AS g,
        |  CAST(CAST(l_extendedprice AS DECIMAL(12,2))*100 AS BIGINT) AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
        |  count(*) OVER (PARTITION BY g) AS n FROM s),
        |p AS (SELECT unnest([10,20,30,40,50,60,70,80,90]) AS pct)
        |SELECT g AS l_returnflag, CAST(pct AS BIGINT) AS pct,
        |  CAST(v AS DOUBLE)/100.0 AS value
        |FROM r CROSS JOIN p
        |WHERE rn = greatest(1, (pct*n + 99) // 100)
        |ORDER BY 1, 2""".stripMargin,
    "dq_fk_chain" ->
      """SELECT 'customer->nation' AS hop,
        |  (SELECT count(*) FROM customer WHERE c_nationkey NOT IN
        |    (SELECT n_nationkey FROM nation)) AS n_orphans
        |UNION ALL
        |SELECT 'lineitem->orders',
        |  (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN
        |    (SELECT o_orderkey FROM orders))
        |UNION ALL
        |SELECT 'orders->customer',
        |  (SELECT count(*) FROM orders WHERE o_custkey NOT IN
        |    (SELECT c_custkey FROM customer))
        |ORDER BY hop""".stripMargin,
    "olap_concentration" ->
      """WITH pc AS (SELECT r.r_name, c.c_custkey,
        |  CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(12,2))*100 AS BIGINT))
        |    AS BIGINT) AS v
        |  FROM orders o
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation n ON n.n_nationkey = c.c_nationkey
        |  JOIN region r ON r.r_regionkey = n.n_regionkey
        |  GROUP BY 1, 2),
        |rk AS (SELECT r_name, v, row_number() OVER (PARTITION BY r_name
        |  ORDER BY v, c_custkey) AS rn FROM pc),
        |m AS (SELECT r_name, count(*) AS n,
        |  CAST(sum(v) AS DECIMAL(38,0)) AS sv,
        |  CAST(sum(rn*v) AS DECIMAL(38,0)) AS siv,
        |  CAST(sum(v*v) AS DECIMAL(38,0)) AS sv2
        |  FROM rk GROUP BY 1)
        |SELECT r_name AS region, n,
        |  round(CAST(2*siv - (n+1)*sv AS DOUBLE)
        |        / CAST(n*sv AS DOUBLE), 12) AS gini,
        |  round(CAST(sv2 AS DOUBLE) / CAST(sv*sv AS DOUBLE), 12) AS hhi
        |FROM m ORDER BY 1""".stripMargin,
    "olap_top_n_other" ->
      """WITH a AS (SELECT n.n_name,
        |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        |    AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  GROUP BY 1),
        |b AS (SELECT *, row_number() OVER (ORDER BY cents DESC, n_name)
        |  AS rn FROM a),
        |g AS (SELECT CASE WHEN rn <= 5 THEN n_name ELSE 'OTHER' END
        |    AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_nations,
        |  CAST(sum(cents) AS BIGINT) AS revenue_cents
        |  FROM b GROUP BY 1)
        |SELECT bucket, n_nations,
        |  CAST(revenue_cents AS DOUBLE) / 100.0 AS revenue,
        |  (1000 * revenue_cents) //
        |    CAST(sum(revenue_cents) OVER () AS BIGINT) AS share_permille
        |FROM g ORDER BY revenue DESC, bucket""".stripMargin,
    "w_drawdown" ->
      """WITH dly AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        |    AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |r AS (SELECT day, cents, max(cents) OVER (ORDER BY day
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS peak_cents FROM dly)
        |SELECT day, peak_cents, cents, peak_cents - cents AS dd_cents
        |FROM r ORDER BY dd_cents DESC, day LIMIT 1""".stripMargin,
    "w_rank_change" ->
      """WITH a AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  n_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE)
        |    AS revenue
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2),
        |r AS (SELECT yr, n_name, revenue,
        |  CAST(row_number() OVER (PARTITION BY yr
        |    ORDER BY revenue DESC, n_name) AS BIGINT) AS rk FROM a)
        |SELECT yr, n_name, revenue, rk,
        |  lag(rk, 1) OVER (PARTITION BY n_name ORDER BY yr) AS prev_rk,
        |  lag(rk, 1) OVER (PARTITION BY n_name ORDER BY yr) - rk
        |    AS delta
        |FROM r ORDER BY yr, n_name""".stripMargin,
    "olap_abc" ->
      """WITH pc AS (SELECT l_partkey,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
        |    AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |r AS (SELECT l_partkey, cents, CAST(sum(cents) OVER (
        |  ORDER BY cents DESC, l_partkey ROWS UNBOUNDED PRECEDING)
        |  AS BIGINT) AS cum FROM pc),
        |t AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM pc)
        |SELECT l_partkey, cents, cum,
        |  CASE WHEN CAST(cum AS HUGEINT) * 100 <=
        |      CAST(total AS HUGEINT) * 80 THEN 'A'
        |    WHEN CAST(cum AS HUGEINT) * 100 <=
        |      CAST(total AS HUGEINT) * 95 THEN 'B'
        |    ELSE 'C' END AS cls
        |FROM r, t ORDER BY l_partkey""".stripMargin,
    "fi_recs_user" ->
      """WITH own AS (SELECT DISTINCT o.o_custkey AS cust,
        |  l.l_partkey AS item
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_custkey < 4),
        |b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
        |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |pr AS (SELECT a.it AS ia, c.it AS ib, count(*) AS s
        |  FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it GROUP BY 1, 2),
        |fp AS (SELECT ia, ib, s FROM pr WHERE s >= 2),
        |sym AS (SELECT ia AS item, ib AS rec, s FROM fp
        |  UNION ALL SELECT ib, ia, s FROM fp),
        |sc AS (SELECT own.cust, sym.rec,
        |  CAST(sum(sym.s) AS BIGINT) AS score
        |  FROM own JOIN sym ON sym.item = own.item
        |  GROUP BY 1, 2),
        |ex AS (SELECT sc.* FROM sc
        |  WHERE NOT EXISTS (SELECT 1 FROM own
        |    WHERE own.cust = sc.cust AND own.item = sc.rec)),
        |r AS (SELECT cust, rec, score, row_number() OVER
        |  (PARTITION BY cust ORDER BY score DESC, rec) AS rank FROM ex)
        |SELECT cust, rec, score, rank FROM r WHERE rank <= 3
        |ORDER BY cust, rank""".stripMargin,
    "fi_cosine_topk" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
        |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |n AS (SELECT it, count(*) AS ni FROM b GROUP BY 1),
        |pr AS (SELECT a.it AS ia, c.it AS ib, count(*) AS s
        |  FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it GROUP BY 1, 2),
        |fp AS (SELECT pr.ia, pr.ib, pr.s, na.ni AS na, nc.ni AS nb
        |  FROM pr JOIN n na ON na.it = pr.ia JOIN n nc ON nc.it = pr.ib
        |  WHERE pr.s >= 3),
        |sym AS (SELECT ia AS item, ib AS other, s, na AS ni, nb AS no
        |  FROM fp
        |  UNION ALL SELECT ib, ia, s, nb, na FROM fp),
        |r AS (SELECT item, other, s,
        |  CAST(s AS DOUBLE)/sqrt(CAST(ni*no AS DOUBLE)) AS sim,
        |  row_number() OVER (PARTITION BY item
        |    ORDER BY CAST(s AS DOUBLE)/sqrt(CAST(ni*no AS DOUBLE)) DESC,
        |      other) AS rank
        |  FROM sym)
        |SELECT item, other, CAST(s AS BIGINT) AS support, sim,
        |  CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 3 ORDER BY item, rank""".stripMargin,
    "olap_corr_ols" ->
      """WITH s AS (SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x,
        |  CAST(CAST(l_extendedprice AS DECIMAL(12,2))*100 AS BIGINT) AS y
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |m AS (SELECT g, CAST(count(*) AS DECIMAL(38,0)) AS n,
        |  CAST(sum(x) AS DECIMAL(38,0)) AS sx,
        |  CAST(sum(y) AS DECIMAL(38,0)) AS sy,
        |  CAST(sum(x*y) AS DECIMAL(38,0)) AS sxy,
        |  CAST(sum(x*x) AS DECIMAL(38,0)) AS sxx,
        |  CAST(sum(y*y) AS DECIMAL(38,0)) AS syy
        |  FROM s GROUP BY 1)
        |SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
        |  CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0 THEN
        |    CAST(n*sxy - sx*sy AS DOUBLE)
        |    / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
        |       * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) END AS r,
        |  CASE WHEN n*sxx - sx*sx > 0 THEN
        |    CAST(n*sxy - sx*sy AS DOUBLE)
        |    / CAST(n*sxx - sx*sx AS DOUBLE) END AS slope_cents,
        |  CASE WHEN n*sxx - sx*sx > 0 THEN
        |    CAST(sy*sxx - sx*sxy AS DOUBLE)
        |    / CAST((n*sxx - sx*sx)*100 AS DOUBLE) END AS intercept
        |FROM m ORDER BY 1""".stripMargin,
    "dq_outliers_mad" ->
      """WITH s AS (SELECT l_returnflag AS g,
        |  CAST(CAST(l_extendedprice AS DECIMAL(12,2))*100 AS BIGINT) AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
        |  count(*) OVER (PARTITION BY g) AS n FROM s),
        |c AS (SELECT g, v AS center FROM r
        |  WHERE rn = greatest(1, (50*n + 99)//100)),
        |d AS (SELECT s.g, c.center, abs(s.v - c.center) AS devc
        |  FROM s JOIN c ON c.g = s.g),
        |r2 AS (SELECT g, devc, row_number() OVER (PARTITION BY g
        |    ORDER BY devc) AS rn,
        |  count(*) OVER (PARTITION BY g) AS n FROM d),
        |m AS (SELECT g, devc AS mad FROM r2
        |  WHERE rn = greatest(1, (50*n + 99)//100))
        |SELECT d.g AS l_returnflag,
        |  CAST(d.center AS DOUBLE)/100.0 AS center,
        |  CAST(m.mad AS DOUBLE)/100.0 AS mad,
        |  count(*) AS n,
        |  CAST(sum(CASE WHEN d.devc > 3*m.mad THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM d JOIN m ON m.g = d.g
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    "g_two_hop_reach" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
        |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |pr AS (SELECT a.it AS ia, c.it AS ib, count(*) AS s
        |  FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it GROUP BY 1, 2),
        |fp AS (SELECT ia, ib FROM pr WHERE s >= 2),
        |e2 AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
        |  SELECT ia AS src, ib AS dst FROM fp
        |  UNION ALL SELECT ib, ia FROM fp)),
        |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
        |  FROM e2 GROUP BY 1),
        |hubs AS (SELECT node, deg FROM deg
        |  ORDER BY deg DESC, node LIMIT 10),
        |h1 AS (SELECT hubs.node, e2.dst FROM e2
        |  JOIN hubs ON e2.src = hubs.node),
        |h2 AS (SELECT h1.node, e2.dst FROM h1
        |  JOIN e2 ON e2.src = h1.dst),
        |r AS (SELECT DISTINCT node, dst FROM
        |  (SELECT node, dst FROM h1 UNION ALL SELECT node, dst FROM h2)
        |  WHERE dst <> node),
        |c AS (SELECT node, CAST(count(*) AS BIGINT) AS reach_2hop
        |  FROM r GROUP BY 1)
        |SELECT hubs.node, hubs.deg, c.reach_2hop
        |FROM hubs JOIN c ON c.node = hubs.node
        |ORDER BY hubs.deg DESC, hubs.node""".stripMargin,
    "g_modularity" -> {
      val rounds = (1 to 4).map { i =>
        s"""c$i AS MATERIALIZED (SELECT e2.src, l${i - 1}.lbl,
           |  count(*) AS cnt
           |  FROM e2 JOIN l${i - 1} ON l${i - 1}.node = e2.dst
           |  GROUP BY 1, 2),
           |l$i AS MATERIALIZED (SELECT src AS node, lbl FROM (
           |  SELECT src, lbl, row_number() OVER (PARTITION BY src
           |    ORDER BY cnt DESC, lbl) AS rn FROM c$i) WHERE rn = 1)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
         |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
         |pr AS (SELECT a.it AS ia, c.it AS ib, count(*) AS s
         |  FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it GROUP BY 1, 2),
         |fp AS (SELECT ia, ib FROM pr WHERE s >= 2),
         |e2 AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
         |  SELECT ia AS src, ib AS dst FROM fp
         |  UNION ALL SELECT ib, ia FROM fp)),
         |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e2),
         |$rounds,
         |mm AS (SELECT CAST(count(*) // 2 AS BIGINT) AS m FROM e2),
         |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
         |  FROM e2 GROUP BY 1),
         |inn AS (SELECT x.lbl AS community,
         |  CAST(count(*) AS BIGINT) AS ind
         |  FROM e2 JOIN l4 x ON x.node = e2.src
         |  JOIN l4 y ON y.node = e2.dst
         |  WHERE x.lbl = y.lbl GROUP BY 1),
         |dc AS (SELECT l4.lbl AS community,
         |  CAST(count(*) AS BIGINT) AS n_nodes,
         |  CAST(sum(deg.deg) AS BIGINT) AS deg_sum
         |  FROM l4 JOIN deg ON deg.node = l4.node GROUP BY 1)
         |SELECT dc.community, dc.n_nodes,
         |  CAST(coalesce(inn.ind, 0) // 2 AS BIGINT) AS e_in,
         |  dc.deg_sum, mm.m AS m_edges,
         |  CAST(coalesce(inn.ind, 0) AS DOUBLE) / CAST(2*mm.m AS DOUBLE)
         |    - (CAST(dc.deg_sum AS DOUBLE) / CAST(2*mm.m AS DOUBLE))
         |      * (CAST(dc.deg_sum AS DOUBLE) / CAST(2*mm.m AS DOUBLE))
         |    AS q_contrib
         |FROM dc LEFT JOIN inn ON inn.community = dc.community, mm
         |ORDER BY 1""".stripMargin
    },
    "g_communities" -> {
      val rounds = (1 to 4).map { i =>
        s"""c$i AS MATERIALIZED (SELECT e2.src, l${i - 1}.lbl,
           |  count(*) AS cnt
           |  FROM e2 JOIN l${i - 1} ON l${i - 1}.node = e2.dst
           |  GROUP BY 1, 2),
           |l$i AS MATERIALIZED (SELECT src AS node, lbl FROM (
           |  SELECT src, lbl, row_number() OVER (PARTITION BY src
           |    ORDER BY cnt DESC, lbl) AS rn FROM c$i) WHERE rn = 1)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
         |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
         |pr AS (SELECT a.it AS ia, c.it AS ib, count(*) AS s
         |  FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it GROUP BY 1, 2),
         |fp AS (SELECT ia, ib FROM pr WHERE s >= 2),
         |e2 AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
         |  SELECT ia AS src, ib AS dst FROM fp
         |  UNION ALL SELECT ib, ia FROM fp)),
         |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e2),
         |$rounds
         |SELECT node, lbl AS community FROM l4 ORDER BY node""".stripMargin
    },
    "g_concomp" -> {
      val rounds = (1 to 6).map { i =>
        s"""m$i AS MATERIALIZED (SELECT e2.src AS node,
           |  min(l${i - 1}.comp) AS best
           |  FROM e2 JOIN l${i - 1} ON l${i - 1}.node = e2.dst
           |  GROUP BY 1),
           |l$i AS MATERIALIZED (SELECT l${i - 1}.node,
           |  least(l${i - 1}.comp, m$i.best) AS comp
           |  FROM l${i - 1} JOIN m$i USING (node))""".stripMargin
      }.mkString(",\n")
      s"""WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
         |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
         |pr AS (SELECT a.it AS ia, c.it AS ib, count(*) AS s
         |  FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it GROUP BY 1, 2),
         |fp AS (SELECT ia, ib FROM pr WHERE s >= 2),
         |e2 AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
         |  SELECT ia AS src, ib AS dst FROM fp
         |  UNION ALL SELECT ib, ia FROM fp)),
         |l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS comp
         |  FROM e2),
         |$rounds,
         |op AS (SELECT coalesce(sum(CASE WHEN x.comp <> y.comp THEN 1
         |    ELSE 0 END), 0) AS o
         |  FROM e2 JOIN l6 x ON x.node = e2.src
         |  JOIN l6 y ON y.node = e2.dst)
         |SELECT node, comp, (o = 0) AS converged FROM l6, op
         |ORDER BY node""".stripMargin
    },
    "g_pagerank_weighted" -> {
      val rounds = (1 to 3).map { i =>
        s"""m$i AS MATERIALIZED (SELECT e2.dst AS id,
           |  sum((r${i - 1}.r * e2.w) // ow.outw) AS c
           |  FROM e2 JOIN r${i - 1} ON e2.src = r${i - 1}.id
           |  JOIN ow ON e2.src = ow.src GROUP BY 1),
           |r$i AS MATERIALIZED (SELECT r${i - 1}.id,
           |  150000 + (17 * coalesce(m$i.c, 0)) // 20 AS r
           |  FROM r${i - 1} LEFT JOIN m$i USING (id))""".stripMargin
      }.mkString(",\n")
      s"""WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
         |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
         |pr AS (SELECT a.it AS ia, c.it AS ib, count(*) AS s
         |  FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it GROUP BY 1, 2),
         |fp AS (SELECT ia, ib, s FROM pr WHERE s >= 2),
         |e2 AS MATERIALIZED (SELECT ia AS src, ib AS dst, s AS w FROM fp
         |  UNION ALL SELECT ib, ia, s FROM fp),
         |ow AS (SELECT src, sum(w) AS outw FROM e2 GROUP BY 1),
         |r0 AS (SELECT DISTINCT src AS id, CAST(1000000 AS BIGINT) AS r
         |  FROM e2),
         |$rounds
         |SELECT id, CAST(r AS BIGINT) AS rank FROM r3
         |ORDER BY id""".stripMargin
    },
    "g_kcore" -> {
      val k = 2
      val rounds = 8
      // Every e_i is referenced ~3× by round i+1: without MATERIALIZED,
      // DuckDB inlines the chain and the base scan explodes 3^rounds.
      val peels = (1 to rounds).map { i =>
        s"""d$i AS MATERIALIZED (SELECT n, count(*) AS d
           |  FROM (SELECT a AS n FROM e${i - 1}
           |  UNION ALL SELECT b FROM e${i - 1}) GROUP BY 1),
           |k$i AS MATERIALIZED (SELECT n FROM d$i WHERE d >= $k),
           |e$i AS MATERIALIZED (SELECT a, b FROM e${i - 1}
           |  WHERE a IN (SELECT n FROM k$i) AND b IN (SELECT n FROM k$i))"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
         |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
         |pr AS (SELECT a.it AS ia, c.it AS ib, count(*) AS s
         |  FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it GROUP BY 1, 2),
         |e0 AS MATERIALIZED (SELECT ia AS a, ib AS b FROM pr WHERE s >= 2),
         |$peels,
         |dF AS (SELECT n, count(*) AS d FROM (SELECT a AS n FROM e$rounds
         |  UNION ALL SELECT b FROM e$rounds) GROUP BY 1),
         |cv AS (SELECT coalesce(min(CASE WHEN d >= $k THEN 1 ELSE 0 END), 1)
         |  AS c FROM dF)
         |SELECT n AS node, CAST(d AS BIGINT) AS deg, (cv.c = 1) AS converged
         |FROM dF CROSS JOIN cv ORDER BY node""".stripMargin
    },
    "g_triangles" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
        |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |pr AS (SELECT a.it AS ia, c.it AS ib, count(*) AS s
        |  FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it GROUP BY 1, 2),
        |e AS (SELECT ia AS a, ib AS b FROM pr WHERE s >= 2),
        |t AS (SELECT count(*) AS n_triangles FROM e e1
        |  JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
        |  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
        |  CAST(n_triangles AS BIGINT) AS n_triangles FROM t""".stripMargin,
    "olap_rollup" ->
      """SELECT coalesce(r_name,'ALL') AS region, coalesce(n_name,'ALL') AS nation,
        |CAST(GROUPING(r_name, n_name) AS INT) AS gid,
        |count(*) AS n_orders,
        |CAST(sum(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey=c_custkey
        |JOIN nation ON c_nationkey=n_nationkey
        |JOIN region ON n_regionkey=r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY region, nation""".stripMargin,
    "olap_share_of_parent" ->
      """WITH roll AS (SELECT r_name, n_name,
        |  CAST(GROUPING(r_name, n_name) AS INT) AS gid,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE)
        |    AS revenue
        |  FROM orders JOIN customer ON o_custkey=c_custkey
        |  JOIN nation ON c_nationkey=n_nationkey
        |  JOIN region ON n_regionkey=r_regionkey
        |  GROUP BY ROLLUP(r_name, n_name))
        |SELECT n.r_name AS region, n.n_name AS nation,
        |  n.revenue AS revenue, n.revenue / r.revenue AS share_of_region
        |FROM (SELECT * FROM roll WHERE gid=0) n
        |JOIN (SELECT * FROM roll WHERE gid=1) r ON n.r_name=r.r_name
        |ORDER BY region, nation""".stripMargin,
    "olap_cube" ->
      """WITH o AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  o_orderstatus FROM orders)
        |SELECT coalesce(CAST(yr AS VARCHAR),'ALL') AS yr,
        |coalesce(o_orderstatus,'ALL') AS status,
        |CAST(GROUPING(yr, o_orderstatus) AS INT) AS gid, count(*) AS n
        |FROM o GROUP BY CUBE(yr, o_orderstatus)
        |ORDER BY yr, status, gid""".stripMargin,
    "olap_grouping_sets" ->
      """SELECT coalesce(r_name,'ALL') AS region,
        |coalesce(o_orderstatus,'ALL') AS status,
        |CAST(GROUPING(r_name, o_orderstatus) AS INT) AS gid,
        |count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey=c_custkey
        |JOIN nation ON c_nationkey=n_nationkey
        |JOIN region ON n_regionkey=r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (o_orderstatus), ())
        |ORDER BY gid, region, status""".stripMargin,
    "w_rank_region" ->
      """WITH w AS (SELECT r_name, c_name, count(DISTINCT o_orderkey) AS wins
        |  FROM orders JOIN customer ON o_custkey=c_custkey
        |  JOIN nation ON c_nationkey=n_nationkey
        |  JOIN region ON n_regionkey=r_regionkey
        |  WHERE o_orderstatus='F' GROUP BY 1, 2),
        |r AS (SELECT r_name AS region, c_name, wins,
        |  dense_rank() OVER (PARTITION BY r_name
        |    ORDER BY wins DESC, c_name) AS rnk FROM w)
        |SELECT region, c_name, wins, rnk FROM r WHERE rnk <= 3
        |ORDER BY region, rnk, c_name""".stripMargin,
    "w_cume_dist" ->
      """WITH g AS (SELECT n_name, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE)
        |    AS revenue
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1)
        |SELECT n_name, n, revenue,
        |  percent_rank() OVER (ORDER BY revenue, n_name) AS pct_rank,
        |  cume_dist() OVER (ORDER BY revenue, n_name) AS cume
        |FROM g ORDER BY n_name""".stripMargin,
    "w_yoy_delta" ->
      """WITH y AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE) AS revenue
        |  FROM orders GROUP BY 1)
        |SELECT yr, n, revenue,
        |lag(n, 1) OVER (ORDER BY yr) AS n_prev,
        |n - lag(n, 1) OVER (ORDER BY yr) AS delta,
        |CAST(sum(n) OVER (ORDER BY yr ROWS BETWEEN UNBOUNDED PRECEDING
        |  AND CURRENT ROW) AS BIGINT) AS cum_n
        |FROM y ORDER BY yr""".stripMargin,
    "olap_running_distinct" ->
      """WITH f AS (SELECT o_custkey,
        |  min(date_trunc('month', o_orderdate)) AS first_mo
        |  FROM orders GROUP BY 1),
        |m AS (SELECT first_mo, count(*) AS new_customers FROM f
        |  GROUP BY 1)
        |SELECT first_mo, new_customers,
        |  CAST(sum(new_customers) OVER (ORDER BY first_mo
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_customers
        |FROM m ORDER BY first_mo""".stripMargin,
    "olap_winsorized" ->
      """WITH f AS (SELECT o_orderstatus AS st,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2))*100 AS BIGINT) AS v
        |  FROM orders),
        |r AS (SELECT st, v,
        |  row_number() OVER (PARTITION BY st ORDER BY v) AS rn,
        |  count(*) OVER (PARTITION BY st) AS n FROM f),
        |q AS (SELECT st,
        |  min(CASE WHEN rn = greatest(1, (10*n+99)//100) THEN v END) AS lo,
        |  min(CASE WHEN rn = greatest(1, (90*n+99)//100) THEN v END) AS hi
        |  FROM r GROUP BY 1)
        |SELECT f.st AS o_orderstatus, count(*) AS n,
        |  CAST(sum(least(greatest(f.v, q.lo), q.hi)) AS DOUBLE)
        |    / (100 * count(*)) AS wins_mean
        |FROM f JOIN q ON f.st = q.st GROUP BY 1 ORDER BY 1""".stripMargin,
    "w_moving_avg" ->
      """WITH g AS (SELECT o_orderdate AS day, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(20,2))) * 100 AS BIGINT)
        |    AS c
        |  FROM orders GROUP BY 1)
        |SELECT day, n,
        |  CAST(sum(c) OVER w AS DOUBLE) / (100.0 * count(c) OVER w)
        |    AS avg_rev_7d
        |FROM g
        |WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING
        |  AND CURRENT ROW)
        |ORDER BY day""".stripMargin,
    "fi_triples" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
        |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |pr AS (SELECT a.it AS ia, c.it AS ib, count(*) AS s
        |  FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it GROUP BY 1, 2),
        |e AS (SELECT ia, ib FROM pr WHERE s >= 2),
        |po AS (SELECT x.bk, x.it AS a, y.it AS bb
        |  FROM b x JOIN b y ON x.bk = y.bk AND x.it < y.it
        |  JOIN e ON x.it = e.ia AND y.it = e.ib),
        |t3 AS (SELECT po.a, po.bb AS b, z.it AS c
        |  FROM po JOIN b z ON z.bk = po.bk AND z.it > po.bb
        |  JOIN e e2 ON e2.ia = po.a AND e2.ib = z.it
        |  JOIN e e3 ON e3.ia = po.bb AND e3.ib = z.it)
        |SELECT a AS item_a, b AS item_b, c AS item_c,
        |  CAST(count(*) AS BIGINT) AS support
        |FROM t3 GROUP BY 1, 2, 3 HAVING count(*) >= 2
        |ORDER BY 1, 2, 3""".stripMargin,
    "g_link_predict" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
        |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |pr AS (SELECT a.it AS ia, c.it AS ib, count(*) AS s
        |  FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it GROUP BY 1, 2),
        |e AS (SELECT ia, ib FROM pr WHERE s >= 2),
        |adj AS (SELECT ia AS node, ib AS nbr FROM e
        |  UNION ALL SELECT ib, ia FROM e),
        |dg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
        |  FROM adj GROUP BY 1),
        |cand AS (SELECT x.node AS u, y.node AS v,
        |  CAST(count(*) AS BIGINT) AS cn
        |  FROM adj x JOIN adj y ON x.nbr = y.nbr AND x.node < y.node
        |  GROUP BY 1, 2),
        |ne AS (SELECT cand.u, cand.v, cand.cn FROM cand LEFT JOIN e
        |  ON cand.u = e.ia AND cand.v = e.ib WHERE e.ia IS NULL)
        |SELECT ne.u AS node_a, ne.v AS node_b, ne.cn,
        |  da.deg AS deg_a, db.deg AS deg_b,
        |  CAST(ne.cn AS DOUBLE)
        |    / CAST(da.deg + db.deg - ne.cn AS DOUBLE) AS jaccard
        |FROM ne JOIN dg da ON ne.u = da.node
        |JOIN dg db ON ne.v = db.node
        |ORDER BY jaccard DESC, node_a, node_b LIMIT 20""".stripMargin,
    "w_seasonality_index" ->
      """WITH g AS (SELECT CAST(month(o_orderdate) AS BIGINT) AS mon,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)) * 100)
        |    AS HUGEINT) AS rev
        |  FROM orders GROUP BY 1),
        |t AS (SELECT sum(rev) AS tot FROM g)
        |SELECT mon, CAST(rev AS DOUBLE) / 100.0 AS revenue,
        |  CAST(rev * 12 AS DOUBLE) / CAST(tot AS DOUBLE) AS seasonality
        |FROM g, t ORDER BY mon""".stripMargin,
    "olap_growth_decomposition" ->
      """WITH y AS (SELECT CAST(min(year(o_orderdate)) AS BIGINT) AS ymin
        |  FROM orders),
        |b AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
        |  FROM orders),
        |a AS (SELECT ymin AS y0,
        |  CAST(sum(CASE WHEN yr = ymin THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n0,
        |  CAST(sum(CASE WHEN yr = ymin + 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n1,
        |  CAST(sum(CASE WHEN yr = ymin THEN c ELSE 0 END) AS BIGINT)
        |    AS r0,
        |  CAST(sum(CASE WHEN yr = ymin + 1 THEN c ELSE 0 END) AS BIGINT)
        |    AS r1
        |  FROM b, y WHERE yr = ymin OR yr = ymin + 1 GROUP BY ymin)
        |SELECT y0, y0 + 1 AS y1, n0, n1,
        |  CAST(r0 AS DOUBLE) / 100.0 AS rev_y0,
        |  CAST(r1 AS DOUBLE) / 100.0 AS rev_y1,
        |  CAST(r1 - r0 AS DOUBLE) / 100.0 AS delta,
        |  CAST((n1 - n0) * r0 AS DOUBLE) / CAST(n0 * 100 AS DOUBLE)
        |    AS volume_effect,
        |  CAST(r1 - r0 AS DOUBLE) / 100.0 -
        |    CAST((n1 - n0) * r0 AS DOUBLE) / CAST(n0 * 100 AS DOUBLE)
        |    AS value_effect
        |FROM a""".stripMargin,
    "olap_delta_contribution" ->
      """WITH o AS (SELECT n_name, CAST(year(o_orderdate) AS BIGINT)
        |    AS yr,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |    AS c
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey),
        |y0 AS (SELECT min(yr) AS y0 FROM o),
        |per AS (SELECT n_name, yr = y0 AS is_y1,
        |  CAST(sum(c) AS BIGINT) AS rev
        |  FROM o, y0 WHERE yr IN (y0, y0 + 1) GROUP BY 1, 2),
        |d AS (SELECT coalesce(a.n_name, b.n_name) AS nation,
        |  coalesce(a.rev, 0) AS rev_y1, coalesce(b.rev, 0) AS rev_y2,
        |  coalesce(b.rev, 0) - coalesce(a.rev, 0) AS delta
        |  FROM (SELECT n_name, rev FROM per WHERE is_y1) a
        |  FULL JOIN (SELECT n_name, rev FROM per WHERE NOT is_y1) b
        |    ON a.n_name = b.n_name),
        |t AS (SELECT CAST(sum(delta) AS BIGINT) AS td FROM d)
        |SELECT nation, CAST(rev_y1 AS DOUBLE) / 100.0 AS rev_y1,
        |  CAST(rev_y2 AS DOUBLE) / 100.0 AS rev_y2,
        |  CAST(delta AS DOUBLE) / 100.0 AS delta,
        |  CASE WHEN td <> 0 THEN CAST(delta AS DOUBLE)
        |    / CAST(td AS DOUBLE) END AS share_of_change
        |FROM d, t ORDER BY nation""".stripMargin,
    "fi_basket_stats" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
        |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |s AS (SELECT bk, CAST(count(*) AS BIGINT) AS sz
        |  FROM b GROUP BY 1)
        |SELECT CAST(length(printf('%b', sz)) - 1 AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_baskets,
        |  min(sz) AS min_size, max(sz) AS max_size,
        |  CAST(sum((sz * (sz - 1)) // 2) AS BIGINT) AS n_pairs
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "w_customer_migration" ->
      """WITH y0 AS (SELECT min(CAST(year(o_orderdate) AS BIGINT)) AS y0
        |  FROM orders),
        |per AS (SELECT o_custkey,
        |  CAST(year(o_orderdate) AS BIGINT) = y0 AS is_y1,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)) * 100)
        |    AS BIGINT) AS rev
        |  FROM orders, y0
        |  WHERE CAST(year(o_orderdate) AS BIGINT) IN (y0, y0 + 1)
        |  GROUP BY 1, 2),
        |bd AS (SELECT o_custkey, is_y1,
        |  CASE WHEN rev < 20000000 THEN 'low'
        |       WHEN rev < 60000000 THEN 'mid' ELSE 'high' END AS band
        |  FROM per)
        |SELECT a.band AS band_y1, coalesce(b.band, 'none') AS band_y2,
        |  CAST(count(*) AS BIGINT) AS n_customers
        |FROM (SELECT o_custkey, band FROM bd WHERE is_y1) a
        |LEFT JOIN (SELECT o_custkey, band FROM bd WHERE NOT is_y1) b
        |  ON a.o_custkey = b.o_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "g_degree_dist" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
        |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |pr AS (SELECT a.it AS ia, c.it AS ib, count(*) AS s
        |  FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it GROUP BY 1, 2),
        |e AS (SELECT ia, ib FROM pr WHERE s >= 2),
        |adj AS (SELECT ia AS node, ib AS nbr FROM e
        |  UNION ALL SELECT ib, ia FROM e),
        |dg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
        |  FROM adj GROUP BY 1)
        |SELECT CAST(length(printf('%b', deg)) - 1 AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_nodes,
        |  min(deg) AS min_deg, max(deg) AS max_deg
        |FROM dg GROUP BY 1 ORDER BY 1""".stripMargin,
    "g_closure_by_degree" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
        |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |pr AS (SELECT a.it AS ia, c.it AS ib, count(*) AS s
        |  FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it GROUP BY 1, 2),
        |e AS (SELECT ia AS a, ib AS b FROM pr WHERE s >= 2),
        |tr AS (SELECT e1.a AS ta, e1.b AS tb, e2.b AS tc
        |  FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
        |  WHERE EXISTS (SELECT 1 FROM e e3
        |    WHERE e3.a = e1.b AND e3.b = e2.b)),
        |tv AS (SELECT node, CAST(count(*) AS BIGINT) AS tri FROM (
        |  SELECT ta AS node FROM tr UNION ALL SELECT tb FROM tr
        |  UNION ALL SELECT tc FROM tr) GROUP BY 1),
        |dg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        |  SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
        |j AS (SELECT dg.deg, coalesce(tv.tri, 0) AS tri
        |  FROM dg LEFT JOIN tv USING (node))
        |SELECT CAST(length(printf('%b', deg)) - 1 AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_nodes,
        |  CAST(sum(tri) AS BIGINT) AS n_closed,
        |  CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges,
        |  CASE WHEN sum(deg * (deg - 1) // 2) > 0
        |    THEN (1000 * CAST(sum(tri) AS BIGINT))
        |      // CAST(sum(deg * (deg - 1) // 2) AS BIGINT)
        |    ELSE NULL END AS closure_permille
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "g_hub_report" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
        |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |pr AS (SELECT a.it AS ia, c.it AS ib, count(*) AS s
        |  FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it GROUP BY 1, 2),
        |e AS (SELECT ia, ib FROM pr WHERE s >= 2),
        |adj AS (SELECT ia AS node, ib AS nbr FROM e
        |  UNION ALL SELECT ib, ia FROM e),
        |dg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
        |  FROM adj GROUP BY 1),
        |t AS (SELECT sum(CAST(deg AS HUGEINT) * deg) AS sd2 FROM dg)
        |SELECT node, deg,
        |  CAST(CAST(deg AS HUGEINT) * deg AS DOUBLE)
        |    / CAST(sd2 AS DOUBLE) AS wedge_share
        |FROM dg, t ORDER BY deg DESC, node LIMIT 10""".stripMargin,
    "g_assortativity" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
        |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |pr AS (SELECT a.it AS ia, c.it AS ib, count(*) AS s
        |  FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it GROUP BY 1, 2),
        |e AS (SELECT ia, ib FROM pr WHERE s >= 2),
        |adj AS (SELECT ia AS src, ib AS dst FROM e
        |  UNION ALL SELECT ib, ia FROM e),
        |dg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
        |  FROM adj GROUP BY 1),
        |dd AS (SELECT dx.deg AS x, dy.deg AS y FROM adj
        |  JOIN dg dx ON adj.src = dx.node
        |  JOIN dg dy ON adj.dst = dy.node),
        |mo AS (SELECT CAST(count(*) AS BIGINT) AS m,
        |  sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |  sum(CAST(x AS HUGEINT)*x) AS sxx,
        |  sum(CAST(y AS HUGEINT)*y) AS syy,
        |  sum(CAST(x AS HUGEINT)*y) AS sxy FROM dd)
        |SELECT m AS m_edges,
        |  CASE WHEN CAST(m*sxx - sx*sx AS DOUBLE) > 0
        |        AND CAST(m*syy - sy*sy AS DOUBLE) > 0
        |    THEN round(CAST(m*sxy - sx*sy AS DOUBLE)
        |      / sqrt(CAST(m*sxx - sx*sx AS DOUBLE)
        |           * CAST(m*syy - sy*sy AS DOUBLE)), 12)
        |  END AS assortativity
        |FROM mo""".stripMargin
  )
}
