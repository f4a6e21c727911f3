package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-size frequency/membership sketches — the approximate structures a
  * 100 TB pipeline uses where exact state would be data-sized.
  *
  * Both sketches here are built from deterministic md5-derived bucket keys
  * (the engine's standard cross-engine hash), so every estimate is exactly
  * reproducible by the DuckDB oracle — the correctness gate checks the
  * ESTIMATES, not just a tolerance band.
  */
object Sketches {

  /** Count–min sketch heavy hitters: estimate the frequency of the exact
    * top-`k` keys through a depth×width counter grid and report estimate
    * vs truth side by side.
    *
    * Output: (key, exact_cnt, est_cnt, overestimate) for the top-`k` keys
    * by exact count (ties broken by key).
    *
    * Scale design: the sketch is ONE aggregate over (seed, bucket) —
    * depth × 16^prefixLen counters TOTAL, regardless of row count. Partial
    * aggregation combines map-side, the grid is mergeable across
    * partitions/days by construction (counter-wise add), and the grid
    * broadcasts back for the estimate join. The exact top-k here is the
    * calibration baseline (same posture as `t_minhash_est` /
    * `a8_hll_bound`): at 100 TB you keep the sketch and drop the exact
    * pass. CM guarantees est ≥ exact always; est ≤ exact + εN with
    * ε = e/width at confidence 1 − e^−depth.
    */
  def cmsHeavyHitters(df: DataFrame, keyCol: String, k: Int = 10,
                      depth: Int = 3, prefixLen: Int = 2): DataFrame = {
    require(depth >= 1 && prefixLen >= 1, "depth and prefixLen must be >= 1")
    val keyed = df.select(col(keyCol).cast("string").as("k"))
    // The counter grid: one row per live (seed, bucket) cell. STAGED
    // (localCheckpoint): its ≤ depth×16^prefixLen rows are consulted once
    // per depth row by the estimate joins — without the stage each join
    // branch would re-scan and re-aggregate the full input (the sketch IS
    // the thing you materialize; re-deriving it per probe defeats it).
    val grid = cmsGrid(df, keyCol, depth, prefixLen).localCheckpoint()
    val top = keyed.groupBy(col("k")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("k")).limit(k)
    // Estimate = min over depth rows of the key's bucket counter.
    val est = (0 until depth).foldLeft(top) { (acc, s) =>
      acc.join(
        broadcast(grid.where(col("s") === s).select(
          col("bucket").as(s"_b$s"), col("c").as(s"_c$s"))),
        substring(md5(concat_ws(":", lit(s), col("k"))), 1, prefixLen)
          === col(s"_b$s"))
    }
    est.select(col("k"), col("exact_cnt"),
        least((0 until depth).map(s => col(s"_c$s")): _*).as("est_cnt"))
      .withColumn("overestimate", col("est_cnt") - col("exact_cnt"))
  }

  /** The bare counter-grid aggregate — (s, bucket, c) — shared by the
    * batch path and Structured Streaming (a plain grouped count, so the
    * SAME definition runs under `outputMode(complete)` and the streamed
    * grid equals the batch grid on any batching: the mergeability claim,
    * machine-checked in StreamingSpec).
    */
  def cmsGrid(df: DataFrame, keyCol: String, depth: Int,
              prefixLen: Int): DataFrame =
    df.select(col(keyCol).cast("string").as("k"))
      .select(col("k"), explode(array((0 until depth).map(lit): _*)).as("s"))
      .withColumn("bucket",
        substring(md5(concat_ws(":", col("s"), col("k"))), 1, prefixLen))
      .groupBy(col("s"), col("bucket")).agg(count(lit(1)).as("c"))

  /** Join-size estimation from sketches (the AGMS / Alon–Gibbons–Matias–
    * Szegedy application of the counter grid): the size of `a ⋈ b` on a
    * key is Σ_k f_a(k)·f_b(k), and each sketch row's bucket inner
    * product Σ_bucket c_a·c_b is an UPPER bound on it (collisions only
    * add cross terms — every term is non-negative). The estimate is the
    * min over the `depth` independent rows. With a = b this estimates
    * the self-join size Σ f(k)² — the skew statistic a planner reads
    * before choosing a join strategy.
    *
    * Why it matters at 100 TB: both sides reduce to depth×width counter
    * grids in ONE linear aggregate each; the inner product touches
    * counters, never rows. You learn whether the join output is 10⁶ or
    * 10¹² rows — and whether to pre-salt — for the cost of two scans and
    * no shuffle of either table. The exact Σ f_a·f_b computed alongside
    * is the calibration baseline (same posture as `t_cms_heavy`): at
    * scale you keep the sketch and drop the exact pass.
    *
    * Output: one row (exact_size, est_size, overestimate ≥ 0).
    */
  def cmsJoinSize(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
                  depth: Int = 3, prefixLen: Int = 2): DataFrame = {
    val ga = cmsGrid(a, aKey, depth, prefixLen)
    val gb = cmsGrid(b, bKey, depth, prefixLen)
    val est = agmsEstimate(ga, gb, depth)
    val fa = a.select(col(aKey).cast("string").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("f_a"))
    val fb = b.select(col(bKey).cast("string").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("f_b"))
    val exact = fa.join(fb, Seq("k"))
      .agg(coalesce(sum(col("f_a") * col("f_b")), lit(0L)).as("exact_size"))
    exact.crossJoin(broadcast(est))
      .select(col("exact_size"), col("est_size"),
        (col("est_size") - col("exact_size")).as("overestimate"))
  }

  /** The AGMS estimate from two ALREADY-BUILT counter grids — the ONE
    * definition of the read path, shared by the batch face above and
    * the streamed face ([[graft.streaming.CmsStream.joinSizeEstimate]])
    * so the two can never drift on the arithmetic the specs equate.
    *
    * Per-seed inner product over the (tiny) grids, then min-of-seeds.
    * A seed with NO overlapping buckets has inner product 0 — it just
    * produces no row from the equi-join, so the min must fall to 0
    * whenever fewer than `depth` seed rows survive. The inner product
    * multiplies LongType counters; under ANSI mode two buckets near
    * ~3e9 rows each overflow the long multiply and kill the query
    * (ADVICE r10), so product/sum ride decimal(38,0) — the same
    * posture as Drift.chisqFromCounts — and the final one-row estimate
    * casts back to the long the oracle compares (an estimate beyond
    * long range means a >9e18-row join; the exact side would have
    * overflowed first). Output: one row (est_size).
    */
  def agmsEstimate(ga: DataFrame, gb: DataFrame, depth: Long): DataFrame =
    ga.join(gb.withColumnRenamed("c", "c_b"), Seq("s", "bucket"))
      .groupBy(col("s")).agg(
        sum(col("c").cast("decimal(38,0)") * col("c_b").cast("decimal(38,0)"))
          .as("p"))
      .agg(min(col("p")).as("_mp"), count(lit(1)).as("_ns"))
      .select(when(col("_ns") < depth, lit(0L))
        .otherwise(col("_mp")).cast("long").as("est_size"))

  /** Membership-pruned incremental exact dedup: keep the batch rows whose
    * content hash is absent from the corpus, consulting a tiny hash-prefix
    * bitmap BEFORE the anti-join.
    *
    * The bitmap is a one-hash Bloom filter: the set of distinct
    * `prefixLen`-hex-char md5 prefixes present in the corpus (≤ 16^prefixLen
    * values — at prefixLen 4 that is ≤ 64 KiB collected and broadcast, the
    * same broadcast-tiny-bounds pattern as the decile operator). Batch rows
    * whose prefix misses the bitmap are DEFINITELY new and bypass the join
    * entirely; only possible members pay the shuffle. False positives cost
    * a join probe, never correctness — the result is proven identical to
    * the plain anti-join by the oracle. At full saturation (every prefix
    * live) the plan degrades gracefully to the plain anti-join.
    */
  def bloomPrunedNewRows(batch: DataFrame, corpus: DataFrame, idCol: String,
                         textCol: String, prefixLen: Int = 2): DataFrame = {
    val h = md5(col(textCol))
    val pfx = substring(h, 1, prefixLen)
    val live: Array[String] = corpus.select(pfx.as("p")).distinct()
      .collect().map(_.getString(0)).sorted
    val maybe = array_contains(typedLit(live.toSeq), pfx)
    val definite = batch.where(!maybe).select(col(idCol))
    val candidates = batch.where(maybe)
      .join(corpus.select(h.as("_h")).distinct(),
        h === col("_h"), "left_anti")
      .select(col(idCol))
    definite.unionByName(candidates)
  }

  /** The k=2 Bloom bit positions of a text value on an `mBits`-slot
    * bitmap — two independent hash functions carved from disjoint
    * md5 hex windows (chars 1-6 and 7-12; 24 bits each, far above any
    * sane mBits), reduced mod mBits. `conv(hex, 16, 10)` here is
    * bit-identical to the oracle's `CAST('0x' || substr(...) AS
    * BIGINT)` (the dq_fingerprint_daily pattern), so both engines
    * derive the SAME positions and a membership verdict can sit under
    * the DuckDB oracle. Shared by the streamed maintained-bloom face
    * ([[graft.streaming.BloomStream]]); the batch prune above uses the
    * coarser one-hash prefix bitmap.
    */
  def bloomBitPositions(textCol: Column, mBits: Int): Column = {
    require(mBits > 0 && mBits <= (1 << 24), s"mBits out of range: $mBits")
    val h = md5(textCol)
    array(
      conv(substring(h, 1, 6), 16, 10).cast("long") % mBits,
      conv(substring(h, 7, 6), 16, 10).cast("long") % mBits)
  }

  /** KMV (k-minimum-values, the "theta sketch" family) pairwise distinct
    * SET-OPERATION estimates — the sketch HLL cannot be: HLL registers
    * merge by max, which unions but can never intersect; a KMV sketch is
    * a uniform sample of the distinct-value hash space, so two sketches
    * COMPOSE under ∩ and ∖ (Beyer et al., "On Synopses for Distinct-Value
    * Estimation Under Multiset Operations", SIGMOD'07).
    *
    * Per group: the `k` lexicographically smallest md5 hashes of its
    * distinct values (md5 hex compares identically in both engines, so
    * the sketch contents — not just the estimates — replay exactly).
    * Per group pair: re-minimize the union of the two sketches to `k`
    * positions; with `m` of those present in BOTH single-group sketches,
    * Jaccard ≈ m / k_used — ONE exact int/int division, zero logarithms,
    * zero hex→numeric conversions to drift between engines. The exact
    * per-pair truth rides beside the estimate (calibration posture of
    * `cmsHeavyHitters` / `t_minhash_est`): at 100 TB you keep the
    * k-bounded sketches — P² pairwise comparisons cost P²·k rows total,
    * while the exact value-keyed intersection self-join they replace is
    * data-sized and skew-exposed.
    *
    * Build shape: ONE distinct pass over (group, hash) — the shuffle
    * exact nunique already pays — then per-group k-minima via the native
    * [[graft.functions.KmvMinK]] aggregate (bounded buffer, map-side
    * partial aggregation: the shuffle carries ≤ k hashes per key per
    * partition, where a row_number window would carry and sort them
    * all), then joins that only ever touch ≤ P·k sketch rows. Output per
    * (g_a < g_b) pair: sketch overlap m, k_used, jaccard_est, and the
    * exact jaccard/intersection/union.
    */
  def kmvPairwiseOverlap(df: DataFrame, groupCol: String, valCol: String,
                         k: Int = 256): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    graft.functions.NativeFunctions.register(df.sparkSession)
    def minK(hashed: DataFrame, keys: Seq[String]): DataFrame =
      hashed.groupBy(keys.map(col): _*)
        .agg(graft.functions.NativeFunctions.kmvMinK(col("h"), k).as("hs"))
        .select(keys.map(col) :+ explode(col("hs")).as("h"): _*)
    val dv = df.select(col(groupCol).as("g"),
        col(valCol).cast("string").as("v"))
      .where(col("g").isNotNull && col("v").isNotNull)
      .distinct()
      .localCheckpoint() // read twice: sketch build + exact calibration
    // Per-group k-minima via the native KMV aggregate (bounded TreeSet
    // buffer, partial-aggregates map-side) — NOT a row_number window,
    // which would shuffle and per-key-sort every distinct hash just to
    // drop all but k (functions/KmvMinK.scala scaladoc).
    val sk = minK(dv.select(col("g"), md5(col("v")).as("h")), Seq("g"))
      .localCheckpoint() // read 3×: union sketch + both membership joins
    val pairs = sk.select(col("g").as("ga")).distinct()
      .join(sk.select(col("g").as("gb")).distinct(), col("ga") < col("gb"))
    // Union sketch: k smallest over the union of the two group sketches
    // (the aggregate's set buffer counts a hash in both sketches once).
    val u = minK(
      sk.join(pairs, col("g") === col("ga")).select("ga", "gb", "h")
        .unionByName(
          sk.join(pairs, col("g") === col("gb")).select("ga", "gb", "h")),
      Seq("ga", "gb"))
    val m = u
      .join(sk.select(col("g").as("ga"), col("h"), lit(1L).as("_ina")),
        Seq("ga", "h"), "left")
      .join(sk.select(col("g").as("gb"), col("h"), lit(1L).as("_inb")),
        Seq("gb", "h"), "left")
      .groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("k_used"),
        sum(when(col("_ina") === 1L && col("_inb") === 1L, 1L)
          .otherwise(0L)).as("m"))
    // Exact calibration: value-keyed self-join intersection + counts.
    val n = dv.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val inter = dv.select(col("g").as("ga"), col("v"))
      .join(dv.select(col("g").as("gb"), col("v")), Seq("v"))
      .where(col("ga") < col("gb"))
      .groupBy(col("ga"), col("gb")).agg(count(lit(1)).as("n_inter"))
    m.join(broadcast(n.select(col("g").as("ga"), col("n").as("n_a"))),
        Seq("ga"))
      .join(broadcast(n.select(col("g").as("gb"), col("n").as("n_b"))),
        Seq("gb"))
      .join(inter, Seq("ga", "gb"), "left")
      .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
      .select(col("ga"), col("gb"), col("m"), col("k_used"),
        (col("m").cast("double") / col("k_used")).as("jaccard_est"),
        col("n_inter"),
        (col("n_a") + col("n_b") - col("n_inter")).as("n_union"),
        (col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard_exact"))
  }
}
