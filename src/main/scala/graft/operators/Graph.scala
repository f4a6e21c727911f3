package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond label propagation
  * ([[Dedup.connectedComponents]]): PageRank — the link-based importance
  * score web-scale curation pipelines use as a document-quality prior
  * (rank mass flowing through a hyperlink/citation graph).
  *
  * Determinism across engines: floating-point PageRank sums doubles in
  * shuffle order, so no two runs need agree bitwise. Ranks here are
  * integer micro-units (BIGINT, `scale` = 1.0): every share is an
  * integral division `rank div outdeg`, every damping step is
  * `(17 * contrib) div 20` (d = 0.85 as an exact rational), and sums of
  * BIGINTs are order-independent — the oracle replays the iterations
  * bit-for-bit as unrolled SQL. Dangling mass (outdeg 0) is dropped, the
  * standard simplification.
  *
  * Scale design — Pregel-lite, same posture as connected components:
  * each iteration is ONE hash-join of the rank table against the edge
  * list plus ONE map-side-combinable sum by destination; the driver owns
  * only the loop counter, `localCheckpoint` bounds lineage per round.
  * Rank and degree tables are |V| rows, messages are |E| rows — nothing
  * is ever all-pairs and nothing collects.
  */
object Graph {

  /** `iters` rounds of integer-scaled PageRank over `edges` (src, dst)
    * for the vertex set `nodes` (id). Returns (id, rank) in micro-units.
    */
  def pagerankInt(edges: DataFrame, nodes: DataFrame, iters: Int,
                  scale: Long = 1000000L): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    // outdeg is static across rounds — pre-join it onto the edge list
    // ONCE (round 15, guide §2.4 "remove shuffles outright"): each round
    // then pays one ranks join instead of a ranks join plus a rebuilt
    // degree aggregate + second join.
    val eDeg = e
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint()
    // (1-d)*scale with d = 17/20: exact in integers.
    val base = (scale * 3L) / 20L
    var ranks = nodes.select(col("id"), lit(scale).as("r"))
    (1 to iters).foreach { _ =>
      val msgs = eDeg
        .join(ranks, eDeg("src") === ranks("id"))
        .select(col("dst").as("id"),
          expr("r div outdeg").as("share"))
        .groupBy(col("id")).agg(sum(col("share")).as("contrib"))
      ranks = nodes.select(col("id"))
        .join(msgs, Seq("id"), "left")
        .select(col("id"),
          (lit(base) +
            expr(s"(17 * coalesce(contrib, 0L)) div 20")).as("r"))
        .localCheckpoint()
    }
    ranks.withColumnRenamed("r", "rank")
  }

  /** PERSONALIZED PageRank (topic-sensitive, Haveliwala): the restart
    * mass returns only to the SEED set, so rank measures importance
    * *relative to the seeds* — "documents like these trusted ones", the
    * seed-expansion primitive behind quality-prior propagation and
    * related-item discovery. Same integer micro-unit discipline as
    * [[pagerankInt]] (share = r div outdeg, damping (17·c) div 20,
    * BIGINT sums — bit-reproducible, oracle unrolls the rounds) with
    * two changes: r₀ = scale on seeds / 0 elsewhere, and the (3·scale)
    * div 20 restart term lands only on seed rows. Same Pregel-lite
    * shape — one join + one map-side-combinable sum per round; the
    * seed flag rides the rank table as a column, so personalization
    * costs no extra join.
    */
  def personalizedPagerankInt(edges: DataFrame, nodes: DataFrame,
                              seeds: DataFrame, iters: Int,
                              scale: Long = 1000000L): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    // Static outdeg pre-joined once, as in [[pagerankInt]] (round 15).
    val eDeg = e
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint()
    val base = (scale * 3L) / 20L
    val flagged = nodes.select(col("id"))
      .join(seeds.select(col("id"), lit(true).as("_s")), Seq("id"), "left")
      .select(col("id"), coalesce(col("_s"), lit(false)).as("is_seed"))
      .localCheckpoint()
    var ranks = flagged.select(col("id"), col("is_seed"),
      when(col("is_seed"), lit(scale)).otherwise(lit(0L)).as("r"))
    (1 to iters).foreach { _ =>
      val msgs = eDeg
        .join(ranks.select(col("id"), col("r")), eDeg("src") === col("id"))
        .select(col("dst").as("id"),
          expr("r div outdeg").as("share"))
        .groupBy(col("id")).agg(sum(col("share")).as("contrib"))
      ranks = flagged
        .join(msgs, Seq("id"), "left")
        .select(col("id"), col("is_seed"),
          (when(col("is_seed"), lit(base)).otherwise(lit(0L)) +
            expr(s"(17 * coalesce(contrib, 0L)) div 20")).as("r"))
        .localCheckpoint()
    }
    ranks.select(col("id"), col("r").as("rank"))
  }

  /** Multi-source BFS: minimum hop distance from any seed, bounded to
    * `rounds` expansions — reachability-with-distance (influence radius,
    * citation depth, contamination spread), the remaining basic of the
    * graph family (PageRank / LPA / k-core / triangles / components).
    *
    * Frontier-at-a-time: each round joins ONLY the newest frontier
    * against the edge list (never the whole reached set), dedups, and
    * anti-joins the reached set — so a round's cost is |frontier
    * edges|, and the anti-join keeps the FIRST (minimum) hop per node.
    * All loop state is `localCheckpoint`-bounded like [[pagerankInt]];
    * nothing ever collects to the driver. Returns (id, hop) for nodes
    * within `rounds` hops of a seed (seeds at hop 0); unreached nodes
    * are absent (callers left-join if they want -1 semantics).
    */
  def bfsHops(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be non-negative: $rounds")
    val e = edges.select(col("src"), col("dst"))
    var reached = seeds.select(col("id"), lit(0L).as("hop"))
      .distinct().localCheckpoint()
    var frontier = reached.select(col("id"))
    var r = 1
    while (r <= rounds) {
      val next = frontier.join(e, frontier("id") === e("src"))
        .select(e("dst").as("id")).distinct()
        .join(reached, Seq("id"), "left_anti")
        .localCheckpoint()
      reached = reached
        .unionByName(next.select(col("id"), lit(r.toLong).as("hop")))
        .localCheckpoint()
      frontier = next
      r += 1
    }
    reached
  }

  /** Community detection by MAJORITY-VOTE label propagation — coarser
    * than connected components (which only needs reachability): a node
    * adopts the most common label among its neighbors, so densely
    * intra-connected regions converge to one label while bridges
    * cannot pull whole cliques across. Fully deterministic: labels
    * seed as own id, the vote is argmax(count) with MIN-label
    * tie-break (max of struct(cnt, −label)), rounds are FIXED so the
    * oracle unrolls identical votes (converged or not, both engines
    * agree). Per round: one neighbor join + two grouped aggregates —
    * Pregel-lite, driver owns only the counter.
    *
    * @return (node, community) — the label after `rounds` votes.
    */
  def labelPropagation(edges: DataFrame, aCol: String, bCol: String,
                       rounds: Int = 4): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val fwd = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
    val e = fwd.unionByName(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      .where(col("src") =!= col("dst") &&
        col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint()
    var labels = e.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint()
    (1 to rounds).foreach { _ =>
      labels = e
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src"), col("lbl"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("src"))
        .agg(max(struct(col("cnt"), (-col("lbl")).as("_neg"))).as("_m"))
        .select(col("src").as("node"),
          (-col("_m._neg")).as("lbl"))
        .localCheckpoint()
    }
    labels.select(col("node"), col("lbl").as("community"))
  }

  /** WEIGHTED PageRank: rank mass splits across out-edges proportional
    * to edge weight — co-purchase support, citation multiplicity —
    * instead of uniformly. Same integer micro-unit discipline as
    * [[pagerankInt]]: share = (r·w) div Σw_out, damping (17·c) div 20,
    * sums of BIGINTs — bit-reproducible, oracle unrolls the rounds.
    * Same Pregel-lite shape: one join + one map-side-combinable sum per
    * round.
    */
  def pagerankWeightedInt(edges: DataFrame, nodes: DataFrame, iters: Int,
                          scale: Long = 1000000L): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w").cast("long"))
      .localCheckpoint()
    // Materialize the per-round re-read relations ONCE: `nodes` enters
    // the initial ranks AND every round's left join, and `outW` every
    // round's share division — left lazy, each round would re-run their
    // full upstream lineage (for the co-purchase caller that lineage is
    // the lineitem basket self-join: 4 rebuilds measured at 11.8 s
    // isolated vs 4.5 s staged). Both are |V|-row relations — cheap to
    // hold, expensive to recompute.
    val n0 = nodes.select(col("id")).localCheckpoint()
    // Static Σw_out pre-joined onto the edges once (round 15) — each
    // round then pays one ranks join, not a join + a second outW join.
    val eW = e
      .join(e.groupBy(col("src")).agg(sum(col("w")).as("outw")), "src")
      .localCheckpoint()
    val base = (scale * 3L) / 20L
    var ranks = n0.select(col("id"), lit(scale).as("r"))
    (1 to iters).foreach { _ =>
      val msgs = eW
        .join(ranks, eW("src") === ranks("id"))
        .select(col("dst").as("id"),
          expr("(r * w) div outw").as("share"))
        .groupBy(col("id")).agg(sum(col("share")).as("contrib"))
      ranks = n0
        .join(msgs, Seq("id"), "left")
        .select(col("id"),
          (lit(base) +
            expr(s"(17 * coalesce(contrib, 0L)) div 20")).as("r"))
        .localCheckpoint()
    }
    ranks.withColumnRenamed("r", "rank")
  }

  /** k-core decomposition by iterative peeling: repeatedly delete
    * nodes of degree < k until only the k-core remains — the standard
    * "dense engaged subgraph" extraction (community kernels, spam-farm
    * detection, co-purchase cliques).
    *
    * Each round is one degree aggregate + one semi-join filter of the
    * edge list; `localCheckpoint` bounds lineage; the driver owns only
    * the round counter. Rounds are FIXED (not converge-tested) so an
    * oracle can unroll the identical peels — `converged` reports
    * whether another round would change anything, computed from the
    * data identically in both engines, so the contract stays honest
    * even if `rounds` under-runs a deeper graph.
    *
    * @return (node, deg, converged): surviving nodes with their degree
    *         inside the surviving subgraph.
    */
  def kCore(edges: DataFrame, aCol: String, bCol: String, k: Int,
            rounds: Int = 8): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k>=1, rounds>=1: k=$k $rounds")
    var e = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .where(col("a") =!= col("b") &&
        col("a").isNotNull && col("b").isNotNull)
      .distinct()
      .localCheckpoint()
    def degrees(ed: DataFrame) = ed
      .select(explode(array(col("a"), col("b"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    for (_ <- 1 to rounds) {
      val keep = degrees(e).where(col("d") >= k).select(col("n"))
      e = e.join(keep.withColumnRenamed("n", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("n", "b"), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint()
    }
    val deg = degrees(e)
    val conv = deg.agg(
      coalesce(min(when(col("d") >= k, 1L).otherwise(0L)), lit(1L))
        .as("_c"))
    deg.crossJoin(broadcast(conv))
      .select(col("n").as("node"), col("d").as("deg"),
        (col("_c") === 1L).as("converged"))
  }

  /** Triangle count by degree-ordered edge orientation (the
    * Schank–Wagner / node-iterator++ recipe): orient every undirected
    * edge from its lower-(degree, id) endpoint to the higher; each
    * node's OUT-degree is then bounded by O(√|E|) regardless of how
    * skewed the raw degree distribution is, so the wedge self-join costs
    * Σ outdeg² — the hub whose deg² would explode a naive neighbor join
    * is exactly the node the orientation strips of out-edges. Each
    * triangle has exactly one source-of-two-out-edges vertex under any
    * acyclic orientation, so it is counted exactly once.
    *
    * Plan: degree aggregate (linear) → orientation projection → wedge
    * equi-join on the shared source → closure semi-join against the
    * normalized edge set. All shuffles are key-hash; nothing collects.
    *
    * @param edges undirected edge list; (a,b) and (b,a) and duplicates
    *              collapse to one edge, self-loops drop.
    * @return one row (n_edges, n_triangles).
    */
  def triangleCount(edges: DataFrame, aCol: String, bCol: String)
      : DataFrame = {
    val e = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .where(col("a") =!= col("b") &&
        col("a").isNotNull && col("b").isNotNull)
      .distinct()
      .localCheckpoint() // read 3×: degrees, wedges (×2), closure
    val deg = e.select(explode(array(col("a"), col("b"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // Orient low (d, id) → high (d, id): struct comparison gives the
    // total order, ties broken by id.
    val oriented = e
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("a")).otherwise(col("b")).as("src"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("b")).otherwise(col("a")).as("dst"))
    // Wedges from a shared source (v < w de-duplicates the pair), closed
    // by the normalized edge (v,w) — v < w already, so no re-normalize.
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
      .select(col("x.dst").as("a"), col("y.dst").as("b"))
    val tri = wedges.join(e, Seq("a", "b"))
      .agg(count(lit(1)).as("n_triangles"))
    e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(tri))
  }

  /** EXACT connected components by min-label propagation: every node
    * starts labeled with its own id; each round every node adopts the
    * minimum label in its closed neighborhood. After `rounds` rounds a
    * node's label is the minimum node id within `rounds` hops, so the
    * labeling is exactly the component minimum once `rounds` reaches the
    * component diameter — `converged` reports whether any edge still
    * straddles two labels, computed FROM THE DATA so the contract stays
    * honest if rounds ever under-run (kCore posture).
    *
    * Sibling of [[graft.operators.Dedup.connectedComponents]] (the
    * production path for near-dup clusters / golden records), which
    * iterates to ACTUAL convergence via a label-sum probe — a
    * data-dependent round count no SQL oracle can replay. This variant
    * runs a FIXED round budget so the DuckDB oracle unrolls the
    * identical rounds and compares bit-for-bit, and reports honestly
    * when the budget under-ran.
    *
    * This is the exact dual of [[labelPropagation]]'s majority vote:
    * same Pregel-lite shape — per round ONE equi-join (labels onto the
    * symmetric edge list) and ONE map-side-combinable min aggregate,
    * both hash-shuffled on the node key; `localCheckpoint` caps lineage
    * so round R costs one bounded job, not an R-deep nested plan. At
    * cluster scale the round count is the graph diameter — for web/
    * co-occurrence graphs a dozen rounds; pathological chain graphs
    * would instead use star-contraction (Kiveris et al., "Connected
    * Components in MapReduce"), whose alternating min-rounds this same
    * loop body expresses.
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          rounds: Int = 6): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val fwd = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
    val e = fwd.unionByName(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      .where(col("src") =!= col("dst") &&
        col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint()
    var labels = e.select(col("src").as("node")).distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint()
    // Self-loop fold (r16, guide §2.4): appending one (n, n) edge per
    // node makes the neighbor-min INCLUDE the node's own label, so
    // min(_nc) ≡ least(comp, neighbor min) and each round is ONE join +
    // ONE map-side-combinable min — the pre-r16 body paid a second
    // labels join (and its broadcast build) per round for the own-label
    // term. The union of two checkpointed relations costs no recompute.
    val eSelf = e.unionByName(
      labels.select(col("node").as("src"), col("node").as("dst")))
    (1 to rounds).foreach { _ =>
      labels = eSelf
        .join(labels.withColumnRenamed("node", "dst")
          .withColumnRenamed("comp", "_nc"), Seq("dst"))
        .groupBy(col("src")).agg(min(col("_nc")).as("comp"))
        .withColumnRenamed("src", "node")
        .localCheckpoint()
    }
    // Converged ⇔ no edge joins two different labels (data-derived).
    val open = e
      .join(labels.select(col("node").as("src"), col("comp").as("ca")),
        Seq("src"))
      .join(labels.select(col("node").as("dst"), col("comp").as("cb")),
        Seq("dst"))
      .agg(coalesce(sum(when(col("ca") =!= col("cb"), 1L).otherwise(0L)),
        lit(0L)).as("_open"))
    labels.crossJoin(broadcast(open))
      .select(col("node"), col("comp"), (col("_open") === 0L).as("converged"))
  }
}
