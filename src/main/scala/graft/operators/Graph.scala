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
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // (1-d)*scale with d = 17/20: exact in integers.
    val base = (scale * 3L) / 20L
    var ranks = nodes.select(col("id"), lit(scale).as("r"))
    (1 to iters).foreach { _ =>
      val msgs = e
        .join(ranks, e("src") === ranks("id"))
        .join(outdeg, "src")
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
}
