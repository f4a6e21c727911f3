package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Merkle-style (anti-entropy) table reconciliation: find the rows that
  * differ between two versions of a table WITHOUT shuffling the rows
  * that don't.
  *
  * `a19_table_diff` is the flat version — a full-outer join of both
  * versions, every row pays the shuffle. At 100 TB with 0.1% drift
  * that moves a thousand times more data than the answer needs. The
  * pruned protocol (the replica-repair design of Dynamo/Cassandra
  * anti-entropy, flattened to two levels):
  *
  *   1. Each side reduces MAP-SIDE to `nBuckets` summaries —
  *      (row count, order-independent checksum = decimal-exact SUM of
  *      48-bit row-hash prefixes). The bucket key is a hash of the ROW
  *      KEY, so a changed row stays in its bucket and flips its
  *      bucket's checksum.
  *   2. Buckets whose (count, checksum) agree on both sides are CLEAN:
  *      provably no added/removed key and no changed content (up to
  *      48-bit hash-sum collision) — their rows never leave the map
  *      side.
  *   3. Only rows of DIRTY buckets (a tiny broadcast set of bucket ids)
  *      enter the row-level full-outer classify join.
  *
  * Output = exactly the flat diff minus its `same` rows — the oracle
  * runs the UNPRUNED protocol, so a green row proves the prune drops
  * and invents nothing.
  */
object Reconcile {

  /** 48-bit integer from the leading md5 hex of a string column. */
  private def h48(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 12), 16, 10).cast("long")

  /** Per-key difference rows between two (k, h) version tables, where
    * `h` is a content hash of everything that counts as "the row".
    * Returns (k, status ∈ added|removed|changed); `same` keys — the
    * 99.9% — are pruned at the bucket level and never shuffle.
    */
  def prunedDiff(verA: DataFrame, verB: DataFrame,
                 nBuckets: Int = 1 << 10): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    def bucketed(df: DataFrame) = df.select(col("k"), col("h"),
      pmod(h48(col("k")), lit(nBuckets.toLong)).as("bucket"))
    val ba = bucketed(verA).localCheckpoint() // summaries + dirty-row scan
    val bb = bucketed(verB).localCheckpoint()
    def summary(df: DataFrame, n: String, s: String) =
      df.groupBy(col("bucket")).agg(
        count(lit(1)).as(n),
        sum(conv(substring(col("h"), 1, 12), 16, 10)
          .cast("decimal(38,0)")).as(s))
    // STAGED: the dirty set is consulted by BOTH row scans' broadcasts —
    // without the stage each consumer re-derives the whole summary
    // full-outer join (seen in the reviewed plan; PLANS.md).
    val dirty = summary(ba, "n_a", "s_a")
      .join(summary(bb, "n_b", "s_b"), Seq("bucket"), "full_outer")
      .where(col("n_a").isNull || col("n_b").isNull ||
        col("n_a") =!= col("n_b") || col("s_a") =!= col("s_b"))
      .select(col("bucket"))
      .localCheckpoint()
    val da = ba.join(broadcast(dirty), Seq("bucket"))
    val db = bb.join(broadcast(dirty), Seq("bucket"))
    da.alias("a").join(db.alias("b"), col("a.k") === col("b.k"),
        "full_outer")
      .select(coalesce(col("a.k"), col("b.k")).as("k"),
        when(col("a.k").isNull, "added")
          .when(col("b.k").isNull, "removed")
          .when(col("a.h") =!= col("b.h"), "changed")
          .otherwise("same").as("status"))
      .where(col("status") =!= "same")
  }
}
