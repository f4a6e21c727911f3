package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — the second time-join Spark lacks as a native
  * operator: left rows match right intervals with
  * `start <= time < end` on a shared key.
  *
  * Naive Spark turns the inequality predicate into a
  * BroadcastNestedLoopJoin (all pairs per key). This operator uses the
  * standard bucketization rewrite instead: quantize time into fixed
  * buckets, explode each right interval over the buckets it covers, and
  * equi-join on (key, bucket) before applying the exact range predicate.
  * Each left row owns exactly ONE bucket, so a (left, interval) pair can
  * meet in at most one bucket — no post-join dedup. Cost is
  * |left| + Σ interval-spans joined hash-wise; pick `bucketMicros` near
  * the typical interval length so each interval explodes to O(1) buckets.
  * One hash shuffle per side, skew handled by AQE like any equi-join.
  */
object RangeJoin {

  /** Inner range join: all of `left`'s and `right`'s columns for pairs
    * with equal `keyCols` and `startCol <= timeCol < endCol`. Time
    * columns are timestamps; `bucketMicros` is the quantization width.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                timeCol: String, startCol: String, endCol: String,
                bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, s"bucket must be positive, got $bucketMicros")
    val lb = left.withColumn("_b",
      floor(unix_micros(col(timeCol)) / bucketMicros))
    // End is exclusive: the last covered bucket is the one holding
    // end - 1 microsecond. Degenerate (empty) intervals cover no bucket.
    val rb = right
      .withColumn("_bs", floor(unix_micros(col(startCol)) / bucketMicros))
      .withColumn("_be",
        floor((unix_micros(col(endCol)) - 1) / bucketMicros))
      .where(col("_bs") <= col("_be"))
      .withColumn("_b", explode(sequence(col("_bs"), col("_be"))))
      .drop("_bs", "_be")
    lb.join(rb, keyCols :+ "_b")
      .where(col(timeCol) >= col(startCol) && col(timeCol) < col(endCol))
      .drop("_b")
  }
}
