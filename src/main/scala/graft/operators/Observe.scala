package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Zero-extra-pass data-quality counters (`Dataset.observe`).
  *
  * The reference logs pipeline health by running extra pandas passes
  * (row counts and isna sums recomputed per task — limpiezaSpotify.py:
  * 92-101 shape); at 100 TB a second scan to count rejects costs as much
  * as the pipeline itself. `observe` attaches aggregate metrics to the
  * plan as a CollectMetrics node: they accumulate ON THE SAME PASS as
  * whatever action materializes the frame, and surface driver-side after
  * the action — the counters are free.
  */
object Observe {

  /** Attach named row counters to `df`: each entry counts rows matching
    * its condition, plus a total `n_rows`. Returns the instrumented frame
    * (results unchanged) and the [[Observation]] whose `.get` yields the
    * metric map once ANY action has run the frame.
    */
  def counters(df: DataFrame, obsName: String,
               conditions: Map[String, Column]): (DataFrame, Observation) = {
    val obs = new Observation(obsName)
    val cols = conditions.toSeq.sortBy(_._1)
      .map { case (n, c) => count_if(c).cast("long").as(n) } :+
      count(lit(1)).cast("long").as("n_rows")
    (df.observe(obs, cols.head, cols.tail: _*), obs)
  }
}
