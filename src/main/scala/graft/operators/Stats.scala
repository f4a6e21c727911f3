package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-moment bivariate statistics: Pearson correlation and simple
  * OLS (y = a + b·x) per group from ONE linear aggregate pass.
  *
  * Spark's `corr`/`covar_samp` stream doubles in shuffle order — two
  * runs need not agree bitwise, and no oracle can replay them. Here
  * every moment (n, Σx, Σy, Σxy, Σx², Σy²) is an EXACT integer sum
  * (x integer-valued, y through the DECIMAL(12,2)→cents hop, products
  * summed as DECIMAL(38,0) — order-independent), and:
  *   - slope   = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)   — ONE division of
  *     exact integers;
  *   - intercept = (ΣyΣx² − ΣxΣxy) / ((nΣx² − (Σx)²)·100) — ONE
  *     division (the ·100 returns cents to currency);
  *   - r = the same numerator over √·√ of the two exact variances —
  *     mirrored float ops, bit-identical across engines.
  *
  * Degenerate groups (zero x-variance or y-variance) return NULL for
  * the undefined statistics rather than NaN/∞.
  */
object Stats {

  def corrOls(df: DataFrame, groupCols: Seq[String],
              xCol: String, yCol: String): DataFrame = {
    val gs = groupCols.map(col)
    val x = col(xCol).cast("long")
    val y = (col(yCol).cast("decimal(12,2)") * 100).cast("long")
    val d38 = "decimal(38,0)"
    val m = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(gs ++ Seq(x.as("_x"), y.as("_y")): _*)
      .groupBy(gs: _*)
      .agg(count(lit(1)).cast(d38).as("_n"),
        sum(col("_x")).cast(d38).as("_sx"),
        sum(col("_y")).cast(d38).as("_sy"),
        sum((col("_x") * col("_y")).cast(d38)).as("_sxy"),
        sum((col("_x") * col("_x")).cast(d38)).as("_sxx"),
        sum((col("_y") * col("_y")).cast(d38)).as("_syy"))
    val num = col("_n") * col("_sxy") - col("_sx") * col("_sy")
    val denx = col("_n") * col("_sxx") - col("_sx") * col("_sx")
    val deny = col("_n") * col("_syy") - col("_sy") * col("_sy")
    val inum = col("_sy") * col("_sxx") - col("_sx") * col("_sxy")
    m.select(gs ++ Seq(
      col("_n").cast("long").as("n"),
      when(denx > 0 && deny > 0,
        num.cast("double") /
          (sqrt(denx.cast("double")) * sqrt(deny.cast("double"))))
        .as("r"),
      when(denx > 0,
        num.cast("double") / denx.cast("double")).as("slope_cents"),
      when(denx > 0,
        inum.cast("double") / (denx * 100).cast("double"))
        .as("intercept")): _*)
  }
}
