package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout: the Morton interleave itself, and the pruning claim —
  * after a z-ordered rewrite, per-file min/max spans shrink on BOTH
  * clustered dimensions, while a 1-D range sort leaves the second
  * dimension at full span (so footer-stats skipping works only on one).
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zValue interleaves bits dimension-major") {
    // cells (x=0b10, y=0b01), 2 bits: out bit (i*2 + j):
    //  x bit0=0 -> out0, x bit1=1 -> out2; y bit0=1 -> out1, y bit1=0.
    // z = 0b0110 = 6.
    val z = Seq((2, 1)).toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), 2).as("z"))
      .as[Long].collect().head
    assert(z == 6L)
  }

  test("three-dimension interleave places bits dimension-major") {
    // cells (x=0b01, y=0b10, z=0b11), 2 bits: out bit (i*3 + j):
    // i=0: x→bit0=1, y→bit1=0, z→bit2=1; i=1: x→bit3=0, y→bit4=1,
    // z→bit5=1 ⇒ 0b110101 = 53.
    val z = Seq((1, 2, 3)).toDF("x", "y", "z")
      .select(Layout.zValue(Seq(col("x"), col("y"), col("z")), 2).as("v"))
      .as[Long].collect().head
    assert(z == 53L)
  }

  test("zValue is invertible: deinterleaving recovers every cell") {
    val rnd = new scala.util.Random(11)
    val cases = (1 to 100).map(_ => (rnd.nextInt(16), rnd.nextInt(16)))
    val zs = cases.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zValue(Seq(col("x"), col("y")), 4).as("z"))
      .as[(Int, Int, Long)].collect()
    for ((x, y, z) <- zs) {
      def dim(j: Int) = (0 until 4).map(i =>
        (((z >> (i * 2 + j)) & 1L) << i).toInt).sum
      assert((dim(0), dim(1)) == (x, y), s"($x,$y) -> $z")
    }
  }

  test("cellId buckets by strict bound count") {
    val out = Seq(5, 10, 25, 99).toDF("v")
      .select(Layout.cellId(col("v"), array(lit(10), lit(20), lit(30)))
        .as("c")).as[Int].collect().toSeq
    assert(out == Seq(0, 0, 2, 3))
  }

  private def fileSpans(path: String, c1: String, c2: String) = {
    val perFile = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg((max(col(c1)) - min(col(c1))).cast("double").as("s1"),
        (max(col(c2)) - min(col(c2))).cast("double").as("s2"))
      .agg(avg(col("s1")), avg(col("s2")), count(lit(1)))
      .collect().head
    (perFile.getDouble(0), perFile.getDouble(1), perFile.getLong(2))
  }

  test("z-order shrinks per-file spans on BOTH dims; 1-D sort does not") {
    val li = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_partkey", "l_extendedprice")
    val tmp = sys.props("java.io.tmpdir")
    val zdir = s"$tmp/layout_spec_z"
    val ldir = s"$tmp/layout_spec_linear"

    Layout.writeZOrdered(li, zdir, Seq("l_orderkey", "l_partkey"),
      bits = 4, nFiles = 16)
    li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(ldir)

    val stats = li.agg(
      (max(col("l_orderkey")) - min(col("l_orderkey"))).cast("double"),
      (max(col("l_partkey")) - min(col("l_partkey"))).cast("double"))
      .collect().head
    val (g1, g2) = (stats.getDouble(0), stats.getDouble(1))
    val (z1, z2, zn) = fileSpans(zdir, "l_orderkey", "l_partkey")
    val (l1, l2, ln) = fileSpans(ldir, "l_orderkey", "l_partkey")
    assert(zn == 16 && ln == 16)

    // 16 files over a 16x16 grid ≈ 4x4 cell blocks → ~1/4 global span
    // per dim. Leave slack for cell-boundary straddle: < 60% of global.
    assert(z1 < 0.6 * g1, s"zorder dim1 span $z1 vs global $g1")
    assert(z2 < 0.6 * g2, s"zorder dim2 span $z2 vs global $g2")
    // The linear layout is tight on dim1 but FULL-span on dim2 — and
    // z-order must beat it decisively on dim2.
    assert(l2 > 0.9 * g2, s"linear dim2 span $l2 vs global $g2")
    assert(z2 < 0.7 * l2, s"zorder dim2 $z2 not below linear $l2")

    // Lossless: the rewrite preserves content.
    val a = li.agg(count(lit(1)), sum(col("l_extendedprice")
      .cast("decimal(20,2)"))).collect().head
    val b = spark.read.parquet(zdir).agg(count(lit(1)),
      sum(col("l_extendedprice").cast("decimal(20,2)"))).collect().head
    assert(a == b)
  }
}
