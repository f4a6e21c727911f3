package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Compaction contract: output file count follows the size arithmetic
  * (ceil(totalBytes / targetBytes), never zero), and the rewrite loses
  * no rows.
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))

  test("compacts a shattered directory to the computed file count") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_compact").toString
    val in = s"$base/in"
    val out = s"$base/out"
    (1 to 10000).map(i => (i.toLong, s"row_$i")).toDF("id", "s")
      .repartition(40).write.parquet(in)
    assert(parquetFiles(in).length == 40, "fixture must start shattered")

    val total = parquetFiles(in).map(_.length).sum
    val target = total / 3 // expect ceil(total / (total/3)) = 3..4 files
    val n = Tables.compact(spark, in, out, target)
    assert(n == math.ceil(total.toDouble / target).toInt)
    assert(parquetFiles(out).length == n)
    assert(n < 40, "compaction must reduce the file count")

    // content-preserving: same rows, nothing dropped or duplicated
    val got = spark.read.parquet(out).as[(Long, String)].collect().sorted
    assert(got.length == 10000)
    assert(got.head == (1L, "row_1") && got.last == (10000L, "row_10000"))
  }

  test("oversized target still writes at least one file") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_compact1").toString
    Seq((1L, "x")).toDF("id", "s").write.parquet(s"$base/in")
    val n = Tables.compact(spark, s"$base/in", s"$base/out", 1L << 40)
    assert(n == 1)
    assert(spark.read.parquet(s"$base/out").count() == 1)
  }
}
