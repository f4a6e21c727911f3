package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Snapshots

/** Manifest-based snapshot versioning: append composes, overwrite
  * replaces logically while history stays readable, vacuum drops only
  * unreferenced data, and version discovery survives restarts (all
  * state is on disk, none in the session).
  */
class LakeSnapshotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshBase(tag: String): String = {
    val base = s"/tmp/graft_test_snapshots/$tag"
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
    base
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").as[Long].collect().toSet

  test("append composes versions; overwrite replaces; history stays readable") {
    val base = freshBase("compose")
    assert(Snapshots.latestVersion(spark, base) == 0)
    assert(Snapshots.append(spark, base,
      Seq(1L, 2L).toDF("id")) == 1)
    assert(Snapshots.append(spark, base,
      Seq(3L).toDF("id")) == 2)
    assert(Snapshots.overwrite(spark, base,
      Seq(9L).toDF("id")) == 3)
    assert(Snapshots.latestVersion(spark, base) == 3)
    assert(ids(Snapshots.readAsOf(spark, base, 1)) == Set(1L, 2L))
    assert(ids(Snapshots.readAsOf(spark, base, 2)) == Set(1L, 2L, 3L))
    assert(ids(Snapshots.readAsOf(spark, base, 3)) == Set(9L))
    assert(ids(Snapshots.readLatest(spark, base)) == Set(9L))
  }

  test("reading a never-published version fails loudly") {
    val base = freshBase("missing")
    Snapshots.append(spark, base, Seq(1L).toDF("id"))
    val e = intercept[IllegalArgumentException] {
      Snapshots.readAsOf(spark, base, 7)
    }
    assert(e.getMessage.contains("version 7"))
  }

  test("vacuum drops only data no surviving manifest references") {
    val base = freshBase("vacuum")
    Snapshots.append(spark, base, Seq(1L).toDF("id"))     // v1: batch-1
    Snapshots.append(spark, base, Seq(2L).toDF("id"))     // v2: b1+b2
    Snapshots.overwrite(spark, base, Seq(3L).toDF("id"))  // v3: batch-3
    Snapshots.append(spark, base, Seq(4L).toDF("id"))     // v4: b3+b4
    // keepFrom=3: v1/v2 manifests go; batch-1 and batch-2 are
    // referenced ONLY by them → deleted; batch-3 survives via v3/v4.
    val dropped = Snapshots.vacuum(spark, base, keepFrom = 3)
    assert(dropped.map(_.split('/').last).toSet ==
      Set("batch-1", "batch-2"))
    assert(ids(Snapshots.readAsOf(spark, base, 3)) == Set(3L))
    assert(ids(Snapshots.readAsOf(spark, base, 4)) == Set(3L, 4L))
    intercept[IllegalArgumentException] {
      Snapshots.readAsOf(spark, base, 2)
    }
    // latestVersion still discovered from surviving manifests.
    assert(Snapshots.latestVersion(spark, base) == 4)
  }

  test("vacuum keeping everything deletes nothing") {
    val base = freshBase("keepall")
    Snapshots.append(spark, base, Seq(1L).toDF("id"))
    Snapshots.append(spark, base, Seq(2L).toDF("id"))
    assert(Snapshots.vacuum(spark, base, keepFrom = 1).isEmpty)
    assert(ids(Snapshots.readAsOf(spark, base, 1)) == Set(1L))
  }
}
