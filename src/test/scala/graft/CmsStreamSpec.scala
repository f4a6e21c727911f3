package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.CmsStream
import graft.operators.Sketches

/** Streamed count–min maintenance: the grid is a LINEAR sketch, so
  * summed per-batch partials must equal the one-shot grid cell-for-
  * cell on any batching; replay idempotence via batch directories;
  * estimates keep the est ≥ exact contract against streamed state.
  */
class CmsStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(min: Int): Timestamp = new Timestamp(min * 60000L)

  private def evs(users: Seq[Long]): Seq[Ev] =
    users.zipWithIndex.map { case (u, i) =>
      Ev(i.toLong, t(i % 50), u, "view", 0, "{}")
    }

  test("streamed grid equals the one-shot batch grid cell-for-cell") {
    val dir = s"${sys.props("java.io.tmpdir")}/cms_spec_${System.nanoTime()}"
    val users = (1L to 400L).map(u => u % 37)
    val input = MemoryStream[Ev](spark)
    val q = CmsStream.gridWriter(input.toDF(), s"$dir/state",
      s"$dir/chk", "user_id", depth = 3, prefixLen = 2).start()
    try {
      input.addData(evs(users.take(150)))
      q.processAllAvailable()
      input.addData(evs(users.drop(150)))
      q.processAllAvailable()
      val streamed = CmsStream.currentGrid(spark, s"$dir/state")
        .as[(Int, String, Long)].collect().toSet
      val oneShot = Sketches.cmsGrid(users.toDF("user_id"), "user_id",
          depth = 3, prefixLen = 2)
        .as[(Int, String, Long)].collect().toSet
      assert(streamed === oneShot)
      // Estimates from streamed state: est >= exact for every key.
      val exact = users.groupBy(u => u.toString)
        .view.mapValues(_.size.toLong).toMap
      val est = CmsStream.estimates(spark, s"$dir/state",
          exact.keys.toSeq, depth = 3, prefixLen = 2)
        .as[(String, Long)].collect().toMap
      exact.foreach { case (k, n) => assert(est(k) >= n) }
    } finally q.stop()
  }

  test("replaying a batch id leaves the grid unchanged; new id adds") {
    val dir = s"${sys.props("java.io.tmpdir")}/cms_rp_${System.nanoTime()}"
    val batch = evs((1L to 90L).map(_ % 11)).toDF()
    CmsStream.applyBatch(batch, 3L, s"$dir/state", "user_id", 3, 2)
    val first = CmsStream.currentGrid(spark, s"$dir/state")
      .agg(sum($"c")).as[Long].head()
    CmsStream.applyBatch(batch, 3L, s"$dir/state", "user_id", 3, 2)
    val second = CmsStream.currentGrid(spark, s"$dir/state")
      .agg(sum($"c")).as[Long].head()
    assert(first === second)
    CmsStream.applyBatch(batch, 4L, s"$dir/state", "user_id", 3, 2)
    val third = CmsStream.currentGrid(spark, s"$dir/state")
      .agg(sum($"c")).as[Long].head()
    assert(third === 2 * first)
  }

  test("join-size estimate from two streamed grids equals the batch face") {
    val dir = s"${sys.props("java.io.tmpdir")}/cms_js_${System.nanoTime()}"
    val usersA = (1L to 300L).map(u => u % 23)
    val usersB = (1L to 200L).map(u => (u * 3) % 31)
    // Side A maintained in two batches, side B in three — the linear-
    // sketch claim is that ANY batching sums to the one-shot grid, so
    // the estimate must match the batch `cmsJoinSize` exactly.
    CmsStream.applyBatch(evs(usersA.take(120)).toDF(), 0L,
      s"$dir/a", "user_id", 3, 2)
    CmsStream.applyBatch(evs(usersA.drop(120)).toDF(), 1L,
      s"$dir/a", "user_id", 3, 2)
    CmsStream.applyBatch(evs(usersB.take(70)).toDF(), 0L,
      s"$dir/b", "user_id", 3, 2)
    CmsStream.applyBatch(evs(usersB.slice(70, 150)).toDF(), 1L,
      s"$dir/b", "user_id", 3, 2)
    CmsStream.applyBatch(evs(usersB.drop(150)).toDF(), 2L,
      s"$dir/b", "user_id", 3, 2)
    val streamed = CmsStream.joinSizeEstimate(spark, s"$dir/a", s"$dir/b")
      .as[Long].head()
    val batchRow = Sketches.cmsJoinSize(
        usersA.toDF("user_id"), "user_id",
        usersB.toDF("user_id"), "user_id", depth = 3, prefixLen = 2)
      .as[(Long, Long, Long)].head()
    assert(streamed === batchRow._2) // est_size
    // AGMS upper-bound contract against the exact join size.
    assert(streamed >= batchRow._1)
    // Grids maintained with different geometry must FAIL, not return a
    // silently-wrong estimate (the (s, bucket) join would miss).
    CmsStream.applyBatch(evs(usersB).toDF(), 0L, s"$dir/c", "user_id", 3, 3)
    intercept[IllegalArgumentException] {
      CmsStream.joinSizeEstimate(spark, s"$dir/a", s"$dir/c")
    }
    // A not-yet-started stream (no state) is NOT a geometry mismatch:
    // probing a populated grid against an empty path answers the
    // planner's question with the legitimate no-data estimate, 0.
    val vsEmpty = CmsStream.joinSizeEstimate(spark, s"$dir/a",
      s"$dir/never-started")
    assert(vsEmpty.columns.toSeq === Seq("est_size"))
    assert(vsEmpty.as[Long].head() === 0L)
  }

  test("compaction: grid and estimates unchanged, folded replay ignored") {
    val dir = s"${sys.props("java.io.tmpdir")}/cms_cp_${System.nanoTime()}"
    val st = s"$dir/state"
    def dirs: Seq[String] = new java.io.File(st).listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq.sorted
    def grid: Set[(Int, String, Long)] = CmsStream.currentGrid(spark, st)
      .as[(Int, String, Long)].collect().toSet
    val users = (1L to 300L).map(u => u % 23)
    CmsStream.applyBatch(evs(users.take(120)).toDF(), 0L, st, "user_id", 3, 2)
    CmsStream.applyBatch(evs(users.drop(120)).toDF(), 1L, st, "user_id", 3, 2)
    val before = grid
    assert(CmsStream.compact(spark, st) === 1L)
    // CM linearity: the folded grid IS the grid — cell-for-cell — and
    // the per-micro-batch directory growth is gone.
    assert(grid === before)
    assert(dirs === Seq("batch=compacted-1"))
    // The AGMS join-size read over compacted state still equals the
    // batch face (self-join here), so downstream contracts survive
    // compaction.
    val selfEst = CmsStream.joinSizeEstimate(spark, st, st).as[Long].head()
    val batchSelf = Sketches.cmsJoinSize(
        users.toDF("user_id"), "user_id",
        users.toDF("user_id"), "user_id", depth = 3, prefixLen = 2)
      .as[(Long, Long, Long)].head()
    assert(selfEst === batchSelf._2)
    // A recovering stream REPLAYS a folded batch: ignored structurally.
    CmsStream.applyBatch(evs(users.take(120)).toDF(), 0L, st, "user_id", 3, 2)
    assert(grid === before)
    // New batches accumulate; the next compact folds and sweeps.
    CmsStream.applyBatch(evs(users.take(120)).toDF(), 2L, st, "user_id", 3, 2)
    val grown = CmsStream.currentGrid(spark, st)
      .agg(sum($"c")).as[Long].head()
    assert(grown === 3 * 300L + 120L * 3L) // depth 3 rows per key
    assert(CmsStream.compact(spark, st) === 2L)
    assert(dirs === Seq("batch=compacted-2"))
    assert(CmsStream.currentGrid(spark, st)
      .agg(sum($"c")).as[Long].head() === grown)
  }

  test("absent keys estimate to zero via the left-join probe") {
    val dir = s"${sys.props("java.io.tmpdir")}/cms_ab_${System.nanoTime()}"
    CmsStream.applyBatch(evs(Seq(1L, 1L, 2L)).toDF(), 0L,
      s"$dir/state", "user_id", 3, 2)
    val est = CmsStream.estimates(spark, s"$dir/state",
        Seq("1", "nosuchkey-zzz"), depth = 3, prefixLen = 2)
      .as[(String, Long)].collect().toMap
    assert(est("1") >= 2L)
    // A key whose buckets are all empty must report 0 (left join).
    assert(est("nosuchkey-zzz") >= 0L)
  }
}
