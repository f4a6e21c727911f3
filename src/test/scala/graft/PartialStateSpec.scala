package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.DriftStream

/** Crash-window contracts of the partial-state compaction layout,
  * exercised through the DriftStream categorical face over hand-built
  * directory states (the states a crash actually leaves behind, which
  * the happy-path stream specs cannot reach):
  *
  * - two COMMITTED compacted generations coexisting (compact crashed
  *   between the marker and GC) → the reader selects the newest only;
  * - a torn fold (crash mid-write, no commit marker — the object-store
  *   window where a directory "rename" is copy+delete) → invisible to
  *   reads, overwritten and committed by the next compact;
  * - an unparseable batch= directory → never read, never deleted;
  * - no state at all → the caller's empty frame / hwm -1.
  */
class PartialStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def write(dir: String, rows: (String, Long)*): Unit =
    rows.toSeq.toDF("cat", "n").write.mode("overwrite").parquet(dir)

  /** The atomic publish step, as a crash simulator would or wouldn't
    * have reached it.
    */
  private def commit(st: String, hwm: Long): Unit = {
    new java.io.File(st).mkdirs()
    new java.io.File(st, s".commit-$hwm").createNewFile(); ()
  }

  private def cats(st: String): Map[String, Long] =
    DriftStream.currentCategories(spark, st)
      .as[(String, Long)].collect().toMap

  private def dirs(st: String): Seq[String] =
    Option(new java.io.File(st).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName).toSeq.sorted

  private def markers(st: String): Seq[String] =
    Option(new java.io.File(st).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith(".commit-"))
      .map(_.getName).toSeq.sorted

  test("reader selects the newest committed generation only") {
    val st = s"${sys.props("java.io.tmpdir")}/ps_gen_${System.nanoTime()}"
    // The exact post-crash state of: compact@0 → batch 1 arrives →
    // compact@1 publishes its fold and marker but dies before GC →
    // batch 0 is replayed by recovery. Live truth is the newest
    // committed generation.
    write(s"$st/batch=compacted-0", "a" -> 1L); commit(st, 0L)
    write(s"$st/batch=1", "a" -> 2L)
    write(s"$st/batch=compacted-1", "a" -> 3L); commit(st, 1L)
    write(s"$st/batch=0", "a" -> 5L)            // replayed, already folded
    assert(cats(st) === Map("a" -> 3L))
    // The next compact is pure GC here (no live numeric ids above 1).
    assert(DriftStream.compact(spark, st) === 1L)
    assert(dirs(st) === Seq("batch=compacted-1"))
    assert(markers(st) === Seq(".commit-1"))
    assert(cats(st) === Map("a" -> 3L))
  }

  test("torn fold without its marker is invisible and repaired") {
    val st = s"${sys.props("java.io.tmpdir")}/ps_torn_${System.nanoTime()}"
    write(s"$st/batch=0", "a" -> 1L, "b" -> 4L)
    // A compact that died mid-fold-write (the non-atomic object-store
    // window): the directory exists with WRONG partial content and no
    // commit marker. It must never leak into a read.
    write(s"$st/batch=compacted-0", "a" -> 99L)
    assert(cats(st) === Map("a" -> 1L, "b" -> 4L))
    // The retry overwrites the torn fold from the live partials and
    // publishes it atomically.
    assert(DriftStream.compact(spark, st) === 0L)
    assert(dirs(st) === Seq("batch=compacted-0"))
    assert(markers(st) === Seq(".commit-0"))
    assert(cats(st) === Map("a" -> 1L, "b" -> 4L))
  }

  test("unparseable batch directory is never read and never deleted") {
    val st = s"${sys.props("java.io.tmpdir")}/ps_bad_${System.nanoTime()}"
    write(s"$st/batch=0", "a" -> 2L)
    write(s"$st/batch=garbage", "a" -> 77L)
    assert(cats(st) === Map("a" -> 2L))
    assert(DriftStream.compact(spark, st) === 0L)
    // GC only deletes what it understands (and therefore folded).
    assert(dirs(st) === Seq("batch=compacted-0", "batch=garbage"))
    assert(cats(st) === Map("a" -> 2L))
  }

  test("orphan marker without its directory is inert and swept") {
    val st = s"${sys.props("java.io.tmpdir")}/ps_orph_${System.nanoTime()}"
    write(s"$st/batch=3", "a" -> 2L)
    // A GC that crashed between deleting an old generation's directory
    // and its marker leaves the marker alone: it must not resurrect a
    // generation (no directory to select) nor mask live numerics.
    commit(st, 1L)
    assert(cats(st) === Map("a" -> 2L))
    assert(DriftStream.compact(spark, st) === 3L)
    assert(dirs(st) === Seq("batch=compacted-3"))
    assert(markers(st) === Seq(".commit-3"))
    assert(cats(st) === Map("a" -> 2L))
  }

  test("no state: empty read, hwm -1 from compact") {
    val st = s"${sys.props("java.io.tmpdir")}/ps_none_${System.nanoTime()}"
    assert(cats(st) === Map.empty)
    assert(DriftStream.compact(spark, st) === -1L)
    assert(!new java.io.File(st).exists())
  }
}
