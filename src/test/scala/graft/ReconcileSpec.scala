package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Reconcile

class ReconcileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ver(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("k", "c").select($"k", md5($"c").as("h"))

  /** Flat full-outer reference diff (the a19 semantics minus `same`). */
  private def flat(a: Seq[(Long, String)], b: Seq[(Long, String)])
      : Set[(Long, String)] = {
    val ma = a.toMap; val mb = b.toMap
    val added = (mb.keySet -- ma.keySet).map(k => (k, "added"))
    val removed = (ma.keySet -- mb.keySet).map(k => (k, "removed"))
    val changed = (ma.keySet & mb.keySet)
      .filter(k => ma(k) != mb(k)).map(k => (k, "changed"))
    added ++ removed ++ changed
  }

  test("identical versions: nothing reported, zero dirty rows") {
    val rows = (1L to 200L).map(i => (i, s"row-$i"))
    val out = Reconcile.prunedDiff(ver(rows), ver(rows), nBuckets = 8)
    assert(out.count() === 0L)
  }

  test("matches the flat diff on adds, removes, and changes") {
    val a = (1L to 300L).map(i => (i, s"row-$i"))
    val b = (1L to 300L).flatMap { i =>
      if (i % 7 == 0) None                       // removed
      else if (i % 5 == 0) Some((i, s"ROW-$i"))  // changed
      else Some((i, s"row-$i"))
    } ++ (1001L to 1010L).map(i => (i, s"new-$i")) // added
    val out = Reconcile.prunedDiff(ver(a), ver(b), nBuckets = 16)
      .as[(Long, String)].collect().toSet
    assert(out === flat(a, b))
  }

  test("bucket count does not change the answer (1 bucket = flat join)") {
    val a = (1L to 120L).map(i => (i, s"v$i"))
    val b = a.map { case (k, v) => if (k % 9 == 0) (k, v + "!") else (k, v) }
    val one = Reconcile.prunedDiff(ver(a), ver(b), nBuckets = 1)
      .as[(Long, String)].collect().toSet
    val many = Reconcile.prunedDiff(ver(a), ver(b), nBuckets = 64)
      .as[(Long, String)].collect().toSet
    assert(one === many && one === flat(a, b))
  }

  test("a same-key row inside a dirty bucket is still suppressed") {
    // Force everything into ONE bucket: unchanged keys share the bucket
    // with the changed key but must not surface.
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z"))
    val b = Seq((1L, "x"), (2L, "Y"), (3L, "z"))
    val out = Reconcile.prunedDiff(ver(a), ver(b), nBuckets = 1)
      .as[(Long, String)].collect().toSet
    assert(out === Set((2L, "changed")))
  }
}
