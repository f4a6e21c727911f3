package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

class TriangleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Brute-force reference: count id-ordered closed triples. */
  private def brute(edges: Seq[(Long, Long)]): Long = {
    val e = edges.map { case (a, b) => (a min b, a max b) }
      .filter { case (a, b) => a != b }.toSet
    val es = e.toSeq
    es.map { case (a, b) =>
      es.count { case (a2, c) => a2 == a && c > b && e.contains((b, c)) }
    }.sum.toLong
  }

  test("hand-built graph: K4 has 4 triangles plus a pendant edge") {
    val edges = Seq[(Long, Long)](
      (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), // K4
      (4, 5)) // pendant
    val row = Graph.triangleCount(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].head()
    assert(row === ((7L, 4L)))
  }

  test("duplicate, reversed, and self-loop edges collapse first") {
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 1), (1, 2), (2, 3), (1, 3), (3, 3))
    val row = Graph.triangleCount(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].head()
    assert(row === ((3L, 1L)))
  }

  test("matches brute force on a seeded random graph (with hubs)") {
    val rnd = new scala.util.Random(23)
    // Skewed: node 0 is a hub in most edges — exercises the orientation.
    val edges = (1 to 400).map { _ =>
      if (rnd.nextInt(3) == 0) (0L, rnd.nextInt(40).toLong)
      else (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)
    }
    val row = Graph.triangleCount(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].head()
    assert(row._2 === brute(edges))
    assert(row._2 > 0L)
  }

  test("k-core: pendant chain peels away, the clique survives") {
    // K4 on {1,2,3,4} plus a chain 4-5-6: 2-core = exactly the K4.
    val edges = Seq[(Long, Long)](
      (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
      (4, 5), (5, 6))
    val out = Graph.kCore(edges.toDF("a", "b"), "a", "b", k = 2)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(out === Set((1L, 3L, true), (2L, 3L, true),
      (3L, 3L, true), (4L, 3L, true)))
  }

  test("k-core: cascading removal (each peel exposes the next layer)") {
    // Chain 1-2-3-4-5: every node ends below degree 2 only after the
    // ends peel repeatedly — the 2-core is empty, found in >1 round.
    val edges = (1L to 4L).map(i => (i, i + 1))
    val out = Graph.kCore(edges.toDF("a", "b"), "a", "b", k = 2)
    assert(out.count() === 0L)
  }

  test("k-core at k=1 keeps every non-isolated node") {
    val edges = Seq[(Long, Long)]((1, 2), (3, 4))
    val out = Graph.kCore(edges.toDF("a", "b"), "a", "b", k = 1)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(out.map(_._1) === Set(1L, 2L, 3L, 4L))
    assert(out.forall(_._3))
  }

  test("triangle-free graph (star) counts zero") {
    val edges = (1L to 10L).map(i => (0L, i))
    val row = Graph.triangleCount(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].head()
    assert(row === ((10L, 0L)))
  }
}
