package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

class RelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("normalizeKey: null -> empty, trimmed, lowercased") {
    val df = Seq(Some("  FOO Bar "), None, Some("x")).toDF("k")
    val out = df.select(Relational.normalizeKey($"k")).as[String].collect()
    assert(out.toSeq == Seq("foo bar", "", "x"))
  }

  test("fullOuterWithIndicator produces all three buckets") {
    val l = Seq((1, "a"), (2, "b")).toDF("k", "lv")
    val r = Seq((2, "x"), (3, "y")).toDF("k", "rv")
    val out = Relational.fullOuterWithIndicator(l, r, Seq("k"))
      .select($"k", $"_merge").as[(Int, String)].collect().toMap
    assert(out == Map(1 -> "left_only", 2 -> "both", 3 -> "right_only"))
  }

  test("deterministicMode breaks ties toward the smallest value") {
    // group 1: {5:2, 3:2} tie -> 3; group 2: {7:3, 1:1} -> 7
    val df = Seq((1, 5), (1, 5), (1, 3), (1, 3), (2, 7), (2, 7), (2, 7),
      (2, 1)).toDF("g", "v")
    val out = Relational.deterministicMode(df, "g", "v", "m")
      .as[(Int, Int)].collect().toMap
    assert(out == Map(1 -> 3, 2 -> 7))
  }

  test("deterministicMode matches reference semantics on random data") {
    val rnd = new scala.util.Random(42)
    val groups = (1 to 5).map { g =>
      g -> List.fill(1 + rnd.nextInt(12))(rnd.nextInt(4))
    }
    val df = groups.flatMap { case (g, vs) => vs.map(g -> _) }.toDF("g", "v")
    val expected = groups.map { case (g, vs) =>
      val counts = vs.groupBy(identity).view.mapValues(_.size)
      val mx = counts.values.max
      g -> counts.collect { case (v, c) if c == mx => v }.min
    }.toMap
    val got = Relational.deterministicMode(df, "g", "v", "m")
      .as[(Int, Int)].collect().toMap
    assert(got == expected)
  }

  test("firstByOrder is pinned to the explicit order column") {
    val df = Seq((1, 30, "z"), (1, 10, "a"), (1, 20, "m")).toDF("g", "o", "v")
    val out = Relational.firstByOrder(df, "g", "o", Seq("v"))
      .as[(Int, String)].collect()
    assert(out.toSeq == Seq((1, "a")))
  }

  test("freqCount orders by count desc then key") {
    val df = Seq("b", "b", "a", "a", "c").toDF("x")
    val out = Relational.freqCount(df, "x").as[(String, Long)].collect()
    assert(out.toSeq == Seq(("a", 2L), ("b", 2L), ("c", 1L)))
  }

  test("single-pass profiling aggregates") {
    val df = Seq((1, Some("x")), (2, None), (2, None)).toDF("a", "b")
    val nu = Relational.nunique(df, Seq("a", "b")).collect()(0)
    assert(nu.getLong(0) == 2 && nu.getLong(1) == 1)
    val nc = Relational.nullCounts(df, Seq("a", "b")).collect()(0)
    assert(nc.getLong(0) == 0 && nc.getLong(1) == 2)
    val st = Relational.stats(df.select($"a".cast("double").as("a")), Seq("a"))
      .collect()(0)
    assert(st.getLong(0) == 3)           // cnt
    assert(st.getDouble(1) == 5.0 / 3)   // mean = round(sum,2)/count
  }

  test("modeOrFirst (fused, one shuffle) == deterministicMode + firstByOrder") {
    val rnd = new scala.util.Random(7)
    val rows = for {
      g <- 1 to 6; i <- 1 to (1 + rnd.nextInt(10))
    } yield (g, rnd.nextInt(4), i, s"v${rnd.nextInt(3)}")
    val df = rows.toDF("g", "m", "ord", "f")
    val fused = Relational.modeOrFirst(df, "g", "m", "ord", "f", "mo", "fo")
      .as[(Int, Int, String)].collect().toSet
    val modes = Relational.deterministicMode(df, "g", "m", "mo")
    val firsts = Relational.firstByOrder(df, "g", "ord", Seq("f"))
    val composed = modes.join(firsts, Seq("g"))
      .select($"g", $"mo", $"f").as[(Int, Int, String)].collect().toSet
    assert(fused == composed)
  }

  test("saltedJoin returns exactly the plain inner join's rows") {
    val large = Seq((1, "o1"), (1, "o2"), (1, "o3"), (2, "o4"), (9, "o5"))
      .toDF("k", "ov")
    val small = Seq((1, "c1"), (2, "c2"), (3, "c3")).toDF("k", "cv")
    val salted = Relational.saltedJoin(large, small, Seq("k"), salts = 4)
      .select($"k", $"ov", $"cv").as[(Int, String, String)].collect().sorted
    val plain = large.join(small, Seq("k"))
      .select($"k", $"ov", $"cv").as[(Int, String, String)].collect().sorted
    assert(salted.toSeq == plain.toSeq && plain.nonEmpty)
  }

  test("autoSaltedJoin matches the plain join on skewed AND even keys") {
    // Hot key 1 carries 12 of 15 rows (skew 4x the mean) -> salts; the
    // even frame stays below threshold -> plain path. Either way the
    // row set is identical to the unsalted join.
    val hot = ((1 to 12).map(i => (1, s"h$i")) ++
      Seq((2, "a"), (3, "b"), (4, "c"))).toDF("k", "ov")
    val even = (1 to 12).map(i => (i, s"e$i")).toDF("k", "ov")
    val small = (1 to 12).map(i => (i, s"c$i")).toDF("k", "cv")
    for (large <- Seq(hot, even)) {
      val auto = Relational.autoSaltedJoin(large, small, Seq("k"))
        .select($"k", $"ov", $"cv").as[(Int, String, String)]
        .collect().sorted.toSeq
      val plain = large.join(small, Seq("k"))
        .select($"k", $"ov", $"cv").as[(Int, String, String)]
        .collect().sorted.toSeq
      assert(auto == plain && plain.nonEmpty)
    }
  }

  test("argmaxRow picks max with deterministic tie-break") {
    val df = Seq((1, 10.0), (2, 10.0), (3, 5.0)).toDF("id", "v")
    val out = Relational.argmaxRow(df, $"v", $"id").as[(Int, Double)].collect()
    assert(out.toSeq == Seq((1, 10.0)))
  }
}
