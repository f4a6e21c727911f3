package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** The SURVEY.md §7.4 parity traps, each pinned by a test. */
class ParityTrapsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("trap 1: null join keys match only after normalize (fillna '')") {
    val l = Seq((Option.empty[String], 1)).toDF("k", "lv")
    val r = Seq((Option.empty[String], 2)).toDF("k", "rv")
    // Raw Spark semantics: null keys never match.
    assert(l.join(r, Seq("k")).count() == 0)
    // Reference semantics (merge_to_dw.py:63): null -> "" joins.
    val ln = Relational.normalizeKeys(l, Seq("k"))
    val rn = Relational.normalizeKeys(r, Seq("k"))
    assert(ln.join(rn, Seq("k")).count() == 1)
  }

  test("trap 2: mode ties break toward the smallest value, always") {
    val df = Seq((1, 9), (1, 2), (1, 9), (1, 2)).toDF("g", "v")
    val m = Relational.deterministicMode(df, "g", "v", "m")
      .as[(Int, Int)].collect()
    assert(m.toSeq == Seq((1, 2)))
  }

  test("trap 2 property: deterministicMode == reference semantics on random multisets") {
    val rnd = new scala.util.Random(42)
    (1 to 25).foreach { _ =>
      val rows = for {
        g <- 1 to (1 + rnd.nextInt(5))
        _ <- 1 to (1 + rnd.nextInt(12))
      } yield (g, rnd.nextInt(6))
      // Reference semantics (pandas Series.mode().iloc[0]): most frequent
      // value, ties -> smallest.
      val expected = rows.groupBy(_._1).map { case (g, rs) =>
        val counts = rs.groupBy(_._2).map { case (v, vs) => v -> vs.size }
        val maxC = counts.values.max
        g -> counts.collect { case (v, c) if c == maxC => v }.min
      }
      val got = Relational.deterministicMode(rows.toDF("g", "v"), "g", "v", "m")
        .as[(Int, Int)].collect().toMap
      assert(got == expected, s"rows=$rows")
    }
  }

  test("trap 2b: mode works on STRING columns with the same tie order") {
    // The tie-break negates the count, not the value, so non-numeric mode
    // columns order natively (round-2 verdict: `value * -1` failed
    // analysis on strings).
    val df = Seq((1, "b"), (1, "a"), (1, "b"), (1, "a"), (2, "z"))
      .toDF("g", "v")
    val m = Relational.deterministicMode(df, "g", "v", "m")
      .as[(Int, String)].collect().sortBy(_._1)
    assert(m.toSeq == Seq((1, "a"), (2, "z")))
    // Fused variant carries a string mode plus an order-stable carry.
    val df2 = Seq((1, "b", 10, "x"), (1, "a", 11, "y"), (1, "b", 12, "z"))
      .toDF("g", "v", "ord", "c")
    val f = Relational.modeOrFirstMulti(df2, "g", "v", "ord", Seq("c"), "m")
      .select("g", "m", "c").as[(Int, String, String)].collect()
    assert(f.toSeq == Seq((1, "b", "x")))
  }

  test("trap 4: lenient cast yields null on junk, value on digits") {
    val df = Seq("1-URGENT", "7", "").toDF("s")
    val out = df.select(expr("try_cast(s AS INT)")).as[Option[Int]].collect()
    assert(out.toSeq == Seq(None, Some(7), None))
  }

  test("trap 6: boolean means need an explicit cast") {
    val df = Seq(true, true, false, false).toDF("w")
    val rate = df.agg(avg($"w".cast("double"))).as[Double].collect().head
    assert(rate == 0.5)
  }

  test("trap 7: string timestamps parse before datediff") {
    val df = Seq(("2020-11-24T00:00:00", "2020-12-08T00:00:00"))
      .toDF("p", "u")
    val days = df.select(
      datediff(to_timestamp($"u"), to_timestamp($"p"))).as[Int]
      .collect().head
    assert(days == 14)
  }

  test("trap 8: NULL merge keys never match — both sides pass through") {
    // lake_merge's `===` join: a null-key source row is source-only
    // (inserted, if the insert condition allows), a null-key target row
    // is target-only (kept) — they must NOT pair with each other.
    val tgt = Seq((Option.empty[Long], 1L), (Some(5L), 2L)).toDF("k", "v")
    val src = Seq((Option.empty[Long], 9L, false)).toDF("k", "new_v", "del")
    val out = graft.operators.LakeMerge.mergeInto(tgt, src, "k",
      whenMatchedUpdate = Map("v" -> col("s.new_v")),
      whenNotMatchedInsert = Map("k" -> col("s.k"), "v" -> col("s.new_v")))
      .as[(Option[Long], Long)].collect().toSeq.sortBy(_._2)
    assert(out == Seq((None, 1L), (Some(5L), 2L), (None, 9L)))
  }

  test("trap 10: monotonically_increasing_id is layout-dependent; " +
    "hash surrogates are not") {
    // The reason StarSchema keys dims with xxhash64(natural key) and
    // never with generated ids: the same rows under a different
    // partitioning get DIFFERENT monotonic ids (the id encodes the
    // partition), while hash surrogates depend only on row content —
    // so incremental reloads and replicas stay consistent.
    val rows = (1 to 100).map(i => s"brand-${i % 10}").toDF("b")
    def monoIds(parts: Int) = rows.repartition(parts)
      .withColumn("id", monotonically_increasing_id())
      .orderBy($"b", $"id").select($"id").as[Long].collect().toSeq
    def hashIds(parts: Int) = rows.repartition(parts)
      .select($"b", xxhash64($"b").as("id")).distinct()
      .orderBy($"b").as[(String, Long)].collect().toSeq
    assert(monoIds(2) != monoIds(8), "expected layout-dependent ids")
    assert(hashIds(2) == hashIds(8), "hash surrogates must not move")
  }

  test("trap 9: uniqueViolations counts NULL keys as violations, " +
    "count_distinct would not") {
    // count(*) includes nulls, count_distinct excludes them — so two
    // null PKs report 2 violations (null PKs ARE a PK violation). Pin
    // the behavior so a refactor to a null-exempt rule is a visible
    // choice, not an accident.
    val df = Seq(Option(1L), Option(1L), None, None).toDF("k")
    val v = graft.operators.Quality.check(df,
      Seq("pk" -> graft.operators.Quality.uniqueViolations(col("k"))))
      .as[(String, Long)].collect().head._2
    assert(v == 3L) // 4 rows, 1 distinct non-null value
  }

  test("trap 11: money sums — raw double is order-dependent once the " +
    "running total's ulp passes a cent; decimal/long-cents is exact " +
    "in any order (BASELINE.md round-14 addendum C)") {
    // The third decade's q1_agg adjudication, pinned as a spec: a raw
    // DOUBLE sum over cent-discrete prices admits no order-independent
    // contract once the accumulator's ulp exceeds 0.01 (at sf100 that
    // regime is 10^8 rows/group summing to ~5e12; here ONE
    // 10^15-dollar row compresses it into 10,001 rows — ulp(1e15) =
    // 0.125, so a big-first accumulation rounds every subsequent cent
    // away while small-first keeps them). The fixed-point paths the
    // repo's money queries use (OlapQueries' decimal(20,2) revenue;
    // LONG cents, 10^17 < 2^63) are exact and order-independent by
    // construction — that is the discipline this trap pins.
    val cents = ((1L to 10000L).map(_ => 1L) :+ 100000000000000000L)
    val df = cents.toDF("cents")
      .withColumn("dollars", $"cents".cast("double") / 100.0)
    // orderBy → coalesce(1): one partition whose row order IS the sort
    // order, so the plain-fold accumulator visits rows as directed.
    val asc = df.orderBy($"cents".asc).coalesce(1)
    val desc = df.orderBy($"cents".desc).coalesce(1)
    def dbl(d: org.apache.spark.sql.DataFrame): Double =
      d.agg(sum($"dollars")).as[Double].head()
    def dec(d: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      d.agg(sum($"dollars".cast("decimal(30,2)")))
        .as[java.math.BigDecimal].head()
    def lng(d: org.apache.spark.sql.DataFrame): Long =
      d.agg(sum($"cents")).as[Long].head()
    val exactCents = 100000000000000000L + 10000L
    // Fixed point: same bits in either order, exactly right.
    assert(lng(asc) === exactCents && lng(desc) === exactCents)
    val want = new java.math.BigDecimal(exactCents).movePointLeft(2)
    assert(dec(asc).compareTo(want) == 0 && dec(desc).compareTo(want) == 0)
    // Raw double: the SAME multiset, two accumulation orders, two
    // answers. Small-first survives (+100 dollars = 800 ulps of 1e15,
    // representable); big-first rounds each 0.01 < ulp/2 to nothing.
    val (a, d) = (dbl(asc), dbl(desc))
    assert(a !== d, "raw double money sum must expose order dependence")
    assert(math.abs(d - 1e15) < 1e-3, "big-first loses all 10,000 cents")
    assert(math.abs(a - (1e15 + 100.0)) < 1e-3, "small-first keeps them")
  }
}
