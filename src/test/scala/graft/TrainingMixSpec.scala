package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TrainingMix

/** TrainingMix operators: the two-phase prefix sum must EQUAL the naive
  * single-window answer (that equivalence is what lets the DuckDB oracle
  * stay plain window SQL), and the mix/pack/trim semantics hold on small
  * frames where the expected answer is enumerable.
  */
class TrainingMixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsDf = Seq(
    (1L, "en", 10L), (2L, "en", 20L), (3L, "en", 30L), (4L, "de", 5L),
    (5L, "de", 25L), (6L, "en", 40L), (7L, "de", 15L), (8L, "en", 35L),
    (9L, "de", 45L), (10L, "en", 50L)
  ).toDF("id", "src", "tok")

  test("withRunningTotal equals the naive global window") {
    // Force several range partitions so the partition-offset path is real.
    val got = TrainingMix.withRunningTotal(docsDf, Nil,
        Seq(md5($"id".cast("string")), $"id"), $"tok", "cum",
        numPartitions = 4)
      .select($"id", $"cum")
    val naive = docsDf.withColumn("cum",
      sum($"tok").over(Window.orderBy(md5($"id".cast("string")), $"id")
        .rowsBetween(Window.unboundedPreceding, 0)))
      .select($"id", $"cum")
    assert(got.except(naive).isEmpty && naive.except(got).isEmpty)
  }

  test("withRunningTotal equals the naive per-group window") {
    val got = TrainingMix.withRunningTotal(docsDf, Seq("src"),
        Seq($"tok".desc, $"id"), $"tok", "cum", numPartitions = 4)
      .select($"id", $"cum")
    val naive = docsDf.withColumn("cum",
      sum($"tok").over(Window.partitionBy($"src").orderBy($"tok".desc, $"id")
        .rowsBetween(Window.unboundedPreceding, 0)))
      .select($"id", $"cum")
    assert(got.except(naive).isEmpty && naive.except(got).isEmpty)
  }

  test("packSequences: packs are contiguous in hash order and start-offset bounded") {
    val packed = TrainingMix.packSequences(docsDf, "id", $"tok", 60L,
      numPartitions = 3)
    val rows = packed.withColumn("ord", md5($"id".cast("string")))
      .orderBy($"ord").collect()
    var cum = 0L
    rows.foreach { r =>
      val start = cum
      cum += r.getAs[Long]("n_tok")
      assert(r.getAs[Long]("pack_id") === start / 60L,
        s"doc ${r.getAs[Long]("id")} starts at $start")
    }
    // Every pack id in [0, totalTokens/budget] occurs (chunking leaves no
    // gaps — pack ids are floor(start/budget) of a contiguous stream).
    val ids = rows.map(_.getAs[Long]("pack_id")).distinct.sorted
    assert(ids.head === 0L && ids === (ids.head to ids.last).toArray.toSeq)
  }

  test("weightedMix: rate 1 keeps all, rate ~0 drops all, deterministic") {
    val all = TrainingMix.weightedMix(docsDf, "src", "id",
      Map("en" -> 1.0, "de" -> 1.0))
    assert(all.count() === 10)
    val none = TrainingMix.weightedMix(docsDf, "src", "id",
      Map("en" -> 0.0, "de" -> 0.0))
    assert(none.count() === 0)
    val half = TrainingMix.weightedMix(docsDf, "src", "id",
      Map("en" -> 0.5), defaultRate = 0.5)
    assert(half.collect().toSet === half.collect().toSet) // stable re-run
    // kept set is exactly the rows whose md5 falls under the threshold
    val thr = TrainingMix.rateThreshold(0.5)
    val expect = docsDf.where(md5($"id".cast("string")) < lit(thr))
    assert(half.except(expect).isEmpty && expect.except(half).isEmpty)
  }

  test("trimToTokenBudget keeps best-first prefix per source") {
    // en quality order (score=tok desc): 10(50),6(40),8(35),3(30),2(20),1(10)
    // budget 100: starts 0,50,90 kept (3 docs); start 125 ≥ 100 dropped.
    // de order: 9(45),5(25),7(15),4(5); starts 0,45,70,85 all < 100 → all.
    val kept = TrainingMix.trimToTokenBudget(docsDf, "src", "id",
        $"tok", $"tok", 100L, numPartitions = 3)
      .select($"id").as[Long].collect().toSet
    assert(kept === Set(10L, 6L, 8L, 9L, 5L, 7L, 4L))
  }

  test("shardAssignments: unit-weight packing = rank/docsPerShard") {
    val got = TrainingMix.shardAssignments(docsDf, "id", 3L,
      numPartitions = 3)
    val naive = docsDf.withColumn("rn",
        row_number().over(Window.orderBy(md5($"id".cast("string")), $"id")))
      .select($"id", (($"rn" - 1) / 3).cast("long").as("shard_id"))
    assert(got.except(naive).isEmpty && naive.except(got).isEmpty)
  }

  test("writeShards lays out one directory per shard with full rows") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    TrainingMix.writeShards(docsDf, "id", 4L, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === 10)
    assert(back.columns.toSet === Set("id", "src", "tok", "shard_id"))
    // 10 docs / 4 per shard → shards 0,1,2 as directories
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard_id=")).map(_.getName).sorted
    assert(shardDirs.toSeq ===
      Seq("shard_id=0", "shard_id=1", "shard_id=2"))
  }

  test("property: two-phase prefix sum == sequential scan on random frames") {
    // Random sizes, values, group counts, and partition counts — the
    // distributed result must equal a driver-side sequential scan in the
    // same total order every time.
    val rnd = new scala.util.Random(11)
    (1 to 5).foreach { _ =>
      val n = 20 + rnd.nextInt(40)
      val nGroups = 1 + rnd.nextInt(3)
      val rows = (1 to n).map(i =>
        (i.toLong, s"g${rnd.nextInt(nGroups)}", rnd.nextInt(100).toLong))
      val df = rows.toDF("id", "src", "tok")
      val parts = 2 + rnd.nextInt(5)
      val got = TrainingMix.withRunningTotal(df, Seq("src"),
          Seq($"id"), $"tok", "cum", numPartitions = parts)
        .select($"id", $"cum").as[(Long, Long)].collect().toMap
      val expected = rows.groupBy(_._2).values.flatMap { grp =>
        grp.sortBy(_._1).scanLeft((0L, 0L)) { case ((_, acc), (id, _, tok)) =>
          (id, acc + tok)
        }.drop(1)
      }.toMap
      assert(got === expected, s"parts=$parts rows=$rows")
    }
  }

  test("CorpusJobs.curateToShards produces readable shard-partitioned output") {
    val dir = java.nio.file.Files.createTempDirectory("corpus-shards").toString
    graft.jobs.CorpusJobs.curateToShards(spark,
      "/root/testdata/sf0.001/documents.parquet", dir, docsPerShard = 16L)
    val back = spark.read.parquet(dir)
    assert(back.count() > 0)
    assert(back.columns.contains("shard_id") && back.columns.contains("text"))
    // The chain must have dropped something (quality gate + mix at least).
    val total = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert(back.count() < total)
  }

  test("rateThreshold is the 8-hex-digit floor of rate·2^32") {
    assert(TrainingMix.rateThreshold(0.5) === "80000000")
    assert(TrainingMix.rateThreshold(0.75) === "c0000000")
    assert(TrainingMix.rateThreshold(0.0) === "00000000")
    assertThrows[IllegalArgumentException](TrainingMix.rateThreshold(1.0))
  }

  test("cluster split: near-dup members always share a split; rates hold") {
    import graft.operators.TrainingMix
    val docs = (1L to 400L).map(Tuple1(_)).toSeq.toDF("id")
    // Pair up (2k−1, 2k): 200 clusters of 2.
    val pairs = (1L to 200L).map(k => (2 * k - 1, 2 * k))
      .toDF("id_a", "id_b")
    val cc = graft.operators.Dedup.connectedComponents(pairs, "id_a", "id_b")
    val sp = TrainingMix.splitAssignments(docs, "id", cc,
        testRate = 0.2, valRate = 0.2)
      .as[(Long, Long, String)].collect()
    // No cluster straddles splits.
    assert(sp.groupBy(_._2).forall(_._2.map(_._3).distinct.length == 1))
    // All three splits materialize and roughly track the rates.
    val bySplit = sp.groupBy(_._3).view.mapValues(_.length).toMap
    assert(bySplit.keySet === Set("test", "val", "train"))
    assert(bySplit("train") > bySplit("test") &&
      bySplit("train") > bySplit("val"))
    // Deterministic across invocations.
    val sp2 = TrainingMix.splitAssignments(docs, "id", cc,
        testRate = 0.2, valRate = 0.2)
      .as[(Long, Long, String)].collect()
    assert(sp.sortBy(_._1).toSeq === sp2.sortBy(_._1).toSeq)
  }

  test("plan audit: no data-sized global window — only pid-local and totals windows") {
    // The scale contract: every Window over the DATA is partitioned by
    // _pid (+ group cols); the only non-partitioned window runs over the
    // per-partition totals relation, whose input is an Aggregate, not the
    // corpus. Assert on the optimized logical plan: each Window node
    // either has partition expressions, or its child tree contains the
    // totals Aggregate.
    val df = TrainingMix.packSequences(docsDf, "id", $"tok", 60L,
      numPartitions = 4)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      val partitioned = w.partitionSpec.nonEmpty
      val overTotals = w.child.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.nonEmpty
      assert(partitioned || overTotals,
        s"unpartitioned window over raw data:\n$w")
    }
  }
}
