package graft

/** Benchmark main: times the headline query set from BASELINE.md — the ten
  * dashboard cards D1–D10 plus the merge pipeline (J1) and the cleaning
  * aggregate (A1) — on SPARK_GRAFT_SF_DIR, printing one JSON line.
  *
  * Each query is fully materialized via a `noop`-format write: every output
  * column is computed and serialized on the executors, so expression-heavy
  * projections are really timed. A bare `.count()` would let Catalyst prune
  * all columns and bench the scan alone (round-1 VERDICT "What's wrong").
  * An untimed warm-up pass over the whole headline set amortizes
  * JVM/codegen/classloading and parquet footer reads for EVERY input table,
  * so per-query numbers measure the plan, not first-touch JIT noise (with a
  * d9-only warm-up, the first query to touch lineitem absorbed ~4 s of
  * one-time cost that its plan didn't own).
  */
object Bench {
  val headline: Seq[String] = Seq(
    "d1_avg_popularity", "d2_n_artists", "d3_top_albums",
    "d4_winning_artists", "d5_wins_danceability", "d6_year_genre_pivot",
    "d7_extremes", "d8_low_energy_popular", "d9_top_artists",
    "d10_genre_wins", "j1_merge_indicator", "a1_mode_first")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-bench")

    def materialize(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // Warm-up (untimed): JIT + codegen + parquet footer reads for all tables.
    headline.foreach { name =>
      try materialize(name) catch { case _: Throwable => () }
    }

    // Median of 3 timed repetitions per query: single runs at this scale
    // carry ±30% scheduler/GC noise, which would drown real plan
    // regressions between rounds.
    val results = headline.map { name =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try materialize(name)
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.sorted.apply(1)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
