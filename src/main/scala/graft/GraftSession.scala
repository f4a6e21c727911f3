package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's tuned defaults.
  *
  * Local-mode is a single JVM with N executor threads; on a real cluster the
  * same configs apply per-executor. AQE (on by default in Spark 3.2+) is kept
  * on explicitly: it handles skew-join splitting (the reference's lowercased
  * artist-name keys are skew-prone, see SURVEY.md §7.4.8) and post-shuffle
  * partition coalescing, both of which matter far more at 100 TB than at test
  * scale.
  */
object GraftSession {

  /** The engine's production configs, applied to any builder — on a
    * cluster, master/memory/shuffle sizing come from spark-submit and this
    * is the only piece the application must add (or pass
    * `--conf spark.sql.extensions=graft.GraftExtensions` and the UTC/AQE
    * pair directly). AQE stays ON: skew-join splitting and post-shuffle
    * coalescing matter far more at 100 TB than at test scale. Timezone is
    * pinned so timestamp semantics never depend on cluster locale.
    */
  def tuned(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    // Fact⋈fact posture: when neither side broadcasts, a selective build
    // side injects a bloom filter that prunes the probe scan BEFORE the
    // shuffle. Pinned on (its size gates keep it scoped to big scans);
    // PlanAuditSpec asserts the injection fires.
    .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // Codegen class cache sized for a query-SERVER workload, not a
    // single-query shell: the default 100-entry LRU holds ~5-15 plans'
    // generated classes, so any process cycling through more plans than
    // that (the 199-query bench, a BI endpoint, a pipeline scheduler)
    // recompiles every whole-stage class on every re-run — a flat
    // ~0.2-1.5 s Janino tax per execution that reads as 2-4× on
    // sub-second queries (measured in r9 when the bench moved to
    // interleaved passes: ev_seasonal_hour steady-state 0.52 s vs its
    // 0.25 pin, all of it driver-side compile). 10k entries covers the
    // full registered surface with room; static conf, so it must be set
    // at session build.
    .config("spark.sql.codegen.cache.maxEntries", "10000")

  /** Local-mode session: a single JVM with N executor threads, shuffle
    * partitions = core count (at cluster scale set ≈ 2–3× total cores and
    * let AQE coalesce).
    */
  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = tuned(SparkSession.builder())
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // spark.sql.extensions only applies when getOrCreate builds a NEW
    // session; against a pre-existing one it is silently skipped. The
    // explicit (idempotent) registration makes the native function surface
    // unconditional for every GraftSession.local caller.
    graft.functions.NativeFunctions.register(spark)
    spark.sparkContext.setLogLevel("WARN")
    // The engine's bounded post-aggregate rank/share windows (top-k /
    // pct-of-total over ≤ hundreds of pre-aggregated rows — audited in
    // SCALE.md) intentionally run unpartitioned, and each emits a
    // `WindowExec: No Partition Defined` WARN. Across a 199-query run
    // that is hundreds of lines of noise in exactly the stdout/stderr
    // channel the bench's compact verdict line must survive (VERDICT r9
    // item 6). Filtered by MESSAGE, not by level (ADVICE r10): a
    // RegexFilter on the one known-benign text is attached to the
    // WindowExec logger config, so any OTHER WindowExec warning — a
    // behavior-change notice in a newer Spark, a spill diagnostic —
    // still reaches every library user. Scoped to the ONE concrete
    // class that logs the message (Spark's Logging trait names loggers
    // by runtime class, so the WindowExecBase warn surfaces as
    // WindowExec).
    try {
      import org.apache.logging.log4j.{Level, LogManager}
      import org.apache.logging.log4j.core.Filter.Result
      import org.apache.logging.log4j.core.LoggerContext
      import org.apache.logging.log4j.core.config.LoggerConfig
      import org.apache.logging.log4j.core.filter.RegexFilter
      val name = "org.apache.spark.sql.execution.window.WindowExec"
      val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
      val conf = ctx.getConfiguration
      if (conf.getLoggerConfig(name).getName != name) {
        // additive=true: everything except the filtered message still
        // flows to the root appenders at the inherited level.
        val lc = new LoggerConfig(name, Level.WARN, true)
        lc.addFilter(RegexFilter.createFilter(
          ".*No Partition Defined for Window operation.*", null,
          java.lang.Boolean.FALSE, Result.DENY, Result.NEUTRAL))
        conf.addLogger(name, lc)
        ctx.updateLoggers()
      }
    }
    catch { case _: Throwable => () } // non-log4j2 binding: keep the WARNs
    spark
  }
}
