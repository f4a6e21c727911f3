package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the tuned session posture SCALE.md's claims rest on — an edit
  * that silently drops AQE, the UTC pin, runtime bloom filters, or the
  * native-function registration should fail the build, not surface as a
  * slow or wrong round later.
  */
class SessionConfigSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("tuned posture: AQE, UTC, runtime bloom filters, sized shuffle") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(spark.conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.enabled") == "true")
    // local[N] keeps shuffle partitions = core count, never the 200
    // default (32 threads spilling into 200 partitions at test scale
    // would benchmark scheduler overhead, not plans).
    assert(spark.conf.get("spark.sql.shuffle.partitions").toInt <= 64)
  }

  test("native function surface is registered unconditionally") {
    // GraftSession.local registers even against a pre-existing session
    // (spark.sql.extensions only applies to NEW sessions).
    val one = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))," +
        " array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c," +
        " hamming_dist('00ff', '00fe') AS h").head()
    assert(math.abs(one.getDouble(0) - 1.0) < 1e-12)
    assert(one.getLong(1) == 1L)
  }

  test("WindowExec noise is filtered by MESSAGE, not by level") {
    // ADVICE r10: raising the whole logger to ERROR hid every future
    // WindowExec warning for every library user. The session now
    // attaches a RegexFilter on the one known-benign message — assert
    // the filter DENIES that message and stays NEUTRAL on anything
    // else, so a genuine WindowExec warning still surfaces.
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.Filter.Result
    import org.apache.logging.log4j.core.LoggerContext
    import org.apache.logging.log4j.core.impl.Log4jLogEvent
    import org.apache.logging.log4j.message.SimpleMessage
    spark // force session build (and with it the filter install)
    val name = "org.apache.spark.sql.execution.window.WindowExec"
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val lc = ctx.getConfiguration.getLoggerConfig(name)
    assert(lc.getName == name, "WindowExec logger config not installed")
    assert(lc.getLevel == Level.WARN,
      "logger must stay at WARN — filtering is the filter's job")
    def ev(msg: String) = Log4jLogEvent.newBuilder()
      .setLoggerName(name).setLevel(Level.WARN)
      .setMessage(new SimpleMessage(msg)).build()
    val f = lc.getFilter
    assert(f != null, "message filter not attached")
    assert(f.filter(ev("No Partition Defined for Window operation! " +
      "Moving all data to a single partition.")) == Result.DENY)
    assert(f.filter(ev("WindowExec spilled 3 GiB to disk")) ==
      Result.NEUTRAL)
    // The end-of-query unpersist advisory (502 copies per bench run) is
    // denied on the RDD classes that emit it; other RDD warnings pass.
    Seq("org.apache.spark.rdd.MapPartitionsRDD",
        "org.apache.spark.rdd.ShuffledRDD").foreach { n =>
      val rc = ctx.getConfiguration.getLoggerConfig(n)
      assert(rc.getName == n, s"$n logger config not installed")
      val rf = rc.getFilter
      assert(rf != null)
      assert(rf.filter(ev("RDD 33287 was locally checkpointed, its " +
        "lineage has been truncated and cannot be recomputed after " +
        "unpersisting")) == Result.DENY)
      assert(rf.filter(ev("Evicting cached RDD 12 from memory")) ==
        Result.NEUTRAL)
    }
  }
}
