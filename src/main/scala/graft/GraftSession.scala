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
  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
