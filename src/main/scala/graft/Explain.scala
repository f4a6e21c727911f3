package graft

/** Diagnostic main: print the formatted physical plan of registered
  * queries. Usage: runMain graft.Explain <sfDir> [queryName ...]
  * (no names → all). The plan audit loop: after a query is correct,
  * inspect its plan for missing broadcasts, unpushed filters, and
  * codegen gaps before calling it done.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local(8, "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
