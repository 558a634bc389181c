package graft.tools


/** Dev utility: print the formatted physical plan of registered queries.
  * Usage: runMain graft.tools.Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
                else graft.SparkEntry.queries.keys.toSeq.sorted
    // The SHARED harness recipe (HarnessSession): a committed plan
    // capture must show the same physical shape the bench executes —
    // this session previously lacked the range-join band default and
    // the nanos probe flag, so range-join and events-reading queries
    // could explain under a different plan than they bench.
    val spark = graft.HarnessSession.create(logLevel = "ERROR")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
