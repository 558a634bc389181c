package graft.tools


/** Dev utility: time named queries at sf0.1, 3 runs each (run1 shows
  * first-run JIT/codegen cost — what a run-once benchmark pays).
  * Usage: runMain graft.tools.TimeQ <queryName> [more ...] */
object TimeQ {
  def main(args: Array[String]): Unit = {
    // the shared harness recipe — timings must measure bench-shaped plans
    val spark = graft.HarnessSession.create(logLevel = "ERROR")
    spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").count()
    for (name <- args; i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.1").count()
      println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // bench semantics: each run pays its own caches (query fns are pure)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
