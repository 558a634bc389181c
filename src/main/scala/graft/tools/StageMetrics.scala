package graft.tools

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Post-execution per-operator SQL-metric dump — the stage-level
  * profile the bench totals can't give. Runs one registered query at
  * `SPARK_GRAFT_SF_DIR` (default sf0.1), executes it, then walks the
  * FINAL adaptive plan (through QueryStageExec / ReusedExchange
  * boundaries, which plain plan.collect does not traverse) printing
  * every operator with its non-zero runtime metrics: rows, shuffle
  * bytes/time, aggregate build time, sort time, scan time, codegen
  * stage durations. This is how a warm q206 second is attributed to
  * its sub-pipelines (BASELINE.md carries the readout).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.StageMetrics q206_cf_holdout_precision 3"
  */
object StageMetrics {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q206_cf_holdout_precision")
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // the shared harness recipe: a profile must attribute the SAME plan
    // the bench runs (this session previously lacked the range-join
    // band default, so range queries could profile under a different
    // physical shape than they bench)
    val spark = graft.HarnessSession.create()
    val fn = graft.SparkEntry.queries(name)
    // warm run(s) first — metrics are read from the LAST (steady-state)
    // execution, so JIT/codegen/MV-build costs don't pollute the readout
    var lastSec = 0.0
    var df = fn(spark, sf)
    for (i <- 1 to runs) {
      spark.catalog.clearCache()
      df = fn(spark, sf)
      val t0 = System.nanoTime()
      df.collect(): Unit
      lastSec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"run $i: $lastSec%.2f s")
    }
    println(f"== $name @ $sf: last run $lastSec%.2f s ==")
    val interesting = Set("numOutputRows", "shuffleBytesWritten",
      "dataSize", "writeTime", "fetchWaitTime", "aggTime", "sortTime",
      "scanTime", "collectTime", "buildTime", "duration", "numMatched",
      "shuffleRecordsWritten", "spillSize", "pipelineTime")
    def fmt(v: Long, metric: String): String =
      if (metric == "shuffleWriteTime") f"${v / 1e9}%.2f s" // nsTiming
      else if (metric.toLowerCase.contains("time") || metric == "duration")
        f"${v / 1000.0}%.2f s"
      else if (metric.toLowerCase.contains("size") ||
               metric.toLowerCase.contains("bytes")) f"${v / 1e6}%.1f MB"
      else v.toString
    // the expensive sub-pipelines of a query with persist() points live
    // INSIDE the cache build, invisible to the top-level plan — descend
    // into each InMemoryRelation's cachedPlan exactly once
    val seenCaches = scala.collection.mutable.Set.empty[AnyRef]
    def walk(p: SparkPlan, depth: Int): Unit = {
      val ms = p.metrics.toSeq
        .filter { case (k, m) => m.value > 0 &&
          (interesting.contains(k) || k.toLowerCase.contains("time")) }
        .sortBy(_._1)
        .map { case (k, m) => s"$k=${fmt(m.value, k)}" }
      val head = p.nodeName + (if (ms.isEmpty) "" else ms.mkString("  [", ", ", "]"))
      println(("  " * depth) + head)
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
        case q: QueryStageExec => walk(q.plan, depth + 1)
        case r: ReusedExchangeExec =>
          println(("  " * (depth + 1)) + s"(reuses ${r.child.nodeName})")
        case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          val rel = s.relation
          if (seenCaches.add(rel.cacheBuilder)) {
            println(("  " * (depth + 1)) + "(cache build plan:)")
            walk(rel.cachedPlan, depth + 2)
          } else
            println(("  " * (depth + 1)) + "(cache shown above)")
        case other => other.children.foreach(walk(_, depth + 1))
      }
    }
    walk(df.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
