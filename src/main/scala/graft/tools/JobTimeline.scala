package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart}

/** Dev-only per-JOB wall-clock timeline for one registered query — the
  * complement of StageMetrics' per-operator view. A query whose plan
  * has persist points and broadcast builds executes as a CHAIN of Spark
  * jobs; the listener records each job's [start, end] so serial gaps
  * and overlap potential are measured instead of argued (r17 verdict
  * item 3: q206's ~10 sequential broadcast builds).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.JobTimeline q206_cf_holdout_precision 3"
  */
object JobTimeline {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q206_cf_holdout_precision")
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.HarnessSession.create()
    val fn = graft.SparkEntry.queries(name)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(js.jobId, (js.time, desc, js.stageInfos.map(_.numTasks).sum))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (t0, desc, nTasks) =>
          done.add((je.jobId, t0, je.time, desc, nTasks))
        }
      }
    })
    var lastSec = 0.0
    for (i <- 1 to runs) {
      spark.catalog.clearCache()
      done.clear()
      val df = fn(spark, sf)
      val t0 = System.nanoTime()
      df.collect(): Unit
      lastSec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"run $i: $lastSec%.2f s")
    }
    println(f"== $name @ $sf: last run $lastSec%.2f s ==")
    Thread.sleep(500) // let the listener bus drain
    import scala.jdk.CollectionConverters._
    val ds = done.asScala.toSeq.sortBy(_._2)
    val base = ds.headOption.map(_._2).getOrElse(0L)
    var prevEnd = base
    var serialGap = 0L
    ds.foreach { case (id, s, e, desc, nTasks) =>
      val gap = s - prevEnd
      if (gap > 0) serialGap += gap
      prevEnd = math.max(prevEnd, e)
      println(f"job $id%3d  +${(s - base) / 1000.0}%6.2f s  dur ${(e - s) / 1000.0}%6.3f s  gap ${gap / 1000.0}%6.3f s  tasks $nTasks%4d  ${desc.take(60)}")
    }
    println(f"jobs=${ds.size}  span=${(prevEnd - base) / 1000.0}%.2f s  driver-only gap total=${serialGap / 1000.0}%.2f s")
    spark.stop()
  }
}
