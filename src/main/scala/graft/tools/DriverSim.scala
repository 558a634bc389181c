package graft.tools


/** Driver-protocol reproduction harness (round-13 verdict item 1): the
  * driver's BENCH_r13 artifact read q206 at 33.1 s while every isolated
  * self-measurement said 4.6-8.9 s, and the gap correlated with a
  * loadavg-16 window spanning the name-contiguous q179-q242 band. This
  * tool measures a query under the EXACT bench protocol — same session
  * conf, same sf0.001 warm pass, same clearCache-between-runs timing —
  * while an adjustable synthetic CPU load (busy-spin daemon threads)
  * reproduces the contaminated environment, so the ambient-vs-intrinsic
  * split is measured instead of argued:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.DriverSim q206_cf_holdout_precision 16 4"
  *                                        ^query  ^spinner threads ^runs
  *
  * Emits one JSON line per configuration with the run times and the
  * loadavg around each run. A query whose loaded/unloaded ratio matches
  * the band's other members (~4x at 16 spinners on 32 cores) is being
  * amplified by the environment, not regressing; the committed NOTES
  * carry the readout.
  *
  * Round-15 closed the residual with the `prefix` mode (replay the
  * timed loop's full alphabetic prefix first, then time the target
  * under the real sweep's accumulated JVM state): q206 reproduced the
  * driver band exactly — first two runs 11.96/12.68 s (agreeing within
  * 30%, so the bench's adaptive loop stops), third run 4.71 s — and
  * `prefixgc` (a forced full GC + settle between prefix and timing)
  * restored 5.58/3.72 s directly. Named cause: GC DEBT — the prefix's
  * accumulated old-gen garbage is collected inside the first big
  * allocating runs. Targeted fix: Bench's >2 s third-run insurance.
  */
object DriverSim {

  private def loadAvg: Double = graft.HarnessSession.loadAvg

  /** Locale-stable 2/1-dp formatting: the emitted line is JSON, and the
    * f-interpolator follows the default locale (a comma decimal
    * separator would corrupt it — the Bench.scala lesson). */
  private def fmt(v: Double, dp: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))

  /** `burst` mode (round-17 verdict item 5): field-test the hardened
    * bench retry gate end-to-end against a REAL synthetic burst instead
    * of letting the driver be its first engagement. Runs a subset sweep
    * under the bench measurement shape (min-of-2, loadavg sampled
    * around each query), injects CPU spinners over the sweep's TAIL
    * window (the r15/r16 contamination shape: a burst covering the last
    * queries and, without the settle, the retry pass too), kills them
    * at sweep end, then hands the readings to the PRODUCTION
    * [[graft.Bench.retryPass]] with the real environment (re-run
    * closure, real 1-min loadavg, real sleep). The emitted line carries
    * pre-retry and post-retry per-query times against the committed
    * self baseline plus the suspect list — success = every burst-hit
    * query recovers to ~self and `suspect` is empty.
    *
    *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt \
    *     "runMain graft.tools.DriverSim burst q01_...,q206_...,... 16 4"
    *                                          ^subset csv  ^spinners ^tailN
    */
  private def runBurst(args: Array[String]): Unit = {
    val namesArg = args.lift(1).getOrElse(
      sys.error("burst mode needs a comma-separated query subset"))
    val spinners = args.lift(2).map(_.toInt).getOrElse(16)
    val names = namesArg.split(',').map(_.trim).filter(_.nonEmpty).toSeq.sorted
    val tailN = args.lift(3).map(_.toInt).getOrElse(names.size)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.HarnessSession.create()
    // bench-identical warm: corpus scan + each subset query at sf0.001
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    graft.HarnessSession.warmDir(sfDir).foreach { wd =>
      names.foreach { n =>
        try graft.SparkEntry.queries(n)(spark, wd).count()
        catch { case _: Throwable => () }
        finally spark.catalog.clearCache()
      }
    }
    val (mvSecs, _, _) = graft.sources.MVWarm.warmAll(spark, sfDir)
    spark.catalog.clearCache()
    val self = graft.Bench.selfBaseline(sfDir = Some(sfDir))
    System.err.println(s"burst: baseline ${self.size} queries; " +
      s"spinners=$spinners over the last $tailN of ${names.size}")
    @volatile var spinning = true
    var threads = Seq.empty[Thread]
    def igniteBurst(): Unit = {
      threads = (0 until spinners).map { i =>
        val t = new Thread(() => {
          var x = 1.0
          while (spinning) { x = math.sqrt(x + 1.0); if (x > 1e12) x = 1.0 }
        }, s"driversim-burst-$i")
        t.setDaemon(true)
        t.start()
        t
      }
      System.err.println(
        s"burst: $spinners spinners IGNITED (loadavg ${fmt(loadAvg, 1)})")
    }
    def timeOnce(n: String): Option[Double] = {
      val t0 = System.nanoTime()
      try { graft.SparkEntry.queries(n)(spark, sfDir).count()
        Some((System.nanoTime() - t0) / 1e9) }
      catch { case _: Throwable => None }
      finally spark.catalog.clearCache()
    }
    val burstAt = math.max(0, names.size - tailN)
    val readings = names.zipWithIndex.map { case (n, i) =>
      if (i == burstAt) igniteBurst()
      val l0 = loadAvg
      // bench shape: min-of-2, both raw timings kept
      val raws = (1 to 2).flatMap(_ => timeOnce(n))
      // -1.0 sentinel, not NaN: a query failing both runs (bad name,
      // sf-scale crash) must not corrupt the emitted JSON line -- the
      // artifact is the whole point of the run (round-19 review); the
      // reading also carries ok=false so the gate never retries it
      val official = if (raws.nonEmpty) raws.min else -1.0
      graft.Bench.Reading(n, official, raws.size == 2,
        math.max(l0, loadAvg), raws)
    }
    // sweep ends; the burst dies HERE — the settle's whole job is to
    // outwait the 1-min loadavg lag this leaves behind
    spinning = false
    threads.foreach(_.join(1000))
    System.err.println(
      s"burst: spinners killed at sweep end (loadavg ${fmt(loadAvg, 1)})")
    val pre = readings.map(r => r.name -> r.official).toMap
    val (out, suspects) = graft.Bench.retryPass(readings, self,
      n => timeOnce(n), () => loadAvg, ms => Thread.sleep(ms))
    def m(vals: Seq[(String, Double)]): String =
      vals.map { case (k, v) => s"\"$k\":${fmt(v, 2)}" }.mkString("{", ",", "}")
    val sus = suspects.map(x =>
      s"""{"q":"${x.name}","official":${fmt(x.official, 2)},"self":${fmt(x.self, 2)}}""")
      .mkString("[", ",", "]")
    val recovered = out.filter { r =>
      self.get(r.name).exists(sv =>
        pre(r.name) > sv * 1.5 && r.official <= sv * 1.5)
    }.map(_.name)
    val json =
      s"""{"tool":"driversim-burst","spinners":$spinners,"tail_n":$tailN,""" +
      s""""mv_prewarm_secs":$mvSecs,"baseline_n":${self.size},""" +
      s""""pre":${m(readings.map(r => r.name -> r.official))},""" +
      s""""post":${m(out.map(r => r.name -> r.official))},""" +
      s""""self":${m(names.flatMap(n => self.get(n).map(n -> _)))},""" +
      s""""recovered":${recovered.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      s""""suspect":$sus,"sf":"$sfDir"}"""
    println(json)
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q206_cf_holdout_precision")
    if (name == "burst") { runBurst(args); return }
    // "16" = 16 CPU spinners; "16m" = 16 memory-bandwidth walkers (each
    // strides a 256 MB array — the shape of ANOTHER Spark JVM's shuffle
    // traffic on a shared host, which contends for LLC/memory bus where
    // a sqrt spinner only contends for cycles); "prefix" = IN-SWEEP
    // replay (round-14 verdict item 1): before timing the target, run
    // every alphabetically-PRIOR registered query once at the target SF
    // exactly like the bench's timed loop does (same name-asc order,
    // same clearCache teardown), so the target is measured under the
    // real sweep's accumulated JVM state — codegen cache population,
    // broadcast/GC pressure, C2 profile pollution — instead of a
    // fresh-session best case. The remaining driver/self residual, if
    // it reproduces here, is in-sweep state; if it does not, it is
    // ambient container load by measurement rather than elimination.
    // "prefixgc" additionally forces a full GC + a context-cleaner
    // settling pause between the prefix and the timed runs — if that
    // alone restores the fresh-session time, the in-sweep residual is
    // accumulated-garbage GC pressure / cleaner backlog, not plan state
    val spinArg = args.lift(1).getOrElse("0")
    val prefixReplay = spinArg.startsWith("prefix")
    val prefixGc = spinArg == "prefixgc"
    val memLoad = spinArg.endsWith("m")
    val spinners = if (prefixReplay) 0 else spinArg.stripSuffix("m").toInt
    val runs = args.lift(2).map(_.toInt).getOrElse(4)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = graft.HarnessSession.cpus
    // session identical to Bench.main's BY CONSTRUCTION (shared recipe)
    val spark = graft.HarnessSession.create()
    val fn = graft.SparkEntry.queries(name)
    // bench-identical warm: corpus scan + the query once at sf0.001
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val warmDir = graft.HarnessSession.warmDir(sfDir)
    // prefix mode warms EVERY query at sf0.001 (the bench's exact warm
    // pass); point mode warms just the target
    val warmNames =
      if (prefixReplay) graft.SparkEntry.queries.keys.toSeq.sorted
      else Seq(name)
    warmDir.foreach { wd =>
      warmNames.foreach { n =>
        try graft.SparkEntry.queries(n)(spark, wd).count()
        catch { case _: Throwable => () }
        finally spark.catalog.clearCache()
      }
    }
    val (mvSecs, _, mvFound) = graft.sources.MVWarm.warmAll(spark, sfDir)
    spark.catalog.clearCache()
    // in-sweep replay: the timed loop's alphabetic prefix, one run per
    // query (state accumulation, not statistics), at the TARGET SF
    val prefixNames =
      if (prefixReplay)
        graft.SparkEntry.queries.keys.toSeq.sorted.takeWhile(_ < name)
      else Seq.empty
    val prefixT0 = System.nanoTime()
    prefixNames.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, sfDir).count()
      catch { case _: Throwable => () }
      finally spark.catalog.clearCache()
      // the timed loop now sheds GC debt between queries; the replay
      // must mirror the protocol it reproduces
      graft.HarnessSession.teardownGc()
    }
    val prefixSecs = (System.nanoTime() - prefixT0) / 1e9
    if (prefixReplay) System.err.println(
      s"prefix: ${prefixNames.size} queries in ${fmt(prefixSecs, 1)} s " +
      s"(loadavg ${fmt(loadAvg, 1)})")
    if (prefixGc) {
      System.gc(); Thread.sleep(2000); System.gc(); Thread.sleep(2000)
      System.err.println(s"prefixgc: forced 2x full GC + 4 s settle")
    }
    // synthetic ambient load: plain busy-spin daemons, the shape of
    // other containers' compute on a shared host
    @volatile var spinning = true
    val threads = (0 until spinners).map { i =>
      val t = new Thread(() => {
        if (memLoad) {
          val arr = new Array[Long](32 << 20) // 256 MB per walker
          var idx = i.toLong
          var acc = 0L
          while (spinning) {
            idx = (idx * 6364136223846793005L + 1442695040888963407L)
            val j = ((idx >>> 17) % arr.length).toInt
            acc += arr(j); arr(j) = acc
          }
        } else {
          var x = 1.0
          while (spinning) { x = math.sqrt(x + 1.0); if (x > 1e12) x = 1.0 }
        }
      }, s"driversim-spin-$i")
      t.setDaemon(true)
      t.start()
      t
    }
    try {
      // let loadavg climb toward the spinner count before timing
      if (spinners > 0) Thread.sleep(30000)
      val times = (1 to runs).map { i =>
        val l0 = loadAvg
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count()
        finally spark.catalog.clearCache()
        val sec = (System.nanoTime() - t0) / 1e9
        System.err.println(
          s"run $i: ${fmt(sec, 2)} s (loadavg ${fmt(math.max(l0, loadAvg), 1)})")
        (sec, math.max(l0, loadAvg))
      }
      val secs = times.map(_._1)
      val json =
        s"""{"tool":"driversim","query":"$name","spinners":$spinners,""" +
        s""""load_kind":"${if (prefixGc) "prefix-replay-gc"
          else if (prefixReplay) "prefix-replay"
          else if (memLoad) "memwalk" else "cpu"}",""" +
        (if (prefixReplay)
          s""""prefix_n":${prefixNames.size},"prefix_secs":${fmt(prefixSecs, 1)},"""
         else "") +
        s""""cpus":$cpus,"mv_prewarm_secs":$mvSecs,""" +
        s""""mv_found_n":${mvFound.size},""" +
        s""""runs":${secs.map(fmt(_, 2)).mkString("[", ",", "]")},""" +
        s""""min":${fmt(secs.min, 2)},""" +
        s""""loadavg":${times.map(t => fmt(t._2, 1)).mkString("[", ",", "]")},""" +
        s""""sf":"$sfDir"}"""
      println(json)
    } finally spinning = false
    spark.stop()
  }
}
