package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, ListState, MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Typed event record for the streaming API (mirrors the events table;
  * ts is an epoch-µs long exactly like Tables.events.ts_us). */
final case class Event(event_id: Long, ts_us: Long, user_id: Long,
    event_type: String, value: Double)

/** Per-user running aggregate emitted by the stateful stream. */
final case class UserRunning(user_id: Long, n_events: Long, sum_value: Double)

/** Open-session state carried between triggers by the session tracker. */
final case class SessionState(start_us: Long, last_us: Long, n_events: Long)

/** A closed session emitted once its idle gap expires. */
final case class ClosedSession(user_id: Long, start_us: Long, end_us: Long,
    n_events: Long)

/** Per-user feature state carried by the online feature computer. */
final case class PitState(n_clicks: Long, n_views: Long, n_events: Long,
    last_val: Double, has_last: Boolean)

/** One point-in-time feature row emitted at a purchase (label) event. */
final case class PitFeature(event_id: Long, user_id: Long, prior_clicks: Long,
    prior_views: Long, prior_events: Long, last_val: Option[Double])

/** One closed day in the anomaly monitor's trailing baseline. */
final case class DayCount(day: Long, n: Long)

/** A closed day's anomaly verdict (day = epoch day; z NULL during
  * warm-up / zero-variance baselines, exactly like batch q120). */
final case class DayAnomaly(event_type: String, day: Long, n: Long,
    baseline_mean: Option[Double], z: Option[Double], anomaly: Int)

/** Structured Streaming surface (SURVEY.md §2.8): the same event-time
  * semantics as the batch EventTime operators, expressed on unbounded
  * input. The driver harness is batch-only, so these are exercised by
  * StreamingSpec via MemoryStream; the transforms are source-agnostic —
  * `spark.readStream.parquet/kafka → transform → writeStream` at scale.
  *
  * Scale notes: tumbling/sliding aggregation state is bounded by the
  * watermark horizon (late data beyond 1 day is dropped and state
  * evicted); the stateful running aggregate keeps O(users) state,
  * partitioned by the groupBy key across executors.
  */
object EventStream {

  /** Streaming form of q18 (tumbling daily counts): event-time window +
    * watermark. Works identically on a batch DataFrame. */
  def tumblingDaily(events: DataFrame): DataFrame =
    events
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
      .withWatermark("ts_t", "1 day")
      .groupBy(window(col("ts_t"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").cast("date").as("day"), col("event_type"),
        col("n"), col("sum_value"))

  /** Stream ⋈ STATIC dimension enrichment — the lookup-join shape every
    * event pipeline runs in front of its sinks: purchases stream in,
    * the customer→nation dimension is a BATCH table, revenue aggregates
    * per (day, nation). The static side is re-planned each micro-batch
    * (so a refreshed dimension snapshot is picked up) and broadcast, so
    * the unbounded side never shuffles for the join — at 100 TB/day the
    * stream stays partition-local until the windowed aggregate, whose
    * state is bounded by the watermark horizon × nation cardinality.
    * `dim` must carry (user_id, nation). Works identically on a batch
    * DataFrame (StreamingSpec proves the parity). */
  def enrichedDailyNationRevenue(events: DataFrame, dim: DataFrame): DataFrame =
    events
      .select(timestamp_micros(col("ts_us")).as("ts_t"), col("user_id"),
        col("event_type"), col("value"))
      .withWatermark("ts_t", "1 day")
      .filter(col("event_type") === "purchase")
      .join(broadcast(dim), Seq("user_id"))
      .groupBy(window(col("ts_t"), "1 day").as("w"), col("nation"))
      // decimal-accumulated sum (det.dsum discipline): a plain double
      // sum is accumulation-order-dependent, and the batch/stream parity
      // gate asserts exact row equality — the micro-batch and batch
      // plans partition differently, so the sum must be order-free
      .agg(count(lit(1)).as("n_purchases"),
        graft.functions.det.dsum(col("value")).as("revenue"))
      .select(col("w.start").cast("date").as("day"), col("nation"),
        col("n_purchases"), col("revenue"))

  /** Stateful per-user running aggregate via mapGroupsWithState — the
    * "user reduce fn with state across triggers" that a MapReduce-style
    * system cannot express without an external store. */
  def runningUserCounts(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
          val (n, sv) = batch.foldLeft((prev.n_events, prev.sum_value)) {
            case ((c, s), e) => (c + 1, s + e.value)
          }
          val next = UserRunning(userId, n, sv)
          state.update(next)
          next
      }
  }

  /** Custom sessionization via flatMapGroupsWithState: sessions close on
    * a 30-minute idle gap OR explicitly on a "signup" event — per-key
    * logic session_window can't express. State is one SessionState per
    * open session, flushed by an EVENT-TIME timeout set to last event +
    * gap: a session closes exactly when the watermark passes its idle
    * horizon, so emitted sessions depend on event time alone (matching
    * the batch island method), never on trigger/arrival wall-clock
    * timing the way a processing-time timeout would. State stays
    * bounded by concurrently-active users inside the watermark horizon.
    * Emits 0..N closed sessions per key per trigger (the flatMap part). */
  def trackedSessions(events: Dataset[Event]): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapUs = 30L * 60 * 1000000
    events
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
      .withWatermark("ts_t", "1 hour")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(userId, s.start_us, s.last_us, s.n_events))
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts_us, e.event_id))
            val closed = Seq.newBuilder[ClosedSession]
            var open = state.getOption
            sorted.foreach { e =>
              open match {
                case Some(s) if e.ts_us - s.last_us > gapUs =>
                  closed += ClosedSession(userId, s.start_us, s.last_us, s.n_events)
                  open = Some(SessionState(e.ts_us, e.ts_us, 1))
                case Some(s) =>
                  open = Some(SessionState(s.start_us, e.ts_us, s.n_events + 1))
                case None =>
                  open = Some(SessionState(e.ts_us, e.ts_us, 1))
              }
              // domain rule session_window can't express: signup ends the
              // session immediately
              if (e.event_type == "signup") {
                open.foreach(s =>
                  closed += ClosedSession(userId, s.start_us, s.last_us, s.n_events))
                open = None
              }
            }
            open match {
              case Some(s) =>
                state.update(s)
                // close when the WATERMARK passes last_us + gap (ms
                // granularity); clamp above the current watermark —
                // Spark rejects a timeout at-or-before it
                state.setTimeoutTimestamp(math.max(
                  s.last_us / 1000 + gapUs / 1000,
                  state.getCurrentWatermarkMs() + 1))
              case None => if (state.exists) state.remove()
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming exact-dedup on event_id with bounded state: the watermark
    * lets Spark evict seen-keys older than the horizon, so state is
    * O(events per hour), not O(all events ever) — the streaming twin of
    * q21's hash-dedup and the standard shape for at-least-once ingestion
    * (replayed events inside the horizon are dropped exactly). */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
      .withWatermark("ts_t", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming rate limiter: first event per (user, type, hour) — the
    * online twin of q173's batch throttle accounting.
    * dropDuplicatesWithinWatermark on the throttle key keeps exactly
    * the first ARRIVAL per group. Under a globally (ts_us, event_id)-
    * ordered single-partition replay — what StreamingSpec constructs —
    * first arrival IS the batch rank-1 row, so the kept sets match
    * row-for-row; in production, out-of-order delivery or same-key
    * events racing within one micro-batch may keep a non-rank-1 event
    * (arrival order, not event-time order, decides). Throttle-key
    * state evicts an hour past the watermark — O(groups per horizon),
    * not O(all groups ever). */
  def throttleEvents(events: DataFrame): DataFrame =
    events
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
      .withColumn("hr", expr("ts_us div 3600000000"))
      .withWatermark("ts_t", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "hr")

  /** Watermarked STREAM-STREAM inner join — the streaming twin of the
    * batch range join (q41): each purchase matched to the same user's
    * clicks in the preceding hour — the half-open interval (p−1h, p],
    * exactly q41's bounds, so a MemoryStream replay of the fixture
    * reproduces q41's per-purchase counts row-for-row (StreamingSpec
    * asserts this parity). Both sides carry a watermark and the
    * join condition bounds event time on both ends, so Spark derives a
    * state-eviction horizon for each side: buffered rows older than
    * watermark − range are dropped, keeping state O(events per hour)
    * per side instead of unbounded — the property that makes
    * stream-stream joins deployable at 100 TB/day. */
  def clicksBeforePurchases(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .withColumn("c_ts", timestamp_micros(col("ts_us")))
      .withWatermark("c_ts", "1 hour")
      .select(col("event_id").as("click_id"), col("user_id").as("c_uid"),
        col("c_ts"), col("ts_us").as("c_us"))
    val p = purchases
      .withColumn("p_ts", timestamp_micros(col("ts_us")))
      .withWatermark("p_ts", "1 hour")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("p_ts"), col("ts_us").as("p_us"))
    p.join(c,
        col("user_id") === col("c_uid") &&
          col("c_ts") > col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        (col("p_us") - col("c_us")).as("gap_us"))
  }

  /** [[runningUserCounts]] on the arbitrary-state v2 API
    * (`transformWithState`, new in Spark 4): identical semantics, but
    * state lives in NAMED typed handles (`ValueState`) on the RocksDB
    * state store, with per-state TTL available via [[TTLConfig]] — the
    * API a production pipeline uses when one operator needs several
    * independent state variables (counters, timers, seen-sets) with
    * different retention, which mapGroupsWithState can only fake by
    * packing everything into one case class. StreamingSpec asserts
    * batch-for-batch equality with the v1 operator. */
  class RunningCountsProcessor
      extends StatefulProcessor[Long, Event, UserRunning] {
    @transient private var running: ValueState[UserRunning] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      running = getHandle.getValueState[UserRunning]("running",
        org.apache.spark.sql.Encoders.product[UserRunning], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[UserRunning] = {
      val prev = Option(running.get()).getOrElse(UserRunning(key, 0L, 0.0))
      val (n, sv) = rows.foldLeft((prev.n_events, prev.sum_value)) {
        case ((c, s), e) => (c + 1, s + e.value)
      }
      val next = UserRunning(key, n, sv)
      running.update(next)
      Iterator.single(next)
    }
  }

  /** The ONLINE form of batch q120's daily volume anomaly monitor, and
    * the showcase for transformWithState's MULTIPLE NAMED STATE
    * VARIABLES — the capability the v1 API can only fake by packing one
    * case class: per event_type, a `MapState[day, count]` accumulates
    * the open (not-yet-watermark-closed) days, and a `ListState
    * [DayCount]` carries the trailing ≤ 7 CLOSED days that form the
    * z-score baseline. When the watermark passes a day's end (+1 day
    * allowed lateness, mirroring the batch job's daily grain), the day
    * closes in ascending order: its z is computed from the tail with
    * EXACTLY the batch arithmetic (cnt==7 gate, integer Σn/Σn², the
    * same IEEE expression order, 4-dp round), the row is emitted, the
    * tail advances, and the map entry is evicted — so state is O(open
    * days + 7) per type, bounded by the watermark horizon. StreamingSpec
    * replays the fixture chronologically and asserts every emitted
    * verdict equals batch q120's row for that (type, day) — the
    * monitor a pipeline runs continuously, proved consistent with the
    * one it runs in backfill. */
  class DailyAnomalyProcessor
      extends StatefulProcessor[String, Event, DayAnomaly] {
    @transient private var open: MapState[Long, Long] = _
    @transient private var tail: ListState[DayCount] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getMapState[Long, Long]("open",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
      tail = getHandle.getListState[DayCount]("tail",
        org.apache.spark.sql.Encoders.product[DayCount], TTLConfig.NONE)
    }
    private def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    /** Close every open day the watermark has passed (its end plus one
      * day of allowed lateness — the daily-grain analog of the 1-hour
      * horizons the other operators use), ascending. Idempotent: closed
      * days leave the map, so the input path and the timer path can both
      * call this without double-emitting. */
    private def closeDays(key: String, watermarkMs: Long): Iterator[DayAnomaly] = {
      val wmDay = watermarkMs / 86400000L - 1
      val closing = open.keys().filter(_ < wmDay).toSeq.sorted
      val out = Seq.newBuilder[DayAnomaly]
      closing.foreach { day =>
        val n = open.getValue(day)
        val t = tail.get().toSeq
        val cnt = t.length
        val s1 = t.map(_.n).sum
        val s2 = t.map(d => d.n * d.n).sum
        val z = if (cnt == 7 && s2 * cnt > s1 * s1)
          Some(round4((n - s1.toDouble / cnt) /
            math.sqrt((s2.toDouble - s1.toDouble * s1 / cnt) / cnt)))
        else None
        out += DayAnomaly(key, day, n,
          if (cnt > 0) Some(round4(s1.toDouble / cnt)) else None,
          z, if (z.exists(v => math.abs(v) >= 2.0)) 1 else 0)
        tail.put((t :+ DayCount(day, n)).takeRight(7).toArray)
        open.removeKey(day)
      }
      out.result().iterator
    }
    override def handleInputRows(key: String, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[DayAnomaly] = {
      // Per-batch delta accumulation (round-17, guide §1.2 "per-task
      // work"): the per-row form did TWO RocksDB point-lookups plus one
      // put PER EVENT (measured at sf0.1: 100k gets + 50k puts in the
      // first micro-batch — allUpdatesTimeMs 1.4 s of the batch's 1.5 s
      // addBatch). A micro-batch delivers each key's rows as one
      // iterator, so the day counts fold into a local map first and
      // MapState is touched once per DISTINCT (key, day): same final
      // map values, and the close-timer condition (cur == 0, i.e. the
      // day was absent when its first event arrived) fires for exactly
      // the same (key, day) set — state I/O now scales with open days,
      // not event volume.
      val delta = scala.collection.mutable.LongMap.empty[Long]
      rows.foreach { e =>
        val day = e.ts_us / 86400000000L
        delta.update(day, delta.getOrElse(day, 0L) + 1L)
      }
      delta.toSeq.sortBy(_._1).foreach { case (day, add) =>
        val cur = if (open.containsKey(day)) open.getValue(day) else 0L
        // first event of a day registers its closure timer, so the day
        // closes when the WATERMARK passes — even if this type never
        // receives another event (a per-key input would otherwise be the
        // only close trigger, and a quiet type would hold its verdicts
        // forever); the clamp keeps an already-passed horizon legal
        if (cur == 0L)
          getHandle.registerTimer(math.max((day + 2) * 86400000L,
            timerValues.getCurrentWatermarkInMs() + 1))
        open.updateValue(day, cur + add)
      }
      closeDays(key, timerValues.getCurrentWatermarkInMs())
    }
    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[DayAnomaly] =
      closeDays(key, timerValues.getCurrentWatermarkInMs())
  }

  /** [[trackedSessions]] on the v2 API with REAL TIMERS: the open
    * session lives in a named ValueState, and instead of
    * mapGroupsWithState's single implicit timeout slot the processor
    * `registerTimer`s the session's idle horizon explicitly (deleting
    * the stale timer when new activity extends the session) and closes
    * it in `handleExpiredTimer` when the watermark crosses — the v2
    * timer surface (register/delete/expire) exercised end to end.
    * Session semantics are IDENTICAL to the v1 operator (30-min gap,
    * signup closes immediately); StreamingSpec replays the same input
    * through both and asserts equal closed-session sets. */
  class SessionTimerProcessor
      extends StatefulProcessor[Long, Event, ClosedSession] {
    @transient private var open: ValueState[SessionState] = _
    private val gapUs = 30L * 60 * 1000000
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[SessionState]("open",
        org.apache.spark.sql.Encoders.product[SessionState], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[ClosedSession] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
      val closed = Seq.newBuilder[ClosedSession]
      var cur = Option(open.get())
      def dropTimer(): Unit =
        cur.foreach(s => getHandle.deleteTimer(s.last_us / 1000 + gapUs / 1000))
      sorted.foreach { e =>
        cur match {
          case Some(s) if e.ts_us - s.last_us > gapUs =>
            closed += ClosedSession(key, s.start_us, s.last_us, s.n_events)
            dropTimer()
            cur = Some(SessionState(e.ts_us, e.ts_us, 1))
          case Some(s) =>
            dropTimer()
            cur = Some(SessionState(s.start_us, e.ts_us, s.n_events + 1))
          case None =>
            cur = Some(SessionState(e.ts_us, e.ts_us, 1))
        }
        if (e.event_type == "signup") {
          cur.foreach(s =>
            closed += ClosedSession(key, s.start_us, s.last_us, s.n_events))
          dropTimer()
          cur = None
        }
      }
      cur match {
        case Some(s) =>
          open.update(s)
          getHandle.registerTimer(math.max(s.last_us / 1000 + gapUs / 1000,
            timerValues.getCurrentWatermarkInMs() + 1))
        case None => open.clear()
      }
      closed.result().iterator
    }
    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] =
      Option(open.get()) match {
        // staleness guard: a timer registered before the session was
        // extended carries an expiry below the CURRENT idle horizon —
        // ignore it (the extension registered the live timer); a
        // watermark-clamped timer at-or-past the horizon is legitimate
        case Some(s)
            if expiredTimerInfo.getExpiryTimeInMs >=
              s.last_us / 1000 + gapUs / 1000 =>
          open.clear()
          Iterator.single(ClosedSession(key, s.start_us, s.last_us, s.n_events))
        case _ => Iterator.empty
      }
  }

  /** [[SessionTimerProcessor]] wired like [[trackedSessions]]. */
  def trackedSessionsV2(events: Dataset[Event]): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
      .withWatermark("ts_t", "1 hour")
      .as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** [[DailyAnomalyProcessor]] wired to a watermarked typed stream. */
  def dailyAnomalies(events: Dataset[Event]): Dataset[DayAnomaly] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
      .withWatermark("ts_t", "1 hour")
      .as[Event]
      .groupByKey(_.event_type)
      .transformWithState(new DailyAnomalyProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** The v2-API twin of [[runningUserCounts]]; requires the RocksDB
    * state store provider (transformWithState's backing contract). */
  def runningUserCountsV2(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningCountsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** The ONLINE form of batch q140's point-in-time feature snapshot: one
    * PitState per user accumulates click/view/total counts and the last
    * value; every purchase emits the state AS IT STOOD strictly before
    * the purchase — the online/offline feature-parity contract
    * (StreamingSpec replays the full fixture through this and asserts
    * row-for-row equality with batch q140, the audit every feature
    * store owes its training pipeline). Events are applied in
    * (event-time, event_id) order within each trigger; like the session
    * tracker above, cross-trigger correctness assumes per-user
    * event-time-ordered delivery inside the watermark horizon — a
    * production deployment buffers out-of-order rows in state and
    * flushes on an event-time timeout (the trackedSessions mechanism),
    * trading emission latency for disorder tolerance. State is one
    * fixed-size record per user, hash-spread across executors. */
  def pitFeatures(events: Dataset[Event]): Dataset[PitFeature] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[PitState, PitFeature](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[PitState]) =>
          var st = state.getOption.getOrElse(PitState(0L, 0L, 0L, 0.0, false))
          val out = Seq.newBuilder[PitFeature]
          batch.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            if (e.event_type == "purchase")
              out += PitFeature(e.event_id, userId, st.n_clicks, st.n_views,
                st.n_events, if (st.has_last) Some(st.last_val) else None)
            st = PitState(
              st.n_clicks + (if (e.event_type == "click") 1L else 0L),
              st.n_views + (if (e.event_type == "view") 1L else 0L),
              st.n_events + 1L, e.value, has_last = true)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Streaming session windows via the built-in session_window generator
    * (30-min gap) — the streaming twin of q20's island method. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
      .withWatermark("ts_t", "1 hour")
      .groupBy(session_window(col("ts_t"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("w.start")).as("start_us"),
        unix_micros(col("w.end")).as("end_us"), col("n_events"))
}
