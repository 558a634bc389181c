package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.sources.Tables
import graft.functions.det._

/** Temporal analytics the event-history side of a training-data pipeline
  * needs: rolling-window distinct actives (WAU-style engagement), SCD2
  * gaps-and-islands state intervals (the temporal-dimension build), and
  * a point-in-time feature snapshot (the feature-store join that must
  * never leak the future).
  *
  * Shared determinism discipline: every window orders by (ts_us,
  * event_id) — `ts_us` is the exact integer microsecond both engines
  * agree on (`Tables.events` reads the ns parquet as int64 and divides;
  * the oracle uses `epoch_us(ts)`), and `event_id` breaks ts ties, so
  * island boundaries and lag/lead frames are identical under any
  * partitioning on either engine.
  */
object Temporal {

  // ---------------------------------------------------------------------
  // q132 — rolling 7-day distinct actives per event type
  // ---------------------------------------------------------------------

  /** Distinct users per (event_type, day) over the trailing 7 days
    * [day−6, day] — the WAU/rolling-engagement curve. COUNT(DISTINCT)
    * over a sliding window has no direct window-function form (distinct
    * must dedupe ACROSS the frame), and the naive per-day self-join over
    * raw events is O(rows × 7). Scale shape instead: (1) reduce the
    * stream map-side to the distinct (type, day, user) triples — the
    * only information the metric needs, orders of magnitude smaller
    * than the event stream; (2) fan each triple out to the ≤ 7 target
    * days it contributes to with a static `explode(sequence(0,6))` —
    * bounded map-side fan-out, never an inequality join (no
    * BroadcastNestedLoopJoin, plan-asserted); (3) semi-join the tiny
    * observed-day dimension (broadcast) so only real days report; (4)
    * one hash aggregate with two COUNT(DISTINCT)s. Every step is an
    * equi-shuffle on bounded keys — the same plan runs on 1000
    * executors with the day dimension still broadcast. */
  private val q132 = QueryDef(
    "q132_rolling_7d_actives",
    "rolling 7-day distinct active users per event type (WAU curve)",
    Some("""
      WITH du AS (SELECT DISTINCT event_type,
                         CAST(date_trunc('day', ts) AS DATE) AS uday, user_id
                  FROM events),
      d AS (SELECT DISTINCT uday AS day FROM du),
      fan AS (SELECT event_type, uday, user_id, uday + i AS day
              FROM du CROSS JOIN (SELECT unnest([0,1,2,3,4,5,6]) AS i))
      SELECT event_type, day,
             COUNT(DISTINCT user_id) AS active_users_7d,
             COUNT(DISTINCT uday) AS days_covered
      FROM fan JOIN d USING (day)
      GROUP BY event_type, day
      ORDER BY event_type, day"""),
    (s, dir) => {
      val du = Tables.events(s, dir)
        .select(col("event_type"),
          to_date(timestamp_micros(col("ts_us"))).as("uday"), col("user_id"))
        .distinct()
      val days = du.select(col("uday").as("day")).distinct()
      du.select(col("event_type"), col("uday"), col("user_id"),
          explode(sequence(lit(0), lit(6))).as("i"))
        .select(col("event_type"), col("uday"), col("user_id"),
          date_add(col("uday"), col("i")).as("day"))
        .join(broadcast(days), "day")
        .groupBy("event_type", "day")
        .agg(countDistinct(col("user_id")).as("active_users_7d"),
          countDistinct(col("uday")).as("days_covered"))
        .orderBy("event_type", "day")
    })

  // ---------------------------------------------------------------------
  // q133 — SCD2 state intervals (gaps-and-islands temporal dimension)
  // ---------------------------------------------------------------------

  /** Each user's event_type stream collapsed into SCD2-style state
    * intervals: consecutive same-type events merge into one island
    * (change rows = `type ≠ lag(type)`), each island's validity runs
    * from its first event to the next island's start (`lead`), the last
    * island per user stays open (NULL valid_to) — the standard temporal-
    * dimension build from a change stream. Reported per state: interval
    * count, open count, mean/max closed duration in days (day-granular
    * datediff — integer on both engines; [[davgNN]] excludes the open
    * intervals the way SQL AVG drops NULLs).
    *
    * Scale: both windows partition by user_id — per-user histories are
    * bounded and hash-spread, nothing ever total-orders; the aggregate
    * is a 5-row hash agg. This is the island form of q20's session
    * windows with state identity instead of a time gap as the boundary
    * predicate. */
  private val q133 = QueryDef(
    "q133_user_state_intervals",
    "SCD2 gaps-and-islands: per-state interval counts + durations",
    Some(s"""
      WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
                 FROM events),
      c AS (SELECT user_id, event_id, ts_us, event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts_us, event_id) AS prev_type
            FROM e),
      ch AS (SELECT user_id, event_id, ts_us, event_type FROM c
             WHERE prev_type IS NULL OR prev_type <> event_type),
      iv0 AS (SELECT event_type, ts_us,
                     lead(ts_us) OVER (PARTITION BY user_id
                                       ORDER BY ts_us, event_id) AS vto_us
              FROM ch),
      iv AS (SELECT event_type AS state,
                    CAST(date_diff('day',
                      CAST(make_timestamp(ts_us) AS DATE),
                      CAST(make_timestamp(vto_us) AS DATE)) AS BIGINT) AS dur_days
             FROM iv0)
      SELECT state, COUNT(*) AS n_intervals,
             COUNT(CASE WHEN dur_days IS NULL THEN 1 END) AS n_open,
             ${davgNNSql("CAST(dur_days AS DOUBLE)")} AS mean_days,
             MAX(dur_days) AS max_days
      FROM iv GROUP BY state ORDER BY state"""),
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val iv = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        .withColumn("vto_us", lead(col("ts_us"), 1).over(w))
        .select(col("event_type").as("state"),
          datediff(to_date(timestamp_micros(col("vto_us"))),
            to_date(timestamp_micros(col("ts_us")))).cast("long").as("dur_days"))
      iv.groupBy("state")
        .agg(count(lit(1)).as("n_intervals"),
          count(when(col("dur_days").isNull, 1)).as("n_open"),
          davgNN(col("dur_days").cast("double")).as("mean_days"),
          max(col("dur_days")).as("max_days"))
        .orderBy("state")
    })

  // ---------------------------------------------------------------------
  // q140 — point-in-time feature snapshot (feature-store join)
  // ---------------------------------------------------------------------

  /** For every purchase event, the user's feature vector AS OF strictly
    * before the purchase: prior click/view/total event counts and the
    * previous event's value — the point-in-time-correct feature join
    * that training pipelines need to avoid future leakage. Instead of
    * one as-of join per feature (N shuffles of the label stream), all
    * features ride ONE pass over the per-user history: conditional
    * running sums over `ROWS UNBOUNDED PRECEDING .. 1 PRECEDING` (the
    * strict-past frame IS the leakage guarantee) plus a lag, then a
    * filter to the label rows. Windows partition by user_id only —
    * bounded per-user history, no global sort (plan-asserted); at 100 TB
    * the same plan shuffles each user's history to one executor once,
    * which is the lower bound for any point-in-time semantics. */
  private val q140 = QueryDef(
    "q140_pit_feature_snapshot",
    "point-in-time per-user features (strict past) for each purchase",
    Some("""
      WITH h AS (
        SELECT event_id, user_id, ts, event_type, value,
               SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pc,
               SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
               COUNT(*)
                 OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe,
               lag(value) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS last_val
        FROM events)
      SELECT event_id, user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COALESCE(pc, 0) AS BIGINT) AS prior_clicks,
             CAST(COALESCE(pv, 0) AS BIGINT) AS prior_views,
             CAST(pe AS BIGINT) AS prior_events,
             last_val
      FROM h WHERE event_type = 'purchase'
      ORDER BY event_id"""),
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val wp = w.rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, dir)
        .withColumn("pc",
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).over(wp))
        .withColumn("pv",
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).over(wp))
        .withColumn("pe", count(lit(1)).over(wp))
        .withColumn("last_val", lag(col("value"), 1).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          to_date(timestamp_micros(col("ts_us"))).as("day"),
          coalesce(col("pc"), lit(0L)).as("prior_clicks"),
          coalesce(col("pv"), lit(0L)).as("prior_views"),
          col("pe").as("prior_events"),
          col("last_val"))
        .orderBy("event_id")
    })

  // ---------------------------------------------------------------------
  // q141 — last-touch attribution
  // ---------------------------------------------------------------------

  /** Every purchase attributed to the user's most recent PRIOR click's
    * campaign (campaign = the click's JSON props.k mod 5; purchases with
    * no prior click report campaign −1): per-campaign purchase counts
    * and exact-decimal attributed revenue. Same one-pass shape as q140 —
    * the carried campaign is `last(click campaign, ignoreNulls)` over
    * the strict-past frame, so attribution is a per-user window carry,
    * never a per-purchase as-of join (q10's shape done N times). The
    * −1 coalesce also dodges the engines' opposite NULL sort orders.
    * Windows partition by user_id only (plan-asserted with q133). */
  private val q141 = QueryDef(
    "q141_last_touch_attribution",
    "purchase revenue attributed to the latest prior click's campaign",
    Some(s"""
      WITH h AS (
        SELECT event_type, value,
               last_value(CASE WHEN event_type = 'click'
                               THEN CAST(props ->> 'k' AS BIGINT) % 5 END
                          IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS camp
        FROM events)
      SELECT COALESCE(camp, -1) AS campaign,
             COUNT(*) AS n_purchases,
             ${dsumSql("value")} AS attributed_revenue
      FROM h WHERE event_type = 'purchase'
      GROUP BY 1 ORDER BY campaign"""),
    (s, dir) => {
      val wp = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, dir)
        .withColumn("camp", last(
          when(col("event_type") === "click",
            get_json_object(col("props"), "$.k").cast("long") % 5),
          ignoreNulls = true).over(wp))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("camp"), lit(-1L)).as("campaign"))
        .agg(count(lit(1)).as("n_purchases"),
          dsum(col("value")).as("attributed_revenue"))
        .orderBy("campaign")
    })

  // ---------------------------------------------------------------------
  // q142 — event-type transition matrix (first-order Markov)
  // ---------------------------------------------------------------------

  /** The per-user next-event transition matrix: counts and conditional
    * probabilities P(next | current) over consecutive event pairs within
    * each user's stream — the first-order Markov model behind journey
    * simulation and anomaly scoring. One lead() per user (bounded
    * histories, hash-spread) then a 25-row hash aggregate; the
    * probability denominator joins back broadcast (event-type-domain
    * sized). P is a single IEEE divide of two exact longs, rounded
    * 6 dp on both engines. */
  private val q142 = QueryDef(
    "q142_event_transition_matrix",
    "first-order Markov transition counts + P(next|cur) over user streams",
    Some("""
      WITH t AS (
        SELECT event_type AS cur,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id) AS nxt
        FROM events),
      c AS (SELECT cur, nxt, COUNT(*) AS n FROM t
            WHERE nxt IS NOT NULL GROUP BY cur, nxt),
      d AS (SELECT cur, CAST(SUM(n) AS BIGINT) AS n_cur FROM c GROUP BY cur)
      SELECT c.cur, c.nxt, c.n,
             ROUND(CAST(c.n AS DOUBLE) / d.n_cur, 6) + 0.0 AS p
      FROM c JOIN d ON c.cur = d.cur
      ORDER BY c.cur, c.nxt"""),
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val c = Tables.events(s, dir)
        .select(col("event_type").as("cur"),
          lead(col("event_type"), 1).over(w).as("nxt"))
        .filter(col("nxt").isNotNull)
        .groupBy("cur", "nxt").agg(count(lit(1)).as("n"))
      val d = c.groupBy(col("cur").as("dcur")).agg(sum("n").as("n_cur"))
      c.join(broadcast(d), col("cur") === col("dcur"))
        .select(col("cur"), col("nxt"), col("n"),
          (round(col("n").cast("double") / col("n_cur"), 6) + lit(0.0)).as("p"))
        .orderBy("cur", "nxt")
    })

  // ---------------------------------------------------------------------
  // q145 — sequential time-bounded funnel
  // ---------------------------------------------------------------------

  /** The ORDERED funnel q63's min-time form cannot express: signup →
    * view STRICTLY AFTER the signup → purchase strictly after that view
    * AND within 7 days of the signup. Step timestamps chain through
    * three whole-partition window minima over the per-user stream
    * (su = first signup; vu = first view past su; pu = first purchase
    * past vu inside the horizon) — deliberately UNORDERED window frames,
    * so there is no tie hazard at all, and all three Window operators
    * plus the per-user collapse ride ONE exchange on user_id (same
    * partitioning — Catalyst reuses it, plan-asserted). The horizon is
    * exact integer µs arithmetic. Output: stage counts + conversion
    * rates — the activation metric as one row. */
  private val q145 = QueryDef(
    "q145_sequential_funnel",
    "signup -> view -> purchase-within-7d ordered funnel with strict sequencing",
    Some("""
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
      w1 AS (SELECT user_id, event_type, ts_us,
                    MIN(CASE WHEN event_type = 'signup' THEN ts_us END)
                      OVER (PARTITION BY user_id) AS su
             FROM e),
      w2 AS (SELECT *, MIN(CASE WHEN event_type = 'view' AND ts_us > su
                                THEN ts_us END)
                         OVER (PARTITION BY user_id) AS vu
             FROM w1),
      w3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts_us > vu
                                 AND ts_us <= su + 604800000000
                                THEN ts_us END)
                         OVER (PARTITION BY user_id) AS pu
             FROM w2),
      u AS (SELECT user_id, MAX(su) AS su, MAX(vu) AS vu, MAX(pu) AS pu
            FROM w3 GROUP BY user_id)
      SELECT COUNT(*) AS n_users, COUNT(su) AS n_signup,
             COUNT(vu) AS n_view_after, COUNT(pu) AS n_purchase_7d,
             ROUND(CAST(COUNT(vu) AS DOUBLE) / COUNT(su), 6) + 0.0 AS cvr_view,
             ROUND(CAST(COUNT(pu) AS DOUBLE) / COUNT(vu), 6) + 0.0 AS cvr_purchase,
             ROUND(CAST(COUNT(pu) AS DOUBLE) / COUNT(su), 6) + 0.0 AS cvr_overall
      FROM u"""),
    (s, dir) => {
      val wU = Window.partitionBy("user_id")
      val horizonUs = 7L * 86400L * 1000000L
      val u = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts_us"))
        .withColumn("su", min(when(col("event_type") === "signup",
          col("ts_us"))).over(wU))
        .withColumn("vu", min(when(col("event_type") === "view" &&
          col("ts_us") > col("su"), col("ts_us"))).over(wU))
        .withColumn("pu", min(when(col("event_type") === "purchase" &&
          col("ts_us") > col("vu") &&
          col("ts_us") <= col("su") + horizonUs, col("ts_us"))).over(wU))
        .groupBy("user_id")
        .agg(max("su").as("su"), max("vu").as("vu"), max("pu").as("pu"))
      u.agg(count(lit(1)).as("n_users"), count(col("su")).as("n_signup"),
          count(col("vu")).as("n_view_after"), count(col("pu")).as("n_purchase_7d"))
        .select(col("n_users"), col("n_signup"), col("n_view_after"),
          col("n_purchase_7d"),
          (round(col("n_view_after").cast("double") / col("n_signup"), 6)
            + lit(0.0)).as("cvr_view"),
          (round(col("n_purchase_7d").cast("double") / col("n_view_after"), 6)
            + lit(0.0)).as("cvr_purchase"),
          (round(col("n_purchase_7d").cast("double") / col("n_signup"), 6)
            + lit(0.0)).as("cvr_overall"))
    })

  // ---------------------------------------------------------------------
  // q148 — per-segment revenue trend (closed-form OLS slope)
  // ---------------------------------------------------------------------

  /** Is each market segment's daily revenue trending up or down? The
    * least-squares slope over the (day-index, daily-revenue) series in
    * CLOSED FORM: slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) — no fitted
    * model object, just five aggregates. x is an exact integer day
    * index (days since 1995-01-01), so Σx/Σx² are exact longs; y is
    * the exact-decimal daily revenue; Σxy rides the decimal accumulator
    * over identical per-row IEEE products — the slope is then the same
    * arithmetic over the same rounded inputs on both engines (q143's
    * discipline). Two hash aggregates (orders → daily → segment), the
    * dimension join broadcast; nothing is ordered, nothing windowed —
    * a regression needs sums, not sorts. */
  private val q148 = QueryDef(
    "q148_revenue_trend_ols",
    "per-segment daily-revenue OLS slope, closed form over five aggregates",
    Some(s"""
      WITH daily AS (
        SELECT c_mktsegment AS segment,
               date_diff('day', DATE '1995-01-01',
                         CAST(date_trunc('day', o_orderdate) AS DATE)) AS x,
               ${dsumSql("o_totalprice")} AS y
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2),
      m AS (SELECT segment, COUNT(*) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   ${dsumSql("y")} AS sy,
                   ${dsumSql("CAST(x AS DOUBLE) * y")} AS sxy
            FROM daily GROUP BY segment)
      SELECT segment, n AS n_days,
             ROUND(sy / n, 4) + 0.0 AS avg_daily,
             ROUND((n * sxy - sx * sy)
                   / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)
               + 0.0 AS slope_per_day
      FROM m ORDER BY segment"""),
    (s, dir) => {
      val daily = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
            .as("x"))
        .agg(dsum(col("o_totalprice")).as("y"))
      daily.groupBy("segment")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum(col("x") * col("x")).as("sxx"), dsum(col("y")).as("sy"),
          dsum(col("x").cast("double") * col("y")).as("sxy"))
        .select(col("segment"), col("n").as("n_days"),
          (round(col("sy") / col("n"), 4) + lit(0.0)).as("avg_daily"),
          (round((col("n") * col("sxy") - col("sx") * col("sy"))
            / (col("n").cast("double") * col("sxx")
              - col("sx").cast("double") * col("sx")), 6)
            + lit(0.0)).as("slope_per_day"))
        .orderBy("segment")
    })

  // ---------------------------------------------------------------------
  // q152 — day-of-week seasonality profile
  // ---------------------------------------------------------------------

  /** The weekly seasonality decomposition that pairs with q148's trend:
    * per (segment, ISO day-of-week) order counts, exact-decimal
    * revenue, and each weekday's share of its segment's total. Day
    * numbering is the cross-engine trap: Spark's dayofweek is
    * 1=Sunday while DuckDB's isodow is 1=Monday — q67's calendar
    * pairing (weekday()+1 ⟷ isodow) is reused so both engines emit
    * identical ISO numbers. One fact scan into a 5×7-bounded grid
    * aggregate; the per-segment totals join back broadcast. */
  private val q152 = QueryDef(
    "q152_dow_seasonality",
    "per-segment ISO day-of-week order/revenue profile with segment shares",
    Some(s"""
      WITH o AS (SELECT c_mktsegment AS segment,
                        CAST(isodow(o_orderdate) AS INTEGER) AS dow,
                        o_totalprice
                 FROM orders JOIN customer ON o_custkey = c_custkey),
      g AS (SELECT segment, dow, COUNT(*) AS n_orders,
                   ${dsumSql("o_totalprice")} AS revenue
            FROM o GROUP BY segment, dow),
      t AS (SELECT segment AS tseg, ${dsumSql("revenue")} AS total
            FROM g GROUP BY segment)
      SELECT segment, dow, n_orders, revenue,
             ROUND(revenue / total, 6) + 0.0 AS rev_share
      FROM g JOIN t ON segment = tseg
      ORDER BY segment, dow"""),
    (s, dir) => {
      val g = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"),
          (weekday(to_date(col("o_orderdate"))) + 1).cast("int").as("dow"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      val t = g.groupBy(col("segment").as("tseg")).agg(dsum(col("revenue")).as("total"))
      g.join(broadcast(t), col("segment") === col("tseg"))
        .select(col("segment"), col("dow"), col("n_orders"), col("revenue"),
          (round(col("revenue") / col("total"), 6) + lit(0.0)).as("rev_share"))
        .orderBy("segment", "dow")
    })

  // ---------------------------------------------------------------------
  // q153 — watermark lateness audit (out-of-orderness profile)
  // ---------------------------------------------------------------------

  /** How out-of-order is the event stream, and what watermark delay
    * would each horizon drop? Arrival order is the ingest sequence
    * (event_id); an event is LATE for delay d when some earlier-arriving
    * event of its type already carried an event time more than d ahead
    * (strict-past running max — the q140 frame, so an event never
    * classifies itself). Reported per type: late counts at 1-minute /
    * 1-hour / 1-day horizons plus the worst observed disorder — exactly
    * the numbers that size `withWatermark` for the streaming twins of
    * these operators (EventStream picks 1 hour; this query is the
    * evidence). All-integer µs arithmetic; the window partitions by
    * event_type (bounded keys, q120's shape) — the per-partition
    * running max is the only state, the same O(1)-per-row shape the
    * streaming engine itself uses to track the watermark. */
  private val q153 = QueryDef(
    "q153_watermark_lateness_audit",
    "per-type late-event counts at 1m/1h/1d watermark horizons + max disorder",
    Some("""
      WITH a AS (SELECT event_type, event_id, epoch_us(ts) AS ts_us FROM events),
      w AS (SELECT event_type, ts_us,
                   MAX(ts_us) OVER (PARTITION BY event_type ORDER BY event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS prevmax
            FROM a)
      SELECT event_type, COUNT(*) AS n_events,
             COUNT(CASE WHEN ts_us < prevmax - 60000000 THEN 1 END) AS n_late_1m,
             COUNT(CASE WHEN ts_us < prevmax - 3600000000 THEN 1 END) AS n_late_1h,
             COUNT(CASE WHEN ts_us < prevmax - 86400000000 THEN 1 END) AS n_late_1d,
             CAST(COALESCE(MAX(CASE WHEN prevmax > ts_us
                                    THEN (prevmax - ts_us) // 1000000 END), 0)
                  AS BIGINT) AS max_late_s
      FROM w GROUP BY event_type ORDER BY event_type"""),
    (s, dir) => {
      val wp = Window.partitionBy("event_type").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, dir)
        .select(col("event_type"), col("event_id"), col("ts_us"))
        .withColumn("prevmax", max(col("ts_us")).over(wp))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          count(when(col("ts_us") < col("prevmax") - 60000000L, 1))
            .as("n_late_1m"),
          count(when(col("ts_us") < col("prevmax") - 3600000000L, 1))
            .as("n_late_1h"),
          count(when(col("ts_us") < col("prevmax") - 86400000000L, 1))
            .as("n_late_1d"),
          coalesce(max(when(col("prevmax") > col("ts_us"),
            expr("(prevmax - ts_us) div 1000000"))), lit(0L)).as("max_late_s"))
        .orderBy("event_type")
    })

  // ---------------------------------------------------------------------
  // q155 — cohort LTV curve (cumulative revenue by cohort age)
  // ---------------------------------------------------------------------

  /** The lifetime-value curve behind q76's retention counts: customers
    * cohorted by FIRST-order month, revenue aggregated per (cohort,
    * month-age k) with explicit integer month arithmetic ((Δyear)·12 +
    * Δmonth — no engine's months_between float semantics), then
    * accumulated per cohort over k, with the cohort size alongside. The
    * cumulative sum is a per-cohort ordered window over the bounded
    * (cohort × age) grid — both engines add the same rounded cells in
    * the same total order, the q149 sequential-sum argument; cohort
    * sizes broadcast back. The per-customer LTV ratio is deliberately
    * NOT emitted: cum_rev/n_customers landed exactly on a 4-dp rounding
    * boundary at sf0.1 (the q86/q143 class — the double's shortest
    * decimal form sits on .5 while its exact binary value is below, and
    * the engines' ROUNDs split), so the report carries the exact
    * integer denominator instead and the division stays with the
    * reader. Two hash aggregates + one bounded window: the
    * marketing-facing curve at any scale. */
  private val q155 = QueryDef(
    "q155_cohort_ltv_curve",
    "per-cohort cumulative revenue by month age + LTV per customer",
    Some(s"""
      WITH fo AS (SELECT o_custkey AS cust,
                         MIN(CAST(date_trunc('month', o_orderdate) AS DATE)) AS cm
                  FROM orders GROUP BY 1),
      o AS (SELECT cm AS cohort,
                   CAST((year(o_orderdate) - year(cm)) * 12
                        + (month(o_orderdate) - month(cm)) AS BIGINT) AS k,
                   o_totalprice
            FROM orders JOIN fo ON o_custkey = cust),
      g AS (SELECT cohort, k, COUNT(*) AS n_orders,
                   ${dsumSql("o_totalprice")} AS rev
            FROM o GROUP BY 1, 2),
      cs AS (SELECT cm AS ccoh, COUNT(*) AS n_customers FROM fo GROUP BY 1),
      r AS (SELECT cohort, k, n_orders, rev,
                   ROUND(SUM(rev) OVER (PARTITION BY cohort ORDER BY k
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                         4) + 0.0 AS cum_rev
            FROM g)
      SELECT cohort, k, n_orders, rev, cum_rev, n_customers
      FROM r JOIN cs ON cohort = ccoh
      ORDER BY cohort, k"""),
    (s, dir) => {
      val orders = Tables.orders(s, dir)
      val fo = orders.groupBy(col("o_custkey").as("cust"))
        .agg(min(trunc(to_date(col("o_orderdate")), "MM")).as("cm"))
      val o = orders.join(fo, col("o_custkey") === col("cust"))
        .select(col("cm").as("cohort"),
          ((year(to_date(col("o_orderdate"))) - year(col("cm"))) * 12
            + (month(to_date(col("o_orderdate"))) - month(col("cm"))))
            .cast("long").as("k"),
          col("o_totalprice"))
      val g = o.groupBy("cohort", "k")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("rev"))
      val cs = fo.groupBy(col("cm").as("ccoh")).agg(count(lit(1)).as("n_customers"))
      val w = Window.partitionBy("cohort").orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.withColumn("cum_rev", round(sum(col("rev")).over(w), 4) + lit(0.0))
        .join(broadcast(cs), col("cohort") === col("ccoh"))
        .select(col("cohort"), col("k"), col("n_orders"), col("rev"),
          col("cum_rev"), col("n_customers"))
        .orderBy("cohort", "k")
    })

  // ---------------------------------------------------------------------
  // q156 — signup-cohort retention triangle (D1 / D7 / D14)
  // ---------------------------------------------------------------------

  /** Fixed-horizon retention RATES: users cohorted by their first
    * SIGNUP day (an explicit lifecycle event — q76's weekly matrix
    * cohorts by first activity of any kind and emits every offset's
    * raw count; this is the complementary dashboard readout: exact-day
    * D1/D7/D14 horizons as shares of the cohort). Scale shape: the
    * event stream reduces MAP-SIDE to distinct
    * (user, day) pairs — the only fact retention needs, orders of
    * magnitude smaller than events; the cohort table is user-domain;
    * their equi-join co-partitions on user_id; the final aggregate
    * groups by cohort day (bounded by the calendar). Day arithmetic is
    * exact integer (`ts_us div 86400000000`, the q132 discipline);
    * rates are one IEEE divide of exact longs, round6. Offsets use
    * conditional COUNT(DISTINCT) so one aggregate emits the whole
    * triangle row — no per-offset re-scan. */
  private val q156 = QueryDef(
    "q156_signup_dn_retention",
    "signup-day cohorts: share of users active exactly 1/7/14 days later",
    Some("""
      WITH c AS (SELECT user_id, MIN(epoch_us(ts) // 86400000000) AS cohort_day
                 FROM events WHERE event_type = 'signup' GROUP BY 1),
      a AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS aday
            FROM events),
      j AS (SELECT c.cohort_day, a.aday - c.cohort_day AS off, c.user_id
            FROM c JOIN a USING (user_id)),
      g AS (SELECT cohort_day,
                   COUNT(DISTINCT user_id) AS n_cohort,
                   COUNT(DISTINCT CASE WHEN off = 1 THEN user_id END) AS n_d1,
                   COUNT(DISTINCT CASE WHEN off = 7 THEN user_id END) AS n_d7,
                   COUNT(DISTINCT CASE WHEN off = 14 THEN user_id END) AS n_d14
            FROM j GROUP BY 1)
      SELECT cohort_day, n_cohort, n_d1, n_d7, n_d14,
             ROUND(CAST(n_d1 AS DOUBLE) / n_cohort, 6) + 0.0 AS r1,
             ROUND(CAST(n_d7 AS DOUBLE) / n_cohort, 6) + 0.0 AS r7,
             ROUND(CAST(n_d14 AS DOUBLE) / n_cohort, 6) + 0.0 AS r14
      FROM g ORDER BY cohort_day"""),
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val dayExpr = expr("ts_us div 86400000000")
      val cohorts = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(dayExpr).as("cohort_day"))
      val activity = ev.select(col("user_id"), dayExpr.as("aday")).distinct()
      val j = cohorts.join(activity, "user_id")
        .select(col("cohort_day"), (col("aday") - col("cohort_day")).as("off"),
          col("user_id"))
      j.groupBy("cohort_day")
        .agg(countDistinct(col("user_id")).as("n_cohort"),
          countDistinct(when(col("off") === 1, col("user_id"))).as("n_d1"),
          countDistinct(when(col("off") === 7, col("user_id"))).as("n_d7"),
          countDistinct(when(col("off") === 14, col("user_id"))).as("n_d14"))
        .select(col("cohort_day"), col("n_cohort"), col("n_d1"), col("n_d7"),
          col("n_d14"),
          (round(col("n_d1").cast("double") / col("n_cohort"), 6) + lit(0.0))
            .as("r1"),
          (round(col("n_d7").cast("double") / col("n_cohort"), 6) + lit(0.0))
            .as("r7"),
          (round(col("n_d14").cast("double") / col("n_cohort"), 6) + lit(0.0))
            .as("r14"))
        .orderBy("cohort_day")
    })

  // ---------------------------------------------------------------------
  // q160 — lifecycle ordering audit (events before first signup)
  // ---------------------------------------------------------------------

  /** Temporal referential integrity — q126 checks that KEYS resolve;
    * this checks that TIME makes sense: per event type, how many events
    * precede their user's first signup (impossible under a correct
    * instrumentation, common under clock skew / backfills / replays),
    * how many tie it to the microsecond, and how many belong to users
    * with no signup at all. The first-signup table is user-domain
    * (one map-side min), the audit join co-partitions on user_id, and
    * the report is type-domain-sized. Counts are exact integers; the
    * share is one IEEE divide, round6. */
  private val q160 = QueryDef(
    "q160_lifecycle_order_audit",
    "per event type: events before / at / without their user's first signup",
    Some("""
      WITH fs AS (SELECT user_id, MIN(epoch_us(ts)) AS s_us
                  FROM events WHERE event_type = 'signup' GROUP BY 1),
      j AS (SELECT e.event_type, epoch_us(e.ts) AS ts_us, fs.s_us
            FROM events e LEFT JOIN fs USING (user_id))
      SELECT event_type,
             COUNT(*) AS n_total,
             COUNT(CASE WHEN s_us IS NULL THEN 1 END) AS n_no_signup,
             COUNT(CASE WHEN ts_us < s_us THEN 1 END) AS n_before_signup,
             COUNT(CASE WHEN ts_us = s_us THEN 1 END) AS n_at_signup,
             ROUND(CAST(COUNT(CASE WHEN ts_us < s_us THEN 1 END) AS DOUBLE)
                   / COUNT(*), 6) + 0.0 AS share_before
      FROM j GROUP BY event_type ORDER BY event_type"""),
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val fs = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("ts_us")).as("s_us"))
      ev.select(col("event_type"), col("ts_us"), col("user_id"))
        .join(fs, Seq("user_id"), "left")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_total"),
          count(when(col("s_us").isNull, 1)).as("n_no_signup"),
          count(when(col("ts_us") < col("s_us"), 1)).as("n_before_signup"),
          count(when(col("ts_us") === col("s_us"), 1)).as("n_at_signup"))
        .select(col("event_type"), col("n_total"), col("n_no_signup"),
          col("n_before_signup"), col("n_at_signup"),
          (round(col("n_before_signup").cast("double") / col("n_total"), 6)
            + lit(0.0)).as("share_before"))
        .orderBy("event_type")
    })

  // ---------------------------------------------------------------------
  // q161 — hourly gap-fill by linear interpolation (resampling)
  // ---------------------------------------------------------------------

  /** Time-series regularization — the resample-and-impute step between
    * raw events and any windowed model input: the hourly mean value per
    * event type is projected onto the COMPLETE hour grid (min..max
    * observed, `sequence` explode — the grid is calendar-bounded, never
    * fact-sized), and missing hours are filled by linear interpolation
    * between the nearest observed neighbors (ignore-nulls last/first
    * window carries, the q141 discipline; boundaries are observed by
    * construction so every gap is interior). Interpolation is FIXED-
    * POINT integer arithmetic (the q73 discipline): the 4-dp neighbor
    * means lift exactly to micro-units (×10⁴ longs), the slope step is
    * floor((nv−pv)·(hr−ph) / (nh−ph)) — computed as floor of one IEEE
    * division of exact integers, identical on both engines because the
    * true rational is never closer than 1/gap to an integer while the
    * division error is ≤ 1 ulp — and the filled mass is reported IN
    * micro-units, so the whole fill path is exact integer and immune to
    * the ROUND-of-derived-ratio hazard (a first draft rounding the
    * double interpolation flipped a 4-dp boundary between engines at
    * sf0.01). The audit aggregates per type: grid/observed/filled hour
    * counts, the longest gap run, and the filled micro-unit mass —
    * windows partition by type over calendar-bounded rows, all
    * pre-aggregation is map-side. */
  private val q161 = QueryDef(
    "q161_hourly_gapfill_interpolation",
    "complete hourly grid per type: interpolated fills, gap runs, filled mass",
    Some(s"""
      WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
                        ${davgSql("value")} AS m
                 FROM events GROUP BY 1, 2),
      span AS (SELECT event_type, MIN(hr) AS h0, MAX(hr) AS h1
               FROM h GROUP BY 1),
      grid AS (SELECT event_type, unnest(generate_series(h0, h1)) AS hr
               FROM span),
      g AS (SELECT grid.event_type, grid.hr, h.m
            FROM grid LEFT JOIN h ON h.event_type = grid.event_type
                                 AND h.hr = grid.hr),
      w AS (SELECT event_type, hr, m,
                   last_value(m IGNORE NULLS) OVER
                     (PARTITION BY event_type ORDER BY hr
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
                   last_value(CASE WHEN m IS NOT NULL THEN hr END IGNORE NULLS)
                     OVER (PARTITION BY event_type ORDER BY hr
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ph,
                   first_value(m IGNORE NULLS) OVER
                     (PARTITION BY event_type ORDER BY hr
                      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
                   first_value(CASE WHEN m IS NOT NULL THEN hr END IGNORE NULLS)
                     OVER (PARTITION BY event_type ORDER BY hr
                      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nh
            FROM g),
      f AS (SELECT event_type, hr,
                   CASE WHEN m IS NULL
                        THEN CAST(ROUND(pv * 10000) AS BIGINT)
                             + CAST(FLOOR(
                                 CAST((CAST(ROUND(nv * 10000) AS BIGINT)
                                       - CAST(ROUND(pv * 10000) AS BIGINT))
                                      * (hr - ph) AS DOUBLE)
                                 / CAST(nh - ph AS DOUBLE)) AS BIGINT)
                   END AS fill_u,
                   (m IS NULL) AS is_fill,
                   CASE WHEN m IS NULL THEN ph END AS gap_anchor
            FROM w),
      runs AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS run_len
               FROM f WHERE is_fill GROUP BY event_type, gap_anchor),
      rmax AS (SELECT event_type AS ret, CAST(MAX(run_len) AS BIGINT) AS mx
               FROM runs GROUP BY 1),
      agg AS (SELECT event_type,
                     COUNT(*) AS n_hours,
                     COUNT(CASE WHEN NOT is_fill THEN 1 END) AS n_observed,
                     COUNT(CASE WHEN is_fill THEN 1 END) AS n_filled,
                     CAST(COALESCE(SUM(fill_u), 0) AS BIGINT) AS filled_mass_u
              FROM f GROUP BY event_type)
      SELECT event_type, n_hours, n_observed, n_filled,
             COALESCE(mx, 0) AS max_gap_run, filled_mass_u
      FROM agg LEFT JOIN rmax ON ret = event_type
      ORDER BY event_type"""),
    (s, dir) => {
      val h = Tables.events(s, dir)
        .groupBy(col("event_type"), expr("ts_us div 3600000000").as("hr"))
        .agg(davg(col("value")).as("m"))
      val grid = h.groupBy("event_type")
        .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
        .select(col("event_type"), explode(expr("sequence(h0, h1)")).as("hr"))
      val g = grid.join(h, Seq("event_type", "hr"), "left")
      val wPrev = Window.partitionBy("event_type").orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wNext = Window.partitionBy("event_type").orderBy("hr")
        .rowsBetween(1, Window.unboundedFollowing)
      val w = g
        .withColumn("pv", last(col("m"), ignoreNulls = true).over(wPrev))
        .withColumn("ph",
          last(when(col("m").isNotNull, col("hr")), ignoreNulls = true).over(wPrev))
        .withColumn("nv", first(col("m"), ignoreNulls = true).over(wNext))
        .withColumn("nh",
          first(when(col("m").isNotNull, col("hr")), ignoreNulls = true).over(wNext))
      val pu = round(col("pv") * 10000).cast("long")
      val nu = round(col("nv") * 10000).cast("long")
      val f = w.select(col("event_type"), col("hr"),
        when(col("m").isNull,
          pu + floor(((nu - pu) * (col("hr") - col("ph"))).cast("double")
            / (col("nh") - col("ph")).cast("double")).cast("long"))
          .as("fill_u"),
        col("m").isNull.as("is_fill"),
        when(col("m").isNull, col("ph")).as("gap_anchor"))
      val runs = f.filter(col("is_fill"))
        .groupBy(col("event_type").as("ret"), col("gap_anchor"))
        .agg(count(lit(1)).as("run_len"))
        .groupBy("ret").agg(max(col("run_len")).as("max_gap_run"))
      f.groupBy("event_type")
        .agg(count(lit(1)).as("n_hours"),
          count(when(!col("is_fill"), 1)).as("n_observed"),
          count(when(col("is_fill"), 1)).as("n_filled"),
          coalesce(sum(col("fill_u")), lit(0L)).cast("long")
            .as("filled_mass_u"))
        .join(runs, col("event_type") === col("ret"), "left")
        .select(col("event_type"), col("n_hours"), col("n_observed"),
          col("n_filled"), coalesce(col("max_gap_run"), lit(0L)).as("max_gap_run"),
          col("filled_mass_u"))
        .orderBy("event_type")
    })

  // ---------------------------------------------------------------------
  // q169 — multi-touch time-decay attribution (rational weights)
  // ---------------------------------------------------------------------

  /** q141's last-touch answered "who gets the sale"; this answers it the
    * way marketing teams actually split it: EVERY click in the 7-day
    * lookback gets credit, decayed harmonically with age — w = 1/(1+d)
    * for a click d whole days before the purchase. Harmonic (not
    * exponential) decay is deliberate: the weights are exact rationals
    * of small integers, so no libm exp/pow enters the parity surface.
    * Per purchase, weights normalize through an order-independent
    * decimal window sum (the det.dsum discipline applied inside a
    * window), and credit = value · w / Z then rolls up per campaign
    * through the usual decimal accumulator; purchases with no prior
    * click keep full value under campaign −1, so revenue is conserved.
    * Clicks whose props.k is missing or non-numeric carry no campaign
    * and are EXCLUDED before the join (TRY_CAST in the oracle, so a
    * malformed payload can never raise there either) — after the left
    * join, camp NULL therefore unambiguously means "no attributable
    * click", and the conservation invariant survives dirty payloads
    * instead of double-crediting them. Plan: the q41 interval-join
    * shape — equi-shuffle on user_id, range predicate inside the
    * joined partition, bounded per user — then a purchase-keyed window
    * (fan-in ≤ clicks-per-week per user) and a campaign-domain
    * rollup. */
  private val q169 = QueryDef(
    "q169_timedecay_attribution",
    "7-day harmonic multi-touch attribution: revenue split across campaigns",
    Some(s"""
      WITH p AS (SELECT user_id, event_id AS pid, epoch_us(ts) AS pts, value
                 FROM events WHERE event_type = 'purchase'),
      c AS (SELECT user_id, epoch_us(ts) AS cts, camp
            FROM (SELECT user_id, ts,
                         TRY_CAST(props ->> 'k' AS BIGINT) % 5 AS camp
                  FROM events WHERE event_type = 'click')
            WHERE camp IS NOT NULL),
      j AS (SELECT p.pid, p.value, c.camp,
                   CASE WHEN c.camp IS NOT NULL
                        THEN 1.0 / (1.0 + CAST((p.pts - c.cts) // 86400000000
                                               AS DOUBLE)) END AS w
            FROM p LEFT JOIN c ON p.user_id = c.user_id
                              AND c.cts < p.pts
                              AND c.cts >= p.pts - 7 * 86400000000),
      z AS (SELECT pid, value, camp, w,
                   ROUND(CAST(SUM(CAST(w AS DECIMAL(30,10)))
                              OVER (PARTITION BY pid) AS DOUBLE), 4) AS zz
            FROM j),
      cr AS (SELECT COALESCE(camp, -1) AS campaign, pid,
                    CASE WHEN camp IS NULL THEN value
                         ELSE value * w / zz END AS credit
             FROM z)
      SELECT campaign,
             CAST(COUNT(*) AS BIGINT) AS n_touches,
             CAST(COUNT(DISTINCT pid) AS BIGINT) AS n_purchases,
             ${dsumSql("credit")} AS attributed_revenue
      FROM cr GROUP BY campaign ORDER BY campaign"""),
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val ev = Tables.events(s, dir)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("pid"),
          col("ts_us").as("pts"), col("value"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("cuid"), col("ts_us").as("cts"),
          (get_json_object(col("props"), "$.k").cast("long") % 5).as("camp"))
        .filter(col("camp").isNotNull)
      val j = p.join(c,
          col("user_id") === col("cuid") && col("cts") < col("pts")
            && col("cts") >= col("pts") - lit(7L) * 86400000000L, "left")
        .select(col("pid"), col("value"), col("camp"),
          when(col("camp").isNotNull,
            lit(1.0) / (lit(1.0)
              + expr("(pts - cts) div 86400000000").cast("double"))).as("w"))
      val z = j.withColumn("zz",
        round(sum(col("w").cast(DecimalType(30, 10)))
          .over(Window.partitionBy("pid")).cast("double"), 4))
      val cr = z.select(coalesce(col("camp"), lit(-1L)).as("campaign"),
        col("pid"),
        when(col("camp").isNull, col("value"))
          .otherwise(col("value") * col("w") / col("zz")).as("credit"))
      cr.groupBy("campaign")
        .agg(count(lit(1)).as("n_touches"),
          countDistinct(col("pid")).as("n_purchases"),
          dsum(col("credit")).as("attributed_revenue"))
        .orderBy("campaign")
    })

  // ---------------------------------------------------------------------
  // q171 — monthly revenue with MoM and YoY growth
  // ---------------------------------------------------------------------

  /** The calendar rollup every revenue dashboard opens with: monthly
    * order revenue with month-over-month and year-over-year deltas.
    * Priors come from SELF-JOINS on the true calendar twin
    * (month − 1 month, month − 12 months) rather than lag(1)/lag(12)
    * row offsets: a zero-order month leaves a hole in the month axis,
    * and a row-offset lag would silently compare against the wrong
    * calendar month while a calendar join yields an honest NULL. The
    * join form also removes the only GLOBAL (unpartitioned) window
    * this query had — the month table is calendar-bounded and
    * broadcast, so the plan carries no single-partition stage at all.
    * The fact table collapses map-side to the month domain first;
    * prior values ship alongside the growth ratios so the reader can
    * always recompute, and missing priors yield NULL growth rather
    * than a fabricated zero. Month arithmetic uses date_trunc /
    * add_months — identical calendar semantics on both engines under
    * UTC. */
  private val q171 = QueryDef(
    "q171_monthly_revenue_growth",
    "monthly revenue, MoM and YoY growth vs true calendar-twin months",
    Some(s"""
      WITH m AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                        ${dsumSql("o_totalprice")} AS revenue,
                        CAST(COUNT(*) AS BIGINT) AS n_orders
                 FROM orders GROUP BY 1),
      g AS (SELECT m.month, m.revenue, m.n_orders,
                   pm.revenue AS prev_m, py.revenue AS prev_y
            FROM m
            LEFT JOIN m pm ON pm.month = CAST(m.month - INTERVAL 1 MONTH AS DATE)
            LEFT JOIN m py ON py.month = CAST(m.month - INTERVAL 12 MONTH AS DATE))
      SELECT month, n_orders, revenue, prev_m, prev_y,
             ROUND((revenue - prev_m) / prev_m, 6) + 0.0 AS mom_growth,
             ROUND((revenue - prev_y) / prev_y, 6) + 0.0 AS yoy_growth
      FROM g ORDER BY month"""),
    (s, dir) => {
      val m = Tables.orders(s, dir)
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(dsum(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders"))
      m.join(broadcast(m.select(col("month").as("pm_m"),
          col("revenue").as("prev_m"))),
          col("pm_m") === add_months(col("month"), -1), "left")
        .join(broadcast(m.select(col("month").as("py_m"),
          col("revenue").as("prev_y"))),
          col("py_m") === add_months(col("month"), -12), "left")
        .select(col("month"), col("n_orders"), col("revenue"), col("prev_m"),
          col("prev_y"),
          (round((col("revenue") - col("prev_m")) / col("prev_m"), 6) + lit(0.0))
            .as("mom_growth"),
          (round((col("revenue") - col("prev_y")) / col("prev_y"), 6) + lit(0.0))
            .as("yoy_growth"))
        .orderBy("month")
    })

  // ---------------------------------------------------------------------
  // q173 — event throttling (1 per user/type/hour) accounting
  // ---------------------------------------------------------------------

  /** Rate limiting as a batch operator: keep the FIRST event per
    * (user, type, hour) — (ts_us, event_id) ordered, the engine-wide
    * tiebreak — and account for what the throttle would drop, per type:
    * kept, dropped, drop share, and the worst single (user, hour)
    * burst. This is the dedup/throttle hygiene pass ingestion runs
    * before sessionization so one hot client can't flood downstream
    * state. The rank-1 predicate pushes into WindowGroupLimit on the
    * (user, type, hour) key (q04/q151 discipline — each group stops
    * after one row); the burst max is a plain grouped count over the
    * same key. Counts exact, share one IEEE divide round6. */
  private val q173 = QueryDef(
    "q173_event_throttling",
    "first-per-(user,type,hour) throttle: kept/dropped accounting per type",
    Some("""
      WITH e AS (SELECT event_type, user_id, event_id,
                        epoch_us(ts) AS ts_us,
                        epoch_us(ts) // 3600000000 AS hr
                 FROM events),
      r AS (SELECT event_type, user_id, hr,
                   row_number() OVER (PARTITION BY user_id, event_type, hr
                                      ORDER BY ts_us, event_id) AS rn
            FROM e),
      b AS (SELECT event_type, user_id, hr, COUNT(*) AS burst
            FROM e GROUP BY 1, 2, 3),
      bm AS (SELECT event_type AS bet, CAST(MAX(burst) AS BIGINT) AS max_burst
             FROM b GROUP BY 1),
      a AS (SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_total,
                   CAST(COUNT(CASE WHEN rn = 1 THEN 1 END) AS BIGINT) AS n_kept,
                   CAST(COUNT(CASE WHEN rn > 1 THEN 1 END) AS BIGINT) AS n_dropped
            FROM r GROUP BY 1)
      SELECT event_type, n_total, n_kept, n_dropped,
             ROUND(CAST(n_dropped AS DOUBLE) / n_total, 6) + 0.0 AS drop_share,
             max_burst
      FROM a JOIN bm ON bet = event_type
      ORDER BY event_type"""),
    (s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_type"), col("user_id"), col("event_id"),
          col("ts_us"), expr("ts_us div 3600000000").as("hr"))
      val r = e.withColumn("rn", row_number().over(
        Window.partitionBy("user_id", "event_type", "hr")
          .orderBy("ts_us", "event_id")))
      val agg = r.groupBy("event_type")
        .agg(count(lit(1)).as("n_total"),
          count(when(col("rn") === 1, 1)).as("n_kept"),
          count(when(col("rn") > 1, 1)).as("n_dropped"))
      val b = e.groupBy(col("event_type").as("bet"), col("user_id"), col("hr"))
        .agg(count(lit(1)).as("burst"))
        .groupBy("bet").agg(max(col("burst")).as("max_burst"))
      agg.join(broadcast(b), col("event_type") === col("bet"))
        .select(col("event_type"), col("n_total"), col("n_kept"),
          col("n_dropped"),
          (round(col("n_dropped").cast("double") / col("n_total"), 6) + lit(0.0))
            .as("drop_share"),
          col("max_burst"))
        .orderBy("event_type")
    })

  // ---------------------------------------------------------------------
  // q174 — per-partition content checksums (anti-entropy audit)
  // ---------------------------------------------------------------------

  /** The anti-entropy fingerprint table a replicated store compares
    * before shipping repairs: per (event_type, day) "partition", the
    * md5 of the ORDER-fIXED event-id list — any replica computing the
    * same table can diff fingerprints and repair only mismatched
    * partitions instead of rescanning everything. Determinism is the
    * whole point: the id list is sorted (sort_array over collect_list
    * on one side, string_agg ORDER BY on the other), so the checksum is
    * a pure function of partition CONTENT, independent of arrival or
    * partitioning order. Emitted per type: partition count, row mass,
    * and the md5-of-md5s rollup fingerprint — one line to compare per
    * replica before drilling into days. Group sizes are day-bounded;
    * the concat cost is the partition's own size, map-side combinable
    * up to the final per-group fold. */
  private val q174 = QueryDef(
    "q174_partition_checksums",
    "per (type, day) md5 content fingerprints + per-type rollup checksum",
    Some("""
      WITH p AS (SELECT event_type,
                        epoch_us(ts) // 86400000000 AS day,
                        md5(string_agg(CAST(event_id AS VARCHAR), ','
                            ORDER BY event_id)) AS fp,
                        CAST(COUNT(*) AS BIGINT) AS n_rows
                 FROM events GROUP BY 1, 2)
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_partitions,
             CAST(SUM(n_rows) AS BIGINT) AS n_rows,
             md5(string_agg(fp, ',' ORDER BY day)) AS rollup_fp
      FROM p GROUP BY event_type ORDER BY event_type"""),
    (s, dir) => {
      val p = Tables.events(s, dir)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(md5(concat_ws(",",
            transform(sort_array(collect_list(col("event_id"))),
              x => x.cast("string")))).as("fp"),
          count(lit(1)).as("n_rows"))
      p.groupBy("event_type")
        .agg(count(lit(1)).as("n_partitions"),
          sum(col("n_rows")).as("n_rows"),
          md5(concat_ws(",", array_sort(collect_list(struct(col("day"), col("fp"))))
            .getField("fp"))).as("rollup_fp"))
        .orderBy("event_type")
    })

  // ---------------------------------------------------------------------
  // q182 — dyadic exponential smoothing (EMA with exact weights)
  // ---------------------------------------------------------------------

  /** Exponential smoothing without the libm: the classic EMA recurrence
    * needs (1−α)^k, but with α = 1/2 the weights are 2^−k — EXACT
    * binary doubles — so a 10-term windowed form Σ rev[t−k]·2^−k /
    * Σ 2^−k is bit-identical cross-engine with no pow() anywhere. The
    * lag chain is spelled out term by term in the same textual order on
    * both sides (ten lags over the day-domain axis — the window input
    * is calendar-bounded, never facts), warm-up rows normalize by the
    * weights actually present, and daily revenue enters as the usual
    * 4-dp decimal sum. The half-life-one-day smoother is what anomaly
    * baselines and sparkline dashboards actually run. */
  private val q182 = QueryDef(
    "q182_dyadic_ema",
    "daily revenue smoothed by exact 2^-k weights (EMA, no libm)",
    Some {
      val terms = (0 to 9).map(k =>
        s"COALESCE(lag(revenue, $k) OVER (ORDER BY day) * ${1.0 / (1L << k)}, 0.0)")
        .mkString(" + ")
      val wsum = (0 to 9).map(k =>
        s"CASE WHEN lag(revenue, $k) OVER (ORDER BY day) IS NOT NULL THEN ${1.0 / (1L << k)} ELSE 0.0 END")
        .mkString(" + ")
      s"""
      WITH m AS (SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
                        ${dsumSql("o_totalprice")} AS revenue
                 FROM orders GROUP BY 1),
      w AS (SELECT day, revenue,
                   $terms AS num,
                   $wsum AS den
            FROM m)
      SELECT day, revenue,
             ROUND(num / den, 4) + 0.0 AS ema
      FROM w ORDER BY day"""
    },
    (s, dir) => {
      val m = Tables.orders(s, dir)
        .groupBy(date_trunc("day", col("o_orderdate")).cast("date").as("day"))
        .agg(dsum(col("o_totalprice")).as("revenue"))
      val w = Window.orderBy("day")
      val num = (0 to 9).map(k =>
        coalesce(lag(col("revenue"), k).over(w) * lit(1.0 / (1L << k)), lit(0.0)))
        .reduce(_ + _)
      val den = (0 to 9).map(k =>
        when(lag(col("revenue"), k).over(w).isNotNull, lit(1.0 / (1L << k)))
          .otherwise(0.0))
        .reduce(_ + _)
      m.select(col("day"), col("revenue"),
          (round(num / den, 4) + lit(0.0)).as("ema"))
        .orderBy("day")
    })

  // ---------------------------------------------------------------------
  // q184 — sweep-line peak concurrency
  // ---------------------------------------------------------------------

  /** Max concurrent active users per event type by the classic
    * sweep-line: each user's activity span [first ts, last ts] becomes
    * a +1 boundary at entry and a −1 after exit, the running sum over
    * the boundary axis is the live concurrency, and its max (with the
    * earliest peak time) is the capacity answer. Boundary ordering
    * breaks ties (+1 before −1 at equal ts via the delta sort key) so
    * touching intervals count as concurrent — the convention is pinned,
    * not engine-luck. The sweep runs over 2×users boundaries per type
    * (user-domain, never events); everything is exact integers. */
  private val q184 = QueryDef(
    "q184_peak_concurrency",
    "sweep-line max concurrent active users per type, with earliest peak time",
    Some("""
      WITH span AS (SELECT event_type, user_id,
                           MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
                    FROM events GROUP BY 1, 2),
      b AS (SELECT event_type, lo AS t, CAST(1 AS BIGINT) AS delta FROM span
            UNION ALL
            SELECT event_type, hi + 1, CAST(-1 AS BIGINT) FROM span),
      r AS (SELECT event_type, t, delta,
                   SUM(delta) OVER (PARTITION BY event_type
                                    ORDER BY t, delta DESC
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS live
            FROM b),
      mx AS (SELECT event_type, CAST(MAX(live) AS BIGINT) AS peak
             FROM r GROUP BY 1),
      nu AS (SELECT event_type AS net, CAST(COUNT(*) AS BIGINT) AS n_users
             FROM span GROUP BY 1)
      SELECT r.event_type, mx.peak,
             CAST(MIN(t) AS BIGINT) AS peak_at_us, nu.n_users
      FROM r JOIN mx ON mx.event_type = r.event_type AND r.live = mx.peak
             JOIN nu ON nu.net = r.event_type
      GROUP BY r.event_type, mx.peak, nu.n_users
      ORDER BY r.event_type"""),
    (s, dir) => {
      val span = Tables.events(s, dir)
        .groupBy("event_type", "user_id")
        .agg(min(col("ts_us")).as("lo"), max(col("ts_us")).as("hi"))
      val b = span.select(col("event_type"), col("lo").as("t"),
          lit(1L).as("delta"))
        .unionByName(span.select(col("event_type"),
          (col("hi") + 1).as("t"), lit(-1L).as("delta")))
      val w = Window.partitionBy("event_type").orderBy(col("t"), col("delta").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val r = b.withColumn("live", sum(col("delta")).over(w))
      val mx = r.groupBy(col("event_type").as("met"))
        .agg(max(col("live")).as("peak"))
      val nu = span.groupBy(col("event_type").as("net"))
        .agg(count(lit(1)).as("n_users"))
      r.join(broadcast(mx),
          col("event_type") === col("met") && col("live") === col("peak"))
        .groupBy("event_type", "peak")
        .agg(min(col("t")).as("peak_at_us"))
        .join(broadcast(nu), col("event_type") === col("net"))
        .select(col("event_type"), col("peak"), col("peak_at_us"),
          col("n_users"))
        .orderBy("event_type")
    })

  // ---------------------------------------------------------------------
  // q185 — funnel stage latency (time between stages)
  // ---------------------------------------------------------------------

  /** q145 counts WHO reaches each funnel stage; this measures HOW LONG
    * the transitions take: per user, first signup → first view after it
    * → first purchase after that, with the two stage latencies reported
    * as exact median / p90 hours across users. The per-user firsts are
    * two user-domain conditional-min joins (never a per-event window);
    * latencies are one IEEE divide of exact microsecond longs; the
    * percentile pair is the q42 discipline. Null-safe: users who stall
    * mid-funnel simply drop out of the later latency populations. */
  private val q185 = QueryDef(
    "q185_funnel_stage_latency",
    "median/p90 hours for signup->view and view->purchase transitions",
    Some("""
      WITH su AS (SELECT user_id, MIN(epoch_us(ts)) AS s_us
                  FROM events WHERE event_type = 'signup' GROUP BY 1),
      vu AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS v_us
             FROM events e JOIN su ON e.user_id = su.user_id
             WHERE e.event_type = 'view' AND epoch_us(e.ts) > su.s_us
             GROUP BY 1),
      pu AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
             FROM events e JOIN vu ON e.user_id = vu.user_id
             WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > vu.v_us
             GROUP BY 1),
      lat AS (SELECT su.user_id,
                     CASE WHEN v_us IS NOT NULL
                          THEN ROUND((v_us - s_us) / 3600000000.0, 4) END AS l1,
                     CASE WHEN p_us IS NOT NULL
                          THEN ROUND((p_us - v_us) / 3600000000.0, 4) END AS l2
              FROM su LEFT JOIN vu ON su.user_id = vu.user_id
                      LEFT JOIN pu ON su.user_id = pu.user_id)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_signup,
             CAST(COUNT(l1) AS BIGINT) AS n_reached_view,
             CAST(COUNT(l2) AS BIGINT) AS n_reached_purchase,
             ROUND(quantile_cont(l1, 0.5), 4) + 0.0 AS med_h_signup_view,
             ROUND(quantile_cont(l1, 0.9), 4) + 0.0 AS p90_h_signup_view,
             ROUND(quantile_cont(l2, 0.5), 4) + 0.0 AS med_h_view_purchase,
             ROUND(quantile_cont(l2, 0.9), 4) + 0.0 AS p90_h_view_purchase
      FROM lat"""),
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val su = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id").as("suid")).agg(min(col("ts_us")).as("s_us"))
      val vu = ev.filter(col("event_type") === "view")
        .join(su, col("user_id") === col("suid"))
        .filter(col("ts_us") > col("s_us"))
        .groupBy(col("user_id").as("vuid")).agg(min(col("ts_us")).as("v_us"))
      val pu = ev.filter(col("event_type") === "purchase")
        .join(vu, col("user_id") === col("vuid"))
        .filter(col("ts_us") > col("v_us"))
        .groupBy(col("user_id").as("puid")).agg(min(col("ts_us")).as("p_us"))
      val lat = su
        .join(vu, col("suid") === col("vuid"), "left")
        .join(pu, col("suid") === col("puid"), "left")
        .select(
          when(col("v_us").isNotNull,
            round((col("v_us") - col("s_us")) / 3600000000.0, 4)).as("l1"),
          when(col("p_us").isNotNull,
            round((col("p_us") - col("v_us")) / 3600000000.0, 4)).as("l2"))
      lat.agg(count(lit(1)).as("n_signup"),
        count(col("l1")).as("n_reached_view"),
        count(col("l2")).as("n_reached_purchase"),
        (round(expr("percentile(l1, 0.5)"), 4) + lit(0.0)).as("med_h_signup_view"),
        (round(expr("percentile(l1, 0.9)"), 4) + lit(0.0)).as("p90_h_signup_view"),
        (round(expr("percentile(l2, 0.5)"), 4) + lit(0.0)).as("med_h_view_purchase"),
        (round(expr("percentile(l2, 0.9)"), 4) + lit(0.0)).as("p90_h_view_purchase"))
    })

  // ---------------------------------------------------------------------
  // q189 — daily-activity streak distribution
  // ---------------------------------------------------------------------

  /** The engagement streak metric: each user's LONGEST run of
    * consecutive active days, rolled into a distribution (how many
    * users peak at a k-day streak). Gaps-and-islands in its purest
    * calendar form — distinct (user, day) pairs, day − row_number is
    * constant exactly within a consecutive run (the q133 anchor trick
    * on the day axis), island length = anchor-group size, per-user max,
    * then a count-of-counts rollup. The event stream reduces map-side
    * to user-days before any window; windows partition per user; the
    * output is streak-length-domain-sized. Pure integers throughout. */
  private val q189 = QueryDef(
    "q189_daily_streak_distribution",
    "longest consecutive-day activity streak per user, as a distribution",
    Some("""
      WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
                  FROM events),
      r AS (SELECT user_id, day,
                   day - row_number() OVER (PARTITION BY user_id ORDER BY day)
                     AS anchor
            FROM ud),
      runs AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len
               FROM r GROUP BY user_id, anchor),
      mx AS (SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak
             FROM runs GROUP BY 1)
      SELECT max_streak, CAST(COUNT(*) AS BIGINT) AS n_users
      FROM mx GROUP BY 1 ORDER BY max_streak"""),
    (s, dir) => {
      val ud = Tables.events(s, dir)
        .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
        .distinct()
      val r = ud.withColumn("anchor",
        col("day") - row_number().over(
          Window.partitionBy("user_id").orderBy("day")))
      val runs = r.groupBy("user_id", "anchor").agg(count(lit(1)).as("len"))
      val mx = runs.groupBy("user_id").agg(max(col("len")).as("max_streak"))
      mx.groupBy("max_streak").agg(count(lit(1)).as("n_users"))
        .orderBy("max_streak")
    })

  // ---------------------------------------------------------------------
  // q191 — daily new-vs-returning growth accounting
  // ---------------------------------------------------------------------

  /** The growth-accounting split every DAU chart decomposes into: per
    * day, users active for the FIRST time ever vs returning users, with
    * the cumulative known-user curve alongside. One map-side reduce to
    * distinct (user, day), one user-domain min for the first-seen day,
    * and the day-domain rollup — new = users whose first day IS the
    * day, returning = active − new, and the cumulative curve is the
    * running sum of news (which must end at the total user count — the
    * conservation law the spec checks). All exact integers; one rounded
    * share. */
  private val q191 = QueryDef(
    "q191_new_vs_returning",
    "per day: first-ever vs returning actives + cumulative known users",
    Some("""
      WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
                  FROM events),
      fs AS (SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY 1),
      d AS (SELECT ud.day,
                   CAST(COUNT(*) AS BIGINT) AS n_active,
                   CAST(COUNT(CASE WHEN ud.day = fs.first_day THEN 1 END)
                        AS BIGINT) AS n_new
            FROM ud JOIN fs ON ud.user_id = fs.user_id
            GROUP BY 1)
      SELECT day, n_active, n_new,
             n_active - n_new AS n_returning,
             CAST(SUM(n_new) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_users,
             ROUND(CAST(n_new AS DOUBLE) / n_active, 6) + 0.0 AS new_share
      FROM d ORDER BY day"""),
    (s, dir) => {
      val ud = Tables.events(s, dir)
        .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
        .distinct()
      val fs = ud.groupBy(col("user_id").as("fuid"))
        .agg(min(col("day")).as("first_day"))
      val d = ud.join(fs, col("user_id") === col("fuid"))
        .groupBy("day")
        .agg(count(lit(1)).as("n_active"),
          count(when(col("day") === col("first_day"), 1)).as("n_new"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      d.select(col("day"), col("n_active"), col("n_new"),
          (col("n_active") - col("n_new")).as("n_returning"),
          sum(col("n_new")).over(w).cast("long").as("cum_users"),
          (round(col("n_new").cast("double") / col("n_active"), 6) + lit(0.0))
            .as("new_share"))
        .orderBy("day")
    })

  // ---------------------------------------------------------------------
  // q196 — churn-model training snapshot (leakage-free by construction)
  // ---------------------------------------------------------------------

  /** The supervised-training table a churn model consumes, built the
    * only safe way: pick a CUTOFF day D (max event day − 7, derived
    * from the data so every scale factor gets a real label window),
    * compute features STRICTLY BEFORE D and the label STRICTLY ON/AFTER
    * D — temporal leakage is impossible by construction, not by
    * convention, because every feature column conditions on
    * `day < D` inside one conditional aggregate and the label is the
    * only term allowed to look at `day >= D`. Population = users with
    * ≥ 1 event before D (a user born inside the label window has no
    * feature history and would be a label leak dressed as a row).
    * Features: event counts over trailing 3/7/21-day windows, purchase
    * count and decimal-exact spend over 21 days, and integer
    * days-since-last-activity; label: a PURCHASE on/after D (the
    * propensity target — mere activity is near-universal in the
    * fixture, which would make the label degenerate). Scale
    * shape: ONE pass over events (conditional sums inside a single
    * user-keyed hash aggregate, map-side combinable), with the cutoff
    * scalar broadcast — no self-joins, no windows, no per-horizon
    * rescans; the same plan emits any number of horizons at 100 TB.
    * TemporalPlanningSpec recomputes the label and the monotone
    * feature-window laws; PlanSpec pins the single-scan shape. */
  private val q196 = QueryDef(
    "q196_churn_training_snapshot",
    "leakage-free churn training table: trailing features before cutoff, label after",
    Some(s"""
      WITH mx AS (SELECT MAX(epoch_us(ts)) // 86400000000 - 7 AS d0
                  FROM events),
      e AS (SELECT user_id, event_type, value,
                   epoch_us(ts) // 86400000000 AS day
            FROM events),
      f AS (SELECT user_id,
                   CAST(SUM(CASE WHEN day >= d0 - 3 AND day < d0
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_events_3d,
                   CAST(SUM(CASE WHEN day >= d0 - 7 AND day < d0
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_events_7d,
                   CAST(SUM(CASE WHEN day >= d0 - 21 AND day < d0
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_events_21d,
                   CAST(SUM(CASE WHEN day >= d0 - 21 AND day < d0
                                      AND event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_purchases_21d,
                   ${dsumSql("CASE WHEN day >= d0 - 21 AND day < d0 AND event_type = 'purchase' THEN value ELSE 0.0 END")}
                     AS spend_21d,
                   CAST(SUM(CASE WHEN day < d0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_events_pre,
                   CAST(d0 - MAX(CASE WHEN day < d0 THEN day END) AS BIGINT)
                     AS days_since_last,
                   CAST(MAX(CASE WHEN day >= d0 AND event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS INTEGER)
                     AS label_purchase
            FROM e CROSS JOIN mx
            GROUP BY user_id, d0)
      SELECT user_id, n_events_3d, n_events_7d, n_events_21d,
             n_purchases_21d, spend_21d, days_since_last, label_purchase
      FROM f WHERE n_events_pre > 0
      ORDER BY user_id"""),
    (s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("value"),
          expr("ts_us div 86400000000").as("day"))
      val mx = e.agg((max(col("day")) - 7).as("d0"))
      def inWin(lo: Int): org.apache.spark.sql.Column =
        col("day") >= col("d0") - lo && col("day") < col("d0")
      e.crossJoin(broadcast(mx))
        .groupBy("user_id")
        .agg(
          sum(when(inWin(3), 1).otherwise(0)).cast("long").as("n_events_3d"),
          sum(when(inWin(7), 1).otherwise(0)).cast("long").as("n_events_7d"),
          sum(when(inWin(21), 1).otherwise(0)).cast("long").as("n_events_21d"),
          sum(when(inWin(21) && col("event_type") === "purchase", 1)
            .otherwise(0)).cast("long").as("n_purchases_21d"),
          dsum(when(inWin(21) && col("event_type") === "purchase",
            col("value")).otherwise(0.0)).as("spend_21d"),
          sum(when(col("day") < col("d0"), 1).otherwise(0)).cast("long")
            .as("n_events_pre"),
          (max(col("d0")) - max(when(col("day") < col("d0"), col("day"))))
            .cast("long").as("days_since_last"),
          max(when(col("day") >= col("d0") && col("event_type") === "purchase",
            1).otherwise(0)).cast("int").as("label_purchase"))
        .filter(col("n_events_pre") > 0)
        .select("user_id", "n_events_3d", "n_events_7d", "n_events_21d",
          "n_purchases_21d", "spend_21d", "days_since_last", "label_purchase")
        .orderBy("user_id")
    })

  def defs: Seq[QueryDef] =
    Seq(q132, q133, q140, q141, q142, q145, q148, q152, q153, q155, q156,
      q160, q161, q169, q171, q173, q174, q182, q184, q185, q189, q191,
      q196)
}
