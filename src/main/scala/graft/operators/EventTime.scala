package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.sources.Tables
import graft.functions.det._

/** Event-time windowing expressed as batch over `events` (SURVEY.md
  * §2.8): tumbling, sliding, and session windows. The harness is strictly
  * batch, so these use the same `window()`/island formulations that a
  * Structured Streaming job would — see graft.streaming for the streaming
  * runtime variant of the tumbling aggregation.
  *
  * All timestamps are compared in epoch MICROseconds: `Tables.events`
  * derives `ts_us` whatever the fixture's physical ts encoding (int64-ns
  * or µs TIMESTAMP_NTZ — it has drifted between driver generations),
  * and DuckDB's `epoch_us(ts)` is bit-identical to ts_us either way.
  */
object EventTime {

  /** Tumbling 1-day windows via Spark's window() generator; window start
    * is the UTC day boundary = date_trunc on the oracle side. */
  private val q18 = QueryDef(
    "q18_tumbling_daily_counts",
    "tumbling 1-day event-time windows: counts + value sums per type",
    Some(s"""
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             COUNT(*) AS n, ${dsumSql("value")} AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY day, event_type"""),
    (s, dir) =>
      Tables.events(s, dir)
        .withColumn("ts_t", timestamp_micros(col("ts_us")))
        .groupBy(window(col("ts_t"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("w.start").cast("date").as("day"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("day", "event_type"))

  /** Sliding 6h windows every 1h: Spark's window() assigns each event to
    * 6 epoch-aligned windows; the oracle reproduces that assignment
    * explicitly (hour-truncate minus i hours, i ∈ 0..5). */
  private val q19 = QueryDef(
    "q19_sliding_6h_1h_counts",
    "sliding 6-hour windows every 1 hour over events",
    Some(s"""
      SELECT epoch_us(date_trunc('hour', ts) - i * INTERVAL 1 HOUR) AS ws_us,
             COUNT(*) AS n, ${dsumSql("value")} AS sum_value
      FROM events CROSS JOIN (SELECT unnest(range(0, 6)) AS i) g
      GROUP BY 1
      ORDER BY ws_us"""),
    (s, dir) =>
      Tables.events(s, dir)
        .withColumn("ts_t", timestamp_micros(col("ts_us")))
        .groupBy(window(col("ts_t"), "6 hours", "1 hour").as("w"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(unix_micros(col("w.start")).as("ws_us"), col("n"), col("sum_value"))
        .orderBy("ws_us"))

  /** Session windows (30-min inactivity gap) via the island method —
    * identical, integer-only logic on both engines (SURVEY.md §7.4 #3:
    * more robust than session_window vs DuckDB-SQL equivalence).
    * Scale note: one shuffle on user_id; per-user state is a running sum,
    * exactly what flatMapGroupsWithState would keep in streaming. */
  private val q20 = QueryDef(
    "q20_session_windows",
    "per-user session windows with 30-minute gap (island method)",
    Some("""
      SELECT user_id, session_id, COUNT(*) AS n_events,
             MIN(us) AS start_us, MAX(us) AS end_us,
             MAX(us) - MIN(us) AS duration_us
      FROM (
        SELECT user_id, us, CAST(SUM(new_sess) OVER (
                 PARTITION BY user_id ORDER BY us, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM (
          SELECT user_id, epoch_us(ts) AS us, event_id,
                 CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                      >= 1800000000
                      OR lag(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
                 THEN 1 ELSE 0 END AS new_sess
          FROM events))
      GROUP BY user_id, session_id
      ORDER BY user_id, session_id"""),
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val gap = col("us") - lag(col("us"), 1).over(w)
      Tables.events(s, dir)
        .select(col("user_id"), col("ts_us").as("us"), col("event_id"))
        .withColumn("new_sess",
          when(gap.isNull || gap >= 1800000000L, 1).otherwise(0))
        .withColumn("session_id",
          sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"))
        .groupBy("user_id", "session_id")
        .agg(
          count(lit(1)).as("n_events"),
          min(col("us")).as("start_us"),
          max(col("us")).as("end_us"),
          (max(col("us")) - min(col("us"))).as("duration_us"))
        .orderBy("user_id", "session_id")
    })

  /** Sliding-window time-series similarity (PAPERS.md EDBT'19 theme):
    * squared Euclidean distance between every 8-step window of the
    * global event value series and a fixed query pattern [1..8] — the
    * subsequence-matching primitive behind matrix-profile/DTW pipelines
    * (this is the exact, unnormalized form). The 8-term distance sum is
    * written left-associated to match DuckDB's list_sum fold order, so
    * parity needs only the final 4-dp round.
    *
    * The plan is PARTITION-PARALLEL — no window over the full series:
    *  1. rows are day-chunked (`ts_us DIV 1 day`; the day order equals
    *     the (ts, event_id) order, so per-chunk ranks + a per-chunk
    *     row-count offset reconstruct the GLOBAL row number exactly);
    *  2. the per-day offset table (one row per day — the only
    *     unpartitioned window, dimension-sized by construction) is
    *     broadcast;
    *  3. a row is COPIED into a later chunk iff that chunk starts
    *     within 7 global positions after it (the (k-1)-row overlap), so
    *     every 8-row window is complete inside its own chunk partition —
    *     correct even for days with fewer than 7 events, because carry
    *     eligibility is decided on global row numbers, not day counts;
    *  4. the 7-PRECEDING collect_list window runs partitioned by chunk.
    * At 100 TB this is the textbook chunk-with-overlap series scan: the
    * heavy window never funnels through one task, and the duplicated
    * rows are bounded by 7 per chunk boundary. A spec asserts equality
    * with the single-window exact form; `value IS NOT NULL` is explicit
    * on both sides (collect_list/list() drop NULLs — don't let parity
    * hinge on an undeclared fixture invariant). */
  private val q74 = QueryDef(
    "q74_sliding_window_distance",
    "top-20 closest 8-step sliding windows to pattern [1..8] (squared L2)",
    Some("""
      WITH s AS (
        SELECT event_id, value,
               list(value) OVER (ORDER BY epoch_us(ts), event_id
                                 ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS w,
               row_number() OVER (ORDER BY epoch_us(ts), event_id) AS rn
        FROM events
        WHERE value IS NOT NULL)
      SELECT event_id,
             ROUND(list_sum(list_transform(generate_series(1, 8),
               i -> (w[i] - i) * (w[i] - i))), 4) AS dist
      FROM s WHERE rn >= 8
      ORDER BY dist, event_id
      LIMIT 20"""),
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("value").isNotNull)
        .select(col("event_id"), col("ts_us"), col("value"),
          expr("ts_us DIV 86400000000").as("chunk"))
      // global rn = per-chunk rank + rows-before-chunk offset
      val wc = Window.partitionBy("chunk").orderBy(col("ts_us"), col("event_id"))
      val offsets = ev.groupBy("chunk").agg(count(lit(1)).as("cnt"))
        .withColumn("off", coalesce(sum(col("cnt")).over(
          Window.orderBy("chunk").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .select(col("chunk"), col("off"))
      val rows = ev.withColumn("lrn", row_number().over(wc))
        .join(broadcast(offsets), Seq("chunk"))
        .select(col("event_id"), col("value"),
          (col("off") + col("lrn")).as("rn"), col("chunk"))
      // overlap copies: row rn feeds chunk t iff t starts in (rn, rn+7]
      val carries = rows.join(
          broadcast(offsets.select(col("chunk").as("tchunk"), col("off").as("toff"))),
          col("toff") + 1 > col("rn") && col("toff") + 1 <= col("rn") + 7)
        .select(col("event_id"), col("value"), col("rn"),
          col("tchunk").as("chunk"), lit(false).as("native"))
      val all = rows.withColumn("native", lit(true))
        .select("event_id", "value", "rn", "chunk", "native")
        .union(carries)
      val ww = Window.partitionBy("chunk").orderBy("rn").rowsBetween(-7, 0)
      val withW = all.withColumn("w", collect_list(col("value")).over(ww))
        .filter(col("native") && col("rn") >= 8)
      val dist = (1 to 8).map { i =>
        val d = element_at(col("w"), i) - i
        d * d
      }.reduce(_ + _)
      withW
        .select(col("event_id"), round(dist, 4).as("dist"))
        .orderBy(col("dist"), col("event_id"))
        .limit(20)
    })

  /** Daily event-volume anomaly detection — the batch form of the
    * metric monitor every ingestion pipeline runs: per (event_type,
    * day), today's count z-scored against the TRAILING 7 days
    * (ROWS 7 PRECEDING..1 PRECEDING — the current day never pollutes
    * its own baseline), flagged at |z| ≥ 2. The baseline moments are
    * integer window sums (Σn, Σn² over ≤7 longs — exact), so z is a
    * fixed sequence of IEEE ops over identical bits on both engines
    * with one correctly-rounded sqrt (the q97 discipline); z is NULL
    * until a full 7-day baseline exists or when the baseline is
    * constant (zero variance), surfacing warm-up honestly instead of
    * dividing by zero. The window partitions by event_type — bounded
    * cardinality, the same per-key shape a streaming deployment gives
    * the operator for free via watermarked state. */
  /** q120's oracle, shared verbatim with the streaming-replay parity
    * query (q194 in Online) — the online monitor must hash-match the
    * exact same DuckDB readout as the batch job it mirrors. */
  private[operators] val dailyAnomalyOracle: String = s"""
      WITH d AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                        CAST(COUNT(*) AS BIGINT) AS n
                 FROM events GROUP BY 1, 2),
      w AS (SELECT event_type, day, n,
                   COUNT(*) OVER fr AS cnt,
                   CAST(COALESCE(SUM(n) OVER fr, 0) AS BIGINT) AS s1,
                   CAST(COALESCE(SUM(n * n) OVER fr, 0) AS BIGINT) AS s2
            FROM d WINDOW fr AS (PARTITION BY event_type ORDER BY day
                                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
      z AS (SELECT event_type, day, n, cnt, s1,
                   CASE WHEN cnt = 7 AND s2 * cnt > s1 * s1
                        THEN ROUND((n - CAST(s1 AS DOUBLE) / cnt)
                               / SQRT((CAST(s2 AS DOUBLE)
                                       - CAST(s1 AS DOUBLE) * s1 / cnt) / cnt),
                               4) + 0.0
                   END AS z
            FROM w)
      SELECT event_type, day, n,
             CASE WHEN cnt > 0
                  THEN ROUND(CAST(s1 AS DOUBLE) / cnt, 4) + 0.0
             END AS baseline_mean,
             z,
             CASE WHEN z IS NOT NULL AND ABS(z) >= 2.0 THEN 1 ELSE 0 END
               AS anomaly
      FROM z ORDER BY event_type, day"""

  private val q120 = QueryDef(
    "q120_daily_volume_anomaly",
    "per-type daily counts z-scored against the trailing 7 days, |z| >= 2 flagged",
    Some(dailyAnomalyOracle),
    (s, dir) => {
      val d = Tables.events(s, dir)
        .groupBy(col("event_type"),
          to_date(timestamp_micros(col("ts_us"))).as("day"))
        .agg(count(lit(1)).as("n"))
      val fr = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-7, -1)
      val w = d
        .withColumn("cnt", count(lit(1)).over(fr))
        .withColumn("s1", coalesce(sum(col("n")).over(fr), lit(0L)))
        .withColumn("s2", coalesce(sum(col("n") * col("n")).over(fr), lit(0L)))
      val zc = when(col("cnt") === 7 && col("s2") * col("cnt") > col("s1") * col("s1"),
        round((col("n") - col("s1").cast("double") / col("cnt"))
          / sqrt((col("s2").cast("double")
            - col("s1").cast("double") * col("s1") / col("cnt")) / col("cnt")),
          4) + 0.0)
      w.withColumn("z", zc)
        .select(col("event_type"), col("day"), col("n"),
          when(col("cnt") > 0,
            round(col("s1").cast("double") / col("cnt"), 4) + 0.0)
            .as("baseline_mean"),
          col("z"),
          when(col("z").isNotNull && abs(col("z")) >= 2.0, 1).otherwise(0)
            .as("anomaly"))
        .orderBy("event_type", "day")
    })

  def defs: Seq[QueryDef] = Seq(q18, q19, q20, q74, q120)
}
