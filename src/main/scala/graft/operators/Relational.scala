package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.sources.Tables
import graft.functions.det._
import graft.functions.text

/** Core relational operators (SURVEY.md §2.3–§2.6): scan→filter→project,
  * star joins, semi/anti joins, hash aggregation with map-side partials,
  * rollup, set ops, ranking windows, as-of join.
  *
  * Scale stance (§7.6): dimension tables (region/nation) are broadcast —
  * no shuffle of the fact side; fact-fact joins shuffle on their join key
  * and Catalyst/AQE picks SMJ/SHJ; aggregations get automatic map-side
  * combine (the MapReduce "combiner", §2.1 M3) from HashAggregateExec.
  */
object Relational {

  /** Flagship: TPC-H-Q1-style pricing summary. scan → pushed filter →
    * partial+final hash agg → sort: the whole map/combine/shuffle/reduce
    * essence of the reference in one declarative plan. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q01 = QueryDef(
    "q01_pricing_summary",
    "TPC-H Q1-style pricing summary: filter + grouped sums/avgs on lineitem",
    Some(s"""
      SELECT l_returnflag, l_linestatus,
        ${dsumSql("l_quantity")} AS sum_qty,
        ${dsumSql("l_extendedprice")} AS sum_base_price,
        ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
        ${dsumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
        ${davgSql("l_quantity")} AS avg_qty,
        ${davgSql("l_extendedprice")} AS avg_price,
        ${davgSql("l_discount")} AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    pricingSummary)

  /** Distributed grep (MapReduce classic): LIKE + RLIKE predicates pushed
    * into the scan; only matching rows leave the executors. */
  private val q02 = QueryDef(
    "q02_grep_documents",
    "distributed grep: LIKE/RLIKE filter over documents",
    Some("""
      SELECT doc_id, lang, source, n_chars
      FROM documents
      WHERE lang = 'en' AND (text LIKE '%scan%' OR regexp_matches(text, 'merge (join|sort)'))
      ORDER BY doc_id"""),
    (s, dir) =>
      Tables.documents(s, dir)
        .filter(col("lang") === "en" &&
          (col("text").like("%scan%") || col("text").rlike("merge (join|sort)")))
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id"))

  /** Star join: fact lineitem ⋈ orders ⋈ customer shuffles on keys;
    * nation/region dims are broadcast (25 / 5 rows — never shuffled, and
    * still ≤ MBs at 100 TB fact scale). */
  private val q03 = QueryDef(
    "q03_revenue_by_nation",
    "star-schema join lineitem⋈orders⋈customer⋈nation⋈region, revenue per nation in ASIA",
    Some(s"""
      SELECT n_name, ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
             COUNT(*) AS n_lineitems
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY n_name"""),
    (s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA"
          && col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp")
          && col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
        .groupBy("n_name")
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_lineitems"))
        .orderBy("n_name"))

  /** Ranking window: top-3 orders per customer. Single shuffle on
    * o_custkey; ties broken by o_orderkey for total determinism. */
  private val q04 = QueryDef(
    "q04_topk_orders_per_customer",
    "row_number window: top-3 orders per customer by totalprice",
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders
      QUALIFY rn <= 3
      ORDER BY o_custkey, rn"""),
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    })

  /** Anti join (NOT EXISTS): customers with no URGENT order. Left-anti
    * shuffles only the key column of the build side. */
  private val q05 = QueryDef(
    "q05_customers_without_urgent_orders",
    "left-anti join: customers having no 1-URGENT order",
    Some("""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey"""),
    (s, dir) =>
      Tables.customer(s, dir)
        .join(
          Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey"))

  /** Semi join (EXISTS): customers that produced a purchase event —
    * events.user_id FK into customer (FIXTURES.md referential integrity). */
  private val q06 = QueryDef(
    "q06_customers_with_purchases",
    "left-semi join: customers with at least one purchase event",
    Some("""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE EXISTS (SELECT 1 FROM events
                    WHERE user_id = c_custkey AND event_type = 'purchase')
      ORDER BY c_custkey"""),
    (s, dir) =>
      Tables.customer(s, dir)
        .join(
          Tables.events(s, dir).filter(col("event_type") === "purchase")
            .select(col("user_id")),
          col("c_custkey") === col("user_id"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey"))

  /** ROLLUP with subtotals; NULL grouping keys coalesced to 'ALL' so both
    * engines agree on ordering without NULL-order ambiguity. */
  private val q07 = QueryDef(
    "q07_rollup_revenue",
    "rollup(l_returnflag, l_linestatus) revenue with subtotals",
    Some(s"""
      SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
             COALESCE(l_linestatus, 'ALL') AS linestatus,
             ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
             COUNT(*) AS n_items
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY returnflag, linestatus"""),
    (s, dir) =>
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("revenue"), col("n_items"))
        .orderBy("returnflag", "linestatus"))

  /** Set ops: EXCEPT / INTERSECT (both DISTINCT semantics in Spark and
    * DuckDB) over two filtered order-key sets, tagged and unioned. */
  private val q08 = QueryDef(
    "q08_set_ops_orders",
    "except/intersect/union over urgent vs high-value order key sets",
    Some("""
      SELECT o_orderkey, 'a_only' AS src FROM (
        SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        EXCEPT
        SELECT o_orderkey FROM orders WHERE o_totalprice > 200000.0)
      UNION ALL
      SELECT o_orderkey, 'b_only' AS src FROM (
        SELECT o_orderkey FROM orders WHERE o_totalprice > 200000.0
        EXCEPT
        SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
      UNION ALL
      SELECT o_orderkey, 'both' AS src FROM (
        SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        INTERSECT
        SELECT o_orderkey FROM orders WHERE o_totalprice > 200000.0)
      ORDER BY src, o_orderkey"""),
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val a = o.filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
      val b = o.filter(col("o_totalprice") > 200000.0).select("o_orderkey")
      a.except(b).withColumn("src", lit("a_only"))
        .union(b.except(a).withColumn("src", lit("b_only")))
        .union(a.intersect(b).withColumn("src", lit("both")))
        .orderBy("src", "o_orderkey")
    })

  /** Exact distinct aggregation (count_distinct shuffles on
    * (event_type, user_id) then re-aggregates — scales linearly). */
  private val q09 = QueryDef(
    "q09_distinct_users_per_event_type",
    "count distinct users + totals per event type",
    Some(s"""
      SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
             COUNT(*) AS n_events, ${dsumSql("value")} AS sum_value
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""),
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"),
          dsum(col("value")).as("sum_value"))
        .orderBy("event_type"))

  /** As-of join on the NATIVE operator (graft.plans.AsOfJoinPlan — the
    * full §2.10 extension ladder: LogicalPlan + SparkStrategy +
    * SparkPlan): for each purchase, the latest click by the same user
    * at or before it, in one co-partitioned merge pass. Through round 9
    * this was composed as equi-join + rank-1 window — correct, but it
    * materializes every (purchase, earlier-click) pair per user before
    * the rank filter and pays a second window sort; the native operator
    * is O(1) memory per task with zero pair fan-out (see
    * AsOfJoinPlan.scala). The oracle SQL is unchanged — the window
    * composition remains the SEMANTIC SPEC the operator must match.
    * All comparisons in epoch MICROseconds — both engines read the
    * parquet at µs precision, so ordering is bit-identical. */
  private val q10 = QueryDef(
    "q10_asof_click_before_purchase",
    "as-of join: latest click at-or-before each purchase per user",
    Some("""
      SELECT user_id, purchase_id, click_id, p_us - c_us AS gap_us FROM (
        SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
               epoch_us(p.ts) AS p_us, epoch_us(c.ts) AS c_us,
               row_number() OVER (PARTITION BY p.event_id
                 ORDER BY c.ts DESC NULLS LAST, c.event_id DESC NULLS LAST) AS rn
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id AND c.ts <= p.ts)
      WHERE rn = 1
      ORDER BY user_id, purchase_id"""),
    (s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts_us").as("us"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("us").as("p_us"))
      val c = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_uid"),
          col("us").as("c_us"))
      graft.plans.AsOfJoin
        .backward(p, c, "user_id", "c_uid", "p_us", "c_us", "click_id")
        .select(col("user_id"), col("purchase_id"), col("click_id"),
          (col("p_us") - col("c_us")).as("gap_us"))
        .orderBy("user_id", "purchase_id")
    })

  /** q10's as-of with the BOUNDED-distance form every mature as-of
    * surface exposes (pandas merge_asof `tolerance`, kdb `wj`, QuestDB
    * `ASOF ... TOLERANCE`): only a click within the last 30 minutes
    * counts as the purchase's attribution source; staler matches fall
    * back to NULL exactly like no-match rows. Runs on the NATIVE
    * operator's tolerance path — emit-time bound check inside the same
    * O(1)-memory merge pass (plans/AsOfJoinPlan.scala), differential-
    * tested against the bounded window composition in AsOfJoinSpec —
    * while the oracle states the composition directly. */
  private val q221 = QueryDef(
    "q221_asof_tolerance_attribution",
    "as-of with 30-min tolerance: attributing click within bound, else NULL",
    Some("""
      SELECT user_id, purchase_id, click_id, gap_us FROM (
        SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
               epoch_us(p.ts) - epoch_us(c.ts) AS gap_us,
               row_number() OVER (PARTITION BY p.event_id
                 ORDER BY c.ts DESC NULLS LAST, c.event_id DESC NULLS LAST) AS rn
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id AND c.ts <= p.ts
         AND epoch_us(c.ts) >= epoch_us(p.ts) - 1800000000)
      WHERE rn = 1
      ORDER BY user_id, purchase_id"""),
    (s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts_us").as("us"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("us").as("p_us"))
      val c = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_uid"),
          col("us").as("c_us"))
      graft.plans.AsOfJoin
        .backward(p, c, "user_id", "c_uid", "p_us", "c_us", "click_id",
          tolerance = Some(1800000000L))
        .select(col("user_id"), col("purchase_id"), col("click_id"),
          (col("p_us") - col("c_us")).as("gap_us"))
        .orderBy("user_id", "purchase_id")
    })

  /** The as-of join through its SQL SURFACE: `graft_asof(...)` is the
    * table-valued function GraftExtensions registers (round-10 verdict
    * item 4 — the native operator was Scala-API-only), here computing
    * the conversion twin of q221: for each CLICK, the first purchase
    * strictly after it within 24 h (forward as-of + tolerance), else
    * NULL. The SQL route resolves the named temp views eagerly, builds
    * the same AsOfJoinPlan the Scala API builds, and plans the same
    * native AsOfJoinExec (AsOfJoinSpec pins that); the temp views are
    * dropped immediately after analysis, so the registered query stays
    * pure from the caller's perspective. Oracle states the bounded
    * rank-1 window composition, as for q10/q69/q221. */
  private val q222 = QueryDef(
    "q222_asof_sql_conversion_window",
    "SQL graft_asof TVF: first purchase within 24h after each click",
    Some("""
      SELECT user_id, click_id, purchase_id, gap_us FROM (
        SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
               epoch_us(p.ts) - epoch_us(c.ts) AS gap_us,
               row_number() OVER (PARTITION BY c.event_id
                 ORDER BY p.ts ASC NULLS LAST, p.event_id ASC NULLS LAST) AS rn
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON p.user_id = c.user_id AND p.ts > c.ts
         AND epoch_us(p.ts) <= epoch_us(c.ts) + 86400000000)
      WHERE rn = 1
      ORDER BY user_id, click_id"""),
    (s, dir) => {
      graft.GraftExtensions.register(s)
      val e = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts_us").as("us"))
      e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("us").as("c_us"))
        .createOrReplaceTempView("graft_q222_clicks")
      e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"),
          col("user_id").as("p_uid"), col("us").as("p_us"))
        .createOrReplaceTempView("graft_q222_purchases")
      try {
        // identifier-style arguments (round-11 ADVICE item 7): table
        // and column references written the way every other TVF takes
        // them — GraftExtensions' analyzer rule literalizes them before
        // TVF resolution (string literals remain accepted)
        s.sql("""SELECT user_id, click_id, purchase_id,
                 |       p_us - c_us AS gap_us
                 |FROM graft_asof(forward, graft_q222_clicks,
                 |  graft_q222_purchases, user_id, p_uid, c_us,
                 |  p_us, purchase_id, 86400000000)""".stripMargin)
          .orderBy("user_id", "click_id")
      } finally {
        // sqlBuilder resolved the views eagerly during analysis above —
        // dropping them now leaves the returned plan self-contained
        s.catalog.dropTempView("graft_q222_clicks"): Unit
        s.catalog.dropTempView("graft_q222_purchases"): Unit
      }
    })

  /** direction='nearest' — the third as-of mode every mature surface
    * exposes (pandas merge_asof direction='nearest'): each purchase is
    * attributed to its temporally CLOSEST click within ±2 h, in either
    * direction, with equal distances breaking toward the backward
    * (click-before) candidate and the per-direction tie rules of
    * q10/q69 (backward largest, forward smallest click id). The signed
    * gap (positive = click before purchase) reveals which side won.
    * Runs on the native operator's nearest path — both per-direction
    * candidates fall out of the same single merge pass, distances
    * compare unsigned so ordering is exact at any magnitude
    * (plans/AsOfJoinPlan.scala) — while the oracle states the explicit
    * two-sided bounded composition. */
  private val q224 = QueryDef(
    "q224_asof_nearest_attribution",
    "nearest as-of: closest click within ±2h of each purchase, backward ties",
    Some("""
      SELECT user_id, purchase_id, click_id, gap_us FROM (
        SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
               epoch_us(p.ts) - epoch_us(c.ts) AS gap_us,
               row_number() OVER (PARTITION BY p.event_id ORDER BY
                 ABS(epoch_us(c.ts) - epoch_us(p.ts)) ASC,
                 CASE WHEN c.ts <= p.ts THEN 0 ELSE 1 END ASC,
                 CASE WHEN c.ts <= p.ts THEN -c.event_id
                      ELSE c.event_id END ASC) AS rn
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id
         AND ABS(epoch_us(c.ts) - epoch_us(p.ts)) <= 7200000000)
      WHERE rn = 1
      ORDER BY user_id, purchase_id"""),
    (s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts_us").as("us"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("us").as("p_us"))
      val c = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_uid"),
          col("us").as("c_us"))
      graft.plans.AsOfJoin
        .nearest(p, c, "user_id", "c_uid", "p_us", "c_us", "click_id",
          tolerance = Some(7200000000L))
        .select(col("user_id"), col("purchase_id"), col("click_id"),
          (col("p_us") - col("c_us")).as("gap_us"))
        .orderBy("user_id", "purchase_id")
    })

  /** COMPOSITE-key as-of (pandas merge_asof `by=[...]` parity) through
    * `AsOfJoin.byKeys`: for each shipment, the gap to the PREVIOUS
    * shipment of the same (supplier, part) pair — repeat-supply cadence,
    * the replenishment-interval signal. Strict past is encoded by
    * probing at t−1 µs (backward as-of includes ties; the probe shift
    * excludes same-instant rows exactly), and the two key columns ride
    * as one struct key with any-field-null → no-match. The oracle is a
    * genuinely different formulation: a RANGE-frame window MAX
    * (UNBOUNDED PRECEDING .. 1 PRECEDING over epoch-µs), which states
    * "latest strictly-earlier time per key" without any join — the
    * as-of must agree row-for-row. Self-as-of at scale beats the
    * window form for the same reason as q10: no pair fan-out. */
  private val q225 = QueryDef(
    "q225_asof_bykeys_repeat_shipment",
    "composite-key as-of: gap to the previous shipment of the same (supplier, part)",
    Some("""
      SELECT l_suppkey, l_partkey, l_orderkey * 8 + l_linenumber AS line_uid,
             epoch_us(l_shipdate) - MAX(epoch_us(l_shipdate)) OVER (
               PARTITION BY l_suppkey, l_partkey
               ORDER BY epoch_us(l_shipdate)
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS gap_us
      FROM lineitem
      ORDER BY l_suppkey, l_partkey, line_uid"""),
    (s, dir) => {
      // ship date may scan as TIMESTAMP_NTZ (fixture drift; see
      // Tables.tsTolerant) — cast under the pinned UTC session like
      // q213, so epoch-µs agree with DuckDB's epoch_us bit-for-bit
      val li = Tables.lineitem(s, dir).select(
        col("l_suppkey"), col("l_partkey"),
        (col("l_orderkey") * 8 + col("l_linenumber")).as("line_uid"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"))
      val lSide = li.select(col("l_suppkey").as("ls"), col("l_partkey").as("lp"),
        col("line_uid"), col("ship_us"),
        (col("ship_us") - 1).as("probe_us"))
      val rSide = li.select(col("l_suppkey").as("rs"), col("l_partkey").as("rp"),
        col("line_uid").as("r_uid"), col("ship_us").as("r_us"))
      graft.plans.AsOfJoin.byKeys(lSide, rSide,
          graft.plans.AsOfDirection.Backward,
          Seq("ls", "lp"), Seq("rs", "rp"), "probe_us", "r_us", "r_uid")
        .select(col("ls").as("l_suppkey"), col("lp").as("l_partkey"),
          col("line_uid"), (col("ship_us") - col("r_us")).as("gap_us"))
        .orderBy("l_suppkey", "l_partkey", "line_uid")
    })

  /** BROADCAST as-of (round-11 verdict item 2, the no-left-exchange
    * shape): every shipment is priced against its supplier's most
    * recent MONTHLY reference checkpoint — a (supplier, month-start)
    * table of average prices over months with ≥ 5 shipments, i.e. a
    * dimension-sized time series derived with one map-side-combined
    * aggregate. The fact side (lineitem) flows from its scan STRAIGHT
    * into the as-of: AsOfJoinStrategy sees the checkpoint table's
    * stats under the broadcast threshold and plans
    * BroadcastAsOfJoinExec — no lineitem shuffle, no lineitem sort,
    * only the checkpoint table moves (one BroadcastExchange, per-key
    * binary-search index on each executor). At 100 TB that is the
    * difference between shuffling the fact twice (checkpoint build
    * would be its only shuffle — map-side partials collapse it to
    * dimension size first) and shuffling it three times. The 60-day
    * tolerance nulls out shipments whose supplier had no qualifying
    * month recently (sparse-history suppliers), exercising the
    * no-match path. Oracle states the bounded rank-1 window
    * composition over the same checkpoint CTE. */
  private val q226 = QueryDef(
    "q226_asof_broadcast_monthly_checkpoint",
    "broadcast as-of: shipment priced vs supplier's last monthly checkpoint",
    Some(s"""
      WITH ck AS (
        SELECT l_suppkey AS ck_supp,
               epoch_us(date_trunc('month', l_shipdate)) AS ck_us,
               ${dsumSql("l_extendedprice")} AS ck_sum,
               CAST(COUNT(*) AS BIGINT) AS ck_n
        FROM lineitem GROUP BY 1, 2 HAVING COUNT(*) >= 5),
      l AS (SELECT l_suppkey, l_returnflag, l_extendedprice,
                   epoch_us(l_shipdate) AS ship_us
            FROM lineitem),
      -- the as-of match depends only on (supplier, ship time), so state
      -- it per DISTINCT probe with a MAX (backward = latest qualifying
      -- checkpoint) — no per-left-row identity needed (the fixture's
      -- (orderkey, linenumber) pairs are NOT unique, so a rank-1-per-row
      -- composition would silently drop duplicate rows)
      best AS (SELECT l_suppkey AS b_supp, ship_us AS b_us,
                      MAX(ck_us) AS ck_us
               FROM (SELECT DISTINCT l_suppkey, ship_us FROM l) p
               JOIN ck ON ck_supp = l_suppkey AND ck_us <= ship_us
                      AND ck_us >= ship_us - 5184000000000
               GROUP BY 1, 2),
      m AS (SELECT l.l_returnflag, l.l_extendedprice, l.ship_us,
                   best.ck_us, ck.ck_sum, ck.ck_n
            FROM l LEFT JOIN best ON b_supp = l.l_suppkey
                                 AND b_us = l.ship_us
                   LEFT JOIN ck ON ck.ck_supp = l.l_suppkey
                               AND ck.ck_us = best.ck_us)
      SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_shipments,
             CAST(COUNT(ck_us) AS BIGINT) AS n_attributed,
             CAST(SUM(ship_us - ck_us) AS BIGINT) AS sum_gap_us,
             ${dsumSql("CASE WHEN ck_us IS NOT NULL THEN l_extendedprice - ck_sum / ck_n END")}
               AS price_drift
      FROM m GROUP BY 1 ORDER BY l_returnflag"""),
    (s, dir) => {
      // ship date may scan as TIMESTAMP_NTZ — cast under the pinned UTC
      // session so epoch-µs and month-starts agree with DuckDB
      val shipTs = col("l_shipdate").cast("timestamp")
      // the checkpoint carries (exact-decimal sum, count), NOT the
      // average: the per-month mean lands on exact .xxxx5 quotients
      // (2-decimal prices over single-digit counts) where Spark's
      // BigDecimal HALF_UP round and DuckDB's bankers/true-binary round
      // disagree in the 4th decimal. Dividing PER ROW at use gives both
      // engines identical IEEE operands -> bit-identical drift values.
      val ck = Tables.lineitem(s, dir)
        .select(col("l_suppkey").as("ck_supp"), col("l_extendedprice"),
          unix_micros(date_trunc("month", shipTs)).as("ck_us"))
        .groupBy("ck_supp", "ck_us")
        .agg(count(lit(1)).as("ck_n"), dsum(col("l_extendedprice")).as("ck_sum"))
        .filter(col("ck_n") >= 5)
      val li = Tables.lineitem(s, dir).select(
        col("l_suppkey"), col("l_returnflag"), col("l_extendedprice"),
        unix_micros(shipTs).as("ship_us"))
      graft.plans.AsOfJoin
        .backward(li, ck, "l_suppkey", "ck_supp", "ship_us", "ck_us",
          "ck_us", tolerance = Some(5184000000000L))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_shipments"),
          count(col("ck_us")).as("n_attributed"),
          sum(col("ship_us") - col("ck_us")).as("sum_gap_us"),
          dsum(when(col("ck_us").isNotNull,
            col("l_extendedprice") - col("ck_sum") / col("ck_n")))
            .as("price_drift"))
        .orderBy("l_returnflag")
    })

  /** KEYLESS (global) as-of through the SALTED wrapper — the 100%-skew
    * limit of the as-of family: site-wide "last click anywhere before
    * this purchase" puts the WHOLE stream under one equi-key, so the
    * plain operator's ClusteredDistribution lands every row in a
    * single task and no runtime skew handling can split a custom
    * operator's partition. [[graft.plans.AsOfJoin.salted]] (q134's
    * degree-adaptive discipline): the left profile marks the constant
    * key heavy, purchases spread over 8 deterministic salts, and the
    * click timeline REPLICATES into each salt — every salt merges
    * against the complete history, so per-row matches are identical to
    * the unsalted operator (AsOfJoinSpec's skew family pins this) while
    * the merge itself runs 8-way. The oracle states the semantic
    * directly as a running last_value over the interleaved stream —
    * clicks order before purchases at equal µs (backward match is
    * at-or-before) and among equal-time clicks the largest event_id
    * wins (the operator's tie rule). */
  private val q248 = QueryDef(
    "q248_salted_global_asof_attribution",
    "site-wide last click before each purchase (keyless as-of, salted 8-way)",
    Some("""
      WITH ev AS (SELECT event_id, epoch_us(ts) AS tu, event_type
                  FROM events WHERE event_type IN ('click', 'purchase')),
      w AS (SELECT event_id, tu, event_type,
                   last_value(CASE WHEN event_type = 'click' THEN event_id END
                       IGNORE NULLS) OVER strm AS last_click_id,
                   last_value(CASE WHEN event_type = 'click' THEN tu END
                       IGNORE NULLS) OVER strm AS last_click_us
            FROM ev
            WINDOW strm AS (ORDER BY tu,
                CASE WHEN event_type = 'click' THEN 0 ELSE 1 END, event_id
              ROWS UNBOUNDED PRECEDING))
      SELECT event_id AS purchase_id, last_click_id, tu - last_click_us AS gap_us
      FROM w WHERE event_type = 'purchase'
      ORDER BY purchase_id"""),
    (s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"), col("ts_us").as("us"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), lit(0L).as("p_g"),
          col("us").as("p_us"))
      val c = e.filter(col("event_type") === "click")
        .select(col("event_id").as("last_click_id"), lit(0L).as("c_g"),
          col("us").as("c_us"))
      graft.plans.AsOfJoin.salted(p, c, graft.plans.AsOfDirection.Backward,
          "p_g", "c_g", "p_us", "c_us", "last_click_id",
          saltSource = Some("purchase_id"), minDegree = 256L, maxSalts = 8)
        .select(col("purchase_id"), col("last_click_id"),
          (col("p_us") - col("c_us")).as("gap_us"))
        .orderBy("purchase_id")
    })

  /** Multiset (ALL) set operations: bag difference/intersection preserve
    * duplicate multiplicities — exceptAll keeps max(m_a - m_b, 0) copies,
    * intersectAll min(m_a, m_b) — identical semantics in Spark and
    * DuckDB. Aggregated to per-key counts for a stable, ordered result. */
  private val q47 = QueryDef(
    "q47_set_ops_multiset",
    "exceptAll/intersectAll over duplicate-bearing partkey bags",
    Some("""
      SELECT l_partkey, 'a_minus_b' AS src, COUNT(*) AS n FROM (
        SELECT l_partkey FROM lineitem WHERE l_quantity > 25.0
        EXCEPT ALL
        SELECT l_partkey FROM lineitem WHERE l_discount > 0.05)
      GROUP BY l_partkey
      UNION ALL
      SELECT l_partkey, 'a_and_b' AS src, COUNT(*) AS n FROM (
        SELECT l_partkey FROM lineitem WHERE l_quantity > 25.0
        INTERSECT ALL
        SELECT l_partkey FROM lineitem WHERE l_discount > 0.05)
      GROUP BY l_partkey
      ORDER BY src, l_partkey"""),
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val a = li.filter(col("l_quantity") > 25.0).select("l_partkey")
      val b = li.filter(col("l_discount") > 0.05).select("l_partkey")
      a.exceptAll(b).groupBy("l_partkey").agg(count(lit(1)).as("n"))
        .withColumn("src", lit("a_minus_b"))
        .union(
          a.intersectAll(b).groupBy("l_partkey").agg(count(lit(1)).as("n"))
            .withColumn("src", lit("a_and_b")))
        .select("l_partkey", "src", "n")
        .orderBy("src", "l_partkey")
    })

  /** FULL OUTER join — the one outer-join kind the other queries don't
    * exercise (left: q44/q69; semi/anti: q05/q06). Two cohort aggregates
    * over DIFFERENT tables (urgent-order customers vs clicking users)
    * genuinely populate both null sides — fixture referential integrity
    * means a raw fact⟗dim full-outer would degenerate to a left join.
    * Null-side accounting (the `side` tag + coalesced key) is the usual
    * cohort-compare recipe. Scale: both sides pre-aggregate BEFORE the
    * join, so the full-outer shuffles two already-small keyed tables —
    * a shuffled hash/merge join on the coalesced key domain. */
  private val q79 = QueryDef(
    "q79_full_outer_cohort_compare",
    "full outer join of urgent-order customers vs clicking users, with side tag",
    Some("""
      SELECT COALESCE(a.k, b.k) AS cust_id,
             a.n_urgent, b.n_clicks,
             CASE WHEN a.k IS NULL THEN 'events_only'
                  WHEN b.k IS NULL THEN 'orders_only'
                  ELSE 'both' END AS side
      FROM (SELECT o_custkey AS k, COUNT(*) AS n_urgent FROM orders
            WHERE o_orderpriority = '1-URGENT' GROUP BY 1) a
      FULL OUTER JOIN
           (SELECT user_id AS k, COUNT(*) AS n_clicks FROM events
            WHERE event_type = 'click' GROUP BY 1) b
        ON a.k = b.k
      ORDER BY cust_id"""),
    (s, dir) => {
      val a = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_custkey").as("ak"))
        .agg(count(lit(1)).as("n_urgent"))
      val b = Tables.events(s, dir)
        .filter(col("event_type") === "click")
        .groupBy(col("user_id").as("bk"))
        .agg(count(lit(1)).as("n_clicks"))
      a.join(b, col("ak") === col("bk"), "full")
        .select(
          coalesce(col("ak"), col("bk")).as("cust_id"),
          col("n_urgent"), col("n_clicks"),
          when(col("ak").isNull, "events_only")
            .when(col("bk").isNull, "orders_only")
            .otherwise("both").as("side"))
        .orderBy("cust_id")
    })

  /** RIGHT OUTER join, written right-outer on purpose (not mirrored to
    * left) so the §2.4 kind is exercised as such: per-user event counts
    * on the LEFT, the full customer dimension on the RIGHT — every
    * customer survives, event-less customers null-extend. Catalyst is
    * free to build the hash side either way; at scale the small
    * pre-aggregated side broadcasts. */
  private val q81 = QueryDef(
    "q81_right_outer_customer_events",
    "right outer join: per-customer event counts, event-less customers kept",
    Some("""
      SELECT c.c_custkey, c.c_mktsegment, e.n_events,
             CASE WHEN e.user_id IS NULL THEN 1 ELSE 0 END AS no_events
      FROM (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY 1) e
      RIGHT OUTER JOIN customer c ON e.user_id = c.c_custkey
      ORDER BY c_custkey"""),
    (s, dir) => {
      val e = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      e.join(Tables.customer(s, dir), col("user_id") === col("c_custkey"), "right")
        .select(col("c_custkey"), col("c_mktsegment"), col("n_events"),
          when(col("user_id").isNull, 1).otherwise(0).as("no_events"))
        .orderBy("c_custkey")
    })

  // ---------------------------------------------------------------------
  // q107 — cascading delete propagation audit (right-to-be-forgotten)
  // ---------------------------------------------------------------------

  /** The erasure-request dry run: a deterministic 2% hash slice of
    * customers plays the delete list, and the audit reports — per table
    * along the FK chain customer → orders → lineitem → events — how many
    * rows the cascade removes and how many survive. This is the
    * accounting a pipeline publishes BEFORE applying a privacy purge,
    * and the shape matters at 100 TB: each fact table is touched ONCE,
    * with the kill set (always request-sized, tiny vs the corpus)
    * reduced to the join keys it needs and BROADCAST into semi-join
    * probes — orders resolves the doomed o_orderkey set (itself still
    * request-sized) for lineitem, so the cascade never shuffles a fact
    * table. Counts are exact longs; the final union is 4 rows. */
  private val q107 = QueryDef(
    "q107_delete_cascade_audit",
    "per-table removed/surviving row counts for a 2% customer erasure cascade",
    Some(s"""
      WITH kill AS (SELECT c_custkey FROM customer
                    WHERE ${graft.functions.text.md5Hash60Sql(
                      "'del:' || CAST(c_custkey AS VARCHAR)")} % 50 = 0),
      ord AS (SELECT o_orderkey, o_custkey FROM orders),
      okill AS (SELECT o_orderkey FROM ord
                JOIN kill ON o_custkey = c_custkey),
      t AS (
        SELECT 'customer' AS table_name,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_rows,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM kill) AS n_removed
        UNION ALL
        SELECT 'orders',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM ord),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM okill)
        UNION ALL
        SELECT 'lineitem',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
                JOIN okill ON l_orderkey = o_orderkey)
        UNION ALL
        SELECT 'events',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM events),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM events
                JOIN kill ON user_id = c_custkey))
      SELECT table_name, n_rows, n_removed,
             n_rows - n_removed AS n_surviving
      FROM t ORDER BY table_name"""),
    (s, dir) => {
      import graft.functions.text
      val kill = Tables.customer(s, dir)
        .filter(text.md5Hash60(concat(lit("del:"),
          col("c_custkey").cast("string"))) % 50 === 0)
        .select("c_custkey")
      val okill = Tables.orders(s, dir)
        .join(broadcast(kill), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey")
      def audit(name: String, full: DataFrame, removed: DataFrame) =
        full.agg(count(lit(1)).as("n_rows"))
          .crossJoin(removed.agg(count(lit(1)).as("n_removed")))
          .select(lit(name).as("table_name"), col("n_rows"), col("n_removed"))
      audit("customer", Tables.customer(s, dir), kill)
        .union(audit("orders", Tables.orders(s, dir), okill))
        .union(audit("lineitem", Tables.lineitem(s, dir),
          Tables.lineitem(s, dir).join(broadcast(okill),
            col("l_orderkey") === col("o_orderkey"))))
        .union(audit("events", Tables.events(s, dir),
          Tables.events(s, dir).join(broadcast(kill),
            col("user_id") === col("c_custkey"))))
        .select(col("table_name"), col("n_rows"), col("n_removed"),
          (col("n_rows") - col("n_removed")).as("n_surviving"))
        .orderBy("table_name")
    })

  /** TPC-H Q5's shape: the six-table snowflake with the extra
    * NON-TREE edge c_nationkey = s_nationkey ("customer buying from a
    * LOCAL supplier") — the query pattern that actually exercises
    * Catalyst's join reordering and CBO, because the customer and
    * supplier branches meet twice (through orders/lineitem AND through
    * the nation equality). q03 is the tree-shaped star; this is the
    * cyclic one. Both dims broadcast, the date filter pushes to the
    * orders scan, and revenue ordering on the 4-dp rounded decimal sums
    * is total with the nation tiebreak. */
  private val q168 = QueryDef(
    "q168_local_supplier_volume",
    "TPC-H Q5 shape: revenue via local suppliers per ASIA nation, one year",
    Some(s"""
      SELECT n_name, ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
             COUNT(*) AS n_lineitems
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name"""),
    (s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey")
            && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA"
          && col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp")
          && col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
        .groupBy("n_name")
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_lineitems"))
        .orderBy(col("revenue").desc, col("n_name")))

  /** Double-charge detection: two orders by the SAME customer for the
    * SAME total within 2 days — the accounting screen for duplicate
    * submissions. The fixture's synthetic prices are effectively
    * unique, so a deterministic 2% hash slice is re-submitted one day
    * later (key-offset clones — the q157/q159 plant→detect
    * discipline); the audit must find exactly those retries plus any
    * organic repeats. The pair space is an EQUI-join on (custkey,
    * totalprice) — price equality is PART OF THE KEY, so the join only
    * fans out over true repeat amounts — with the date window and a<b
    * orientation checked inside the matched group. Reported per
    * segment: pairs, customers involved, duplicated money at risk,
    * tightest gap. Exact doubles compare exactly (same parquet
    * bits). */
  private val q181 = QueryDef(
    "q181_double_charge_audit",
    "same customer+total within 2 days: planted-retry duplicate-charge audit",
    Some(s"""
      WITH allo AS (SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
                    FROM orders
                    UNION ALL
                    SELECT o_orderkey + 10000000, o_custkey, o_totalprice,
                           o_orderdate + INTERVAL 1 DAY
                    FROM orders
                    WHERE ${text.md5Hash60Sql("'retry:' || CAST(o_orderkey AS VARCHAR)")}
                            % 50 = 0),
      p AS (SELECT a.o_custkey AS ck, a.o_totalprice AS price,
                   abs(datediff('day', a.o_orderdate, b.o_orderdate)) AS gap
            FROM allo a JOIN allo b
              ON a.o_custkey = b.o_custkey
             AND a.o_totalprice = b.o_totalprice
             AND a.o_orderkey < b.o_orderkey
            WHERE abs(datediff('day', a.o_orderdate, b.o_orderdate)) <= 2)
      SELECT c_mktsegment AS segment,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(COUNT(DISTINCT ck) AS BIGINT) AS n_customers,
             ${dsumSql("price")} AS dup_money,
             CAST(MIN(gap) AS BIGINT) AS min_gap_days
      FROM p JOIN customer ON ck = c_custkey
      GROUP BY 1 ORDER BY 1"""),
    (s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate"))
      val retries = o
        .filter(graft.functions.text.md5Hash60(
          concat(lit("retry:"), col("o_orderkey").cast("string"))) % 50L === 0L)
        .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
          col("o_custkey"), col("o_totalprice"),
          (col("o_orderdate") + expr("INTERVAL 1 DAY")).as("o_orderdate"))
      val allo = o.unionByName(retries)
      val b = allo.select(col("o_orderkey").as("bok"),
        col("o_custkey").as("bck"), col("o_totalprice").as("bprice"),
        col("o_orderdate").as("bdate"))
      val p = allo.join(b,
          col("o_custkey") === col("bck")
            && col("o_totalprice") === col("bprice")
            && col("o_orderkey") < col("bok"))
        .filter(abs(datediff(col("bdate"), col("o_orderdate"))) <= 2)
        .select(col("o_custkey").as("ck"), col("o_totalprice").as("price"),
          abs(datediff(col("bdate"), col("o_orderdate"))).as("gap"))
      p.join(Tables.customer(s, dir), col("ck") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("ck")).as("n_customers"),
          dsum(col("price")).as("dup_money"),
          min(col("gap")).cast("long").as("min_gap_days"))
        .orderBy("segment")
    })

  /** MapReduce COUNTERS (SURVEY §2.1 M8) as a registered, oracled
    * query: `Dataset.observe` accumulates job-side metrics — rows
    * scanned, chars scanned, rows kept by a grep-style filter — on the
    * executors while the job runs (the `Observation` helper collects
    * them on completion, exactly how a production job reports custom
    * counters next to its output write). The observed totals are then
    * FOLDED INTO the result rows as literal columns, so the DuckDB
    * oracle independently recomputes every counter: if observe ever
    * under- or over-counted, the hash gate fails. In production the
    * counters ride the main output action; the harness contract wants
    * a returned DataFrame, so here a count() action carries them and
    * the per-lang readout recomputes — the observe pass costs one scan
    * of a pushdown-pruned 4-column projection. */
  private val q195 = QueryDef(
    "q195_observed_scan_counters",
    "Dataset.observe job counters (scanned/kept) folded into a grep readout",
    Some("""
      WITH tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS rows_scanned,
                          CAST(SUM(n_chars) AS BIGINT) AS chars_scanned
                   FROM documents),
      k AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
                   CAST(SUM(n_chars) AS BIGINT) AS kept_chars
            FROM documents WHERE text LIKE '%vector%' GROUP BY lang),
      kt AS (SELECT CAST(COALESCE(SUM(n_kept), 0) AS BIGINT) AS rows_kept
             FROM k)
      SELECT k.lang, k.n_kept, k.kept_chars,
             t.rows_scanned, t.chars_scanned, kt.rows_kept
      FROM k CROSS JOIN tot t CROSS JOIN kt
      ORDER BY k.lang"""),
    (s, dir) => {
      val scanObs = org.apache.spark.sql.Observation()
      val keptObs = org.apache.spark.sql.Observation()
      val base = Tables.documents(s, dir)
        .select(col("lang"), col("n_chars"), col("text"))
        .observe(scanObs, count(lit(1)).as("rows_scanned"),
          sum(col("n_chars")).cast("long").as("chars_scanned"))
      val kept = base.filter(col("text").like("%vector%"))
        .observe(keptObs, count(lit(1)).as("rows_kept"))
      // the action the counters ride (production: the output write)
      kept.count()
      val rowsScanned = scanObs.get("rows_scanned").asInstanceOf[Long]
      val charsScanned = scanObs.get("chars_scanned").asInstanceOf[Long]
      val rowsKept = keptObs.get("rows_kept").asInstanceOf[Long]
      kept.groupBy("lang")
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_chars")).cast("long").as("kept_chars"))
        .select(col("lang"), col("n_kept"), col("kept_chars"),
          lit(rowsScanned).as("rows_scanned"),
          lit(charsScanned).as("chars_scanned"),
          lit(rowsKept).as("rows_kept"))
        .orderBy("lang")
    })

  // ---------------------------------------------------------------------
  // q249 — correlated LATERAL subquery (per-row dependent table expr)
  // ---------------------------------------------------------------------

  /** The correlated-LATERAL join surface (SQL:1999 lateral derived
    * tables, first-class in Spark 4): for every nation, the top-2
    * customers by account balance, written as `FROM nation, LATERAL
    * (SELECT ... WHERE c_nationkey = n_nationkey ORDER BY ... LIMIT 2)`
    * — the "per-row dependent subquery" shape analysts reach for before
    * they learn window functions. The interesting part is what Spark
    * MAKES of it: DecorrelateInnerQuery rewrites the correlated
    * LIMIT-per-key into a row_number window partitioned by the
    * correlation key plus one equi-join — so the executed plan is
    * exactly q04's (WindowGroupLimit-able rank + broadcast hash join),
    * NOT a nested-loop re-execution of the subquery per outer row.
    * PlanSpec pins that: one Window node, a broadcast hash join on the
    * correlation key, and no BroadcastNestedLoopJoin/CartesianProduct
    * anywhere — the rewrite is what makes the surface safe at 100 TB
    * (a per-row replay would be O(|outer| · |inner|)). Both engines
    * bind the same SQL text; DuckDB executes its own decorrelation. */
  private val q249 = QueryDef(
    "q249_lateral_topk_per_nation",
    "correlated LATERAL (ORDER BY ... LIMIT 2) per nation, decorrelated to a window",
    Some("""
      SELECT n.n_name, t.c_name, t.c_acctbal
      FROM nation n, LATERAL (
        SELECT c_name, c_acctbal FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
      ORDER BY n.n_name, t.c_acctbal DESC, t.c_name"""),
    (s, dir) => {
      Tables.nation(s, dir).createOrReplaceTempView("graft_q249_nation")
      Tables.customer(s, dir).createOrReplaceTempView("graft_q249_customer")
      try {
        s.sql("""SELECT n.n_name, t.c_name, t.c_acctbal
                 |FROM graft_q249_nation n, LATERAL (
                 |  SELECT c_name, c_acctbal FROM graft_q249_customer c
                 |  WHERE c.c_nationkey = n.n_nationkey
                 |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
                 |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin)
      } finally {
        // analysis above resolved the views eagerly (q222 discipline) —
        // dropping them leaves the returned plan self-contained
        s.catalog.dropTempView("graft_q249_nation"): Unit
        s.catalog.dropTempView("graft_q249_customer"): Unit
      }
    })

  // ---------------------------------------------------------------------
  // q256 — LIMIT/OFFSET pagination (the deep-page cut without a sort)
  // ---------------------------------------------------------------------

  /** The ANSI pagination surface (Spark 3.4+ OFFSET): page 3 of the
    * customer leaderboard — rows 41-60 of ORDER BY (c_acctbal DESC,
    * c_custkey). The interesting part is the physical shape: Spark
    * folds offset+limit into ONE TakeOrderedAndProject(limit=60,
    * offset=40) — a per-partition top-60 heap plus a 60-row driver
    * merge that discards the first 40 — so a deep-ish page costs a
    * bounded heap, never a global sort (PlanSpec pins the node and the
    * absence of a global Sort/single-partition window). The tiebreak on
    * c_custkey makes the page deterministic, so the DuckDB oracle's
    * identical LIMIT/OFFSET text hash-matches row for row. At true
    * depth (OFFSET 10^9) every engine degrades — keyset pagination
    * (WHERE (bal, key) < last-seen ORDER BY ... LIMIT n) is the 100 TB
    * answer, and this page shape is exactly its first-page primitive. */
  private val q256 = QueryDef(
    "q256_offset_pagination",
    "ORDER BY ... LIMIT 20 OFFSET 40 through one bounded TakeOrdered heap",
    Some("""
      SELECT c_custkey, c_name, c_acctbal
      FROM customer
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 20 OFFSET 40"""),
    (s, dir) => {
      Tables.customer(s, dir)
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .offset(40)
        .limit(20)
    })

  // ---------------------------------------------------------------------
  // q257 — keyset pagination (the 100 TB page: anchor filter, no offset)
  // ---------------------------------------------------------------------

  /** The scale-correct sibling of q256: OFFSET n makes every engine
    * materialize (or heap) n + page rows, so a crawler at page 10^6 is
    * quadratic in pages — KEYSET pagination instead anchors on the last
    * row already served and filters `(bal, key) < anchor` before an
    * ordinary top-20 cut. Here the anchor is row 40 of the (c_acctbal
    * DESC, c_custkey) order — computed by the same bounded
    * TakeOrdered heap (limit 40, reversed, limit 1), broadcast as one
    * row — and the page is the composite-key strict-after filter +
    * TakeOrderedAndProject(limit=20): the filter prunes BEFORE the
    * heap, so page depth never grows the state (at 100 TB the anchor
    * filter additionally prunes row groups through the zone maps of a
    * bal-sorted layout). The result is exactly q256's rows 41-60 — the
    * hash gate proves OFFSET ≡ keyset on real data, which is the whole
    * point of the anchor trick. */
  private val q257 = QueryDef(
    "q257_keyset_pagination",
    "keyset (anchor-filtered) page ≡ OFFSET page: rows 41-60 without an offset heap",
    Some("""
      WITH p2 AS (SELECT c_acctbal AS ab, c_custkey AS ak
                  FROM customer
                  ORDER BY c_acctbal DESC, c_custkey LIMIT 40),
      anchor AS (SELECT ab, ak FROM p2 ORDER BY ab ASC, ak DESC LIMIT 1)
      SELECT c_custkey, c_name, c_acctbal
      FROM customer, anchor
      WHERE c_acctbal < ab OR (c_acctbal = ab AND c_custkey > ak)
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 20"""),
    (s, dir) => {
      val cust = Tables.customer(s, dir)
        .select("c_custkey", "c_name", "c_acctbal")
      val anchor = cust
        .orderBy(col("c_acctbal").desc, col("c_custkey")).limit(40)
        .orderBy(col("c_acctbal").asc, col("c_custkey").desc).limit(1)
        .select(col("c_acctbal").as("ab"), col("c_custkey").as("ak"))
      cust.crossJoin(broadcast(anchor))
        .filter(col("c_acctbal") < col("ab") ||
          (col("c_acctbal") === col("ab") && col("c_custkey") > col("ak")))
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .limit(20)
    })

  def defs: Seq[QueryDef] =
    Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q47, q79, q81, q107,
      q126, q127, q168, q181, q195, q221, q222, q224, q225, q226, q248, q249,
      q256, q257, q261)

  // ---------------------------------------------------------------------
  // q127 — column profile (the schema-drift / ingestion-health report)
  // ---------------------------------------------------------------------

  /** Data profiling over the events table: per column, NULL count and
    * exact distinct count — the per-ingest report that catches schema
    * drift (a column suddenly all-NULL, a key column's cardinality
    * collapsing) before any downstream query does. ONE pass: all six
    * (count, distinct) pairs ride a single aggregate (Spark plans the
    * multi-distinct via Expand — one scan, |columns| streams), and the
    * wide one-row result is unpivoted to the long report shape
    * map-side. At 100 TB exact distincts per column are the expensive
    * honest form; the sketched swap-in is q56's HLL registers per
    * column (q121 maintains them incrementally). Exact longs only. */
  private val q127 = QueryDef(
    "q127_column_profile",
    "per-column null and exact distinct counts over events, one pass",
    Some("""
      WITH a AS (SELECT COUNT(*) AS n,
                        COUNT(event_id) AS c1,
                        COUNT(DISTINCT event_id) AS d1,
                        COUNT(epoch_us(ts)) AS c2,
                        COUNT(DISTINCT epoch_us(ts)) AS d2,
                        COUNT(user_id) AS c3, COUNT(DISTINCT user_id) AS d3,
                        COUNT(event_type) AS c4,
                        COUNT(DISTINCT event_type) AS d4,
                        COUNT(value) AS c5, COUNT(DISTINCT value) AS d5,
                        COUNT(props) AS c6, COUNT(DISTINCT props) AS d6
                 FROM events)
      SELECT column_name, CAST(n_nulls AS BIGINT) AS n_nulls,
             CAST(n_distinct AS BIGINT) AS n_distinct
      FROM (SELECT 'event_id' AS column_name, n - c1 AS n_nulls,
                   d1 AS n_distinct FROM a
            UNION ALL SELECT 'ts_us', n - c2, d2 FROM a
            UNION ALL SELECT 'user_id', n - c3, d3 FROM a
            UNION ALL SELECT 'event_type', n - c4, d4 FROM a
            UNION ALL SELECT 'value', n - c5, d5 FROM a
            UNION ALL SELECT 'props', n - c6, d6 FROM a)
      ORDER BY column_name"""),
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val a = ev.agg(count(lit(1)).as("n"),
        count(col("event_id")).as("c1"),
        count_distinct(col("event_id")).as("d1"),
        count(col("ts_us")).as("c2"), count_distinct(col("ts_us")).as("d2"),
        count(col("user_id")).as("c3"), count_distinct(col("user_id")).as("d3"),
        count(col("event_type")).as("c4"),
        count_distinct(col("event_type")).as("d4"),
        count(col("value")).as("c5"), count_distinct(col("value")).as("d5"),
        count(col("props")).as("c6"), count_distinct(col("props")).as("d6"))
      def row(name: String, c: String, d: String) =
        struct(lit(name).as("column_name"),
          (col("n") - col(c)).as("n_nulls"), col(d).as("n_distinct"))
      a.select(explode(array(
          row("event_id", "c1", "d1"), row("ts_us", "c2", "d2"),
          row("user_id", "c3", "d3"), row("event_type", "c4", "d4"),
          row("value", "c5", "d5"), row("props", "c6", "d6"))).as("s"))
        .select(col("s.column_name"), col("s.n_nulls"), col("s.n_distinct"))
        .orderBy("column_name")
    })

  // ---------------------------------------------------------------------
  // q126 — referential-integrity audit (the data-quality gate)
  // ---------------------------------------------------------------------

  /** The DQ report a pipeline publishes before trusting FK joins: for
    * each edge of the star schema (lineitem→orders, orders→customer,
    * events→customer, customer→nation), how many child rows exist, how
    * many are ORPHANS (no parent — left anti), how many parents exist,
    * and how many are CHILDLESS (no child — anti the other way). Each
    * count is one anti-join where the key side is reduced to a single
    * column before joining — at 100 TB the parent key sets of dimension
    * tables broadcast, and the fact-fact edge (lineitem→orders) is the
    * standard shuffled anti-join on the FK. A healthy fixture reports
    * zero orphans on every edge; the query's value is that a non-zero
    * ever-appearing IS the alert. Four rows, exact longs. */
  private val q126 = QueryDef(
    "q126_referential_integrity",
    "per-FK-edge child/orphan/parent/childless counts across the star schema",
    Some("""
      WITH t AS (
        SELECT 'customer->nation' AS edge,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_child,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
                WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))
                 AS n_orphans,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM nation) AS n_parents,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM nation
                WHERE n_nationkey NOT IN (SELECT c_nationkey FROM customer))
                 AS n_childless
        UNION ALL
        SELECT 'events->customer',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM events),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM events
                WHERE user_id NOT IN (SELECT c_custkey FROM customer)),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM customer),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
                WHERE c_custkey NOT IN (SELECT user_id FROM events))
        UNION ALL
        SELECT 'lineitem->orders',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
                WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
                WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem))
        UNION ALL
        SELECT 'orders->customer',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
                WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM customer),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
                WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)))
      SELECT edge, n_child, n_orphans, n_parents, n_childless
      FROM t ORDER BY edge"""),
    (s, dir) => {
      def audit(edge: String, child: DataFrame, childKey: String,
          parent: DataFrame, parentKey: String) = {
        val ck = child.select(col(childKey))
        val pk = parent.select(col(parentKey))
        child.agg(count(lit(1)).as("n_child"))
          .crossJoin(ck.join(pk, col(childKey) === col(parentKey), "left_anti")
            .agg(count(lit(1)).as("n_orphans")))
          .crossJoin(parent.agg(count(lit(1)).as("n_parents")))
          .crossJoin(pk.join(ck, col(parentKey) === col(childKey), "left_anti")
            .agg(count(lit(1)).as("n_childless")))
          .select(lit(edge).as("edge"), col("n_child"), col("n_orphans"),
            col("n_parents"), col("n_childless"))
      }
      audit("customer->nation", Tables.customer(s, dir), "c_nationkey",
          Tables.nation(s, dir), "n_nationkey")
        .union(audit("events->customer", Tables.events(s, dir), "user_id",
          Tables.customer(s, dir), "c_custkey"))
        .union(audit("lineitem->orders", Tables.lineitem(s, dir), "l_orderkey",
          Tables.orders(s, dir), "o_orderkey"))
        .union(audit("orders->customer", Tables.orders(s, dir), "o_custkey",
          Tables.customer(s, dir), "c_custkey"))
        .orderBy("edge")
    })

  // ---------------------------------------------------------------------
  // q261 — schema-catalog audit (DESCRIBE / information-schema shape)
  // ---------------------------------------------------------------------

  /** Catalog introspection as a first-class gate (round-15 verdict item
    * 6): the DESCRIBE-shaped audit a warehouse runs before trusting a
    * dataset version — per table, its schema WIDTH (from the parquet
    * footers, zero data read) and row count, cross-engine verified
    * (DuckDB recomputes the widths via `DESCRIBE <t>` subqueries and
    * the counts from the same parquet). What each half proves
    * (round-19 ADVICE — the earlier comment oversold the cross-engine
    * diff as a drift alarm on its own):
    *  - `n_cols`/`n_rows` cross-engine: Spark and DuckDB agree on the
    *    parquet FOOTER interpretation, and the shared loader dispatch
    *    ([[graft.sources.Tables.load]]) is width-neutral (no column
    *    silently added/dropped on the Spark side). Both engines read
    *    the SAME files, so a real fixture drift moves both sides
    *    identically and this diff alone stays clean.
    *  - `expected_cols`: the FIXTURES.md-recorded width as a CODE
    *    CONSTANT ([[graft.sources.Tables.expectedWidth]]), embedded as
    *    the same literal in both engines — a dropped/added column or a
    *    truncated ingest now surfaces IN THE ARTIFACT as a visible
    *    `n_cols != expected_cols` row (on both sides, so the gate stays
    *    hash-green while the drift is still self-evident), and
    *    SourcesSpec hard-fails the equality on the fixtures.
    * At 100 TB the schema half is metadata-only, and each row count is
    * a column-pruned count aggregate (the scan reads no data columns).
    * events is audited at its RAW footer surface (the engine-derived
    * `ts_us` convenience column is dropped — the oracle sees the files,
    * not the session's view). */
  private val q261 = QueryDef(
    "q261_schema_catalog_audit",
    "per-table schema width + row count, DESCRIBE-verified cross-engine",
    Some("""
      SELECT table_name, n_cols, expected_cols, n_rows FROM (
        SELECT 'region' AS table_name,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM (DESCRIBE region)) AS n_cols,
               CAST(2 AS BIGINT) AS expected_cols,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM region) AS n_rows
        UNION ALL SELECT 'nation',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM (DESCRIBE nation)),
               CAST(3 AS BIGINT),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM nation)
        UNION ALL SELECT 'customer',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM (DESCRIBE customer)),
               CAST(5 AS BIGINT),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM customer)
        UNION ALL SELECT 'supplier',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM (DESCRIBE supplier)),
               CAST(4 AS BIGINT),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM supplier)
        UNION ALL SELECT 'part',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM (DESCRIBE part)),
               CAST(6 AS BIGINT),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM part)
        UNION ALL SELECT 'orders',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM (DESCRIBE orders)),
               CAST(6 AS BIGINT),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders)
        UNION ALL SELECT 'lineitem',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM (DESCRIBE lineitem)),
               CAST(11 AS BIGINT),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem)
        UNION ALL SELECT 'events',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM (DESCRIBE events)),
               CAST(6 AS BIGINT),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM events)
        UNION ALL SELECT 'documents',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM (DESCRIBE documents)),
               CAST(5 AS BIGINT),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM documents)
        UNION ALL SELECT 'embeddings',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM (DESCRIBE embeddings)),
               CAST(3 AS BIGINT),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings))
      ORDER BY table_name"""),
    (s, dir) => {
      val loaded: Seq[(String, DataFrame)] = Tables.names.map { n =>
        val df = Tables.load(s, dir, n) // the shared drift-tolerant dispatch
        // events' engine-derived ts_us convenience column is dropped so
        // the audited width is the RAW footer surface the oracle sees
        n -> (if (n == "events") df.drop("ts_us") else df)
      }
      loaded.map { case (name, df) =>
        df.agg(count(lit(1)).as("n_rows"))
          .select(lit(name).as("table_name"),
            lit(df.schema.size.toLong).as("n_cols"),
            lit(Tables.expectedWidth(name).toLong).as("expected_cols"),
            col("n_rows"))
      }.reduce(_.unionByName(_)).orderBy("table_name")
    })
}
