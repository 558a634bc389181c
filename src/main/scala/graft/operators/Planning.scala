package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables
import graft.functions.{det, text}
import graft.functions.det._

/** Physical-planning / layout operators: the queries an engine runs
  * ABOUT its own execution at scale — skew-safe join salting, Z-order
  * layout locality, join-cardinality profiling (shuffle-size estimation
  * from degree tables, never the join itself), Bloom-filter membership
  * with measured FPR, winsorized robust statistics, and a zone-map
  * pruning audit (the parquet row-group-stats story quantified).
  *
  * Determinism discipline as everywhere: md5-derived hashes instead of
  * RNG, exact-decimal double sums ([[graft.functions.det]]), total ORDER
  * BY, integer arithmetic wherever the semantics allow.
  */
object Planning {

  private def hkey(prefix: String, c: Column): Column =
    text.md5Hash60(concat(lit(prefix), c.cast("string")))

  private def hkeySql(prefix: String, x: String): String =
    text.md5Hash60Sql(s"'$prefix' || CAST($x AS VARCHAR)")

  // ---------------------------------------------------------------------
  // q134 — salted skew-safe fact-fact join (the join twin of q82)
  // ---------------------------------------------------------------------

  /** Revenue by order priority through a DEGREE-ADAPTIVE salted
    * lineitem ⋈ orders join: the profiler's degree table (q136's input)
    * identifies the skew tail — keys with ≥ 8 fact rows, ~5% of the
    * domain here and by definition rare under real skew — and ONLY
    * those keys get salted, with a per-key replication factor
    * `least(4, degree/4)` proportional to their measured degree.
    * Light keys join directly with salt 0 and zero replication, so the
    * build-side blow-up of blanket salting (replicate EVERY key ×N —
    * 8× the dimension for nothing) never happens; replication cost is
    * Σ over heavy keys only, which is what makes explicit salting
    * viable at 100 TB where AQE's runtime skew split is the implicit
    * alternative. The heavy-key list (key, nsalt) broadcasts into both
    * sides; the join key becomes (orderkey, salt), spreading each hot
    * key over its nsalt reducers. The oracle runs the UNSALTED direct
    * join: bit-equality of the exact-decimal aggregates (q82's
    * precedent) IS the correctness claim, proving the two-tier salting
    * is pure plumbing. PlanSpec asserts the (key, salt) exchange with
    * broadcast disabled. */
  private val q134 = QueryDef(
    "q134_salted_skew_join",
    "degree-adaptive salted lineitem-orders join == direct join, bit-equal",
    Some(s"""
      SELECT o_orderpriority, COUNT(*) AS n_items,
             ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""),
    (s, dir) => {
      val heavy = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey").as("hk"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 8)
        .select(col("hk"), least(lit(4L), expr("deg div 4")).as("nsalt"))
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("l_discount"))
        .join(broadcast(heavy), col("l_orderkey") === col("hk"), "left")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"),
          when(col("nsalt").isNotNull,
            hkey("jsalt:", concat(col("l_orderkey").cast("string"), lit(":"),
              col("l_linenumber").cast("string"))) % col("nsalt"))
            .otherwise(0L).as("salt"))
      val reps = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority"))
        .join(broadcast(heavy), col("o_orderkey") === col("hk"), "left")
        .select(col("o_orderkey"), col("o_orderpriority"),
          explode(sequence(lit(0L), coalesce(col("nsalt"), lit(1L)) - 1L))
            .as("rsalt"))
      li.join(reps,
          col("l_orderkey") === col("o_orderkey") && col("salt") === col("rsalt"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
        .orderBy("o_orderpriority")
    })

  // ---------------------------------------------------------------------
  // q135 — Z-order (Morton) layout locality audit
  // ---------------------------------------------------------------------

  /** 8-bit-per-dimension Morton interleave terms, built once for both
    * engines' expressions from the same formula. */
  private def mortonTermsSql: String =
    (0 until 8).map(i =>
      s"(((px >> $i) & 1) << ${2 * i + 1}) + (((sx >> $i) & 1) << ${2 * i})")
      .mkString(" + ")

  /** Would a Z-order layout of lineitem on (partkey, suppkey) let zone
    * maps prune BOTH dimensions? The audit quantifies it: bucket both
    * keys to 8 bits, compute the 16-bit Morton code (bit interleave —
    * pure integer arithmetic, identical on both engines), group rows
    * into the 256 static code ranges a sorted layout would produce as
    * contiguous file chunks, and report the mean number of distinct
    * part/supp buckets each chunk touches — versus the lexicographic
    * (partkey-major) sort, whose chunks pin one part bucket but span
    * every supp bucket. Morton chunks touch ≤ 16 of each (the √N
    * locality guarantee); lexicographic chunks touch 1 × all. All
    * map-side integer arithmetic over STATIC ranges — auditing a sort
    * order needs no sort. */
  private val q135 = QueryDef(
    "q135_zorder_locality_audit",
    "Morton vs lexicographic layout: distinct key-buckets per file chunk",
    Some(s"""
      WITH b AS (SELECT CAST(l_partkey % 256 AS INTEGER) AS px,
                        CAST(l_suppkey % 256 AS INTEGER) AS sx
                 FROM lineitem),
      m AS (SELECT px, sx, ($mortonTermsSql) >> 8 AS rng FROM b),
      mg AS (SELECT rng, COUNT(DISTINCT px) AS np, COUNT(DISTINCT sx) AS ns
             FROM m GROUP BY rng),
      lg AS (SELECT px AS rng, COUNT(DISTINCT px) AS np, COUNT(DISTINCT sx) AS ns
             FROM b GROUP BY px)
      SELECT 'lexicographic' AS strategy, COUNT(*) AS n_ranges,
             ${davgSql("CAST(np AS DOUBLE)")} AS avg_part_buckets,
             ${davgSql("CAST(ns AS DOUBLE)")} AS avg_supp_buckets
      FROM lg
      UNION ALL
      SELECT 'morton', COUNT(*),
             ${davgSql("CAST(np AS DOUBLE)")}, ${davgSql("CAST(ns AS DOUBLE)")}
      FROM mg
      ORDER BY strategy"""),
    (s, dir) => {
      val b = Tables.lineitem(s, dir)
        .select((col("l_partkey") % 256).cast("int").as("px"),
          (col("l_suppkey") % 256).cast("int").as("sx"))
      def bit(c: Column, i: Int): Column = shiftright(c, i).bitwiseAND(lit(1))
      val morton = (0 until 8).map(i =>
        shiftleft(bit(col("px"), i), 2 * i + 1) +
          shiftleft(bit(col("sx"), i), 2 * i)).reduce(_ + _)
      def audit(grouped: DataFrame, name: String): DataFrame =
        grouped.agg(count(lit(1)).as("n_ranges"),
            davg(col("np").cast("double")).as("avg_part_buckets"),
            davg(col("ns").cast("double")).as("avg_supp_buckets"))
          .select(lit(name).as("strategy"), col("n_ranges"),
            col("avg_part_buckets"), col("avg_supp_buckets"))
      val mg = b.withColumn("rng", shiftright(morton, 8)).groupBy("rng")
        .agg(countDistinct(col("px")).as("np"), countDistinct(col("sx")).as("ns"))
      val lg = b.groupBy(col("px").as("rng"))
        .agg(countDistinct(col("px")).as("np"), countDistinct(col("sx")).as("ns"))
      audit(lg, "lexicographic").unionByName(audit(mg, "morton"))
        .orderBy("strategy")
    })

  // ---------------------------------------------------------------------
  // q136 — join-cardinality / skew profiler (shuffle-size estimation)
  // ---------------------------------------------------------------------

  /** Exact output cardinality, matched-key count, and worst-key share for
    * every join edge in the star schema — computed from the two DEGREE
    * tables (per-key counts, key-domain-sized) joined on the key, never
    * by materializing the join itself: |A ⋈ B| = Σ_k d_A(k)·d_B(k). This
    * is the "measure, don't guess" planning input — max_key_share is
    * what q134's salt count and AQE's skew threshold should be sized
    * from, and join_rows is the shuffle volume estimate. Each side
    * collapses map-side to its degree table first, and the side
    * cardinalities come from the SAME tables (n = Σ degree — every row
    * of a side is under exactly one key), so the profiler costs two
    * partial aggregates per edge regardless of join fan-out, with no
    * second scan of either input. */
  private val q136 = QueryDef(
    "q136_join_cardinality_profiler",
    "per-join-edge exact cardinality + worst-key share from degree tables",
    Some("""
      WITH dl1 AS (SELECT l_orderkey AS k, COUNT(*) AS dl FROM lineitem GROUP BY 1),
      dr1 AS (SELECT o_orderkey AS k, COUNT(*) AS dr FROM orders GROUP BY 1),
      j1 AS (SELECT COUNT(*) AS n_join_keys,
                    CAST(SUM(dl * dr) AS BIGINT) AS join_rows,
                    CAST(MAX(dl * dr) AS BIGINT) AS max_key_rows
             FROM dl1 JOIN dr1 USING (k)),
      dl2 AS (SELECT o_custkey AS k, COUNT(*) AS dl FROM orders GROUP BY 1),
      dr2 AS (SELECT c_custkey AS k, COUNT(*) AS dr FROM customer GROUP BY 1),
      j2 AS (SELECT COUNT(*) AS n_join_keys,
                    CAST(SUM(dl * dr) AS BIGINT) AS join_rows,
                    CAST(MAX(dl * dr) AS BIGINT) AS max_key_rows
             FROM dl2 JOIN dr2 USING (k)),
      dl3 AS (SELECT user_id AS k, COUNT(*) AS dl FROM events GROUP BY 1),
      dr3 AS (SELECT c_custkey AS k, COUNT(*) AS dr FROM customer GROUP BY 1),
      j3 AS (SELECT COUNT(*) AS n_join_keys,
                    CAST(SUM(dl * dr) AS BIGINT) AS join_rows,
                    CAST(MAX(dl * dr) AS BIGINT) AS max_key_rows
             FROM dl3 JOIN dr3 USING (k))
      SELECT 'events-customer' AS edge,
             (SELECT CAST(SUM(dl) AS BIGINT) FROM dl3) AS n_left,
             (SELECT CAST(SUM(dr) AS BIGINT) FROM dr3) AS n_right,
             n_join_keys, join_rows, max_key_rows,
             ROUND(CAST(max_key_rows AS DOUBLE) / join_rows, 6) + 0.0 AS max_key_share
      FROM j3
      UNION ALL
      SELECT 'lineitem-orders',
             (SELECT CAST(SUM(dl) AS BIGINT) FROM dl1),
             (SELECT CAST(SUM(dr) AS BIGINT) FROM dr1),
             n_join_keys, join_rows, max_key_rows,
             ROUND(CAST(max_key_rows AS DOUBLE) / join_rows, 6) + 0.0
      FROM j1
      UNION ALL
      SELECT 'orders-customer',
             (SELECT CAST(SUM(dl) AS BIGINT) FROM dl2),
             (SELECT CAST(SUM(dr) AS BIGINT) FROM dr2),
             n_join_keys, join_rows, max_key_rows,
             ROUND(CAST(max_key_rows AS DOUBLE) / join_rows, 6) + 0.0
      FROM j2
      ORDER BY edge"""),
    (s, dir) => {
      def edge(name: String, l: DataFrame, lk: String,
          r: DataFrame, rk: String): DataFrame = {
        val dl = l.groupBy(col(lk).as("k")).agg(count(lit(1)).as("dl"))
        val dr = r.groupBy(col(rk).as("k")).agg(count(lit(1)).as("dr"))
        val j = dl.join(dr, "k")
          .select((col("dl") * col("dr")).as("out"))
          .agg(count(lit(1)).as("n_join_keys"), sum("out").as("join_rows"),
            max("out").as("max_key_rows"))
        // side cardinalities from the degree tables themselves (n = Σd) —
        // no second scan of either input
        j.crossJoin(dl.agg(sum("dl").as("n_left")))
          .crossJoin(dr.agg(sum("dr").as("n_right")))
          .select(lit(name).as("edge"), col("n_left"), col("n_right"),
            col("n_join_keys"), col("join_rows"), col("max_key_rows"),
            (round(col("max_key_rows").cast("double") / col("join_rows"), 6)
              + lit(0.0)).as("max_key_share"))
      }
      edge("events-customer", Tables.events(s, dir), "user_id",
          Tables.customer(s, dir), "c_custkey")
        .unionByName(edge("lineitem-orders", Tables.lineitem(s, dir),
          "l_orderkey", Tables.orders(s, dir), "o_orderkey"))
        .unionByName(edge("orders-customer", Tables.orders(s, dir),
          "o_custkey", Tables.customer(s, dir), "c_custkey"))
        .orderBy("edge")
    })

  // ---------------------------------------------------------------------
  // q137 — deterministic Bloom-filter membership audit
  // ---------------------------------------------------------------------

  /** A relational Bloom filter over a 5% document slice, with its false-
    * positive rate MEASURED against exact membership: k=4 md5-derived
    * positions per doc in a 1024-bit space; the filter is the distinct
    * position set of the member slice (≤ 1024 rows — broadcast,
    * plan-asserted); a doc tests positive iff all 4 of its positions
    * hit the set (equi-join + count = 4, each exploded position matches
    * at most once). No false negatives by construction — the spec's law
    * is n_positive − n_false_pos = n_members. This is the sketch behind
    * runtime join pruning (the InjectRuntimeFilter mechanism PlansSpec
    * drives) built as data, with the observed FPR vs the (1−e^{−kn/m})^k
    * design point surfaced; at 100 TB the member side is whatever kill/
    * allow list the pipeline maintains, and only its BIT-SIZED position
    * set ships to executors. */
  private val q137 = QueryDef(
    "q137_bloom_membership_audit",
    "k=4/m=1024 relational Bloom filter: measured FPR vs exact membership",
    Some(s"""
      WITH f AS (SELECT doc_id,
                        (${hkeySql("bloomm:", "doc_id")} % 20 = 0) AS member
                 FROM documents),
      p AS (SELECT doc_id, member, unnest([${(0 until 4).map(j =>
        s"${hkeySql(s"bloom$j:", "doc_id")} % 1024").mkString(", ")}]) AS pos
            FROM f),
      ft AS (SELECT DISTINCT pos FROM p WHERE member),
      m AS (SELECT doc_id FROM p JOIN ft USING (pos)
            GROUP BY doc_id HAVING COUNT(*) = 4),
      fl AS (SELECT f.member, (m.doc_id IS NOT NULL) AS positive
             FROM f LEFT JOIN m ON f.doc_id = m.doc_id),
      nb AS (SELECT COUNT(*) AS n_bits_set FROM ft)
      SELECT COUNT(*) AS n_docs,
             COUNT(CASE WHEN member THEN 1 END) AS n_members,
             COUNT(CASE WHEN positive THEN 1 END) AS n_positive,
             COUNT(CASE WHEN positive AND NOT member THEN 1 END) AS n_false_pos,
             n_bits_set,
             ROUND(n_bits_set / 1024.0, 4) + 0.0 AS fill_frac,
             ROUND(CAST(COUNT(CASE WHEN positive AND NOT member THEN 1 END)
                        AS DOUBLE)
                   / (COUNT(*) - COUNT(CASE WHEN member THEN 1 END)), 6) + 0.0
               AS fpr
      FROM fl CROSS JOIN nb
      GROUP BY n_bits_set"""),
    (s, dir) => {
      val flags = Tables.documents(s, dir).select(col("doc_id"),
        (hkey("bloomm:", col("doc_id")) % 20L === 0L).as("member"))
      val pos = flags.select(col("doc_id"), col("member"),
        explode(array((0 until 4).map(j =>
          hkey(s"bloom$j:", col("doc_id")) % 1024L): _*)).as("pos"))
      val filt = pos.filter(col("member")).select("pos").distinct()
      val positive = pos.join(broadcast(filt), "pos")
        .groupBy("doc_id").agg(count(lit(1)).as("hits"))
        .filter(col("hits") === 4)
        .select(col("doc_id"), lit(true).as("pflag"))
      val fl = flags.join(positive, Seq("doc_id"), "left")
        .select(col("member"), coalesce(col("pflag"), lit(false)).as("positive"))
      fl.agg(
          count(lit(1)).as("n_docs"),
          count(when(col("member"), 1)).as("n_members"),
          count(when(col("positive"), 1)).as("n_positive"),
          count(when(col("positive") && !col("member"), 1)).as("n_false_pos"))
        .crossJoin(filt.agg(count(lit(1)).as("n_bits_set")))
        .select(col("n_docs"), col("n_members"), col("n_positive"),
          col("n_false_pos"), col("n_bits_set"),
          (round(col("n_bits_set") / 1024.0, 4) + lit(0.0)).as("fill_frac"),
          (round(col("n_false_pos").cast("double")
            / (col("n_docs") - col("n_members")), 6) + lit(0.0)).as("fpr"))
    })

  // ---------------------------------------------------------------------
  // q138 — winsorized robust statistics per segment
  // ---------------------------------------------------------------------

  /** Order prices winsorized at the GLOBAL exact [p05, p95] (q42's
    * percentile pairing, rounded 4 dp on both engines), reported per
    * market segment: clip counts and the raw vs winsorized exact-decimal
    * mean — the outlier-robust preprocessing step before any per-segment
    * revenue model. The two boundaries are a one-row aggregate broadcast
    * into a map-side clip (no window, no per-segment sort); at 100 TB
    * the exact percentile swaps for q80's sampled form, everything else
    * unchanged. */
  private val q138 = QueryDef(
    "q138_winsorized_segment_stats",
    "per-segment order stats winsorized at global exact [p05, p95]",
    Some(s"""
      WITH o AS (SELECT c_mktsegment AS segment, o_totalprice AS price
                 FROM orders JOIN customer ON o_custkey = c_custkey),
      b AS (SELECT ROUND(quantile_cont(price, 0.05), 4) AS lo,
                   ROUND(quantile_cont(price, 0.95), 4) AS hi FROM o)
      SELECT segment, COUNT(*) AS n,
             COUNT(CASE WHEN price < lo THEN 1 END) AS n_clip_low,
             COUNT(CASE WHEN price > hi THEN 1 END) AS n_clip_high,
             ${davgSql("price")} AS mean_raw,
             ${davgSql("CASE WHEN price < lo THEN lo WHEN price > hi THEN hi ELSE price END")} AS mean_winsor
      FROM o CROSS JOIN b
      GROUP BY segment
      ORDER BY segment"""),
    (s, dir) => {
      val o = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"), col("o_totalprice").as("price"))
      val b = o.agg(round(expr("percentile(price, 0.05)"), 4).as("lo"),
        round(expr("percentile(price, 0.95)"), 4).as("hi"))
      o.crossJoin(broadcast(b))
        .groupBy("segment")
        .agg(count(lit(1)).as("n"),
          count(when(col("price") < col("lo"), 1)).as("n_clip_low"),
          count(when(col("price") > col("hi"), 1)).as("n_clip_high"),
          davg(col("price")).as("mean_raw"),
          davg(when(col("price") < col("lo"), col("lo"))
            .when(col("price") > col("hi"), col("hi"))
            .otherwise(col("price"))).as("mean_winsor"))
        .orderBy("segment")
    })

  // ---------------------------------------------------------------------
  // q139 — zone-map pruning audit (data-skipping effectiveness)
  // ---------------------------------------------------------------------

  /** How much of the event stream would per-day zone maps (parquet
    * row-group / partition min-max stats) let `value > c` predicates
    * skip? Zones = daily (count, max(value)); cutoffs = the global
    * p50/p90/p99 of value (exact, 4-dp-rounded — the q42 pairing);
    * a zone is prunable iff its max ≤ cutoff. Reported per cutoff:
    * zones pruned, rows skipped, skip fraction — the number that says
    * whether a date-partitioned layout actually serves the workload's
    * selective scans. The zone table is day-count-sized and the cutoff
    * table is 3 rows; after the map-side daily aggregate everything is
    * constant-size work, at any corpus scale. */
  private val q139 = QueryDef(
    "q139_zonemap_pruning_audit",
    "per-day min-max zone maps vs value>p50/p90/p99 predicates: skip rates",
    Some("""
      WITH e AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day, value
                 FROM events),
      z AS (SELECT day, COUNT(*) AS n, MAX(value) AS vmax FROM e GROUP BY day),
      t AS (SELECT 'p50' AS threshold,
                   ROUND(quantile_cont(value, 0.50), 4) + 0.0 AS cutoff FROM e
            UNION ALL SELECT 'p90', ROUND(quantile_cont(value, 0.90), 4) + 0.0 FROM e
            UNION ALL SELECT 'p99', ROUND(quantile_cont(value, 0.99), 4) + 0.0 FROM e)
      SELECT threshold, cutoff,
             COUNT(*) AS n_zones,
             COUNT(CASE WHEN vmax <= cutoff THEN 1 END) AS zones_pruned,
             CAST(SUM(n) AS BIGINT) AS rows_total,
             CAST(SUM(CASE WHEN vmax <= cutoff THEN n ELSE 0 END) AS BIGINT)
               AS rows_skipped,
             ROUND(CAST(SUM(CASE WHEN vmax <= cutoff THEN n ELSE 0 END) AS DOUBLE)
                   / SUM(n), 6) + 0.0 AS skip_frac
      FROM z CROSS JOIN t
      GROUP BY threshold, cutoff
      ORDER BY threshold"""),
    (s, dir) => {
      val e = Tables.events(s, dir)
        .select(to_date(timestamp_micros(col("ts_us"))).as("day"), col("value"))
      val z = e.groupBy("day")
        .agg(count(lit(1)).as("n"), max(col("value")).as("vmax"))
      val t = e.agg(
          (round(expr("percentile(value, 0.50)"), 4) + lit(0.0)).as("p50"),
          (round(expr("percentile(value, 0.90)"), 4) + lit(0.0)).as("p90"),
          (round(expr("percentile(value, 0.99)"), 4) + lit(0.0)).as("p99"))
        .select(explode(map(
          lit("p50"), col("p50"), lit("p90"), col("p90"),
          lit("p99"), col("p99"))).as(Seq("threshold", "cutoff")))
      z.crossJoin(broadcast(t))
        .groupBy("threshold", "cutoff")
        .agg(count(lit(1)).as("n_zones"),
          count(when(col("vmax") <= col("cutoff"), 1)).as("zones_pruned"),
          sum(col("n")).as("rows_total"),
          sum(when(col("vmax") <= col("cutoff"), col("n")).otherwise(0L))
            .as("rows_skipped"))
        .select(col("threshold"), col("cutoff"), col("n_zones"),
          col("zones_pruned"), col("rows_total"), col("rows_skipped"),
          (round(col("rows_skipped").cast("double") / col("rows_total"), 6)
            + lit(0.0)).as("skip_frac"))
        .orderBy("threshold")
    })

  // ---------------------------------------------------------------------
  // q143 — A/B experiment readout (hash assignment + Welch t)
  // ---------------------------------------------------------------------

  /** A deterministic A/B readout over the customer base: arms assigned
    * by md5 hash (q57's split discipline — assignment is a pure function
    * of the key, reproducible on any engine), metric = per-customer
    * lifetime spend (LEFT JOIN so zero-spend customers count — the
    * classic dilution mistake made impossible), and a Welch t statistic
    * comparing the arms. Everything reduces to six numbers per arm
    * (n, Σx, Σx²) through exact-decimal accumulators; mean/deviation/t
    * are then IEEE arithmetic over those identical rounded doubles in
    * the same textual order on both engines — so even the test statistic
    * is hash-exact. Dispersion is reported as the standard DEVIATION,
    * not the variance: at sf0.1 the spend variance is ~8.5e11, where a
    * double's ulp (~1.2e-4) exceeds the 4-dp rounding grid and the two
    * engines' ROUND implementations legitimately disagree by one ulp —
    * sqrt (IEEE-correctly-rounded, the q97 discipline) pulls the
    * magnitude back to where 4-dp rounding is meaningful. One fact scan,
    * one customer-domain aggregate, a 2-row self-join: nothing here
    * grows with scale except the scan. */
  private val q143 = QueryDef(
    "q143_ab_experiment_readout",
    "hash-assigned A/B arms over customer spend: per-arm stats + Welch t",
    Some(s"""
      WITH cs AS (SELECT o_custkey, ${dsumSql("o_totalprice")} AS s
                  FROM orders GROUP BY o_custkey),
      sp AS (SELECT (${hkeySql("ab:", "c_custkey")} % 2) AS arm,
                    COALESCE(s, 0.0) AS spend
             FROM customer LEFT JOIN cs ON c_custkey = o_custkey),
      a AS (SELECT arm, COUNT(*) AS n, ${dsumSql("spend")} AS s,
                   ${dsumSql("spend * spend")} AS ss
            FROM sp GROUP BY arm)
      SELECT a0.n AS n_a, a1.n AS n_b,
             ROUND(a0.s / a0.n, 4) + 0.0 AS mean_a,
             ROUND(a1.s / a1.n, 4) + 0.0 AS mean_b,
             ROUND(sqrt((a0.ss - a0.s * a0.s / a0.n) / (a0.n - 1)), 4) + 0.0 AS sd_a,
             ROUND(sqrt((a1.ss - a1.s * a1.s / a1.n) / (a1.n - 1)), 4) + 0.0 AS sd_b,
             ROUND((a0.s / a0.n - a1.s / a1.n)
                   / sqrt(((a0.ss - a0.s * a0.s / a0.n) / (a0.n - 1)) / a0.n
                          + ((a1.ss - a1.s * a1.s / a1.n) / (a1.n - 1)) / a1.n),
                   4) + 0.0 AS t_welch
      FROM a a0 JOIN a a1 ON a0.arm = 0 AND a1.arm = 1"""),
    (s, dir) => {
      val cs = Tables.orders(s, dir).groupBy(col("o_custkey"))
        .agg(dsum(col("o_totalprice")).as("s"))
      val sp = Tables.customer(s, dir)
        .join(cs, col("c_custkey") === col("o_custkey"), "left")
        .select((hkey("ab:", col("c_custkey")) % 2L).as("arm"),
          coalesce(col("s"), lit(0.0)).as("spend"))
      val a = sp.groupBy("arm").agg(count(lit(1)).as("n"),
        dsum(col("spend")).as("s"), dsum(col("spend") * col("spend")).as("ss"))
      val a0 = a.filter(col("arm") === 0)
        .select(col("n").as("na"), col("s").as("sa"), col("ss").as("ssa"))
      val a1 = a.filter(col("arm") === 1)
        .select(col("n").as("nb"), col("s").as("sb"), col("ss").as("ssb"))
      def vr(ss: Column, sc: Column, n: Column): Column =
        (ss - sc * sc / n) / (n - 1)
      a0.crossJoin(a1).select(
        col("na").as("n_a"), col("nb").as("n_b"),
        (round(col("sa") / col("na"), 4) + lit(0.0)).as("mean_a"),
        (round(col("sb") / col("nb"), 4) + lit(0.0)).as("mean_b"),
        (round(sqrt(vr(col("ssa"), col("sa"), col("na"))), 4) + lit(0.0)).as("sd_a"),
        (round(sqrt(vr(col("ssb"), col("sb"), col("nb"))), 4) + lit(0.0)).as("sd_b"),
        (round((col("sa") / col("na") - col("sb") / col("nb"))
          / sqrt(vr(col("ssa"), col("sa"), col("na")) / col("na")
            + vr(col("ssb"), col("sb"), col("nb")) / col("nb")), 4)
          + lit(0.0)).as("t_welch"))
    })

  // ---------------------------------------------------------------------
  // q146 — decile lift / gains table
  // ---------------------------------------------------------------------

  /** The lift table for "does customer spend predict purchase activity":
    * customers ranked into spend deciles by NINE broadcast exact-decile
    * boundaries (q123's no-global-sort discipline — decile assignment is
    * map-side comparison arithmetic, where textbook ntile(10) would
    * funnel every customer through one ordered partition), then per
    * decile: converter counts (customers with ≥ 1 purchase event — the
    * distinct-user set is customer-domain-bounded), conversion rate,
    * capture share of all converters, and lift vs the global rate. The
    * one-row global total rides a broadcast cross join. This is the
    * model-evaluation readout every targeting pipeline ships — here as
    * a deterministic engine query. */
  private val q146 = QueryDef(
    "q146_decile_lift_table",
    "spend-decile lift/gains: conversion rate, capture, lift per decile",
    Some(s"""
      WITH cs AS (SELECT o_custkey, ${dsumSql("o_totalprice")} AS s
                  FROM orders GROUP BY o_custkey),
      conv AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
      d AS (SELECT c_custkey, COALESCE(cs.s, 0.0) AS spend,
                   (conv.user_id IS NOT NULL) AS is_conv
            FROM customer LEFT JOIN cs ON c_custkey = o_custkey
                          LEFT JOIN conv ON c_custkey = conv.user_id),
      b AS (SELECT ${(1 to 9).map(i =>
        s"ROUND(quantile_cont(spend, 0.$i), 4) AS b$i").mkString(", ")} FROM d),
      dd AS (SELECT is_conv,
                    1 ${(1 to 9).map(i =>
        s"+ (CASE WHEN spend > b$i THEN 1 ELSE 0 END)").mkString(" ")} AS decile
             FROM d CROSS JOIN b),
      g AS (SELECT decile, COUNT(*) AS n_customers,
                   COUNT(CASE WHEN is_conv THEN 1 END) AS n_converters
            FROM dd GROUP BY decile),
      t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tot_n,
                   CAST(COUNT(CASE WHEN is_conv THEN 1 END) AS BIGINT) AS tot_c
            FROM dd)
      SELECT decile, n_customers, n_converters,
             ROUND(CAST(n_converters AS DOUBLE) / n_customers, 6) + 0.0
               AS conv_rate,
             ROUND(CAST(n_converters AS DOUBLE) / tot_c, 6) + 0.0 AS capture,
             ROUND((CAST(n_converters AS DOUBLE) / n_customers)
                   / (CAST(tot_c AS DOUBLE) / tot_n), 4) + 0.0 AS lift
      FROM g CROSS JOIN t
      ORDER BY decile"""),
    (s, dir) => {
      val cs = Tables.orders(s, dir).groupBy(col("o_custkey"))
        .agg(dsum(col("o_totalprice")).as("s"))
      val conv = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("user_id")).distinct()
      val d = Tables.customer(s, dir)
        .join(cs, col("c_custkey") === col("o_custkey"), "left")
        .join(conv, col("c_custkey") === col("user_id"), "left")
        .select(coalesce(col("s"), lit(0.0)).as("spend"),
          col("user_id").isNotNull.as("is_conv"))
      val bexprs = (1 to 9).map(i =>
        round(expr(s"percentile(spend, 0.$i)"), 4).as(s"b$i"))
      val b = d.agg(bexprs.head, bexprs.tail: _*)
      val dd = d.crossJoin(broadcast(b))
        .select(col("is_conv"),
          (1 to 9).map(i => when(col("spend") > col(s"b$i"), 1).otherwise(0))
            .reduce(_ + _).+(lit(1)).as("decile"))
      val g = dd.groupBy("decile")
        .agg(count(lit(1)).as("n_customers"),
          count(when(col("is_conv"), 1)).as("n_converters"))
      val t = dd.agg(count(lit(1)).as("tot_n"),
        count(when(col("is_conv"), 1)).as("tot_c"))
      g.crossJoin(broadcast(t))
        .select(col("decile"), col("n_customers"), col("n_converters"),
          (round(col("n_converters").cast("double") / col("n_customers"), 6)
            + lit(0.0)).as("conv_rate"),
          (round(col("n_converters").cast("double") / col("tot_c"), 6)
            + lit(0.0)).as("capture"),
          (round((col("n_converters").cast("double") / col("n_customers"))
            / (col("tot_c").cast("double") / col("tot_n")), 4)
            + lit(0.0)).as("lift"))
        .orderBy("decile")
    })

  // ---------------------------------------------------------------------
  // q147 — HLL set algebra (union merge + inclusion-exclusion)
  // ---------------------------------------------------------------------

  /** Sketch SET ALGEBRA on q56's deterministic 64-register HLL: the
    * click-user and purchase-user sets are sketched separately, their
    * UNION is sketched by feeding both streams through the same
    * estimator (register-max merge ≡ sketching the concatenation —
    * q121's merge property used as algebra), and the INTERSECTION is
    * estimated by inclusion-exclusion est_a + est_b − est_union. Exact
    * counts ride alongside so the estimate's error is surfaced, not
    * hidden (the q130 "measure, don't guess" discipline — intersection
    * via inclusion-exclusion is the noisiest HLL derivative and the
    * reason theta sketches exist; this query is the calibration that
    * says whether 64 registers suffice for the workload). At 100 TB:
    * each set is 64 longs per group, set algebra is arithmetic on
    * registers — audience-overlap questions never rescan the streams. */
  private val q147 = QueryDef(
    "q147_hll_set_algebra",
    "HLL union-merge + inclusion-exclusion intersection vs exact overlap",
    Some(s"""
      WITH src AS (
        SELECT 'clicks' AS sete, user_id FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT 'purch', user_id FROM events WHERE event_type = 'purchase'
        UNION ALL
        SELECT 'union', user_id FROM events
        WHERE event_type IN ('click', 'purchase')),
      h AS (SELECT sete, ${text.md5Hash60Sql("CAST(user_id AS VARCHAR)")} AS h
            FROM src),
      b AS (SELECT sete, h % 64 AS bucket,
                   CASE WHEN h // 64 = 0 THEN 55
                        ELSE 55 - length(bin(h // 64)) END AS rho
            FROM h),
      reg AS (SELECT sete, bucket, MAX(rho) AS r FROM b GROUP BY 1, 2),
      agg AS (SELECT sete,
                     CAST(SUM(1::BIGINT << (55 - r)) AS BIGINT) AS s_present,
                     COUNT(*) AS n_present
              FROM reg GROUP BY 1),
      est AS (SELECT sete,
                     CAST(s_present + (64 - n_present) * (1::BIGINT << 55) AS DOUBLE) AS s,
                     64 - n_present AS v
              FROM agg),
      fin AS (SELECT sete,
                     ROUND(CASE WHEN (0.7213 / (1.0 + 1.079 / 64.0) * 64.0 * 64.0
                                      * 36028797018963968.0 / s) <= 160.0 AND v > 0
                                THEN 64.0 * ln(64.0 / CAST(v AS DOUBLE))
                                ELSE 0.7213 / (1.0 + 1.079 / 64.0) * 64.0 * 64.0
                                     * 36028797018963968.0 / s END, 4) AS e
              FROM est),
      p AS (SELECT MAX(CASE WHEN sete = 'clicks' THEN e END) AS est_clicks,
                   MAX(CASE WHEN sete = 'purch' THEN e END) AS est_purchases,
                   MAX(CASE WHEN sete = 'union' THEN e END) AS est_union
            FROM fin),
      x AS (SELECT
              CAST(COUNT(DISTINCT CASE WHEN event_type = 'click'
                                       THEN user_id END) AS BIGINT) AS exact_clicks,
              CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                       THEN user_id END) AS BIGINT) AS exact_purchases
            FROM events),
      xi AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_both FROM
               (SELECT user_id FROM events WHERE event_type = 'click'
                INTERSECT
                SELECT user_id FROM events WHERE event_type = 'purchase'))
      SELECT exact_clicks, exact_purchases, exact_both,
             est_clicks, est_purchases, est_union,
             ROUND(est_clicks + est_purchases - est_union, 4) + 0.0
               AS est_intersection
      FROM p CROSS JOIN x CROSS JOIN xi"""),
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val a = ev.filter(col("event_type") === "click")
        .select(lit("clicks").as("sete"), col("user_id"))
      val bb = ev.filter(col("event_type") === "purchase")
        .select(lit("purch").as("sete"), col("user_id"))
      val u = ev.filter(col("event_type").isin("click", "purchase"))
        .select(lit("union").as("sete"), col("user_id"))
      val src = a.unionAll(bb).unionAll(u)
      val h = src.select(col("sete"),
        text.md5Hash60(col("user_id").cast("string")).as("h"))
      val b = h.select(col("sete"), (col("h") % 64).as("bucket"),
        when(expr("h DIV 64") === 0, 55)
          .otherwise(lit(55) - length(bin(expr("h DIV 64")))).as("rho"))
      val reg = b.groupBy("sete", "bucket").agg(max(col("rho")).as("r"))
      val agg = reg.groupBy("sete").agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - r AS INT))"))
          .as("s_present"),
        count(lit(1)).as("n_present"))
      val est = agg.select(col("sete"),
        (col("s_present") + (lit(64) - col("n_present")) * lit(1L << 55))
          .cast("double").as("s"),
        (lit(64) - col("n_present")).as("v"))
      val eRaw = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(64.0)) *
        lit(64.0) * lit(64.0) * lit(36028797018963968.0) / col("s")
      val fin = est.select(col("sete"),
        round(when(eRaw <= 160.0 && col("v") > 0,
            lit(64.0) * log(lit(64.0) / col("v").cast("double")))
          .otherwise(eRaw), 4).as("e"))
      val p = fin.agg(
        max(when(col("sete") === "clicks", col("e"))).as("est_clicks"),
        max(when(col("sete") === "purch", col("e"))).as("est_purchases"),
        max(when(col("sete") === "union", col("e"))).as("est_union"))
      val x = ev.agg(
        countDistinct(when(col("event_type") === "click", col("user_id")))
          .cast("long").as("exact_clicks"),
        countDistinct(when(col("event_type") === "purchase", col("user_id")))
          .cast("long").as("exact_purchases"))
      val xi = ev.filter(col("event_type") === "click").select("user_id")
        .intersect(ev.filter(col("event_type") === "purchase").select("user_id"))
        .agg(count(lit(1)).as("exact_both"))
      p.crossJoin(x).crossJoin(xi)
        .select(col("exact_clicks"), col("exact_purchases"), col("exact_both"),
          col("est_clicks"), col("est_purchases"), col("est_union"),
          (round(col("est_clicks") + col("est_purchases") - col("est_union"), 4)
            + lit(0.0)).as("est_intersection"))
    })

  // ---------------------------------------------------------------------
  // q149 — Pareto revenue coverage (top-k concentration)
  // ---------------------------------------------------------------------

  /** The Pareto question q91's Gini coefficient summarizes as one
    * number, answered operationally per segment: how many customers
    * cover 80% of revenue, and what share the top decile holds.
    *
    * The ORACLE states the naive form — ONE rank + running-sum window
    * per segment over the total (revenue desc, custkey) order. With a
    * 5-value segment domain that window is the
    * one-task-per-segment-sorts-everything shape (round-11 verdict
    * item 3), so EXECUTED here is the q154 bucket-prefix decomposition:
    * static revenue buckets (floor(rev/100k) — ~40 per segment on this
    * revenue range) make the heavy rank/cumsum window partition by
    * (segment, bucket); the per-bucket (count, revenue-sum) table —
    * buckets × segments rows — takes its own tiny prefix window and
    * broadcasts back; global rank = bucket-count prefix + local rank,
    * global cumsum = bucket-sum prefix + local cumsum. Ranks are exact
    * integers; the cumulative revenue rides the DECIMAL(30,10)
    * accumulator (det discipline) in BOTH the decomposition and the
    * oracle's window, so the split-point additions are
    * order-independent and the hash gate proves the decomposition
    * bit-for-bit — the q154 precedent. The per-segment totals join
    * back broadcast, as before. */
  private val q149 = QueryDef(
    "q149_pareto_revenue_coverage",
    "customers covering 80% of segment revenue + top-decile share",
    Some(s"""
      WITH cr AS (SELECT c_mktsegment AS segment, c_custkey,
                         ${dsumSql("o_totalprice")} AS rev
                  FROM orders JOIN customer ON o_custkey = c_custkey
                  GROUP BY 1, 2),
      t AS (SELECT segment, ${dsumSql("rev")} AS total,
                   CAST(COUNT(*) AS BIGINT) AS n_customers
            FROM cr GROUP BY segment),
      r AS (SELECT segment AS rseg, rev,
                   CAST(row_number() OVER w AS BIGINT) AS rnk,
                   CAST(SUM(CAST(rev AS DECIMAL(30,10)))
                        OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS DOUBLE) AS cum
            FROM cr
            WINDOW w AS (PARTITION BY segment ORDER BY rev DESC, c_custkey))
      SELECT rseg AS segment, t.n_customers,
             CAST(COUNT(CASE WHEN cum - rev < 0.8 * total THEN 1 END) AS BIGINT)
               AS n_top80,
             ROUND(CAST(COUNT(CASE WHEN cum - rev < 0.8 * total THEN 1 END)
                        AS DOUBLE) / t.n_customers, 6) + 0.0 AS frac_top80,
             ROUND(${dsumSql("CASE WHEN rnk <= (t.n_customers + 9) // 10 THEN rev ELSE 0.0 END")}
                   / total, 6) + 0.0 AS share_top10pct
      FROM r JOIN t ON rseg = t.segment
      GROUP BY rseg, t.n_customers, t.total
      ORDER BY segment"""),
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val cr = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"), col("c_custkey"))
        .agg(dsum(col("o_totalprice")).as("rev"))
      val t = cr.groupBy(col("segment").as("tseg"))
        .agg(dsum(col("rev")).as("total"), count(lit(1)).as("n_customers"))
      // bucket = coarsening of the DESC order key (a pure function of
      // rev, so equal revs share a bucket and bucket order = rev order)
      val crB = cr.withColumn("bkt", floor(col("rev") / 100000).cast("long"))
      val wLoc = Window.partitionBy("segment", "bkt")
        .orderBy(col("rev").desc, col("c_custkey"))
      val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(30, 10))
      val loc = crB
        .withColumn("rnk_l", row_number().over(wLoc).cast("long"))
        .withColumn("cum_l", sum(dec(col("rev"))).over(
          wLoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // per-bucket totals -> prefix over EARLIER (higher-revenue)
      // buckets within the segment: a window over segments × buckets
      // rows, never customer-sized
      val bt = crB.groupBy(col("segment").as("bseg"), col("bkt").as("bbkt"))
        .agg(count(lit(1)).as("n_b"), sum(dec(col("rev"))).as("s_b"))
      val wB = Window.partitionBy("bseg").orderBy(col("bbkt").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val pre = bt
        .withColumn("off_n", coalesce(sum(col("n_b")).over(wB), lit(0L)))
        .withColumn("off_s", coalesce(sum(col("s_b")).over(wB),
          lit(0).cast(DecimalType(30, 10))))
        .select(col("bseg"), col("bbkt"), col("off_n"), col("off_s"))
      val r = loc.join(broadcast(pre),
          col("segment") === col("bseg") && col("bkt") === col("bbkt"))
        .withColumn("rnk", col("off_n") + col("rnk_l"))
        .withColumn("cum", (col("off_s") + col("cum_l")).cast("double"))
      r.join(broadcast(t), col("segment") === col("tseg"))
        .groupBy(col("segment"), col("n_customers"), col("total"))
        .agg(
          count(when(col("cum") - col("rev") < lit(0.8) * col("total"), 1))
            .as("n_top80"),
          // decimal-exact like every other unordered sum (the sequential
          // cum window above is order-fixed; this aggregate is not)
          dsum(when(col("rnk") <= expr("(n_customers + 9) div 10"), col("rev"))
            .otherwise(0.0)).as("top10rev"))
        .select(col("segment"), col("n_customers"), col("n_top80"),
          (round(col("n_top80").cast("double") / col("n_customers"), 6)
            + lit(0.0)).as("frac_top80"),
          (round(col("top10rev") / col("total"), 6) + lit(0.0))
            .as("share_top10pct"))
        .orderBy("segment")
    })

  // ---------------------------------------------------------------------
  // q150 — order/lineitem financial reconciliation audit
  // ---------------------------------------------------------------------

  /** Does each order's header total agree with the sum of its line
    * amounts (extendedprice × (1−discount) × (1+tax))? The cross-table
    * consistency audit a warehouse runs before trusting either table:
    * per-status order counts, how many reconcile within 0.01% / 1%,
    * how many have NO lines at all (left join — childless orders are
    * q126's finding, here with the financial consequence), and the
    * median/max relative discrepancy (exact percentile — q42 pairing).
    * The per-order line sum is one co-partitioned aggregate, the
    * compare is map-side, and the report is status-domain-sized. The
    * fixture's headers are NOT derived from its lines, which is the
    * realistic case — the audit's job is to measure the disagreement,
    * not assume it away. */
  private val q150 = QueryDef(
    "q150_revenue_reconciliation_audit",
    "order header total vs line-amount sum: per-status discrepancy profile",
    Some(s"""
      WITH ls AS (SELECT l_orderkey,
                         ${dsumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")}
                           AS lsum
                  FROM lineitem GROUP BY l_orderkey),
      j AS (SELECT o_orderstatus AS status, o_totalprice, lsum,
                   CASE WHEN lsum IS NOT NULL
                        THEN ROUND(abs(lsum - o_totalprice) / o_totalprice, 6)
                   END AS rel
            FROM orders LEFT JOIN ls ON o_orderkey = l_orderkey)
      SELECT status, COUNT(*) AS n_orders,
             COUNT(CASE WHEN lsum IS NULL THEN 1 END) AS n_no_lines,
             COUNT(CASE WHEN rel <= 0.0001 THEN 1 END) AS n_within_001pct,
             COUNT(CASE WHEN rel <= 0.01 THEN 1 END) AS n_within_1pct,
             ROUND(quantile_cont(rel, 0.50), 6) + 0.0 AS median_rel,
             ROUND(MAX(rel), 6) + 0.0 AS max_rel
      FROM j GROUP BY status ORDER BY status"""),
    (s, dir) => {
      val ls = Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("lsum"))
      val j = Tables.orders(s, dir)
        .join(ls, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("o_orderstatus").as("status"), col("lsum"),
          when(col("lsum").isNotNull,
            round(abs(col("lsum") - col("o_totalprice")) / col("o_totalprice"), 6))
            .as("rel"))
      j.groupBy("status")
        .agg(count(lit(1)).as("n_orders"),
          count(when(col("lsum").isNull, 1)).as("n_no_lines"),
          count(when(col("rel") <= 0.0001, 1)).as("n_within_001pct"),
          count(when(col("rel") <= 0.01, 1)).as("n_within_1pct"),
          (round(expr("percentile(rel, 0.50)"), 6) + lit(0.0)).as("median_rel"),
          (round(max(col("rel")), 6) + lit(0.0)).as("max_rel"))
        .orderBy("status")
    })

  // ---------------------------------------------------------------------
  // q151 — CDC merge: upsert (latest-wins) + delete compaction
  // ---------------------------------------------------------------------

  /** The MERGE/upsert compaction a versioned corpus runs on every
    * ingest cycle: a base snapshot (version 1), an update batch
    * (10% hash slice re-emitted as version 2 with changed text), and a
    * delete set (2% hash slice — q107's erasure discipline) collapse to
    * the current state by LATEST-WINS per key then delete-filter. The
    * latest-version pick is a per-key rank over (version desc) — the
    * predicate pushes into WindowGroupLimit so each key stops after one
    * row (plan-asserted; with a monotone version a max-version
    * semi-join is the documented alternative, but rank-1 handles
    * arbitrary version columns and tombstone patterns). The delete set
    * reduces to keys and BROADCASTS into an anti-join — the fact never
    * shuffles for it. Reported per source: surviving rows, how many
    * came from v2, deletions applied, and the final char mass — the
    * accounting that proves the merge touched exactly what it should.
    * At 100 TB this is the compaction pass of any table-format
    * maintenance job; every stage here is the at-scale shape. */
  private val q151 = QueryDef(
    "q151_cdc_merge_compaction",
    "latest-wins upsert + broadcast delete anti-join: per-source accounting",
    Some(s"""
      WITH base AS (SELECT doc_id, source, n_chars, 1 AS version
                    FROM documents),
      upd AS (SELECT doc_id, source, n_chars + 8 AS n_chars, 2 AS version
              FROM documents
              WHERE ${hkeySql("upd:", "doc_id")} % 10 = 0),
      allv AS (SELECT * FROM base UNION ALL SELECT * FROM upd),
      latest AS (SELECT doc_id, source, n_chars, version,
                        row_number() OVER (PARTITION BY doc_id
                                           ORDER BY version DESC) AS rn
                 FROM allv QUALIFY rn = 1),
      dels AS (SELECT doc_id FROM documents
               WHERE ${hkeySql("del:", "doc_id")} % 50 = 0),
      fin AS (SELECT l.doc_id, l.source, l.n_chars, l.version
              FROM latest l LEFT JOIN dels d ON l.doc_id = d.doc_id
              WHERE d.doc_id IS NULL)
      SELECT source,
             COUNT(*) AS n_final,
             COUNT(CASE WHEN version = 2 THEN 1 END) AS n_from_v2,
             (SELECT COUNT(*) FROM dels) AS n_delete_requests,
             CAST(SUM(n_chars) AS BIGINT) AS chars_final
      FROM fin GROUP BY source ORDER BY source"""),
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("n_chars"))
      val base = docs.withColumn("version", lit(1))
      val upd = docs.filter(hkey("upd:", col("doc_id")) % 10L === 0L)
        .select(col("doc_id"), col("source"),
          (col("n_chars") + 8L).as("n_chars"), lit(2).as("version"))
      val latest = base.unionByName(upd)
        .withColumn("rn", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("version").desc)))
        .filter(col("rn") === 1)
      val dels = docs.filter(hkey("del:", col("doc_id")) % 50L === 0L)
        .select(col("doc_id").as("del_id"))
      val fin = latest.join(broadcast(dels),
        col("doc_id") === col("del_id"), "left_anti")
      fin.groupBy("source")
        .agg(count(lit(1)).as("n_final"),
          count(when(col("version") === 2, 1)).as("n_from_v2"),
          sum(col("n_chars")).as("chars_final"))
        .crossJoin(broadcast(dels.agg(count(lit(1)).as("n_delete_requests"))))
        .select(col("source"), col("n_final"), col("n_from_v2"),
          col("n_delete_requests"), col("chars_final"))
        .orderBy("source")
    })

  // ---------------------------------------------------------------------
  // q154 — Pareto skyline (multi-objective dominance)
  // ---------------------------------------------------------------------

  /** The skyline of parts under (lower price better, larger size
    * better): a part survives iff no other part is at most as expensive
    * AND at least as large with one strict — the multi-objective
    * shortlist operator. In 2D the skyline falls out of ONE ordered
    * pass: a part survives iff its size beats the running max size over
    * all STRICTLY cheaper parts and it tops its own price group. The
    * naive form is a global window over the price domain (fact-sized —
    * the single-partition scale killer); executed here is the CHUNKED
    * form (q74/q80 discipline): static price buckets (floor(price/10))
    * give a partition-parallel local strict-past max, the per-bucket
    * maxima collapse to a bucket-count-sized table whose own prefix max
    * broadcasts back, and prevmax = max(local, earlier-bucket) — the
    * heavy window partitions by bucket (plan-asserted), only the tiny
    * bucket table sees an unpartitioned window. The ORACLE runs the
    * simple global-window definition, so the hash gate proves the
    * chunked decomposition equals it bit-for-bit. */
  private val q154 = QueryDef(
    "q154_pareto_skyline",
    "price/size Pareto front via chunked strict-past running max",
    Some("""
      WITH g AS (SELECT p_retailprice AS price, MAX(p_size) AS msize
                 FROM part GROUP BY 1),
      r AS (SELECT price, msize,
                   COALESCE(MAX(msize) OVER (ORDER BY price
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), -1) AS prevmax
            FROM g)
      SELECT p_partkey, p_retailprice, p_size
      FROM part JOIN r ON p_retailprice = price
      WHERE p_size = msize AND p_size > prevmax
      ORDER BY p_retailprice, p_partkey"""),
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val g = Tables.part(s, dir)
        .groupBy(col("p_retailprice").as("price"))
        .agg(max(col("p_size")).as("msize"))
        .withColumn("bkt", floor(col("price") / 10).cast("long"))
      val wLocal = Window.partitionBy("bkt").orderBy("price")
        .rowsBetween(Window.unboundedPreceding, -1)
      val loc = g.withColumn("lprev", max(col("msize")).over(wLocal))
      val wB = Window.orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      val bprev = g.groupBy("bkt").agg(max(col("msize")).as("bmsize"))
        .withColumn("bprev", max(col("bmsize")).over(wB))
        .select(col("bkt").as("jbkt"), col("bprev"))
      val r = loc.join(broadcast(bprev), col("bkt") === col("jbkt"))
        .select(col("price"), col("msize"),
          greatest(coalesce(col("lprev"), lit(-1)),
            coalesce(col("bprev"), lit(-1))).as("prevmax"))
      Tables.part(s, dir)
        .join(r, col("p_retailprice") === col("price"))
        .filter(col("p_size") === col("msize") && col("p_size") > col("prevmax"))
        .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
        .orderBy("p_retailprice", "p_partkey")
    })

  // ---------------------------------------------------------------------
  // q158 — mergeable grid quantile sketch + measured error
  // ---------------------------------------------------------------------

  /** The quantile member of the sketch family (HLL q56/q147, CMS, Bloom
    * q137): a fixed 256-bin grid over the declared value domain [0, 512)
    * (bin width 2, overflow clamped to the last bin) whose per-group bin
    * counts are a MERGEABLE sketch — partial counts from any partitioning
    * sum to the same histogram, no merge proof needed beyond the
    * commutativity of +. The p50/p90/p99 estimates are the upper edge of
    * the first bin whose cumulative count reaches ceil(p·n) — pure
    * integer arithmetic ((num·n + den − 1) div den; no float thresholds)
    * — and, per the "measure, don't guess" discipline (q130), each
    * estimate ships NEXT TO the exact percentile and its absolute error,
    * so the readout itself says whether 2-wide bins suffice for the
    * workload. At 100 TB the sketch is 256 longs per group merged
    * map-side; only the exact arm (here, the calibration) would swap for
    * a sampled form. The cumulative window partitions by event_type over
    * ≤ 256 rows — never fact-sized. */
  private val q158 = QueryDef(
    "q158_grid_quantile_sketch",
    "256-bin mergeable quantile sketch: p50/p90/p99 estimates vs exact, with error",
    Some("""
      WITH e AS (SELECT event_type, value FROM events),
      b AS (SELECT event_type,
                   LEAST(255, CAST(FLOOR(value / 2) AS BIGINT)) AS bin FROM e),
      bc AS (SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS n
             FROM b GROUP BY 1, 2),
      cum AS (SELECT event_type, bin,
                     SUM(n) OVER (PARTITION BY event_type ORDER BY bin
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum
              FROM bc),
      tot AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS nn
              FROM bc GROUP BY 1),
      ps AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p90', 9, 10),
                            ('p99', 99, 100)) AS t(pl, num, den)),
      thr AS (SELECT event_type, nn, pl,
                     (num * nn + den - 1) // den AS thr
              FROM tot CROSS JOIN ps),
      hit AS (SELECT t.event_type, t.pl, t.nn, MIN(c.bin) AS bb
              FROM thr t JOIN cum c ON c.event_type = t.event_type
                                   AND c.cum >= t.thr
              GROUP BY 1, 2, 3),
      ex AS (SELECT event_type,
                    ROUND(quantile_cont(value, 0.50), 4) + 0.0 AS p50,
                    ROUND(quantile_cont(value, 0.90), 4) + 0.0 AS p90,
                    ROUND(quantile_cont(value, 0.99), 4) + 0.0 AS p99
             FROM e GROUP BY 1),
      exm AS (SELECT event_type, 'p50' AS pl, p50 AS exact FROM ex
              UNION ALL SELECT event_type, 'p90', p90 FROM ex
              UNION ALL SELECT event_type, 'p99', p99 FROM ex)
      SELECT h.event_type, h.pl AS p, h.nn AS n,
             CAST((h.bb + 1) * 2 AS DOUBLE) AS est_upper, exm.exact,
             ROUND(ABS(CAST((h.bb + 1) * 2 AS DOUBLE) - exm.exact), 4) + 0.0
               AS abs_err
      FROM hit h JOIN exm ON exm.event_type = h.event_type AND exm.pl = h.pl
      ORDER BY h.event_type, p"""),
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, dir).select(col("event_type"), col("value"))
      val bc = e
        .select(col("event_type"),
          least(lit(255L), floor(col("value") / 2)).as("bin"))
        .groupBy("event_type", "bin").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = bc.withColumn("cum", sum(col("n")).over(w))
        .select(col("event_type").as("cet"), col("bin"), col("cum"))
      val thr = bc.groupBy("event_type").agg(sum(col("n")).as("nn"))
        .select(col("event_type"), col("nn"), explode(array(
          struct(lit("p50").as("pl"), lit(1L).as("num"), lit(2L).as("den")),
          struct(lit("p90").as("pl"), lit(9L).as("num"), lit(10L).as("den")),
          struct(lit("p99").as("pl"), lit(99L).as("num"), lit(100L).as("den"))))
          .as("pp"))
        .select(col("event_type"), col("nn"), col("pp.pl").as("pl"),
          expr("(pp.num * nn + pp.den - 1) div pp.den").as("thr"))
      val hit = thr.join(cum,
          col("cet") === col("event_type") && col("cum") >= col("thr"))
        .groupBy("event_type", "pl", "nn").agg(min(col("bin")).as("bb"))
      val ex = e.groupBy(col("event_type").as("xet")).agg(
          (round(expr("percentile(value, 0.50)"), 4) + lit(0.0)).as("p50"),
          (round(expr("percentile(value, 0.90)"), 4) + lit(0.0)).as("p90"),
          (round(expr("percentile(value, 0.99)"), 4) + lit(0.0)).as("p99"))
        .select(col("xet"), explode(map(
          lit("p50"), col("p50"), lit("p90"), col("p90"),
          lit("p99"), col("p99"))).as(Seq("xpl", "exact")))
      hit.join(broadcast(ex),
          col("xet") === col("event_type") && col("xpl") === col("pl"))
        .select(col("event_type"), col("pl").as("p"), col("nn").as("n"),
          ((col("bb") + 1) * 2).cast("double").as("est_upper"), col("exact"),
          (round(abs(((col("bb") + 1) * 2).cast("double") - col("exact")), 4)
            + lit(0.0)).as("abs_err"))
        .orderBy("event_type", "p")
    })

  // ---------------------------------------------------------------------
  // q167 — CUPED variance reduction for the A/B readout
  // ---------------------------------------------------------------------

  /** q143's experiment readout upgraded with CUPED (controlled
    * pre-experiment data): each customer's PRE-period spend (orders
    * before 1998-07-01) is the covariate X, the POST-period spend is
    * the metric Y, θ = cov(X,Y)/var(X) is fit POOLED across arms, and
    * the adjusted metric Y − θ(X − X̄) removes the variance X explains —
    * the standard trick that shrinks experiment error bars without
    * touching the treatment effect (arm assignment is q143's md5 hash,
    * independent of X by construction). All second moments are computed
    * on /1e5-scaled spends (the q165 magnitude discipline — Σy² stays
    * ~1e5 where 4-dp rounding is meaningful) through exact-decimal
    * accumulators; θ and the realized variance reduction ρ² are
    * IEEE arithmetic over those identical rounded doubles; the reported
    * means stay in raw units (magnitude ~1e5, far below the ROUND
    * hazard zone). One fact scan, one customer-domain aggregate, a
    * 2-row readout — the q143 scale shape with one more moment row. */
  private val q167 = QueryDef(
    "q167_cuped_adjustment",
    "CUPED-adjusted A/B readout: theta, adjusted means, variance reduction",
    Some(s"""
      WITH cs AS (SELECT o_custkey,
                         ${dsumSql("CASE WHEN o_orderdate < TIMESTAMP '1998-07-01 00:00:00' THEN o_totalprice ELSE 0.0 END")} AS xs,
                         ${dsumSql("CASE WHEN o_orderdate >= TIMESTAMP '1998-07-01 00:00:00' THEN o_totalprice ELSE 0.0 END")} AS ys
                  FROM orders GROUP BY 1),
      sp AS (SELECT (${hkeySql("ab:", "c_custkey")} % 2) AS arm,
                    COALESCE(xs, 0.0) AS x, COALESCE(ys, 0.0) AS y
             FROM customer LEFT JOIN cs ON c_custkey = o_custkey),
      pool AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                      ${dsumSql("x")} AS sx, ${dsumSql("y")} AS sy,
                      ${dsumSql("(x / 100000.0) * (x / 100000.0)")} AS sxx,
                      ${dsumSql("(x / 100000.0) * (y / 100000.0)")} AS sxy,
                      ${dsumSql("(y / 100000.0) * (y / 100000.0)")} AS syy,
                      ${dsumSql("x / 100000.0")} AS sxs,
                      ${dsumSql("y / 100000.0")} AS sys
               FROM sp),
      arms AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_arm,
                      ${dsumSql("x")} AS sxa, ${dsumSql("y")} AS sya
               FROM sp GROUP BY arm),
      th AS (SELECT n, sx, sy,
                    CASE WHEN n * sxx - sxs * sxs > 0
                         THEN (n * sxy - sxs * sys) / (n * sxx - sxs * sxs)
                         ELSE 0.0 END AS theta,
                    CASE WHEN n * sxx - sxs * sxs > 0
                          AND n * syy - sys * sys > 0
                         THEN (n * sxy - sxs * sys) * (n * sxy - sxs * sys)
                              / ((n * sxx - sxs * sxs) * (n * syy - sys * sys))
                         ELSE 0.0 END AS rho2
             FROM pool)
      SELECT arm, n_arm,
             ROUND(sya / n_arm, 4) + 0.0 AS mean_post,
             ROUND(sya / n_arm - theta * (sxa / n_arm - sx / n), 4) + 0.0
               AS mean_adj,
             ROUND(theta, 4) + 0.0 AS theta,
             ROUND(rho2, 4) + 0.0 AS var_reduction
      FROM arms CROSS JOIN th
      ORDER BY arm"""),
    (s, dir) => {
      val pre = expr("o_orderdate < TIMESTAMP '1998-07-01 00:00:00'")
      val cs = Tables.orders(s, dir).groupBy(col("o_custkey"))
        .agg(dsum(when(pre, col("o_totalprice")).otherwise(0.0)).as("xs"),
          dsum(when(!pre, col("o_totalprice")).otherwise(0.0)).as("ys"))
      val sp = Tables.customer(s, dir)
        .join(cs, col("c_custkey") === col("o_custkey"), "left")
        .select((hkey("ab:", col("c_custkey")) % 2L).as("arm"),
          coalesce(col("xs"), lit(0.0)).as("x"),
          coalesce(col("ys"), lit(0.0)).as("y"))
      val xsc = col("x") / 100000.0
      val ysc = col("y") / 100000.0
      val pool = sp.agg(count(lit(1)).as("n"),
        dsum(col("x")).as("sx"), dsum(col("y")).as("sy"),
        dsum(xsc * xsc).as("sxx"), dsum(xsc * ysc).as("sxy"),
        dsum(ysc * ysc).as("syy"), dsum(xsc).as("sxs"), dsum(ysc).as("sys"))
      val varX = col("n") * col("sxx") - col("sxs") * col("sxs")
      val varY = col("n") * col("syy") - col("sys") * col("sys")
      val covN = col("n") * col("sxy") - col("sxs") * col("sys")
      val th = pool.select(col("n"), col("sx"), col("sy"),
        when(varX > 0, covN / varX).otherwise(0.0).as("theta"),
        when(varX > 0 && varY > 0, covN * covN / (varX * varY))
          .otherwise(0.0).as("rho2"))
      val arms = sp.groupBy("arm").agg(count(lit(1)).as("n_arm"),
        dsum(col("x")).as("sxa"), dsum(col("y")).as("sya"))
      arms.crossJoin(broadcast(th))
        .select(col("arm"), col("n_arm"),
          (round(col("sya") / col("n_arm"), 4) + lit(0.0)).as("mean_post"),
          (round(col("sya") / col("n_arm")
            - col("theta") * (col("sxa") / col("n_arm") - col("sx") / col("n")), 4)
            + lit(0.0)).as("mean_adj"),
          (round(col("theta"), 4) + lit(0.0)).as("theta"),
          (round(col("rho2"), 4) + lit(0.0)).as("var_reduction"))
        .orderBy("arm")
    })

  // ---------------------------------------------------------------------
  // q170 — bitmap-index distinct (exact, mergeable, self-verifying)
  // ---------------------------------------------------------------------

  /** The bitmap-index trick as a pure aggregate: the user domain is cut
    * into 32-wide words (word = user DIV 32), each (group, word) folds
    * its members into one long via BIT_OR(1 << user MOD 32) — 32 bits,
    * not 64, because a shift into the sign bit is a checked overflow in
    * one engine and silent wraparound in the other — and the
    * exact distinct count is Σ bit_count(word) — an EXACT mergeable
    * "sketch" (OR is idempotent/commutative/associative, so partials
    * from any partitioning merge losslessly), unlike the probabilistic
    * HLL family (q56/q147) it sits beside. The query is self-verifying:
    * it emits the bitmap count NEXT TO COUNT(DISTINCT) and a match
    * flag the oracle gate then proves equal. At 100 TB the word table
    * is |domain|/64 longs per group, the fold is map-side, and set
    * algebra (union/intersection over groups) becomes bitwise OR/AND
    * on co-keyed words — the roaring-bitmap plan shape in engine
    * terms. */
  private val q170 = QueryDef(
    "q170_bitmap_distinct",
    "exact distinct users per type via 32-bit bitmap words == COUNT(DISTINCT)",
    Some("""
      WITH w AS (SELECT event_type, user_id // 32 AS word,
                        BIT_OR(1::BIGINT << CAST(user_id % 32 AS INTEGER)) AS bits
                 FROM events GROUP BY 1, 2),
      b AS (SELECT event_type,
                   CAST(SUM(bit_count(bits)) AS BIGINT) AS n_bitmap,
                   CAST(COUNT(*) AS BIGINT) AS n_words
            FROM w GROUP BY 1),
      x AS (SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
            FROM events GROUP BY 1)
      SELECT event_type, n_words, n_bitmap, n_exact,
             CAST(CASE WHEN n_bitmap = n_exact THEN 1 ELSE 0 END AS INTEGER)
               AS bitmap_matches
      FROM b JOIN x USING (event_type)
      ORDER BY event_type"""),
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val w = ev.groupBy(col("event_type"), expr("user_id div 32").as("word"))
        .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT)))")
          .as("bits"))
      val b = w.groupBy("event_type")
        .agg(sum(bit_count(col("bits"))).cast("long").as("n_bitmap"),
          count(lit(1)).as("n_words"))
      val x = ev.groupBy(col("event_type").as("xet"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      b.join(x, col("event_type") === col("xet"))
        .select(col("event_type"), col("n_words"), col("n_bitmap"),
          col("n_exact"),
          when(col("n_bitmap") === col("n_exact"), 1).otherwise(0)
            .as("bitmap_matches"))
        .orderBy("event_type")
    })

  // ---------------------------------------------------------------------
  // q172 — join fan-out (degree) histogram
  // ---------------------------------------------------------------------

  /** q136 profiles each join edge down to ONE worst-key number; this is
    * the full degree DISTRIBUTION the planner actually sizes from: for
    * the lineitem→orders edge, how many order keys have exactly d lines
    * (the fan-out histogram), with cumulative row mass per degree — the
    * curve that says whether skew is a lone hot key (salt it, q134) or
    * a heavy tail (repartition). Two grouped aggregates: fact → degree
    * table (key-domain), degree table → histogram (max-degree-domain ≈
    * dozens of rows); the cumulative window runs over that tiny
    * histogram only. Everything integer; the mass share is one IEEE
    * divide, round6. */
  private val q172 = QueryDef(
    "q172_degree_histogram",
    "lineitem-per-order fan-out histogram with cumulative row mass",
    Some("""
      WITH deg AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS d
                   FROM lineitem GROUP BY 1),
      h AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n_keys,
                   CAST(SUM(d) AS BIGINT) AS n_rows
            FROM deg GROUP BY 1),
      t AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total FROM h)
      SELECT d, n_keys, n_rows,
             CAST(SUM(n_rows) OVER (ORDER BY d
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_rows,
             ROUND(CAST(n_rows AS DOUBLE) / total, 6) + 0.0 AS row_share
      FROM h CROSS JOIN t
      ORDER BY d"""),
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val deg = Tables.lineitem(s, dir)
        .groupBy("l_orderkey").agg(count(lit(1)).as("d"))
      val h = deg.groupBy("d")
        .agg(count(lit(1)).as("n_keys"), sum(col("d")).as("n_rows"))
      val t = h.agg(sum(col("n_rows")).as("total"))
      val w = Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      h.crossJoin(broadcast(t))
        .select(col("d"), col("n_keys"), col("n_rows"),
          sum(col("n_rows")).over(w).as("cum_rows"),
          (round(col("n_rows").cast("double") / col("total"), 6) + lit(0.0))
            .as("row_share"))
        .orderBy("d")
    })

  // ---------------------------------------------------------------------
  // q176 — exponential (log2) bucket histogram
  // ---------------------------------------------------------------------

  /** The HDR-histogram companion to q158's linear grid: values bucket by
    * binary magnitude — bucket k holds cents c with 2^(k−1) ≤ c < 2^k —
    * so the tail gets constant RELATIVE resolution where a linear grid
    * wastes its bins on the body. The bucket index is
    * length(bin(cents)), an exact integer both engines compute from the
    * same bit pattern (the q147 rho trick) — no log2 libm call, whose
    * 1-ulp wobble at exact powers of two could shift a boundary value
    * into the wrong bucket. Cents come from ROUND(value·100) (the
    * fixture's values are 2-dp; truncation after the double multiply
    * would mis-bin x.29-style values whose product lands just below the
    * integer). Map-side combinable; one bounded window for cumulative
    * shares. */
  private val q176 = QueryDef(
    "q176_log_bucket_histogram",
    "log2-bucket value histogram per type with cumulative shares",
    Some("""
      WITH c AS (SELECT event_type,
                        length(bin(CAST(ROUND(value * 100) AS BIGINT))) AS bucket
                 FROM events WHERE value > 0),
      h AS (SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS n
            FROM c GROUP BY 1, 2),
      t AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS tot FROM h GROUP BY 1)
      SELECT h.event_type, bucket,
             CAST(1::BIGINT << (bucket - 1) AS BIGINT) AS lo_cents,
             n,
             ROUND(CAST(SUM(n) OVER (PARTITION BY h.event_type ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS DOUBLE) / tot, 6) + 0.0 AS cum_share
      FROM h JOIN t ON t.event_type = h.event_type
      ORDER BY h.event_type, bucket"""),
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val c = Tables.events(s, dir).filter(col("value") > 0)
        .select(col("event_type"),
          length(bin(round(col("value") * 100).cast("long"))).as("bucket"))
      val h = c.groupBy("event_type", "bucket").agg(count(lit(1)).as("n"))
      val t = h.groupBy(col("event_type").as("tet"))
        .agg(sum(col("n")).as("tot"))
      val w = Window.partitionBy("event_type").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      h.join(broadcast(t), col("event_type") === col("tet"))
        .select(col("event_type"), col("bucket"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket - 1 AS INT))")
            .as("lo_cents"), col("n"),
          (round(sum(col("n")).over(w).cast("double") / col("tot"), 6)
            + lit(0.0)).as("cum_share"))
        .orderBy("event_type", "bucket")
    })

  // ---------------------------------------------------------------------
  // q177 — bitmap set algebra (exact audience overlap)
  // ---------------------------------------------------------------------

  /** The payoff of q170's bitmap words: AUDIENCE SET ALGEBRA without
    * re-touching the fact table. Click-user and purchase-user bitmaps
    * join on the word index; intersection is popcount(a AND b), union
    * popcount(a OR b) with absent words coalesced — both EXACT, the
    * deterministic answer q147's HLL inclusion-exclusion only
    * estimates (and the noisiest HLL derivative at that). The
    * inclusion–exclusion identity |A|+|B| = |A∩B|+|A∪B| is emitted as
    * a computed check column, and the exact INTERSECT count rides
    * alongside so the oracle gate proves the bitmap path — at 100 TB
    * the word tables are |domain|/32 longs per set and every audience
    * question is a co-keyed bitwise join, never a distinct over
    * facts. */
  private val q177 = QueryDef(
    "q177_bitmap_set_algebra",
    "exact click/purchase audience overlap via word-joined bitmap AND/OR",
    Some("""
      WITH wc AS (SELECT user_id // 32 AS word,
                         BIT_OR(1::BIGINT << CAST(user_id % 32 AS INTEGER)) AS bits
                  FROM events WHERE event_type = 'click' GROUP BY 1),
      wp AS (SELECT user_id // 32 AS word,
                    BIT_OR(1::BIGINT << CAST(user_id % 32 AS INTEGER)) AS bits
             FROM events WHERE event_type = 'purchase' GROUP BY 1),
      j AS (SELECT COALESCE(wc.bits, 0) AS cb, COALESCE(wp.bits, 0) AS pb
            FROM wc FULL OUTER JOIN wp ON wc.word = wp.word),
      agg AS (SELECT CAST(SUM(bit_count(cb)) AS BIGINT) AS n_clicks,
                     CAST(SUM(bit_count(pb)) AS BIGINT) AS n_purch,
                     CAST(SUM(bit_count(cb & pb)) AS BIGINT) AS n_inter,
                     CAST(SUM(bit_count(cb | pb)) AS BIGINT) AS n_union
              FROM j),
      x AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_both FROM
              (SELECT user_id FROM events WHERE event_type = 'click'
               INTERSECT
               SELECT user_id FROM events WHERE event_type = 'purchase'))
      SELECT n_clicks, n_purch, n_inter, n_union, exact_both,
             CAST(CASE WHEN n_inter = exact_both
                        AND n_clicks + n_purch = n_inter + n_union
                       THEN 1 ELSE 0 END AS INTEGER) AS identities_hold
      FROM agg CROSS JOIN x"""),
    (s, dir) => {
      val ev = Tables.events(s, dir)
      def words(t: String, wn: String, bn: String) =
        ev.filter(col("event_type") === t)
          .groupBy(expr("user_id div 32").as(wn))
          .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT)))")
            .as(bn))
      val j = words("click", "cw", "cbits")
        .join(words("purchase", "pw", "pbits"), col("cw") === col("pw"),
          "full_outer")
        .select(coalesce(col("cbits"), lit(0L)).as("cb"),
          coalesce(col("pbits"), lit(0L)).as("pb"))
      val agg = j.agg(
        sum(bit_count(col("cb"))).cast("long").as("n_clicks"),
        sum(bit_count(col("pb"))).cast("long").as("n_purch"),
        sum(bit_count(col("cb").bitwiseAND(col("pb")))).cast("long").as("n_inter"),
        sum(bit_count(col("cb").bitwiseOR(col("pb")))).cast("long").as("n_union"))
      val x = ev.filter(col("event_type") === "click").select("user_id")
        .intersect(ev.filter(col("event_type") === "purchase").select("user_id"))
        .agg(count(lit(1)).as("exact_both"))
      agg.crossJoin(x)
        .select(col("n_clicks"), col("n_purch"), col("n_inter"), col("n_union"),
          col("exact_both"),
          when(col("n_inter") === col("exact_both")
            && col("n_clicks") + col("n_purch") === col("n_inter") + col("n_union"),
            1).otherwise(0).as("identities_hold"))
    })

  // ---------------------------------------------------------------------
  // q178 — two-sample Kolmogorov–Smirnov drift test
  // ---------------------------------------------------------------------

  /** Distribution drift as a hypothesis test: the KS statistic between
    * two sources' doc-length distributions, with the supremum located
    * by EXACT INTEGER arithmetic — D = max|F_a − F_b| is found as
    * max|c_a·n_b − c_b·n_a| over the merged value axis (cumulative
    * counts cross-multiplied, no float enters the argmax), then divided
    * once for display. The 5%-level decision compares the same integer
    * numerator against the critical threshold, so the reject flag is
    * exact too. Merged axis = full outer join of the two count tables
    * + two running sums over the value-domain-bounded axis — the same
    * plan at any corpus size since everything after the per-source
    * count collapse is value-domain-sized. */
  private val q178 = QueryDef(
    "q178_ks_drift_test",
    "exact-integer KS statistic between src0 and src1 doc-length distributions",
    Some("""
      WITH a AS (SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
                 FROM documents WHERE source = 'src0' GROUP BY 1),
      b AS (SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
            FROM documents WHERE source = 'src1' GROUP BY 1),
      u AS (SELECT COALESCE(a.v, b.v) AS v, COALESCE(a.c, 0) AS ca,
                   COALESCE(b.c, 0) AS cb
            FROM a FULL OUTER JOIN b ON a.v = b.v),
      r AS (SELECT v,
                   SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS fa,
                   SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS fb
            FROM u),
      t AS (SELECT CAST(MAX(fa) AS BIGINT) AS na, CAST(MAX(fb) AS BIGINT) AS nb
            FROM r),
      d AS (SELECT CAST(MAX(abs(fa * nb - fb * na)) AS BIGINT) AS dnum
            FROM r CROSS JOIN t)
      SELECT na, nb,
             ROUND(CAST(dnum AS DOUBLE) / (na * nb), 6) + 0.0 AS d_stat,
             ROUND(1.358 * sqrt(CAST(na + nb AS DOUBLE) / (na * nb)), 6) + 0.0
               AS crit_05,
             CAST(CASE WHEN CAST(dnum AS DOUBLE)
                            > 1.358 * sqrt(CAST(na + nb AS DOUBLE) / (na * nb))
                              * na * nb
                       THEN 1 ELSE 0 END AS INTEGER) AS reject_05
      FROM d CROSS JOIN t"""),
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      def side(src: String, cn: String) = Tables.documents(s, dir)
        .filter(col("source") === src)
        .groupBy(col("n_chars").as(s"v_$cn"))
        .agg(count(lit(1)).as(cn))
      val u = side("src0", "ca").join(side("src1", "cb"),
          col("v_ca") === col("v_cb"), "full_outer")
        .select(coalesce(col("v_ca"), col("v_cb")).as("v"),
          coalesce(col("ca"), lit(0L)).as("ca"),
          coalesce(col("cb"), lit(0L)).as("cb"))
      val w = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val r = u.select(col("v"), sum(col("ca")).over(w).as("fa"),
        sum(col("cb")).over(w).as("fb"))
      val t = r.agg(max(col("fa")).as("na"), max(col("fb")).as("nb"))
      val d = r.crossJoin(broadcast(t))
        .agg(max(abs(col("fa") * col("nb") - col("fb") * col("na"))).as("dnum"))
      val crit = lit(1.358) * sqrt((col("na") + col("nb")).cast("double")
        / (col("na") * col("nb")))
      d.crossJoin(broadcast(t))
        .select(col("na"), col("nb"),
          (round(col("dnum").cast("double") / (col("na") * col("nb")), 6)
            + lit(0.0)).as("d_stat"),
          (round(crit, 6) + lit(0.0)).as("crit_05"),
          when(col("dnum").cast("double") >
            crit * col("na") * col("nb"), 1).otherwise(0).as("reject_05"))
    })

  // ---------------------------------------------------------------------
  // q179 — chi-square independence test (contingency table)
  // ---------------------------------------------------------------------

  /** Completes the hypothesis-testing shelf (KS q178, Welch t q143):
    * are market segment and order priority INDEPENDENT? The full
    * segment × priority contingency table with expected counts
    * e = row·col/n and the χ² statistic — computed entirely from the
    * bounded cell table (≤ 25 cells after one fact collapse), so the
    * χ² sum is a decimal fold over identical per-cell doubles and
    * hash-exact. The (r−1)(c−1) degrees of freedom ride along; the
    * verdict column compares against the df=16 α=0.05 critical value
    * 26.296 as a literal both engines share. */
  private val q179 = QueryDef(
    "q179_chi2_independence",
    "segment x priority contingency chi-square with per-cell contributions",
    Some(s"""
      WITH o AS (SELECT c_mktsegment AS seg, o_orderpriority AS pri
                 FROM orders JOIN customer ON o_custkey = c_custkey),
      cells AS (SELECT seg, pri, CAST(COUNT(*) AS BIGINT) AS obs
                FROM o GROUP BY 1, 2),
      rt AS (SELECT seg, CAST(SUM(obs) AS BIGINT) AS rtot FROM cells GROUP BY 1),
      ct AS (SELECT pri, CAST(SUM(obs) AS BIGINT) AS ctot FROM cells GROUP BY 1),
      n AS (SELECT CAST(SUM(obs) AS BIGINT) AS nn FROM cells),
      e AS (SELECT seg, pri, obs,
                   CAST(rtot AS DOUBLE) * ctot / nn AS expd
            FROM cells JOIN rt USING (seg) JOIN ct USING (pri) CROSS JOIN n),
      x AS (SELECT ${dsumSql("(obs - expd) * (obs - expd) / expd")} AS chi2,
                   CAST(COUNT(*) AS BIGINT) AS n_cells
            FROM e),
      dims AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rt) AS r,
                      (SELECT CAST(COUNT(*) AS BIGINT) FROM ct) AS c)
      SELECT chi2, n_cells, (r - 1) * (c - 1) AS dof,
             CAST(CASE WHEN chi2 > 26.296 THEN 1 ELSE 0 END AS INTEGER)
               AS reject_05_df16
      FROM x CROSS JOIN dims"""),
    (s, dir) => {
      val o = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"), col("o_orderpriority").as("pri"))
      val cells = o.groupBy("seg", "pri").agg(count(lit(1)).as("obs"))
      val rt = cells.groupBy(col("seg").as("rseg"))
        .agg(sum(col("obs")).as("rtot"))
      val ct = cells.groupBy(col("pri").as("cpri"))
        .agg(sum(col("obs")).as("ctot"))
      val n = cells.agg(sum(col("obs")).as("nn"))
      val e = cells
        .join(broadcast(rt), col("seg") === col("rseg"))
        .join(broadcast(ct), col("pri") === col("cpri"))
        .crossJoin(broadcast(n))
        .select(col("obs"),
          (col("rtot").cast("double") * col("ctot") / col("nn")).as("expd"))
      val x = e.agg(
        dsum((col("obs") - col("expd")) * (col("obs") - col("expd"))
          / col("expd")).as("chi2"),
        count(lit(1)).as("n_cells"))
      val dims = rt.agg(count(lit(1)).as("r"))
        .crossJoin(ct.agg(count(lit(1)).as("c")))
      x.crossJoin(broadcast(dims))
        .select(col("chi2"), col("n_cells"),
          ((col("r") - 1) * (col("c") - 1)).as("dof"),
          when(col("chi2") > 26.296, 1).otherwise(0).as("reject_05_df16"))
    })

  // ---------------------------------------------------------------------
  // q180 — Benford first-digit forensic audit
  // ---------------------------------------------------------------------

  /** The forensic-accounting screen: does the leading digit of order
    * totals follow Benford's law? Digit extraction is pure string
    * arithmetic on the integer part (no log10 libm — the Benford
    * expectations log₁₀(1+1/d) enter as nine shared LITERALS, so the
    * only float work is one share divide and one χ²-style distance
    * fold through the decimal accumulator). Synthetic uniform-ish
    * prices should FAIL Benford hard — the audit's point is the
    * measured divergence, not a pass. Single scan, digit-domain
    * output. */
  private val q180 = QueryDef(
    "q180_benford_digit_audit",
    "first-digit distribution of order totals vs Benford expectations",
    Some(s"""
      WITH d AS (SELECT CAST(substring(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                                            AS VARCHAR), 1, 1) AS INTEGER)
                          AS digit
                 FROM orders WHERE o_totalprice >= 1.0),
      c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
      n AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM c),
      b AS (SELECT digit, CAST(benford AS DOUBLE) AS benford
            FROM (VALUES (1, 0.301030), (2, 0.176091), (3, 0.124939),
                  (4, 0.096910), (5, 0.079181), (6, 0.066947),
                  (7, 0.057992), (8, 0.051153), (9, 0.045757))
                 AS t(digit, benford))
      SELECT c.digit, n,
             ROUND(CAST(n AS DOUBLE) / nn, 6) + 0.0 AS share,
             benford,
             ROUND(CAST(n AS DOUBLE) / nn - benford, 6) + 0.0 AS excess
      FROM c JOIN b ON b.digit = c.digit CROSS JOIN n
      ORDER BY c.digit"""),
    (s, dir) => {
      // floor explicitly: DuckDB's double->BIGINT cast rounds to nearest
      // while Spark's truncates — a price just under a power of ten
      // would land in different digits
      val d = Tables.orders(s, dir).filter(col("o_totalprice") >= 1.0)
        .select(substring(floor(col("o_totalprice")).cast("long").cast("string"),
          1, 1).cast("int").as("digit"))
      val c = d.groupBy("digit").agg(count(lit(1)).as("n"))
      val n = c.agg(sum(col("n")).as("nn"))
      val benford = Seq(1 -> 0.301030, 2 -> 0.176091, 3 -> 0.124939,
        4 -> 0.096910, 5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992,
        8 -> 0.051153, 9 -> 0.045757)
      val b = c.sparkSession.range(1).select(explode(array(benford.map {
        case (dg, p) => struct(lit(dg).as("bdigit"), lit(p).as("benford"))
      }: _*)).as("x")).select(col("x.bdigit").as("bdigit"),
        col("x.benford").as("benford"))
      c.join(broadcast(b), col("digit") === col("bdigit"))
        .crossJoin(broadcast(n))
        .select(col("digit"), col("n"),
          (round(col("n").cast("double") / col("nn"), 6) + lit(0.0)).as("share"),
          col("benford"),
          (round(col("n").cast("double") / col("nn") - col("benford"), 6)
            + lit(0.0)).as("excess"))
        .orderBy("digit")
    })

  // ---------------------------------------------------------------------
  // q193 — pairwise distribution-distance matrix from bin vectors
  // ---------------------------------------------------------------------

  /** Which event types have similar value distributions? The pairwise
    * total-variation distance ½·Σ|p_a − p_b| between every two types,
    * computed from q158's 256-bin count vectors — the sketch REUSED for
    * set-of-distributions comparisons, never rescanning values. The
    * distance numerator is exact integer cross-multiplication
    * Σ|c_a·n_b − c_b·n_a| (the q178 trick: no float enters the fold;
    * bins missing on one side coalesce to zero via the full outer bin
    * join), divided once for display. TV ∈ [0,1]; the matrix is
    * type-pair-domain-sized and every stage after the one fact
    * collapse is bin-domain work. */
  private val q193 = QueryDef(
    "q193_histogram_distance_matrix",
    "pairwise total-variation distance between type value distributions",
    Some("""
      WITH b AS (SELECT event_type,
                        LEAST(255, CAST(FLOOR(value / 2) AS BIGINT)) AS bin,
                        CAST(COUNT(*) AS BIGINT) AS c
                 FROM events GROUP BY 1, 2),
      t AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n FROM b GROUP BY 1),
      pairs AS (SELECT a.event_type AS ta, a.n AS nna,
                       x.event_type AS tb, x.n AS nnb
                FROM t a JOIN t x ON a.event_type < x.event_type),
      grid AS (SELECT ta, nna, tb, nnb, unnest(generate_series(0, 255)) AS bin
               FROM pairs),
      j AS (SELECT g.ta, g.tb, g.nna, g.nnb,
                   COALESCE(ba.c, 0) AS ca, COALESCE(bb.c, 0) AS cb
            FROM grid g
            LEFT JOIN b ba ON ba.event_type = g.ta AND ba.bin = g.bin
            LEFT JOIN b bb ON bb.event_type = g.tb AND bb.bin = g.bin),
      agg AS (SELECT ta, tb, nna, nnb,
                     CAST(SUM(abs(ca * nnb - cb * nna)) AS BIGINT) AS dnum
              FROM j GROUP BY 1, 2, 3, 4)
      SELECT ta, tb,
             ROUND(CAST(dnum AS DOUBLE) / (2.0 * nna * nnb), 6) + 0.0 AS tv_dist
      FROM agg ORDER BY ta, tb"""),
    (s, dir) => {
      val b = Tables.events(s, dir)
        .select(col("event_type"),
          least(lit(255L), floor(col("value") / 2)).as("bin"))
        .groupBy("event_type", "bin").agg(count(lit(1)).as("c"))
      val t = b.groupBy(col("event_type").as("tet"))
        .agg(sum(col("c")).as("n"))
      val pairs = t.select(col("tet").as("ta"), col("n").as("nna"))
        .join(t.select(col("tet").as("tb"), col("n").as("nnb")),
          col("ta") < col("tb"))
      val grid = pairs.select(col("ta"), col("nna"), col("tb"), col("nnb"),
        explode(expr("sequence(0L, 255L)")).as("bin"))
      val j = grid
        .join(b.select(col("event_type").as("bta"), col("bin").as("bina"),
          col("c").as("ca")),
          col("ta") === col("bta") && col("bin") === col("bina"), "left")
        .join(b.select(col("event_type").as("btb"), col("bin").as("binb"),
          col("c").as("cb")),
          col("tb") === col("btb") && col("bin") === col("binb"), "left")
        .select(col("ta"), col("tb"), col("nna"), col("nnb"),
          coalesce(col("ca"), lit(0L)).as("ca"),
          coalesce(col("cb"), lit(0L)).as("cb"))
      val agg = j.groupBy("ta", "tb", "nna", "nnb")
        .agg(sum(abs(col("ca") * col("nnb") - col("cb") * col("nna")))
          .as("dnum"))
      agg.select(col("ta"), col("tb"),
          (round(col("dnum").cast("double") / (lit(2.0) * col("nna") * col("nnb")), 6)
            + lit(0.0)).as("tv_dist"))
        .orderBy("ta", "tb")
    })

  // ---------------------------------------------------------------------
  // q200 — rendezvous-hash resharding audit (data placement)
  // ---------------------------------------------------------------------

  /** Data placement the way a distributed store assigns it: every doc
    * goes to the node with the HIGHEST-RANDOM-WEIGHT hash (rendezvous /
    * HRW, Thaler & Ravishankar '98 — the consistent-assignment scheme
    * that needs no ring state), and the audit measures what a resize
    * from 16 to 17 nodes moves. HRW's defining property rides as an
    * in-query law: a doc changes owner iff the NEW node wins it, so
    * every moved doc lands on node 16 and the expected moved fraction
    * is 1/17 — the minimal-disruption guarantee that makes consistent
    * hashing consistent (PlanningSpec asserts gains are node-16-only
    * and placement recomputes). Arithmetic is md5-exact: the winner is
    * argmax over (hash, node) encoded as one integer ((h div 32)·32 +
    * node — total order, deterministic under any tie), so owners are
    * ONE map-side max aggregate per doc per epoch: no window, no join,
    * one scan. At 100 TB this audit is how a storage tier prices a
    * topology change before committing to it. */
  private val q200 = QueryDef(
    "q200_rendezvous_sharding_audit",
    "HRW placement over 16 nodes and the 16->17 resize movement per node",
    Some(s"""
      WITH n AS (SELECT unnest(generate_series(0, 16)) AS node),
      hx AS (SELECT d.doc_id, n.node,
                    (${text.md5Hash60Sql("'rv:' || CAST(n.node AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)")}
                     // 32) * 32 + n.node AS combined
             FROM documents d CROSS JOIN n),
      own AS (SELECT doc_id,
                     MAX(CASE WHEN node < 16 THEN combined END) % 32
                       AS owner16,
                     MAX(combined) % 32 AS owner17
              FROM hx GROUP BY doc_id),
      pc AS (SELECT owner16, owner17, CAST(COUNT(*) AS BIGINT) AS n
             FROM own GROUP BY 1, 2),
      ph AS (SELECT t.s.node AS node, t.s.phase AS phase, n,
                    CASE WHEN owner16 != owner17 THEN n ELSE 0 END AS moved
             FROM pc,
                  unnest([struct_pack(node := owner16, phase := 0),
                          struct_pack(node := owner17, phase := 1)]) AS t(s))
      SELECT node,
             CAST(COALESCE(SUM(CASE WHEN phase = 0 THEN n END), 0)
                  AS BIGINT) AS n_before,
             CAST(COALESCE(SUM(CASE WHEN phase = 1 THEN n END), 0)
                  AS BIGINT) AS n_after,
             CAST(COALESCE(SUM(CASE WHEN phase = 0 THEN moved END), 0)
                  AS BIGINT) AS n_lost,
             CAST(COALESCE(SUM(CASE WHEN phase = 1 THEN moved END), 0)
                  AS BIGINT) AS n_gained
      FROM ph GROUP BY node ORDER BY node"""),
    (s, dir) => {
      val hx = Tables.documents(s, dir).select(col("doc_id"))
        .select(col("doc_id"), explode(sequence(lit(0), lit(16))).as("node"))
        .withColumn("combined",
          shiftright(hkey("rv:", concat(col("node").cast("string"), lit(":"),
            col("doc_id").cast("string"))), 5) * 32 + col("node"))
      val own = hx.groupBy("doc_id")
        .agg((max(when(col("node") < 16, col("combined"))) % 32).as("owner16"),
          (max(col("combined")) % 32).as("owner17"))
      // collapse to (owner16, owner17) transition counts FIRST, then
      // fan the <= 17x17 table out with an explode (not a self-union,
      // which would duplicate the whole subtree): the documents scan
      // appears exactly once in the plan (plan-asserted)
      val pcnt = own.groupBy("owner16", "owner17").agg(count(lit(1)).as("n"))
      val ph = pcnt.select(col("owner16"), col("owner17"), col("n"),
          when(col("owner16") =!= col("owner17"), col("n")).otherwise(0L)
            .as("moved"),
          explode(array(
            struct(col("owner16").as("node"), lit(0).as("phase")),
            struct(col("owner17").as("node"), lit(1).as("phase")))).as("t"))
        .select(col("t.node").as("node"), col("t.phase").as("phase"),
          col("n"), col("moved"))
      ph.groupBy("node")
        .agg(coalesce(sum(when(col("phase") === 0, col("n"))), lit(0))
            .cast("long").as("n_before"),
          coalesce(sum(when(col("phase") === 1, col("n"))), lit(0))
            .cast("long").as("n_after"),
          coalesce(sum(when(col("phase") === 0, col("moved"))), lit(0))
            .cast("long").as("n_lost"),
          coalesce(sum(when(col("phase") === 1, col("moved"))), lit(0))
            .cast("long").as("n_gained"))
        .orderBy("node")
    })

  def defs: Seq[QueryDef] =
    Seq(q134, q135, q136, q137, q138, q139, q143, q146, q147, q149, q150,
      q151, q154, q158, q167, q170, q172, q176, q177, q178, q179, q180,
      q193, q200)
}
