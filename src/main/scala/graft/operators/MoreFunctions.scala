package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.sources.Tables

/** Remaining function-family coverage: distribution window functions,
  * array set algebra, regexp-extract-all, conditional aggregates, and
  * deterministic argmax via struct ordering. */
object MoreFunctions {

  /** Distribution window functions over a tie-broken total order —
    * percent_rank/cume_dist/ntile are all pure functions of the (unique)
    * rank, hence deterministic. */
  private val q51 = QueryDef(
    "q51_window_distribution",
    "percent_rank / cume_dist / ntile(4) of customers per market segment",
    Some("""
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROUND(percent_rank() OVER w, 4) AS pr,
             ROUND(cume_dist() OVER w, 4) AS cd,
             CAST(ntile(4) OVER w AS BIGINT) AS quartile
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      ORDER BY c_mktsegment, c_custkey"""),
    (s, dir) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, dir)
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          round(percent_rank().over(w), 4).as("pr"),
          round(cume_dist().over(w), 4).as("cd"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy("c_mktsegment", "c_custkey")
    })

  /** Array set algebra on aggregated vocabularies (intersect/except vs a
    * literal probe set; everything sorted before output). */
  private val q52 = QueryDef(
    "q52_array_set_algebra",
    "per-language vocab arrays: size, intersect and except vs a probe set",
    Some("""
      SELECT lang, CAST(len(vocab) AS BIGINT) AS n_vocab,
             array_to_string(list_sort(list_intersect(vocab, ['scan','key','merge','zzz'])), ',') AS common,
             array_to_string(list_sort(list_filter(['scan','zzz'], p -> NOT list_contains(vocab, p))), ',') AS missing
      FROM (SELECT lang, list_sort(list(DISTINCT w)) AS vocab
            FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
            GROUP BY lang)
      ORDER BY lang"""),
    (s, dir) => {
      val probe = array(lit("scan"), lit("key"), lit("merge"), lit("zzz"))
      Tables.documents(s, dir)
        .select(col("lang"), explode(split(col("text"), " ")).as("w"))
        .groupBy("lang")
        .agg(sort_array(collect_set(col("w"))).as("vocab"))
        .select(col("lang"),
          size(col("vocab")).cast("long").as("n_vocab"),
          array_join(array_sort(array_intersect(col("vocab"), probe)), ",").as("common"),
          array_join(array_sort(array_except(array(lit("scan"), lit("zzz")), col("vocab"))), ",")
            .as("missing"))
        .orderBy("lang")
    })

  /** regexp_extract_all: every digit run from a composed string. */
  private val q53 = QueryDef(
    "q53_regexp_extract_all",
    "all digit runs extracted from brand-size strings per part",
    Some("""
      SELECT p_partkey,
             array_to_string(regexp_extract_all(p_brand || '-' || p_size, '[0-9]+'), ',') AS nums,
             CAST(len(regexp_extract_all(p_brand || '-' || p_size, '[0-9]+')) AS BIGINT) AS n_nums
      FROM part
      ORDER BY p_partkey"""),
    (s, dir) =>
      Tables.part(s, dir)
        .withColumn("s", concat(col("p_brand"), lit("-"), col("p_size").cast("string")))
        .select(col("p_partkey"),
          array_join(expr("regexp_extract_all(s, '[0-9]+', 0)"), ",").as("nums"),
          size(expr("regexp_extract_all(s, '[0-9]+', 0)")).cast("long").as("n_nums"))
        .orderBy("p_partkey"))

  /** Conditional aggregates: count_if / bool_and / bool_or (booleans
    * cast to int for representation-agnostic hash parity). */
  private val q54 = QueryDef(
    "q54_conditional_aggregates",
    "count_if / bool_and / bool_or per order priority",
    Some("""
      SELECT o_orderpriority, COUNT(*) AS n,
             CAST(count_if(o_totalprice > 200000.0) AS BIGINT) AS n_high,
             CAST(bool_and(o_totalprice > 0.0) AS INT) AS all_positive,
             CAST(bool_or(o_orderstatus = 'P') AS INT) AS any_pending
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""),
    (s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          expr("count_if(o_totalprice > 200000.0)").as("n_high"),
          expr("CAST(bool_and(o_totalprice > 0.0) AS INT)").as("all_positive"),
          expr("CAST(bool_or(o_orderstatus = 'P') AS INT)").as("any_pending"))
        .orderBy("o_orderpriority"))

  /** Deterministic argmax: the usual max_by is tie-nondeterministic, so
    * order by a struct whose trailing field is the unique key — struct
    * comparison is lexicographic in both engines. */
  private val q55 = QueryDef(
    "q55_argmax_order_per_priority",
    "orderkey of the highest-price order per priority (tie-safe argmax)",
    Some("""
      SELECT o_orderpriority,
             (max({'p': o_totalprice, 'k': o_orderkey})).p AS top_price,
             (max({'p': o_totalprice, 'k': o_orderkey})).k AS top_orderkey
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""),
    (s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(max(struct(col("o_totalprice").as("p"), col("o_orderkey").as("k"))).as("m"))
        .select(col("o_orderpriority"),
          col("m.p").as("top_price"), col("m.k").as("top_orderkey"))
        .orderBy("o_orderpriority"))

  /** Date/time function breadth: month arithmetic (both engines clamp
    * month-ends identically — verified 1999-01-31 + 1 month = Feb 28),
    * last_day, day-diffs, quarter, ISO day-of-week (Spark weekday() is
    * 0=Monday, DuckDB isodow is 1=Monday — offset by one). Pure per-row
    * projections; no shuffle except the final order. */
  private val q67 = QueryDef(
    "q67_date_arithmetic",
    "calendar arithmetic per order: +3 months, month end, day diffs, quarter, ISO dow",
    Some("""
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
             CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
             last_day(CAST(o_orderdate AS DATE)) AS month_end,
             CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INTEGER)
               AS days_to_1998,
             CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
             CAST(isodow(o_orderdate) AS INTEGER) AS iso_dow
      FROM orders WHERE o_orderkey < 200
      ORDER BY o_orderkey"""),
    (s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_orderkey") < 200)
        .select(col("o_orderkey"),
          col("o_orderdate").cast("date").as("order_date"),
          add_months(col("o_orderdate").cast("date"), 3).as("plus3m"),
          last_day(col("o_orderdate").cast("date")).as("month_end"),
          datediff(lit(java.sql.Date.valueOf("1998-01-01")),
            col("o_orderdate").cast("date")).as("days_to_1998"),
          quarter(col("o_orderdate")).as("qtr"),
          (weekday(col("o_orderdate")) + 1).as("iso_dow"))
        .orderBy("o_orderkey"))

  /** String function breadth: split_part / pad / translate / reverse /
    * instr-strpos / repeat — all 1-based, same not-found and multi-char
    * semantics in both engines. */
  private val q68 = QueryDef(
    "q68_string_functions",
    "string-function kitchen over parts: split/pad/translate/reverse/find/repeat",
    Some("""
      SELECT p_partkey, split_part(p_type, ' ', 1) AS type_head,
             lpad(p_brand, 12, '*') AS brand_pad,
             translate(lower(p_name), 'aeiou', '01234') AS name_tr,
             reverse(left(p_name, 5)) AS name_rev5,
             CAST(strpos(p_type, 'BRASS') AS INTEGER) AS brass_at,
             repeat(right(p_brand, 2), 2) AS brand_echo
      FROM part WHERE p_partkey < 200
      ORDER BY p_partkey"""),
    (s, dir) =>
      Tables.part(s, dir)
        .filter(col("p_partkey") < 200)
        .select(col("p_partkey"),
          split_part(col("p_type"), lit(" "), lit(1)).as("type_head"),
          lpad(col("p_brand"), 12, "*").as("brand_pad"),
          translate(lower(col("p_name")), "aeiou", "01234").as("name_tr"),
          reverse(substring(col("p_name"), 1, 5)).as("name_rev5"),
          instr(col("p_type"), "BRASS").as("brass_at"),
          repeat(substring(col("p_brand"), -2, 2), 2).as("brand_echo"))
        .orderBy("p_partkey"))

  def defs: Seq[QueryDef] = Seq(q51, q52, q53, q54, q55, q67, q68)
}
