package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.sources.Tables
import graft.functions.det._

/** The canonical MapReduce demo jobs (SURVEY.md §2.1, §2.5) plus scalar
  * function coverage (§2.7): word count, inverted index, terasort-style
  * global sort, JSON extraction, string normalization, histograms,
  * date-bucketed aggregation with a moving-average window.
  *
  * Each is a single declarative plan: the map side is a generator or
  * projection, the combiner is Spark's automatic partial HashAggregate,
  * the shuffle is the groupBy exchange, the reduce is the final agg —
  * i.e. the reference's whole job model per query, at any scale.
  */
object Classics {

  /** Word count: THE MapReduce demo. explode = map (1→N), partial agg =
    * combiner, exchange on word = shuffle, final agg = reduce. */
  private val q11 = QueryDef(
    "q11_wordcount",
    "word count over documents.text",
    Some("""
      SELECT word, COUNT(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY word
      ORDER BY word"""),
    (s, dir) =>
      Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("n"))
        .orderBy("word"))

  /** Inverted index: word → sorted posting list. collect_set is
    * order-nondeterministic, so postings are array-sorted then joined to
    * a string (both engines sort numerically before joining). */
  private val q12 = QueryDef(
    "q12_inverted_index",
    "inverted index word -> sorted doc_id posting list",
    Some("""
      SELECT word,
             array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS postings,
             COUNT(DISTINCT doc_id) AS n_docs
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY word
      ORDER BY word"""),
    (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .groupBy("word")
        .agg(
          array_join(
            transform(sort_array(collect_set(col("doc_id"))), _.cast("string")),
            ",").as("postings"),
          countDistinct(col("doc_id")).as("n_docs"))
        .orderBy("word"))

  /** Terasort-style total-order sort: Spark range-partitions on sampled
    * split points then sorts within partitions — the exact TeraSort
    * recipe, scaling to any cluster width. Tie-broken by event_id. */
  private val q13 = QueryDef(
    "q13_global_sort_events",
    "global total-order sort of events by (ts, event_id)",
    Some("""
      SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
      FROM events
      ORDER BY ts_us, event_id"""),
    (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"), col("ts_us"), col("user_id"),
          col("event_type"), col("value"))
        .orderBy("ts_us", "event_id"))

  /** JSON extraction over the semi-structured props column
    * (get_json_object on the Spark side; the oracle extracts the same
    * integer lexically so it needs no DuckDB JSON extension). */
  private val q14 = QueryDef(
    "q14_json_props_stats",
    "extract integer props.k per event_type: min/max/sum/avg",
    Some("""
      SELECT event_type,
             COUNT(*) AS n,
             MIN(k) AS min_k, MAX(k) AS max_k, CAST(SUM(k) AS BIGINT) AS sum_k,
             ROUND(CAST(SUM(k) AS DOUBLE) / COUNT(*), 4) AS avg_k
      FROM (SELECT event_type,
                   CAST(regexp_extract(props, '-?[0-9]+') AS BIGINT) AS k
            FROM events)
      GROUP BY event_type
      ORDER BY event_type"""),
    (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          sum(col("k")).as("sum_k"),
          round(sum(col("k")).cast("double") / count(lit(1)), 4).as("avg_k"))
        .orderBy("event_type"))

  /** String normalization: lower/regexp over part attributes, grouped. */
  private val q15 = QueryDef(
    "q15_normalize_parts",
    "normalize p_type/p_brand strings, aggregate per normalized type",
    Some(s"""
      SELECT lower(p_type) AS norm_type,
             COUNT(*) AS n_parts,
             COUNT(DISTINCT CAST(regexp_extract(p_brand, '[0-9]+') AS INTEGER)) AS n_brands,
             ${davgSql("p_retailprice")} AS avg_price,
             MIN(p_size) AS min_size, MAX(p_size) AS max_size
      FROM part
      GROUP BY lower(p_type)
      ORDER BY norm_type"""),
    (s, dir) =>
      Tables.part(s, dir)
        .select(
          lower(col("p_type")).as("norm_type"),
          regexp_extract(col("p_brand"), "[0-9]+", 0).cast("int").as("brand_num"),
          col("p_retailprice"), col("p_size"))
        .groupBy("norm_type")
        .agg(
          count(lit(1)).as("n_parts"),
          countDistinct(col("brand_num")).as("n_brands"),
          davg(col("p_retailprice")).as("avg_price"),
          min(col("p_size")).as("min_size"),
          max(col("p_size")).as("max_size"))
        .orderBy("norm_type"))

  /** Bucketed histogram of a continuous column (floor-division binning —
    * one shuffle on the bucket key regardless of data volume). */
  private val q16 = QueryDef(
    "q16_value_histogram",
    "histogram of events.value in width-50 buckets",
    Some(s"""
      SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
             COUNT(*) AS n, ${dsumSql("value")} AS sum_value,
             MIN(value) AS min_value, MAX(value) AS max_value
      FROM events
      GROUP BY 1
      ORDER BY bucket"""),
    (s, dir) =>
      Tables.events(s, dir)
        .select(floor(col("value") / 50.0).cast("long").as("bucket"), col("value"))
        .groupBy("bucket")
        .agg(
          count(lit(1)).as("n"),
          dsum(col("value")).as("sum_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .orderBy("bucket"))

  /** Date-bucketed aggregation + frame-spec analytic window: daily
    * revenue with a 7-day moving average over an integer epoch-day
    * RANGE frame (identical semantics on both engines; the frame sees
    * already-rounded daily values so the small-window mean is exact
    * enough for 4 dp parity). */
  private val q17 = QueryDef(
    "q17_daily_revenue_moving_avg",
    "daily order revenue with 7-day moving average (range frame)",
    Some(s"""
      SELECT day, rev, n_orders,
             ROUND(AVG(rev) OVER (ORDER BY d RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS mov_avg7
      FROM (SELECT CAST(o_orderdate AS DATE) AS day,
                   CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS d,
                   ${dsumSql("o_totalprice")} AS rev,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY 1, 2)
      ORDER BY day"""),
    (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(dsum(col("o_totalprice")).as("rev"), count(lit(1)).as("n_orders"))
        .withColumn("d", datediff(col("day"), lit("1970-01-01").cast("date")))
        .withColumn("mov_avg7",
          round(avg(col("rev")).over(
            Window.orderBy(col("d")).rangeBetween(-6, 0)), 4))
        .drop("d")
        .orderBy("day"))

  /** Map-typed semi-structured processing: props parsed to a real
    * MapType with from_json, then map_keys/element_at/size (§2.7 Map
    * family). Oracle uses DuckDB's JSON extension (statically linked in
    * the python wheel) for the same extraction. */
  private val q46 = QueryDef(
    "q46_json_map_functions",
    "from_json -> MapType: key lists, sizes, and value sums per event type",
    Some("""
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             MIN(array_to_string(json_keys(props), ',')) AS min_keys,
             CAST(MAX(len(json_keys(props))) AS BIGINT) AS max_n_keys
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""),
    (s, dir) => {
      val m = from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.LongType))
      Tables.events(s, dir)
        .select(col("event_type"), m.as("m"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(element_at(col("m"), "k")).as("sum_k"),
          min(concat_ws(",", map_keys(col("m")))).as("min_keys"),
          max(size(map_keys(col("m")))).cast("long").as("max_n_keys"))
        .orderBy("event_type")
    })

  /** Semi-structured processing on Spark 4's VARIANT type: props parsed
    * once with parse_json into the shredded binary encoding, fields
    * extracted with variant_get — the engine-native path that replaces
    * per-access string re-parsing (q14's get_json_object re-parses the
    * JSON text on every extraction; a variant column parses once and
    * serves every field access from the encoded form, the difference
    * that matters when a 100 TB events table carries kilobyte props
    * documents read by many fields). Distinct-count + conditional
    * aggregate keep it disjoint from q14's min/max/sum surface; all
    * arithmetic is integer-exact. */
  private val q118 = QueryDef(
    "q118_variant_json_stats",
    "VARIANT parse_json/variant_get over props: distinct + parity counts per type",
    Some("""
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k,
             CAST(SUM(k) AS BIGINT) AS sum_k,
             CAST(SUM(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_even_k
      FROM (SELECT event_type,
                   CAST(json_extract(props, '$.k') AS BIGINT) AS k
            FROM events)
      GROUP BY event_type
      ORDER BY event_type"""),
    (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"),
          variant_get(parse_json(col("props")), "$.k", "long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("k")).cast("long").as("n_distinct_k"),
          sum(col("k")).as("sum_k"),
          sum(when(col("k") % 2 === 0, 1).otherwise(0)).cast("long")
            .as("n_even_k"))
        .orderBy("event_type"))

  /** The RDD-API letter of the north star (round-14 verdict item 6):
    * q11's word count computed on the RDD primitives — `flatMap` (the
    * map), `reduceByKey` (map-side combine + shuffle + reduce in one
    * call), `sortByKey` (range-partitioned total order) — and lifted
    * back to a DataFrame only for the gate's parquet sink. The oracle
    * is q11's own SQL, so the two APIs are hash-proven equivalent.
    *
    * Why the DataFrame API remains this engine's default everywhere
    * else: RDD lambdas are OPAQUE to Catalyst — no filter/projection
    * pushdown into the scan, no column pruning, no whole-stage codegen,
    * no AQE re-planning, and every record pays Scala object
    * (de)serialization instead of staying in Tungsten's binary format.
    * At 100 TB those are order-of-magnitude differences; the RDD
    * surface earns its keep only for genuinely per-partition imperative
    * logic, which this engine has not needed. The split uses
    * `split(_, -1)` (keep trailing empties) to match SQL `split` /
    * DuckDB `string_split` semantics exactly. */
  private val q259 = QueryDef(
    "q259_rdd_wordcount",
    "word count on the RDD API (flatMap → reduceByKey → sortByKey); twin of q11",
    Some("""
      SELECT word, COUNT(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      GROUP BY word
      ORDER BY word"""),
    (s, dir) => {
      import s.implicits._
      val counts = Tables.documents(s, dir)
        .select(col("text")).na.drop().as[String].rdd
        .flatMap(_.split(" ", -1))
        .map((_, 1L))
        .reduceByKey(_ + _)
        // total order via sortByKey (sortBy = keyBy + sortByKey +
        // values) — keyed on Spark SQL's own UTF8String so the range
        // partitioning compares binary UTF-8 exactly like DataFrame
        // ORDER BY and the DuckDB oracle; a plain String sortByKey
        // would order by UTF-16 code units, which diverges when a
        // supplementary character meets a BMP char in [U+E000, U+FFFF]
        .sortBy(p => org.apache.spark.unsafe.types.UTF8String.fromString(p._1))
      counts.toDF("word", "n")
    })

  def defs: Seq[QueryDef] =
    Seq(q11, q12, q13, q14, q15, q16, q17, q46, q118, q259)
}
