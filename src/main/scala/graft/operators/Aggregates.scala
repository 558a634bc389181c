package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables
import graft.functions.det._
import graft.functions.WelfordVariance

/** Custom-aggregate surface (SURVEY.md §2.10) + sketch aggregates
  * (§2.5): the typed Welford Aggregator as the "user reduce fn"
  * showcase, and HyperLogLog approximate distinct for 100 TB
  * cardinalities where exact count-distinct would shuffle every key.
  */
object Aggregates {

  /** Welford-variance UDAF vs DuckDB var_samp. Prices are scaled down
    * (1e-5) before aggregating so the 4-dp rounding comfortably absorbs
    * the ~1e-12 relative difference between the two engines' stable
    * variance algorithms. */
  private val q36 = QueryDef(
    "q36_welford_variance",
    "typed Aggregator (Welford/Chan) sample variance per order status",
    Some(s"""
      SELECT o_orderstatus,
             COUNT(*) AS n,
             ROUND(var_samp(o_totalprice / 100000.0), 4) AS var_scaled,
             ${davgSql("o_totalprice")} AS avg_price
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus"""),
    (s, dir) => {
      val welford = udaf(WelfordVariance)
      Tables.orders(s, dir)
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("n"),
          round(welford(col("o_totalprice") / 100000.0), 4).as("var_scaled"),
          davg(col("o_totalprice")).as("avg_price"))
        .orderBy("o_orderstatus")
    })

  /** HyperLogLog distinct-user estimate per event type, shipped as an
    * ACCURACY AUDIT so the opaque sketch still passes the full hash
    * gate (round-7 VERDICT item 8): Spark's approx_count_distinct
    * (rsd 0.02) runs live, and what the row carries is the exact
    * count (oracled directly) plus `est_within_10pct` — 1 iff the
    * estimate landed within max(1, 10%) of truth. DuckDB cannot
    * reproduce Spark's HLL++ register values (different sketch), so
    * the oracle pins the flag at 1: the cell is a Spark-side
    * assertion, and any estimator drift outside the band flips it to
    * 0 and FAILS the gate — strictly stronger than the old rows-only
    * check, without pretending the raw estimate is portable. The
    * deterministic fully-oracled sketch twin remains q56; the exact
    * aggregate is oracled as q09. HLL merge is commutative, so the
    * estimate is partition-independent. */
  private val q37 = QueryDef(
    "q37_approx_distinct_users",
    "approx_count_distinct (HLL) audited against exact truth per event type",
    Some("""
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
             1 AS est_within_10pct
      FROM events GROUP BY event_type
      ORDER BY event_type"""),
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
        .select(col("event_type"), col("n_events"), col("exact_users"),
          when(abs(col("approx_users") - col("exact_users")) <=
            greatest(lit(1.0), col("exact_users") * 0.1), 1).otherwise(0)
            .as("est_within_10pct"))
        .orderBy("event_type"))

  /** Two-phase SALTED aggregation — the skew-mitigation shape for
    * power-law keys (one user = 10% of a 100 TB event stream would pin
    * one reducer in a direct groupBy). Phase 1 aggregates (key, salt)
    * so the hot key fans over 16 reducers; phase 2 merges the per-salt
    * partials. The salt is md5-derived from event_id (stable, never
    * rand()), and double sums ride the exact DECIMAL accumulator
    * through BOTH phases, so the result is bit-identical to a direct
    * single-phase aggregate — which is exactly what the oracle runs.
    * events has only 5 event_type keys: a deliberately extreme
    * key-to-reducer ratio that a direct groupBy would serialize. */
  private val q82 = QueryDef(
    "q82_salted_skew_aggregation",
    "two-phase salted count+sum per event_type (skew-safe aggregation)",
    Some(s"""
      SELECT event_type, COUNT(*) AS n, ${dsumSql("value")} AS sum_value
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""),
    (s, dir) => {
      val salt = pmod(
        graft.functions.text.md5Hash60(concat(lit("salt:"), col("event_id"))),
        lit(16))
      Tables.events(s, dir)
        .select(col("event_type"), salt.as("salt"),
          col("value").cast(org.apache.spark.sql.types.DecimalType(30, 10)).as("v"))
        .groupBy("event_type", "salt")
        .agg(count(lit(1)).as("pn"), sum(col("v")).as("ps"))
        .groupBy("event_type")
        .agg(sum(col("pn")).as("n"),
          round(sum(col("ps")).cast("double"), 4).as("sum_value"))
        .orderBy("event_type")
    })

  /** percentile_approx (the KLL/GK-family mergeable quantile sketch a
    * 100 TB aggregation uses instead of a global sort) audited the q37
    * way: the opaque sketch value is not cross-engine portable, so the
    * row carries the EXACT interpolated p50/p90 (oracled directly via
    * the percentile ⟷ quantile_cont pairing) plus in-band flags — 1
    * iff the approx value lies within the exact [p48,p52] / [p88,p92]
    * rank band, a bound far looser than the sketch's n/accuracy ≤ n/10⁴
    * rank-error guarantee, so the flag is deterministically 1 unless
    * the estimator breaks. The oracle pins the flags: sketch drift
    * fails the hash gate. Both aggregates are map-side mergeable —
    * this is the shape that replaces q42's exact percentiles when the
    * group is too wide to sort. */
  private val q198 = QueryDef(
    "q198_approx_percentile_audit",
    "percentile_approx audited against exact rank bands per event type",
    Some("""
      SELECT event_type,
             CAST(COUNT(value) AS BIGINT) AS n,
             ROUND(quantile_cont(value, 0.50), 4) + 0.0 AS exact_p50,
             ROUND(quantile_cont(value, 0.90), 4) + 0.0 AS exact_p90,
             1 AS p50_in_band, 1 AS p90_in_band
      FROM events GROUP BY event_type
      ORDER BY event_type"""),
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          count(col("value")).as("n"),
          (round(expr("percentile(value, 0.50)"), 4) + 0.0).as("exact_p50"),
          (round(expr("percentile(value, 0.90)"), 4) + 0.0).as("exact_p90"),
          expr("percentile_approx(value, 0.50, 10000)").as("a50"),
          expr("percentile_approx(value, 0.90, 10000)").as("a90"),
          expr("percentile(value, 0.48)").as("lo50"),
          expr("percentile(value, 0.52)").as("hi50"),
          expr("percentile(value, 0.88)").as("lo90"),
          expr("percentile(value, 0.92)").as("hi90"))
        .select(col("event_type"), col("n"), col("exact_p50"), col("exact_p90"),
          when(col("a50") >= col("lo50") && col("a50") <= col("hi50"), 1)
            .otherwise(0).as("p50_in_band"),
          when(col("a90") >= col("lo90") && col("a90") <= col("hi90"), 1)
            .otherwise(0).as("p90_in_band"))
        .orderBy("event_type"))

  def defs: Seq[QueryDef] = Seq(q36, q37, q82, q198)
}
