package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables
import graft.functions.det._

/** Reshaping + string-distance operators: pivot (wide), unpivot/melt
  * (long), and Levenshtein edit distance. */
object Reshape {

  /** Pivot: revenue per nation × order-status as columns. The status
    * domain is declared explicitly (F/O/P) so the plan is a single
    * aggregation pass with no value-discovery job — mandatory at scale,
    * and it fixes the output schema for the oracle. */
  private val q48 = QueryDef(
    "q48_pivot_revenue_by_status",
    "pivot order revenue to one column per status, per customer nation",
    Some(s"""
      SELECT n_name,
             ${dsumSql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS F,
             ${dsumSql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS O,
             ${dsumSql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS P
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY n_name"""),
    (s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(dsum(col("o_totalprice")))
        .orderBy("n_name"))

  /** Unpivot/melt: wide part attributes to long (attribute, value) rows
    * — the inverse reshape, one Expand pass, no shuffle beyond the
    * final order. */
  private val q49 = QueryDef(
    "q49_unpivot_part_attrs",
    "melt part numeric attributes into (attr, value) rows",
    Some("""
      SELECT p_partkey, attr, val FROM (
        SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
        UNION ALL
        SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val FROM part)
      ORDER BY p_partkey, attr"""),
    (s, dir) =>
      Tables.part(s, dir)
        .select(col("p_partkey"),
          col("p_size").cast("double").as("p_size"),
          col("p_retailprice"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_size"), col("p_retailprice")), "attr", "val")
        .orderBy("p_partkey", "attr"))

  /** Levenshtein edit distance (exact integer DP — identical in both
    * engines): distance from each part's name to its brand string,
    * bucketed. Per-row cost is O(len²) with tiny strings — pure map
    * work, embarrassingly parallel. */
  private val q50 = QueryDef(
    "q50_levenshtein_name_brand",
    "edit distance p_name vs p_brand per part (first 200 parts)",
    Some("""
      SELECT p_partkey, levenshtein(p_name, p_brand) AS dist,
             levenshtein(lower(p_type), 'standard') AS type_dist
      FROM part
      WHERE p_partkey < 200
      ORDER BY p_partkey"""),
    (s, dir) =>
      Tables.part(s, dir)
        .filter(col("p_partkey") < 200)
        .select(col("p_partkey"),
          levenshtein(col("p_name"), col("p_brand")).cast("long").as("dist"),
          levenshtein(lower(col("p_type")), lit("standard")).cast("long").as("type_dist"))
        .orderBy("p_partkey"))

  def defs: Seq[QueryDef] = Seq(q48, q49, q50)
}
