package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability: a pure, deterministic query
  * `(SparkSession, sfDir) => DataFrame` plus (when SQL-expressible) an
  * equivalent DuckDB oracle statement over the same parquet tables.
  *
  * Contract (SURVEY.md §3.2, §7.5): every query ends in a total ORDER BY,
  * every double aggregate is rounded on both sides, and column names match
  * the oracle exactly (the driver sorts columns by name before hashing).
  */
final case class QueryDef(
    name: String,
    doc: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)
