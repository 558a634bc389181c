package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §3.2 + the builder prompt.
  *
  * Every engine capability is a [[QueryDef]] registered by its module;
  * this object is just the flat registry the harness consumes.
  */
object SparkEntry {
  /** All implemented capabilities, one QueryDef per SURVEY.md §2 row. */
  def all: Seq[QueryDef] =
    Relational.defs ++ Classics.defs ++ EventTime.defs ++
      Dedup.defs ++ TextPipeline.defs ++ Similarity.defs ++
      Aggregates.defs ++ Analytics.defs ++ Extended.defs ++
      Reshape.defs ++ MoreFunctions.defs ++ Pipeline.defs ++ Graph.defs ++
      Curation.defs ++ Temporal.defs ++ Planning.defs ++ Online.defs ++
      Formats.defs ++ Learning.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql.stripMargin.trim)).toMap
}
