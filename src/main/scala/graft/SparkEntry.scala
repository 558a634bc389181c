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
      Formats.defs ++ Learning.defs ++ Typed.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The flagship also rides a 1-row events probe (max ts_us) so the t1
    * smoke itself catches an events-fixture schema drift — round 8's
    * ns→µs regeneration surfaced only in the bench tail because the
    * smoke never touched the events loader. */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, max}
    val dir = "/root/testdata/sf0.001"
    val evProbe = graft.sources.Tables.events(spark, dir)
      .agg(max("ts_us").as("max_ts_us"))
    Relational.pricingSummary(spark, dir).crossJoin(broadcast(evProbe))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql.stripMargin.trim)).toMap
}
