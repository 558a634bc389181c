package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet sources for the ten fixture tables (FIXTURES.md).
  *
  * Scale notes (SURVEY.md §7.6): each table is a plain parquet directory;
  * at cluster scale these would be partitioned/bucketed layouts, but the
  * reader API is identical — `spark.read.parquet` gets vectorized scans,
  * predicate pushdown and column pruning from Catalyst for free. Never
  * infer schema from text; parquet footers are authoritative.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** events.ts is ns-precision parquet, which Spark 4 refuses as a
    * TimestampType ([PARQUET_TYPE_ILLEGAL]). Read it as raw int64 nanos
    * (legacy nanosAsLong) and expose `ts_us` = epoch microseconds via
    * exact integer division — DuckDB reads the same column truncated to
    * µs TIMESTAMP, so `epoch_us(ts)` matches `ts_us` bit-for-bit.
    * (Double division would corrupt: epoch-ns ~1.7e18 exceeds 2^53.) */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events").withColumn("ts_us", expr("ts div 1000"))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
