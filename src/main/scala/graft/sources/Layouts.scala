package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Storage-layout operators: the at-rest half of the 100 TB design
  * (SURVEY.md §7.6). On the fixture scale these are exercised by
  * LayoutSpec; at cluster scale they are the difference between a full
  * scan and a pruned one, and between a shuffled join and a local one.
  */
object Layouts {

  /** Hive-style partitioned parquet: one directory per distinct value of
    * the partition columns. Reads with an equality/IN filter on those
    * columns prune entire directories before any IO (visible as
    * PartitionFilters in the scan node). Partition by low-cardinality,
    * always-filtered columns only — high-cardinality partitioning
    * produces the classic small-files problem. */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Bucketed + sorted table: rows are hash-distributed into `n` buckets
    * by `key` at write time. Two tables bucketed the same way join with
    * NO exchange on either side — the shuffle is paid once at write time
    * and amortized over every subsequent join/aggregation, the classic
    * co-located-join layout for fact tables at 100 TB. Requires the
    * session catalog (saveAsTable); pass `path` to land the files as an
    * EXTERNAL table at an explicit location instead of the session
    * warehouse (harness sessions run with the default ./spark-warehouse,
    * which must never collect query scratch data). */
  def writeBucketed(df: DataFrame, table: String, key: String, n: Int,
      path: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(n, key).sortBy(key)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }
}
