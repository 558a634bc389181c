package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.QueryDef
import graft.sources.Tables
import graft.functions.text

/** Text source formats under the correctness gate (SURVEY §2.2 widened
  * beyond parquet): the engine's JSON-Lines and CSV read paths proved
  * LOSSLESS by round-trip — write the documents table out in each
  * format, read it back with an explicit schema (never inference — an
  * inference pass is a full extra scan at 100 TB), and reduce both
  * copies to per-(format, lang) fingerprints that the DuckDB oracle
  * recomputes from the original parquet. Any escaping, encoding, quote
  * or type drift in either text path breaks the content checksum and
  * fails the hash gate.
  */
object Formats {

  /** Per-row md5 content hash folded to 40 bits and summed per group —
    * an order-independent exact-integer content checksum both engines
    * compute identically (2^40-bounded terms keep the BIGINT sum exact
    * to ~2^23 rows per group; beyond that the fold narrows further —
    * the q174 checksum discipline). Fields join under a \u0001
    * separator so no field concatenation is ambiguous. */
  private def rowHash = text.md5Hash60(
    concat_ws("\u0001", col("doc_id"), col("lang"), col("source"),
      col("n_chars"), col("text"))) % (1L << 40)

  private val q202 = QueryDef(
    "q202_text_source_roundtrip",
    "JSON-Lines and CSV source paths proved lossless by checksummed round-trip",
    Some(s"""
      WITH h AS (SELECT lang,
                        ${text.md5Hash60Sql(
                          "doc_id || chr(1) || lang || chr(1) || source || chr(1) || n_chars || chr(1) || text")}
                          % (1::BIGINT << 40) AS h
                 FROM documents),
      g AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(h) AS BIGINT) AS content_checksum
            FROM h GROUP BY lang),
      f AS (SELECT unnest(['csv', 'json']) AS format)
      SELECT f.format, g.lang, g.n_docs, g.content_checksum
      FROM f CROSS JOIN g
      ORDER BY f.format, g.lang"""),
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select("doc_id", "lang", "source", "n_chars", "text")
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("source", StringType), StructField("n_chars", LongType),
        StructField("text", StringType)))
      val base = java.nio.file.Files.createTempDirectory("graft_q202").toString
      docs.write.mode("overwrite").json(s"$base/json")
      docs.write.mode("overwrite")
        .option("header", "true").option("quoteAll", "true")
        .csv(s"$base/csv")
      val j = s.read.schema(schema).json(s"$base/json")
        .withColumn("format", lit("json"))
      val c = s.read.schema(schema)
        .option("header", "true").csv(s"$base/csv")
        .withColumn("format", lit("csv"))
      c.unionByName(j)
        .select(col("format"), col("lang"), rowHash.as("h"))
        .groupBy("format", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("h")).cast("long").as("content_checksum"))
        .orderBy("format", "lang")
    })

  def defs: Seq[QueryDef] = Seq(q202)
}
