package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-pipeline building blocks shared by the dedup / text-analysis
  * operators. Everything is built from codegen'd higher-order array
  * functions — no JVM UDFs in any hot path (SURVEY.md §7.6).
  */
object text {

  /** Distinct word n-shingles per document: (doc_id, shingle).
    * Documents with fewer than n tokens produce no shingles.
    * The oracle twin is [[shinglesCte]].
    *
    * The token array is materialized in its own projection first:
    * higher-order lambdas run interpreted, so an INLINE split() subtree
    * would be re-evaluated on every element_at — ~n·tokens splits per
    * document (measured 6× slower at sf0.1). As an attribute, it is
    * computed once per row. */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame = {
    val t = col("t")
    val sh = when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(t, i + lit(k))): _*)))
      .otherwise(array().cast("array<string>"))
    docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), explode(sh).as("shingle")).distinct()
  }

  /** DuckDB CTEs producing the same (doc_id, shingle) set as [[shingles]]
    * with n=3, named `sh`. */
  val shinglesCte: String =
    """tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |         unnest(list_transform(generate_series(1, len(t) - 2),
      |                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
      |       FROM tok WHERE len(t) >= 3)""".stripMargin

  /** DuckDB CTEs from [[shinglesCte]] through the exact-Jaccard-verified
    * pair set (J >= 0.5), named `ver(doc_a, doc_b)` — the shared oracle
    * prefix of the near-dup graph queries (components, PageRank). */
  val verifiedPairsCte: String =
    s"""$shinglesCte,
      |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
      |p0 AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |ver AS (
      |  SELECT doc_a, doc_b
      |  FROM p0 JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
      |  WHERE ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) >= 0.5)""".stripMargin

  /** Positional k-gram hashes: (doc_id, i, h) with i = 1..len−k+1 and
    * h = [[md5Hash60]] of the space-joined k-gram. Docs shorter than k
    * tokens produce no rows. Shared by the winnowing fingerprints (k=4)
    * and the duplicated-span islands (k=6); the oracle twin is
    * [[posKgramCteSql]]. Token array materialized as an attribute first
    * (same re-evaluation hazard as [[shingles]]). */
  def posKgramHashes(docs: DataFrame, k: Int): DataFrame = {
    val tt = col("t")
    docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(tt) >= k)
      .select(col("doc_id"), tt,
        explode(sequence(lit(1), size(tt) - (k - 1))).as("i"))
      .select(col("doc_id"), col("i"),
        md5Hash60(concat_ws(" ",
          (0 until k).map(j => element_at(tt, col("i") + j)): _*)).as("h"))
  }

  /** DuckDB twin of [[posKgramHashes]]: a subquery producing
    * (doc_id, i, h); expects a CTE `tok(doc_id, t)` in scope (see
    * [[shinglesCte]]'s `tok`). */
  def posKgramCteSql(k: Int): String = {
    val gram = (0 until k).map(j => if (j == 0) "t[i]" else s"t[i+$j]")
      .mkString(" || ' ' || ")
    s"""(SELECT doc_id, i, ${md5Hash60Sql(gram)} AS h
       |       FROM (SELECT doc_id, t,
       |                    unnest(generate_series(1, len(t) - ${k - 1})) AS i
       |             FROM tok WHERE len(t) >= $k))""".stripMargin
  }

  /** 60-bit token hash both engines can compute identically: the first 15
    * hex digits of md5 interpreted as an integer. Used by SimHash so the
    * oracle can reproduce signatures bit-for-bit. */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB twin of [[md5Hash60]]. */
  def md5Hash60Sql(x: String): String =
    s"CAST(concat('0x', substr(md5($x), 1, 15)) AS BIGINT)"
}
