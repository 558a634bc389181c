package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables
import graft.functions.text

/** Graph analytics over the verified near-dup graph (GraphX theme from
  * PAPERS.md; q45 covers connected components — this adds ranking).
  *
  * PageRank here is FIXED-POINT INTEGER arithmetic: ranks live in
  * micro-units (1e6 = 1.0), the damping step is `(x * 85) DIV 100`, and
  * per-edge shares are `rank DIV degree` — every operation is exact
  * integer math both engines implement identically, so a float-free
  * PageRank hash-matches DuckDB with no rounding discipline at all.
  * (Float PageRank would drift: per-node contribution sums are
  * aggregation-order-sensitive.) The mass lost to floor-division is
  * deterministic and identical on both sides — reproducibility over
  * mass conservation, the right trade for a pipeline fingerprint.
  */
object Graph {

  /** 10 fixed iterations; no convergence actions — the whole iteration
    * chain is ONE lazy plan (each step: one join + one aggregate), so
    * Spark executes a single 10-step job. At 100 TB the edge table is
    * hash-partitioned once and every step reuses that partitioning. */
  private val q73 = QueryDef(
    "q73_pagerank_neardup_graph",
    "10-iteration fixed-point integer PageRank over the near-dup pair graph",
    Some {
      val steps = (1 to 10).map { i =>
        s"""c$i AS (SELECT e.dst AS node, SUM(r${i - 1}.rank // d.deg) AS s
           |        FROM e JOIN r${i - 1} ON r${i - 1}.node = e.src
           |        JOIN deg d ON d.node = e.src GROUP BY e.dst),
           |r$i AS (SELECT n.node, CAST(150000 + (COALESCE(c.s, 0) * 85) // 100 AS BIGINT) AS rank
           |        FROM nodes n LEFT JOIN c$i c USING (node))""".stripMargin
      }.mkString(",\n")
      s"""
      WITH ${text.shinglesCte},
      sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
      p0 AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      ver AS (
        SELECT doc_a, doc_b
        FROM p0 JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        WHERE ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) >= 0.5),
      e AS (SELECT doc_a AS src, doc_b AS dst FROM ver
            UNION ALL SELECT doc_b, doc_a FROM ver),
      nodes AS (SELECT DISTINCT src AS node FROM e),
      deg AS (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY src),
      r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
      $steps
      SELECT r10.node AS doc_id, r10.rank AS pr_rank, d.deg AS degree
      FROM r10 JOIN deg d USING (node)
      ORDER BY doc_id"""
    },
    (s, dir) => {
      val sh = text.shingles(Tables.documents(s, dir))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val inter = sh.select(col("doc_id").as("doc_a"), col("shingle"))
        .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("inter"))
      val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val pairs = inter
        .join(sz.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), Seq("doc_a"))
        .join(sz.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), Seq("doc_b"))
        .filter(round(col("inter").cast("double")
          / (col("sz_a") + col("sz_b") - col("inter")), 4) >= 0.5)
        .select(col("doc_a"), col("doc_b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val e = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      val nodes = e.select(col("src").as("node")).distinct()
      val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      var rank = nodes.select(col("node"), lit(1000000L).as("rank"))
      for (_ <- 1 to 10) {
        val share = rank.join(deg, Seq("node"))
          .select(col("node").as("src"), expr("rank DIV deg").as("share"))
        val contrib = e.join(share, Seq("src"))
          .groupBy(col("dst").as("node"))
          .agg(sum(col("share")).as("s"))
        rank = nodes.join(contrib, Seq("node"), "left")
          .select(col("node"),
            (lit(150000L) + expr("COALESCE(s, 0L) * 85 DIV 100")).as("rank"))
      }
      rank.join(deg, Seq("node"))
        .select(col("node").as("doc_id"), col("rank").as("pr_rank"),
          col("deg").as("degree"))
        .orderBy("doc_id")
    })

  def defs: Seq[QueryDef] = Seq(q73)
}
