package graft.operators

import org.apache.spark.sql.functions._
import graft.QueryDef
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

  /** 10 fixed iterations. The rank table is localCheckpoint'ed every 3
    * iterations: round 2 showed that leaving all 10 join+agg steps as
    * ONE lazy plan makes Catalyst analyze/optimize a 10-deep tree whose
    * cost dwarfs the (tiny) data — 10 s at sf0.1 for a 47-node graph.
    * Truncating lineage keeps each optimized plan 3 steps deep; the
    * arithmetic is exact integer, so materialization points cannot
    * change results. At 100 TB the edge table is hash-partitioned once,
    * every step reuses that partitioning, and the checkpoint (cluster
    * `checkpoint()` there, not local) bounds both plan depth and the
    * recovery-lineage length — the standard iterative-graph discipline. */
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
      WITH ${text.verifiedPairsCte},
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
      val pairs = Dedup.verifiedPairs(s, dir)
      val e = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      // Node base WITH degree, materialized once (edges are symmetric,
      // so deg's keys are exactly the node set). Degree is static, so it
      // rides inside the rank table across iterations: the per-iteration
      // share becomes a join-free projection (`rank DIV deg` is map-side
      // arithmetic), cutting the loop from 3 joins/iter to 2 and
      // dropping the final degree join — same exact integer results,
      // ~1/3 fewer scheduled stages per iteration.
      val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
        .localCheckpoint()
      var rank = deg.select(col("node"), col("deg"), lit(1000000L).as("rank"))
      for (i <- 1 to 10) {
        val contrib = e.join(
            rank.select(col("node").as("src"), expr("rank DIV deg").as("share")),
            Seq("src"))
          .groupBy(col("dst").as("node"))
          .agg(sum(col("share")).as("s"))
        rank = deg.join(contrib, Seq("node"), "left")
          .select(col("node"), col("deg"),
            (lit(150000L) + expr("COALESCE(s, 0L) * 85 DIV 100")).as("rank"))
        if (i % 3 == 0 && i < 10) rank = rank.localCheckpoint()
      }
      rank
        .select(col("node").as("doc_id"), col("rank").as("pr_rank"),
          col("deg").as("degree"))
        .orderBy("doc_id")
    })

  def defs: Seq[QueryDef] = Seq(q73)
}
