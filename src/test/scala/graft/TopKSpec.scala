package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TopKLongPairs

/** [[TopKLongPairs]] is a drop-in replacement for the rank-window
  * truncation `row_number() OVER (PARTITION BY key ORDER BY ord DESC,
  * v ASC) <= k` — these tests pin row-level equivalence on randomized
  * inputs (ties on ord, duplicate (ord, v) pairs, groups smaller and
  * larger than k, null ord rows) plus the emitted array's order. */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference: the window form over the same rows. */
  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("key").orderBy(col("ord").desc, col("v"))
    df.withColumn("r", row_number().over(w)).filter(col("r") <= k)
      .select("key", "ord", "v")
  }

  private def heapTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("key")
      .agg(TopKLongPairs.topkPairs(col("ord"), col("v"), k).as("top"))
      .select(col("key"), explode(col("top")).as("t"))
      .select(col("key"), col("t.ord").as("ord"), col("t.v").as("v"))

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted

  test("matches the rank window on randomized input with ties") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(5000)(
      (rnd.nextInt(40).toLong, rnd.nextInt(12).toLong, rnd.nextInt(500).toLong))
    val df = rows.toDF("key", "ord", "v")
    for (k <- Seq(1, 3, 10)) {
      assert(canon(heapTopK(df, k)) == canon(windowTopK(df, k)),
        s"k=$k differs from the window form")
    }
  }

  test("groups smaller than k emit every row; duplicates are preserved") {
    val df = Seq(
      (1L, 5L, 9L), (1L, 5L, 9L), (1L, 2L, 1L), // dup (ord,v) pair
      (2L, 7L, 7L))
      .toDF("key", "ord", "v")
    val got = canon(heapTopK(df, 10))
    assert(got == Seq((1L, 2L, 1L), (1L, 5L, 9L), (1L, 5L, 9L), (2L, 7L, 7L)))
  }

  test("emitted array is best-first (ord desc, v asc)") {
    val df = Seq((1L, 3L, 5L), (1L, 9L, 2L), (1L, 9L, 1L), (1L, 4L, 0L))
      .toDF("key", "ord", "v")
    val arr = df.groupBy("key")
      .agg(TopKLongPairs.topkPairs(col("ord"), col("v"), 3).as("top"))
      .select(col("top.ord"), col("top.v")).head()
    assert(arr.getSeq[Long](0) == Seq(9L, 9L, 4L))
    assert(arr.getSeq[Long](1) == Seq(1L, 2L, 0L))
  }

  test("null ord or v rows are skipped, like a k<<n DESC rank filter") {
    val df = Seq(
      (1L, Some(5L), Some(9L)), (1L, None, Some(3L)), (1L, Some(1L), None))
      .toDF("key", "ord", "v")
    assert(canon(heapTopK(df, 2)) == Seq((1L, 5L, 9L)))
  }

  test("SQL path widens INT inputs and rejects non-castable types at analysis") {
    // Round-10 ADVICE: `VALUES (1, 2)` produces INT literals; without
    // declared input types those passed analysis and threw
    // ClassCastException in update() at execution. ImplicitCastInputTypes
    // must widen them to LONG instead.
    graft.GraftExtensions.register(spark)
    val got = spark.sql(
      """SELECT graft_topk_pairs(o, v, 2) AS top
        |FROM VALUES (1, 10), (3, 30), (2, 20) AS t(o, v)""".stripMargin)
      .select(col("top.ord"), col("top.v")).head()
    assert(got.getSeq[Long](0) == Seq(3L, 2L))
    assert(got.getSeq[Long](1) == Seq(30L, 20L))
    // an ARRAY column cannot implicitly cast to LONG → analysis error,
    // not an executor-side ClassCastException (strings DO implicitly
    // cast in non-ANSI mode — they become null and are skipped, which
    // the null-row test above already covers)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        """SELECT graft_topk_pairs(o, v, 2)
          |FROM VALUES (array(1), array(2)) AS t(o, v)""".stripMargin).collect()
    }
    assert(e.getMessage.toLowerCase.contains("graft_topk_pairs") ||
      e.getMessage.toLowerCase.contains("data type"))
  }

  test("merge across partitions keeps the global top-k") {
    // force many input partitions so partial buffers genuinely merge
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(4000)((1L, rnd.nextInt(100000).toLong, rnd.nextLong().abs))
    val df = rows.toDF("key", "ord", "v").repartition(16)
    assert(canon(heapTopK(df, 5)) == canon(windowTopK(df, 5)))
  }

  // -------------------------------------------------------------------
  // TopKSummedLongPairs (graft_topk_sum): sum-then-top-k fusion
  // -------------------------------------------------------------------

  /** Reference composition for the fused aggregate: SUM(n) per (key, v),
    * anti-join the exclusion set, rank-window top-k on (sum desc, v). */
  private def composedSumTopK(cand: org.apache.spark.sql.DataFrame,
      excl: org.apache.spark.sql.DataFrame, k: Int) = {
    val sc = cand.join(excl, Seq("key", "v"), "left_anti")
      .groupBy("key", "v").agg(sum("n").as("ord"))
    windowTopK(sc.select("key", "ord", "v"), k)
  }

  /** Fused form: one graft_topk_sum over candidates ∪ tombstones. */
  private def fusedSumTopK(cand: org.apache.spark.sql.DataFrame,
      excl: org.apache.spark.sql.DataFrame, k: Int) = {
    val fused = cand.unionByName(excl.withColumn("n",
      lit(graft.functions.TopKSummedLongPairs.Tombstone)))
    fused.groupBy("key")
      .agg(graft.functions.TopKSummedLongPairs.topkSum(col("v"), col("n"), k).as("top"))
      .select(col("key"), explode(col("top")).as("t"))
      .select(col("key"), col("t.ord").as("ord"), col("t.v").as("v"))
  }

  test("graft_topk_sum ≡ sum + anti-join exclusion + rank window (randomized, 16 partitions)") {
    val rnd = new scala.util.Random(41)
    // candidate rows: many (key, v) repeats so the per-v sums genuinely
    // combine; weights ≥ 1 like co-occurrence counts
    val cand = Seq.fill(6000)((rnd.nextInt(40).toLong,
      rnd.nextInt(120).toLong, (rnd.nextInt(9) + 1).toLong))
      .toDF("key", "v", "n").repartition(16)
    // exclusion set: overlaps candidate (key, v) pairs and includes
    // pairs with no candidate rows at all (pure-tombstone entries)
    val excl = Seq.fill(800)((rnd.nextInt(40).toLong, rnd.nextInt(140).toLong))
      .toDF("key", "v").distinct()
    assert(canon(fusedSumTopK(cand, excl, 5)) ==
      canon(composedSumTopK(cand, excl, 5)))
    // k larger than any group: every positive-summed, non-excluded v
    assert(canon(fusedSumTopK(cand, excl, 1000)) ==
      canon(composedSumTopK(cand, excl, 1000)))
  }

  test("graft_topk_sum with no tombstones is exactly sum-then-top-k; ties break on v asc") {
    val cand = Seq(
      (1L, 10L, 3L), (1L, 10L, 2L),   // v=10 sums to 5
      (1L, 20L, 5L),                  // v=20 sums to 5 (tie with v=10)
      (1L, 30L, 4L), (1L, 40L, 1L)
    ).toDF("key", "v", "n")
    val got = cand.groupBy("key")
      .agg(graft.functions.TopKSummedLongPairs.topkSum(col("v"), col("n"), 2).as("top"))
      .select(col("top.ord"), col("top.v")).head()
    // both 5-sums win; tie broken to the smaller v first
    assert(got.getSeq[Long](0) == Seq(5L, 5L))
    assert(got.getSeq[Long](1) == Seq(10L, 20L))
  }

  test("graft_topk_sum drops non-positive totals (exclusion semantics) and null rows") {
    val rows = Seq(
      (1L, Some(10L), Some(7L)),
      (1L, Some(10L), Some(graft.functions.TopKSummedLongPairs.Tombstone)), // sunk
      (1L, Some(20L), Some(0L)),      // zero total: dropped (not positive)
      (1L, Some(30L), None),          // null n: skipped → v=30 never appears
      (1L, None, Some(9L)),           // null v: skipped
      (1L, Some(40L), Some(2L))
    ).toDF("key", "v", "n")
    val got = rows.groupBy("key")
      .agg(graft.functions.TopKSummedLongPairs.topkSum(col("v"), col("n"), 10).as("top"))
      .select(col("top.ord"), col("top.v")).head()
    assert(got.getSeq[Long](0) == Seq(2L))
    assert(got.getSeq[Long](1) == Seq(40L))
  }

  test("graft_topk_sum: stacked tombstones saturate instead of wrapping positive") {
    // round-13 ADVICE: the public surface must be misuse-safe — a
    // caller who unions a NON-deduplicated exclusion set emits 2+
    // tombstone rows per (key, v); two's-complement addition of 5-7
    // tombstones (Long.MinValue/4 each) wraps into a large POSITIVE
    // total, silently resurrecting the excluded entry at rank 1. The
    // saturating sum clamps at Long.MinValue, so the entry stays sunk.
    val ts = graft.functions.TopKSummedLongPairs.Tombstone
    for (dups <- Seq(2, 5, 7, 9)) {
      val rows = (Seq((1L, 10L, 100L), (1L, 20L, 50L)) ++
        Seq.fill(dups)((1L, 10L, ts))).toDF("key", "v", "n")
      val got = rows.groupBy("key")
        .agg(graft.functions.TopKSummedLongPairs.topkSum(col("v"), col("n"), 5).as("top"))
        .select(col("top.v")).head()
      assert(got.getSeq[Long](0) == Seq(20L),
        s"$dups stacked tombstones must keep v=10 excluded")
    }
    // the scalar helper clamps both directions
    import graft.functions.TopKSummedLongPairs.addSat
    assert(addSat(Long.MinValue, -1L) == Long.MinValue)
    assert(addSat(Long.MaxValue, 1L) == Long.MaxValue)
    assert(addSat(ts, ts) == ts * 2) // no overflow: exact
    assert(addSat(5L, -3L) == 2L)
  }

  test("graft_topk_sum SQL path: registered, widens INT, rejects fractional") {
    graft.GraftExtensions.register(spark)
    val got = spark.sql(
      """SELECT graft_topk_sum(v, n, 2) AS top
        |FROM VALUES (10, 1), (10, 2), (20, 4), (30, 1) AS t(v, n)""".stripMargin)
      .select(col("top.ord"), col("top.v")).head()
    assert(got.getSeq[Long](0) == Seq(4L, 3L))
    assert(got.getSeq[Long](1) == Seq(20L, 10L))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        """SELECT graft_topk_sum(v, n, 2)
          |FROM VALUES (1.5, 2.5) AS t(v, n)""".stripMargin).collect()
    }
    assert(e.getMessage.toLowerCase.contains("graft_topk_sum") ||
      e.getMessage.toLowerCase.contains("data type"))
  }
}
