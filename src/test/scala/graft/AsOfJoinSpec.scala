package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.AsOfJoin

/** Native as-of join operator (graft.plans.AsOfJoinPlan): differential
  * testing against the rank-1 window composition it replaced — the
  * composition is the executable SPEC, the operator must match it
  * row-for-row on randomized inputs engineered for merge edge cases
  * (duplicate times, ties, keys on one side only, null keys/times,
  * empty right partitions). */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // deterministic generator: heavy key collision (0..9), heavy time
  // collision (0..19), nulls sprinkled on key and time
  private def mkSide(seed: Long, n: Int, tag: String): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      val k = if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(10).toLong)
      val t = if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(20).toLong)
      (i.toLong, k, t)
    }
    rows.toDF(s"${tag}_id", s"${tag}_k", s"${tag}_t")
  }

  /** The spec: equi-join + rank-1 window, exactly the pre-round-10
    * q10/q69 shape (including its null semantics); `tol` adds the
    * bounded-distance predicate the operator's tolerance implements. */
  private def windowSpec(l: DataFrame, r: DataFrame, forward: Boolean,
      tol: Option[Long] = None): DataFrame = {
    val base = col("l_k") === col("r_k") &&
      (if (forward) col("r_t") > col("l_t") else col("r_t") <= col("l_t"))
    val cond = tol.fold(base) { d =>
      base && (if (forward) col("r_t") <= col("l_t") + d
               else col("r_t") >= col("l_t") - d)
    }
    val w = Window.partitionBy(col("l_id")).orderBy(
      if (forward) col("r_t").asc_nulls_last else col("r_t").desc_nulls_last,
      if (forward) col("r_id").asc_nulls_last else col("r_id").desc_nulls_last)
    l.join(r, cond, "left")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("l_id", "r_id")
  }

  private def collectPairs(df: DataFrame): Set[(Long, Option[Long])] =
    df.collect().map(row => (row.getLong(row.fieldIndex("l_id")),
      if (row.isNullAt(row.fieldIndex("r_id"))) None
      else Some(row.getLong(row.fieldIndex("r_id"))))).toSet

  for (forward <- Seq(false, true); (nl, nr, seed) <- Seq(
      (300, 300, 1L), (100, 500, 2L), (500, 100, 3L), (50, 0, 4L))) {
    val dir = if (forward) "forward" else "backward"
    test(s"$dir as-of matches the window-composition spec (nl=$nl nr=$nr)") {
      val l = mkSide(seed, nl, "l")
      val r = mkSide(seed + 100, nr, "r")
      val native =
        (if (forward) AsOfJoin.forward(l, r, "l_k", "r_k", "l_t", "r_t", "r_id")
         else AsOfJoin.backward(l, r, "l_k", "r_k", "l_t", "r_t", "r_id"))
          .select("l_id", "r_id")
      val spec = windowSpec(l, r, forward)
      assert(native.count() == nl.toLong, "left outer: one row per left row")
      assert(collectPairs(native) == collectPairs(spec))
    }
  }

  for (forward <- Seq(false, true); tol <- Seq(0L, 3L, 7L)) {
    val dir = if (forward) "forward" else "backward"
    test(s"$dir as-of with tolerance=$tol matches the bounded window spec") {
      val l = mkSide(11L, 300, "l")
      val r = mkSide(211L, 300, "r")
      val native =
        (if (forward)
          AsOfJoin.forward(l, r, "l_k", "r_k", "l_t", "r_t", "r_id", Some(tol))
        else
          AsOfJoin.backward(l, r, "l_k", "r_k", "l_t", "r_t", "r_id", Some(tol)))
          .select("l_id", "r_id")
      assert(native.count() == 300L, "left outer: one row per left row")
      assert(collectPairs(native) ==
        collectPairs(windowSpec(l, r, forward, Some(tol))))
    }
  }

  test("tolerance rejects non-integral time columns and negative bounds") {
    val l = mkSide(21L, 10, "l").withColumn("l_d", col("l_t").cast("double"))
    val r = mkSide(22L, 10, "r").withColumn("r_d", col("r_t").cast("double"))
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, r, "l_k", "r_k", "l_d", "r_d", "r_id", Some(5L))
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, r, "l_k", "r_k", "l_t", "r_t", "r_id", Some(-1L))
    }
  }

  test("q221 is exactly q10 filtered by the 30-min bound (subset law)") {
    // house-style sibling law (like the LSH/brute pairs in PipelineSpec):
    // the tolerance form must agree with the unbounded form wherever the
    // unbounded match lies within the bound, and be null exactly where
    // it does not — on the real fixture, not synthetic rows.
    val q10 = SparkEntry.queries("q10_asof_click_before_purchase")(spark, sf)
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(2)) None else Some((r.getLong(2), r.getLong(3))))).toMap
    val q221 = SparkEntry.queries("q221_asof_tolerance_attribution")(spark, sf)
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(2)) None else Some((r.getLong(2), r.getLong(3))))).toMap
    assert(q10.keySet == q221.keySet, "both emit one row per purchase")
    val tol = 1800000000L
    q10.foreach { case (purchase, m10) =>
      val want = m10.filter(_._2 <= tol)
      assert(q221(purchase) == want,
        s"purchase $purchase: q221=${q221(purchase)} vs filtered q10=$want")
    }
    assert(q10.values.exists(m => m.exists(_._2 > tol)),
      "fixture must exercise the out-of-tolerance → null branch")
    assert(q221.values.exists(_.isDefined),
      "fixture must exercise the within-tolerance branch")
  }

  test("exec metrics count output and matched rows") {
    val k = "spark.sql.adaptive.enabled"
    val before = spark.conf.getOption(k)
    spark.conf.set(k, "false") // direct plan traversal, no AQE wrapper
    try {
      val l = mkSide(31L, 200, "l")
      val r = mkSide(231L, 200, "r")
      val df = AsOfJoin.backward(l, r, "l_k", "r_k", "l_t", "r_t", "r_id")
      val wantMatched = windowSpec(l, r, forward = false)
        .filter(col("r_id").isNotNull).count()
      df.collect()
      val node = df.queryExecution.executedPlan.collect {
        case a: graft.plans.AsOfJoinExec => a
      }
      assert(node.size == 1)
      assert(node.head.metrics("numOutputRows").value == 200L)
      assert(node.head.metrics("numMatched").value == wantMatched)
    } finally before.fold(spark.conf.unset(k))(v => spark.conf.set(k, v))
  }

  test("operator requires disjoint column names") {
    val l = mkSide(7L, 10, "l")
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, l, "l_k", "l_k", "l_t", "l_t", "l_id")
    }
  }

  test("q10/q69/q221 plans carry the native operator and exactly one exchange per side") {
    for (name <- Seq("q10_asof_click_before_purchase",
        "q69_asof_forward_view_after_signup",
        "q221_asof_tolerance_attribution")) {
      val df = SparkEntry.queries(name)(spark, sf)
      val p = df.queryExecution.executedPlan.toString
      // AsOfJoinExec renders as "AsOfJoin" (TreeNode strips the Exec suffix)
      assert("""\+- AsOfJoin """.r.findFirstIn(p).isDefined,
        s"$name lost the native as-of operator")
      assert(!p.contains("WindowGroupLimit") && !"Window \\[row_number".r
        .findFirstIn(p).isDefined, s"$name still has the window composition")
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
        s"$name should shuffle each side exactly once")
    }
  }
}
