package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Law-based assertions for the temporal (q132/q133/q140) and planning/
  * layout (q134–q139) operators on sf0.001 — conservation, bounds,
  * monotonicity, and cross-form equality properties that pin the
  * semantics independently of the DuckDB oracle gate. */
class TemporalPlanningSpec extends AnyFunSuite {
  import TestSpark._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // ----------------------------------------------------------------- q132

  test("q132 rolling 7d actives dominates the 1-day distinct count and covers <=7 days") {
    val rows = run("q132_rolling_7d_actives").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cov = r.getAs[Long]("days_covered")
      assert(cov >= 1 && cov <= 7, s"days_covered $cov outside [1,7]")
    }
    // the 7-day distinct count can never be below that day's own distinct count
    val daily = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), to_date(timestamp_micros(col("ts_us"))).as("day"),
        col("user_id"))
      .groupBy("event_type", "day")
      .agg(countDistinct("user_id").as("d1"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day").toString)
        -> r.getAs[Long]("d1")).toMap
    val out = rows.map(r => (r.getAs[String]("event_type"),
      r.getAs[java.sql.Date]("day").toString) -> r.getAs[Long]("active_users_7d")).toMap
    daily.foreach { case (k, d1) =>
      assert(out.contains(k), s"active day $k missing from the rolling curve")
      assert(out(k) >= d1, s"rolling count ${out(k)} < same-day distinct $d1 at $k")
    }
  }

  // ----------------------------------------------------------------- q133

  test("q133 state intervals: one open interval per user, mean<=max, durations consistent") {
    val rows = run("q133_user_state_intervals").collect()
    assert(rows.nonEmpty)
    val nUsers = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_open")).sum == nUsers,
      "exactly one open (last) interval per user")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_intervals") >= r.getAs[Long]("n_open"))
      val mean = Option(r.getAs[java.lang.Double]("mean_days")).map(_.doubleValue)
      val mx = Option(r.getAs[java.lang.Long]("max_days")).map(_.longValue)
      (mean, mx) match {
        case (Some(m), Some(x)) => assert(m <= x + 1e-9, s"mean $m > max $x")
        case (None, None)       => // state with only open intervals
        case other              => fail(s"mean/max null mismatch: $other")
      }
    }
  }

  // ----------------------------------------------------------------- q140

  test("q140 PIT features: one row per purchase, strict-past counts consistent") {
    val out = run("q140_pit_feature_snapshot").collect()
    val purchases = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(out.length == purchases, "exactly one feature row per purchase event")
    out.foreach { r =>
      val pc = r.getAs[Long]("prior_clicks"); val pv = r.getAs[Long]("prior_views")
      val pe = r.getAs[Long]("prior_events")
      assert(pc >= 0 && pv >= 0 && pe >= 0)
      assert(pe >= pc + pv, s"total prior events $pe < clicks $pc + views $pv")
      // a first event has no prior value — and then all counts are zero
      if (r.isNullAt(r.fieldIndex("last_val")))
        assert(pe == 0, "null last_val implies an empty strict-past frame")
      else assert(pe > 0, "non-null last_val implies a non-empty frame")
    }
    assert(out.exists(_.getAs[Long]("prior_events") > 0),
      "fixture has users with history before a purchase")
  }

  // ----------------------------------------------------------------- q134

  test("q134 salted join is bit-equal to the direct unsalted join") {
    import graft.functions.det._
    val direct = graft.sources.Tables.lineitem(spark, sf)
      .join(graft.sources.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy("o_orderpriority")
      .collect().map(_.toSeq).toSeq
    val salted = run("q134_salted_skew_join").collect().map(_.toSeq).toSeq
    assert(salted == direct, "salting must be pure plumbing — results identical")
  }

  // ----------------------------------------------------------------- q135

  test("q135 locality: lexicographic chunks pin one part bucket; morton chunks touch <=16 of each") {
    val rows = run("q135_zorder_locality_audit").collect()
    assert(rows.length == 2)
    val byStrat = rows.map(r => r.getAs[String]("strategy") -> r).toMap
    val lex = byStrat("lexicographic"); val mor = byStrat("morton")
    assert(lex.getAs[Double]("avg_part_buckets") == 1.0,
      "a partkey-major sort pins exactly one part bucket per chunk")
    assert(mor.getAs[Double]("avg_part_buckets") <= 16.0 + 1e-9,
      "a 16x16 morton tile touches at most 16 part buckets")
    assert(mor.getAs[Double]("avg_supp_buckets") <= 16.0 + 1e-9,
      "a 16x16 morton tile touches at most 16 supp buckets")
    // (no morton-vs-lex comparison on the supp dimension: sf0.001 has only
    // 10 suppliers, so every chunk under either order sees nearly all of
    // them — the 16-bucket tile bound above is the scale-relevant law)
  }

  // ----------------------------------------------------------------- q136

  test("q136 profiler: FK edges have join_rows == fact rows and bounded worst-key share") {
    val rows = run("q136_join_cardinality_profiler").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      // every fact row matches exactly one parent row on an FK edge,
      // so the exact join cardinality IS the fact cardinality
      assert(r.getAs[Long]("join_rows") == r.getAs[Long]("n_left"),
        s"${r.getAs[String]("edge")}: FK join must preserve fact cardinality")
      val share = r.getAs[Double]("max_key_share")
      assert(share > 0.0 && share <= 1.0)
      assert(r.getAs[Long]("max_key_rows") >= 1)
      assert(r.getAs[Long]("n_join_keys") <= r.getAs[Long]("n_right"),
        "matched keys cannot exceed the parent key domain")
    }
  }

  // ----------------------------------------------------------------- q137

  test("q137 bloom filter has no false negatives and a bounded measured FPR") {
    val r = run("q137_bloom_membership_audit").collect().head
    val members = r.getAs[Long]("n_members"); val pos = r.getAs[Long]("n_positive")
    val fp = r.getAs[Long]("n_false_pos")
    assert(pos - fp == members,
      "every member must test positive (no false negatives) and nothing else overlaps")
    assert(r.getAs[Long]("n_bits_set") <= 1024)
    val fpr = r.getAs[Double]("fpr")
    assert(fpr >= 0.0 && fpr <= 1.0)
    assert(r.getAs[Double]("fill_frac") <= 1.0)
  }

  // ----------------------------------------------------------------- q138

  test("q138 winsorized stats conserve orders and keep the clipped mean inside [p05, p95]") {
    val rows = run("q138_winsorized_segment_stats").collect()
    assert(rows.nonEmpty)
    val orders = graft.sources.Tables.orders(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == orders)
    val b = graft.sources.Tables.orders(spark, sf)
      .agg(round(expr("percentile(o_totalprice, 0.05)"), 4).as("lo"),
        round(expr("percentile(o_totalprice, 0.95)"), 4).as("hi"))
      .collect().head
    val lo = b.getAs[Double]("lo"); val hi = b.getAs[Double]("hi")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_clip_low") + r.getAs[Long]("n_clip_high")
        <= r.getAs[Long]("n"))
      val mw = r.getAs[Double]("mean_winsor")
      assert(mw >= lo - 1e-6 && mw <= hi + 1e-6,
        s"winsorized mean $mw escaped [$lo, $hi]")
    }
  }

  // ----------------------------------------------------------------- q141

  test("q141 attribution conserves purchases and revenue against the unattributed totals") {
    import graft.functions.det._
    val rows = run("q141_last_touch_attribution").collect()
    assert(rows.nonEmpty)
    val purchases = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("rev")).collect().head
    assert(rows.map(_.getAs[Long]("n_purchases")).sum == purchases.getAs[Long]("n"),
      "every purchase lands in exactly one campaign bucket (incl. -1)")
    val revSum = rows.map(r =>
      BigDecimal(r.getAs[Double]("attributed_revenue"))).sum
    // per-bucket revenues are independently rounded to 4 dp; their sum can
    // drift from the single-total rounding by at most n_buckets * 5e-5
    assert((revSum - BigDecimal(purchases.getAs[Double]("rev"))).abs
      <= BigDecimal(rows.length) * BigDecimal("0.00005"),
      "attributed revenue must re-add to total purchase revenue")
    val camps = rows.map(_.getAs[Long]("campaign"))
    assert(camps.forall(c => c == -1L || (c >= 0L && c <= 4L)))
  }

  // ----------------------------------------------------------------- q142

  test("q142 transitions conserve (events - users) and rows sum to P=1 per current state") {
    val rows = run("q142_event_transition_matrix").collect()
    assert(rows.nonEmpty)
    val e = graft.sources.Tables.events(spark, sf)
    val expected = e.count() - e.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == expected,
      "each user with k events contributes exactly k-1 transitions")
    rows.groupBy(_.getAs[String]("cur")).foreach { case (cur, rs) =>
      val pSum = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(pSum - 1.0) < 1e-4 * rs.length,
        s"P(next|$cur) must sum to 1, got $pSum")
    }
  }

  // ----------------------------------------------------------------- q143

  test("q143 A/B readout: arms partition the customer base, variances non-negative") {
    val r = run("q143_ab_experiment_readout").collect().head
    val customers = graft.sources.Tables.customer(spark, sf).count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == customers,
      "hash arms must partition every customer, zero-spend included")
    assert(r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0)
    assert(r.getAs[Double]("sd_a") >= 0.0 && r.getAs[Double]("sd_b") >= 0.0)
    val t = r.getAs[Double]("t_welch")
    assert(!t.isNaN && !t.isInfinite, "t statistic must be finite")
    // null-effect design: the hash split carries no signal, so |t| should
    // be small — a huge t would mean the assignment hash is correlated
    // with spend (the exact failure this query exists to detect)
    assert(math.abs(t) < 10.0, s"|t|=$t implausible for a null split")
  }

  // ----------------------------------------------------------------- q144

  test("q144 diversity index obeys its algebraic bounds per source") {
    val rows = run("q144_token_diversity_index").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val gs = r.getAs[Double]("gini_simpson")
      val nd = r.getAs[Long]("n_distinct")
      val ev = r.getAs[Double]("effective_vocab")
      // 0 <= 1 - sum p^2 <= 1 - 1/k for k distinct types
      assert(gs >= 0.0 && gs <= 1.0 - 1.0 / nd + 1e-6,
        s"gini-simpson $gs outside [0, 1-1/$nd]")
      // effective vocabulary is at most the distinct count, at least 1
      assert(ev >= 1.0 - 1e-9 && ev <= nd + 1e-6,
        s"effective vocab $ev outside [1, $nd]")
      assert(r.getAs[Long]("n_tokens") >= nd)
    }
  }

  // ----------------------------------------------------------------- q145

  test("q145 sequential funnel is monotone and strictly ordered") {
    val r = run("q145_sequential_funnel").collect().head
    val users = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(r.getAs[Long]("n_users") == users)
    val ns = r.getAs[Long]("n_signup"); val nv = r.getAs[Long]("n_view_after")
    val np = r.getAs[Long]("n_purchase_7d")
    assert(ns >= nv && nv >= np, s"funnel must be monotone: $ns >= $nv >= $np")
    assert(np >= 0 && ns <= users)
    // the ordered funnel is at most the unordered one: users having all
    // three event types regardless of order bound n_purchase_7d above
    val loose = graft.sources.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(when(col("event_type") === "signup", 1)).as("s"),
        count(when(col("event_type") === "view", 1)).as("v"),
        count(when(col("event_type") === "purchase", 1)).as("p"))
      .filter(col("s") > 0 && col("v") > 0 && col("p") > 0).count()
    assert(np <= loose, "strict sequencing can only lose users vs the loose count")
  }

  // ----------------------------------------------------------------- q146

  test("q146 lift table conserves customers, captures sum to 1, lift consistent") {
    val rows = run("q146_decile_lift_table").collect()
    assert(rows.length == 10)
    val customers = graft.sources.Tables.customer(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == customers)
    val capture = rows.map(_.getAs[Double]("capture")).sum
    assert(math.abs(capture - 1.0) < 1e-4, s"capture shares must sum to 1: $capture")
    val totC = rows.map(_.getAs[Long]("n_converters")).sum
    val globalRate = totC.toDouble / customers
    rows.foreach { r =>
      val lift = r.getAs[Double]("lift")
      val rate = r.getAs[Double]("conv_rate")
      assert(math.abs(lift - rate / globalRate) < 1e-2,
        s"lift $lift inconsistent with rate $rate / global $globalRate")
    }
  }

  // ----------------------------------------------------------------- q147

  test("q147 HLL set algebra: union bounds, estimates within HLL error of exact") {
    val r = run("q147_hll_set_algebra").collect().head
    val ea = r.getAs[Double]("est_clicks"); val eb = r.getAs[Double]("est_purchases")
    val eu = r.getAs[Double]("est_union")
    // union register-max merge: the union estimate dominates each side
    assert(eu >= ea - 1e-9 && eu >= eb - 1e-9,
      "register-max union must dominate both sides")
    assert(eu <= ea + eb + 1e-6, "union estimate cannot exceed the sum")
    // m=64 registers -> ~13% standard error; allow 4 sigma
    def close(est: Double, exact: Long) =
      math.abs(est - exact) <= 0.52 * exact + 8
    assert(close(ea, r.getAs[Long]("exact_clicks")))
    assert(close(eb, r.getAs[Long]("exact_purchases")))
    assert(r.getAs[Long]("exact_both") <=
      math.min(r.getAs[Long]("exact_clicks"), r.getAs[Long]("exact_purchases")))
  }

  // ----------------------------------------------------------------- q148

  test("q148 OLS slope sits inside the data's secant-slope envelope") {
    val rows = run("q148_revenue_trend_ols").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_days") >= 2, "a slope needs at least two days")
      assert(r.getAs[Double]("avg_daily") > 0.0)
      // daily revenue is bounded, so the LS slope over ~2400 days must be
      // tiny relative to the mean level — a runaway slope means x/y were
      // mismatched (units or join bug)
      val slope = r.getAs[Double]("slope_per_day")
      assert(math.abs(slope) < r.getAs[Double]("avg_daily"),
        s"slope $slope implausible vs level ${r.getAs[Double]("avg_daily")}")
    }
  }

  // ----------------------------------------------------------------- q149

  test("q149 Pareto coverage: bounds and consistency with concentration") {
    val rows = run("q149_pareto_revenue_coverage").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_customers"); val k = r.getAs[Long]("n_top80")
      assert(k >= 1 && k <= n, s"n_top80 $k outside [1, $n]")
      val frac = r.getAs[Double]("frac_top80")
      assert(math.abs(frac - k.toDouble / n) < 1e-5)
      val s10 = r.getAs[Double]("share_top10pct")
      // the top decile holds at least its proportional share
      assert(s10 >= 0.1 - 1e-6 && s10 <= 1.0 + 1e-9,
        s"top-decile share $s10 must be >= 0.1 (sorted desc) and <= 1")
      // covering 80% of revenue cannot need more than ~80% of customers
      // when revenue is sorted descending plus the crossing customer
      assert(frac <= 0.8 + 1.0 / n + 1e-6,
        s"desc-sorted prefix for 80% revenue used $frac of customers")
    }
  }

  // ----------------------------------------------------------------- q150

  test("q150 reconciliation counts are nested and orders conserved") {
    val rows = run("q150_revenue_reconciliation_audit").collect()
    assert(rows.nonEmpty)
    val orders = graft.sources.Tables.orders(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == orders)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_orders")
      val nol = r.getAs[Long]("n_no_lines")
      val w001 = r.getAs[Long]("n_within_001pct")
      val w1 = r.getAs[Long]("n_within_1pct")
      assert(w001 <= w1, "tolerance bands must nest")
      assert(w1 + nol <= n)
      val med = r.getAs[Double]("median_rel"); val mx = r.getAs[Double]("max_rel")
      assert(med >= 0.0 && mx >= med, s"median $med / max $mx inconsistent")
    }
  }

  // ----------------------------------------------------------------- q151

  test("q151 CDC merge: accounting reconciles base, updates, and deletes exactly") {
    import graft.functions.text
    val rows = run("q151_cdc_merge_compaction").collect()
    assert(rows.nonEmpty)
    val docs = graft.sources.Tables.documents(spark, sf)
    val nDocs = docs.count()
    val hk = (p: String) => text.md5Hash60(concat(lit(p), col("doc_id").cast("string")))
    val nDel = docs.filter(hk("del:") % 50L === 0L).count()
    val expectedFinal = nDocs - nDel
    assert(rows.map(_.getAs[Long]("n_final")).sum == expectedFinal,
      "latest-wins keeps one row per key; deletes remove exactly the kill set")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_from_v2") <= r.getAs[Long]("n_final"))
      assert(r.getAs[Long]("n_delete_requests") == nDel)
    }
    // v2 survivors = updated docs not deleted
    val nUpdSurvive = docs
      .filter(hk("upd:") % 10L === 0L && !(hk("del:") % 50L === 0L)).count()
    assert(rows.map(_.getAs[Long]("n_from_v2")).sum == nUpdSurvive,
      "every surviving updated doc must come from version 2")
  }

  // ----------------------------------------------------------------- q152

  test("q152 seasonality shares sum to 1 per segment over the observed weekdays") {
    val rows = run("q152_dow_seasonality").collect()
    assert(rows.nonEmpty)
    val orders = graft.sources.Tables.orders(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == orders)
    rows.foreach { r =>
      val d = r.getAs[Int]("dow"); assert(d >= 1 && d <= 7, s"ISO dow $d")
    }
    rows.groupBy(_.getAs[String]("segment")).foreach { case (seg, rs) =>
      val share = rs.map(_.getAs[Double]("rev_share")).sum
      assert(math.abs(share - 1.0) < 1e-4 * rs.length,
        s"$seg weekday shares must sum to 1, got $share")
    }
  }

  // ----------------------------------------------------------------- q153

  test("q153 lateness horizons nest and agree with the max-disorder bound") {
    val rows = run("q153_watermark_lateness_audit").collect()
    assert(rows.nonEmpty)
    val events = graft.sources.Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == events)
    rows.foreach { r =>
      val m1 = r.getAs[Long]("n_late_1m"); val h1 = r.getAs[Long]("n_late_1h")
      val d1 = r.getAs[Long]("n_late_1d"); val mx = r.getAs[Long]("max_late_s")
      assert(d1 <= h1 && h1 <= m1, "a longer horizon can only drop fewer events")
      assert(m1 < r.getAs[Long]("n_events"))
      // counts and the worst disorder must tell the same story
      if (mx <= 60) assert(m1 == 0, "no event later than 1m, yet n_late_1m > 0")
      if (m1 > 0) assert(mx > 60)
      // (the fixture's ingest order IS its event-time order — all-zero
      // lateness here; the generated-history PropertySpec reference
      // exercises the disordered case)
    }
  }

  // ----------------------------------------------------------------- q154

  test("q154 skyline == brute-force O(n^2) dominance check") {
    val sky = run("q154_pareto_skyline").collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Double]("p_retailprice"),
        r.getAs[Int]("p_size"))).toSet
    val parts = graft.sources.Tables.part(spark, sf)
      .select("p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Double]("p_retailprice"),
        r.getAs[Int]("p_size")))
    def dominated(p: (Long, Double, Int)) = parts.exists(q =>
      q._2 <= p._2 && q._3 >= p._3 && (q._2 < p._2 || q._3 > p._3))
    val expected = parts.filterNot(dominated).toSet
    assert(sky == expected,
      s"skyline ${sky.size} != brute-force front ${expected.size}")
    assert(sky.nonEmpty)
  }

  // ----------------------------------------------------------------- q155

  test("q155 LTV curve: cumulative monotone per cohort, orders and customers conserved") {
    val rows = run("q155_cohort_ltv_curve").collect()
    assert(rows.nonEmpty)
    val orders = graft.sources.Tables.orders(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == orders)
    rows.groupBy(_.getAs[java.sql.Date]("cohort").toString).foreach { case (c, rs) =>
      val byK = rs.sortBy(_.getAs[Long]("k"))
      val cums = byK.map(_.getAs[Double]("cum_rev")).toSeq
      assert(cums == cums.sorted, s"cohort $c cumulative revenue must be monotone")
      assert(byK.head.getAs[Long]("k") == 0,
        s"cohort $c must have revenue at age 0 (its own first order)")
      assert(rs.map(_.getAs[Long]("n_customers")).distinct.size == 1)
    }
    // cohort sizes partition the customers that ever ordered
    val ordering = graft.sources.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(rows.groupBy(_.getAs[java.sql.Date]("cohort").toString)
      .map(_._2.head.getAs[Long]("n_customers")).sum == ordering)
  }

  // ----------------------------------------------------------------- q139

  test("q139 zone-map audit: totals conserved and pruning monotone in the cutoff") {
    val rows = run("q139_zonemap_pruning_audit").collect()
    assert(rows.length == 3)
    val events = graft.sources.Tables.events(spark, sf).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("rows_total") == events)
      assert(r.getAs[Long]("zones_pruned") <= r.getAs[Long]("n_zones"))
      assert(r.getAs[Long]("rows_skipped") <= r.getAs[Long]("rows_total"))
    }
    // output is ordered p50, p90, p99: a larger cutoff prunes at least as much
    val pruned = rows.map(_.getAs[Long]("zones_pruned")).toSeq
    val skipped = rows.map(_.getAs[Long]("rows_skipped")).toSeq
    assert(pruned == pruned.sorted, s"zones_pruned not monotone: $pruned")
    assert(skipped == skipped.sorted, s"rows_skipped not monotone: $skipped")
    val cuts = rows.map(_.getAs[Double]("cutoff")).toSeq
    assert(cuts == cuts.sorted, "p50 <= p90 <= p99")
  }

  // ----------------------------------------------------------------- q156

  test("q156 retention: offset counts never exceed the cohort, cohorts partition signup users") {
    val rows = run("q156_signup_dn_retention").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_cohort")
      Seq("n_d1", "n_d7", "n_d14").foreach { c =>
        assert(r.getAs[Long](c) <= n, s"$c exceeds cohort size") }
      Seq(("n_d1", "r1"), ("n_d7", "r7"), ("n_d14", "r14")).foreach { case (c, rr) =>
        val expect = BigDecimal(r.getAs[Long](c).toDouble / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
        assert(r.getAs[Double](rr) == expect, s"$rr inconsistent with $c/$n") }
    }
    // cohorts partition the signup-user base: sizes sum to distinct signup users
    val signupUsers = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_cohort")).sum == signupUsers)
  }

  // ----------------------------------------------------------------- q157

  test("q157 fuzzy relink: every corrupted doc re-links to its own original") {
    val rows = run("q157_fuzzy_ocr_relink").collect()
    assert(rows.nonEmpty)
    var batch = 0L
    rows.foreach { r =>
      val nb = r.getAs[Long]("n_batch")
      val nm = r.getAs[Long]("n_matched")
      val ns = r.getAs[Long]("n_self_recovered")
      batch += nb
      // the planted corruption is 2 deletions inside the key, and the
      // block key is untouched — the original must always be found
      assert(nm == nb, s"${r.getAs[String]("source")}: unmatched batch docs")
      assert(ns == nb, s"${r.getAs[String]("source")}: originals missed")
      assert(r.getAs[Long]("n_ambiguous") <= nm)
      val d = r.getAs[Double]("mean_best_dist")
      assert(d >= 0.0 && d <= 3.0, s"mean best distance $d outside [0,3]")
    }
    // the 10% hash slice actually selected documents
    assert(batch > 0)
  }

  // ----------------------------------------------------------------- q158

  test("q158 grid sketch: estimate bin holds the rank-ceil(p*n) order stat, totals conserved") {
    val rows = run("q158_grid_quantile_sketch").collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    val valsByType = graft.sources.Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .groupBy(_.getAs[String]("event_type"))
      .map { case (t, rs) => t -> rs.map(_.getAs[Double]("value")).sorted }
    assert(byType.keySet == valsByType.keySet)
    val pNum = Map("p50" -> (1L, 2L), "p90" -> (9L, 10L), "p99" -> (99L, 100L))
    byType.foreach { case (t, rs) =>
      assert(rs.length == 3, s"$t: p50/p90/p99 expected")
      val vs = valsByType(t)
      rs.foreach { r =>
        assert(r.getAs[Long]("n") == vs.length.toLong, s"$t: n != event count")
        val est = r.getAs[Double]("est_upper")
        assert(est > 0.0 && est <= 512.0 && est % 2 == 0.0,
          s"$t: estimate $est off the grid")
        // the defining law: the estimate is the upper edge of the bin
        // holding the order statistic at rank ceil(p*n) — the exact
        // interpolated percentile may sit an order-stat gap away in a
        // sparse tail, but the BIN is pinned exactly
        val (num, den) = pNum(r.getAs[String]("p"))
        val rank = ((num * vs.length + den - 1) / den).toInt
        val vRank = vs(rank - 1)
        val bin = math.min(255L, math.floor(vRank / 2).toLong)
        assert(est == ((bin + 1) * 2).toDouble,
          s"$t ${r.getAs[String]("p")}: est $est vs order-stat bin $bin ($vRank)")
        // and the reported error is exactly |est - exact|
        val err = BigDecimal(math.abs(est - r.getAs[Double]("exact")))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
        assert(r.getAs[Double]("abs_err") == err, s"$t: abs_err mismatch")
      }
      val sorted = rs.sortBy(_.getAs[String]("p"))
      val ests = sorted.map(_.getAs[Double]("est_upper")).toSeq
      val exacts = sorted.map(_.getAs[Double]("exact")).toSeq
      assert(ests == ests.sorted, s"$t: estimates not monotone in p")
      assert(exacts == exacts.sorted, s"$t: exact percentiles not monotone")
    }
  }

  // ----------------------------------------------------------------- q166

  test("q166 bootstrap: draws live inside the empirical range, band ordered") {
    import org.apache.spark.sql.functions._
    val rows = run("q166_bootstrap_ci").collect()
    assert(rows.nonEmpty)
    val ranges = graft.sources.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("lo"), r.getAs[Double]("hi"), r.getAs[Long]("n"))).toMap
    assert(rows.map(_.getAs[String]("event_type")).toSet == ranges.keySet)
    rows.foreach { r =>
      val (lo, hi, n) = ranges(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n") == n)
      val (p05, p95) = (r.getAs[Double]("boot_p05"), r.getAs[Double]("boot_p95"))
      assert(p05 <= p95, "band ordered")
      // every inverse-CDF draw (hence the band and both means) must lie
      // inside the observed value range, with 4-dp rounding slack
      Seq("true_mean", "boot_mean", "boot_p05", "boot_p95").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= lo - 1e-4 && v <= hi + 1e-4, s"$c=$v escapes [$lo,$hi]")
      }
    }
  }

  // ----------------------------------------------------------------- q167

  test("q167 CUPED: adjustment conserves the pooled mean, reduction in [0,1]") {
    val rows = run("q167_cuped_adjustment").collect()
    assert(rows.length == 2)
    val thetas = rows.map(_.getAs[Double]("theta")).distinct
    assert(thetas.length == 1, "theta is pooled, identical on both rows")
    rows.foreach { r =>
      val vr = r.getAs[Double]("var_reduction")
      assert(vr >= 0.0 && vr <= 1.0, s"variance reduction $vr outside [0,1]")
    }
    // Σ n_a (X̄_a − X̄pool) = 0, so the n-weighted adjusted mean equals the
    // n-weighted raw mean up to per-row 4-dp rounding
    val wAdj = rows.map(r => r.getAs[Long]("n_arm") * r.getAs[Double]("mean_adj")).sum
    val wRaw = rows.map(r => r.getAs[Long]("n_arm") * r.getAs[Double]("mean_post")).sum
    val n = rows.map(_.getAs[Long]("n_arm")).sum
    assert(math.abs(wAdj - wRaw) <= n * 1e-4,
      s"CUPED must not move the pooled mean: $wAdj vs $wRaw")
  }

  // ----------------------------------------------------------------- q193

  test("q193 TV distances: metric bounds, full pair lattice, brute-force agreement") {
    import org.apache.spark.sql.functions._
    val rows = run("q193_histogram_distance_matrix").collect()
    val types = graft.sources.Tables.events(spark, sf)
      .select("event_type").distinct().collect().map(_.getString(0)).sorted
    assert(rows.length == types.length * (types.length - 1) / 2,
      "one row per unordered pair")
    rows.foreach { r =>
      val d = r.getAs[Double]("tv_dist")
      assert(d >= 0.0 && d <= 1.0, s"TV distance $d outside [0,1]")
      assert(r.getAs[String]("ta") < r.getAs[String]("tb"), "pairs oriented")
    }
    // brute-force one pair from raw values
    val bins = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"),
        least(lit(255L), floor(col("value") / 2)).as("bin"))
      .groupBy("event_type", "bin").count().collect()
      .groupBy(_.getAs[String]("event_type"))
      .map { case (t, rs) => t -> rs.map(r =>
        r.getAs[Long]("bin") -> r.getAs[Long]("count")).toMap }
    val (ta, tb) = (types(0), types(1))
    val (na, nb) = (bins(ta).values.sum, bins(tb).values.sum)
    val dnum = (0L to 255L).map { bin =>
      math.abs(bins(ta).getOrElse(bin, 0L) * nb - bins(tb).getOrElse(bin, 0L) * na)
    }.sum
    val expect = BigDecimal(dnum.toDouble / (2.0 * na * nb))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val got = rows.find(r => r.getAs[String]("ta") == ta
      && r.getAs[String]("tb") == tb).get.getAs[Double]("tv_dist")
    assert(got == expect, s"($ta,$tb) TV distance")
  }

  // ----------------------------------------------------------------- q192

  test("q192 dispersion: quotes ordered, ratio consistent, ranking monotone") {
    val rows = run("q192_supplier_price_dispersion").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_suppliers") >= 2L)
      val (lo, hi) = (r.getAs[Double]("lo_unit"), r.getAs[Double]("hi_unit"))
      assert(lo > 0.0 && lo <= hi)
      val d = BigDecimal((hi - lo) / lo)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      assert(r.getAs[Double]("dispersion") == d)
    }
    val ds = rows.map(_.getAs[Double]("dispersion")).toSeq
    assert(ds == ds.sorted.reverse, "top-20 must descend")
  }

  // ----------------------------------------------------------------- q191

  test("q191 growth accounting: news conserve to the user base, splits partition actives") {
    val rows = run("q191_new_vs_returning").collect()
    assert(rows.nonEmpty)
    var cum = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("n_active") ==
        r.getAs[Long]("n_new") + r.getAs[Long]("n_returning"))
      cum += r.getAs[Long]("n_new")
      assert(r.getAs[Long]("cum_users") == cum)
    }
    assert(rows.head.getAs[Long]("n_returning") == 0L,
      "day one has nobody to return")
    val users = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(cum == users, "every user is new exactly once")
  }

  // ----------------------------------------------------------------- q185

  test("q185 stage latencies: populations nest and agree with q145's funnel counts") {
    val r = run("q185_funnel_stage_latency").collect().head
    val (ns, nv, np) = (r.getAs[Long]("n_signup"), r.getAs[Long]("n_reached_view"),
      r.getAs[Long]("n_reached_purchase"))
    assert(ns >= nv && nv >= np, "funnel populations must nest")
    assert(r.getAs[Double]("med_h_signup_view") <= r.getAs[Double]("p90_h_signup_view"))
    assert(r.getAs[Double]("med_h_view_purchase") <= r.getAs[Double]("p90_h_view_purchase"))
    // cross-law: q145 counts the same signup->view stage (identical
    // semantics) and a horizon-bounded purchase stage (subset of ours)
    val f = run("q145_sequential_funnel").collect().head
    assert(f.getAs[Long]("n_signup") == ns)
    assert(f.getAs[Long]("n_view_after") == nv)
    assert(f.getAs[Long]("n_purchase_7d") <= np)
  }

  // ----------------------------------------------------------------- q186

  test("q186 mode: the winner really is the max count under the pinned tiebreak") {
    import org.apache.spark.sql.functions._
    val rows = run("q186_modal_priority").collect()
    assert(rows.nonEmpty)
    val counts = graft.sources.Tables.orders(spark, sf)
      .join(graft.sources.Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_orderpriority").count().collect()
      .groupBy(_.getAs[String]("c_mktsegment"))
      .map { case (k, v) => k -> v.map(r =>
        r.getAs[String]("o_orderpriority") -> r.getAs[Long]("count")) }
    rows.foreach { r =>
      val seg = r.getAs[String]("segment")
      val winner = counts(seg).minBy { case (p, n) => (-n, p) }
      assert((r.getAs[String]("modal_priority"), r.getAs[Long]("n")) == winner,
        s"$seg modal mismatch")
      val tot = counts(seg).map(_._2).sum
      assert(r.getAs[Double]("share") ==
        BigDecimal(winner._2.toDouble / tot)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0)
    }
  }

  // ----------------------------------------------------------------- q188

  test("q188 k-anonymity: k is the true minimum, exposure accounting exact") {
    import org.apache.spark.sql.functions._
    val r = run("q188_k_anonymity_audit").collect().head
    val sizes = graft.sources.Tables.customer(spark, sf)
      .groupBy("c_mktsegment", "c_nationkey").count().collect()
      .map(_.getAs[Long]("count"))
    assert(r.getAs[Long]("n_groups") == sizes.length.toLong)
    assert(r.getAs[Long]("k_anonymity") == sizes.min)
    assert(r.getAs[Long]("n_violating_groups") == sizes.count(_ < 5).toLong)
    assert(r.getAs[Long]("n_exposed") == sizes.filter(_ < 5).sum)
    assert(r.getAs[Long]("n_customers") == sizes.sum)
  }

  // ----------------------------------------------------------------- q183

  test("q183 share-of-parent: shares partition each level, masses nest") {
    val rows = run("q183_share_of_parent").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("rev") <= r.getAs[Double]("region_rev") + 1e-9)
      assert(r.getAs[Double]("region_rev") <= r.getAs[Double]("world_rev") + 1e-9)
    }
    rows.groupBy(_.getAs[String]("region")).foreach { case (rg, rs) =>
      val s = rs.map(_.getAs[Double]("share_of_region")).sum
      assert(math.abs(s - 1.0) < 1e-4, s"$rg nation shares sum to $s")
    }
    val regionShares = rows.map(r => r.getAs[String]("region") ->
      r.getAs[Double]("region_share_of_world")).distinct
    val total = regionShares.map(_._2).sum
    assert(math.abs(total - 1.0) < 1e-4, s"region shares sum to $total")
  }

  // ----------------------------------------------------------------- q179

  test("q179 chi-square: nonnegative, correct dof, cells bounded by the lattice") {
    val r = run("q179_chi2_independence").collect().head
    assert(r.getAs[Double]("chi2") >= 0.0)
    assert(r.getAs[Long]("n_cells") <= 25L, "5 segments x 5 priorities max")
    assert(r.getAs[Long]("dof") == 16L)
    assert((r.getAs[Int]("reject_05_df16") == 1) == (r.getAs[Double]("chi2") > 26.296))
  }

  // ----------------------------------------------------------------- q180

  test("q180 Benford: shares sum to one, counts conserve, excess consistent") {
    val rows = run("q180_benford_digit_audit").collect()
    assert(rows.nonEmpty && rows.length <= 9)
    val shareSum = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"digit shares sum to $shareSum")
    val orders = graft.sources.Tables.orders(spark, sf)
      .filter(org.apache.spark.sql.functions.col("o_totalprice") >= 1.0).count()
    assert(rows.map(_.getAs[Long]("n")).sum == orders)
    rows.foreach { r =>
      val ex = BigDecimal(r.getAs[Long]("n").toDouble / orders
        - r.getAs[Double]("benford"))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      assert(r.getAs[Double]("excess") == ex, s"digit ${r.getAs[Int]("digit")}")
    }
  }

  // ----------------------------------------------------------------- q181

  test("q181 double-charge audit finds exactly the planted retries at gap 1") {
    import org.apache.spark.sql.functions._
    val rows = run("q181_double_charge_audit").collect()
    assert(rows.nonEmpty)
    val planted = graft.sources.Tables.orders(spark, sf)
      .filter(graft.functions.text.md5Hash60(
        concat(lit("retry:"), col("o_orderkey").cast("string"))) % 50L === 0L)
      .count()
    assert(planted > 0, "the 2% slice must select retries")
    // synthetic prices are unique per customer, so every pair is a
    // planted retry against its own original, at exactly one day
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == planted)
    rows.foreach(r => assert(r.getAs[Long]("min_gap_days") == 1L))
    rows.foreach(r => assert(r.getAs[Long]("n_customers") <= r.getAs[Long]("n_pairs")))
  }

  // ----------------------------------------------------------------- q176

  test("q176 log histogram: bucket edges are powers of two, shares reach 1") {
    import org.apache.spark.sql.functions._
    val rows = run("q176_log_bucket_histogram").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Int]("bucket")
      assert(r.getAs[Long]("lo_cents") == (1L << (b - 1)), s"bucket $b edge")
    }
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    val counts = graft.sources.Tables.events(spark, sf)
      .filter(col("value") > 0).groupBy("event_type").count().collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count")).toMap
    byType.foreach { case (t, rs) =>
      assert(rs.map(_.getAs[Long]("n")).sum == counts(t), s"$t mass")
      val last = rs.maxBy(_.getAs[Int]("bucket"))
      assert(last.getAs[Double]("cum_share") == 1.0, s"$t final share")
    }
  }

  // ----------------------------------------------------------------- q172

  test("q172 degree histogram: masses reconcile and the tail agrees with q136") {
    val rows = run("q172_degree_histogram").collect()
    assert(rows.nonEmpty)
    var cum = 0L
    rows.foreach { r =>
      val (d, keys, nrows) = (r.getAs[Long]("d"), r.getAs[Long]("n_keys"),
        r.getAs[Long]("n_rows"))
      assert(nrows == d * keys, s"degree $d: rows != d * keys")
      cum += nrows
      assert(r.getAs[Long]("cum_rows") == cum, s"degree $d cumulative")
    }
    val liCount = graft.sources.Tables.lineitem(spark, sf).count()
    assert(cum == liCount, "histogram must account for every lineitem row")
    // cross-law: orders are unique on o_orderkey, so q136's worst-key
    // rows for the lineitem-orders edge IS the max degree here
    val maxD = rows.map(_.getAs[Long]("d")).max
    val q136row = run("q136_join_cardinality_profiler").collect()
      .find(_.getAs[String]("edge") == "lineitem-orders").get
    assert(q136row.getAs[Long]("max_key_rows") == maxD)
  }

  // ----------------------------------------------------------------- q173

  test("q173 throttle: kept equals distinct (user,hour) groups, bursts consistent") {
    import org.apache.spark.sql.functions._
    val rows = run("q173_event_throttling").collect()
    assert(rows.nonEmpty)
    val groups = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"),
        expr("ts_us div 3600000000").as("hr"))
      .groupBy("event_type", "user_id", "hr").count()
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_groups"), max(col("count")).as("mb"),
        sum(col("count")).as("tot"))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_groups"), r.getAs[Long]("mb"), r.getAs[Long]("tot"))).toMap
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val (ng, mb, tot) = groups(t)
      assert(r.getAs[Long]("n_total") == tot, s"$t total")
      assert(r.getAs[Long]("n_kept") == ng, s"$t kept = one per group")
      assert(r.getAs[Long]("n_dropped") == tot - ng, s"$t dropped")
      assert(r.getAs[Long]("max_burst") == mb, s"$t burst")
      if (mb == 1) assert(r.getAs[Long]("n_dropped") == 0L)
    }
  }

  // ----------------------------------------------------------------- q174

  test("q174 checksums: pure function of content — stable across recomputation, mass conserved") {
    val a = run("q174_partition_checksums").collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_partitions"), r.getAs[Long]("n_rows"),
          r.getAs[String]("rollup_fp"))).toMap
    // recompute over a different physical partitioning — fingerprints
    // must not move (sort_array pins the fold order)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "13")
    val b = try run("q174_partition_checksums").collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_partitions"), r.getAs[Long]("n_rows"),
          r.getAs[String]("rollup_fp"))).toMap
    finally spark.conf.set("spark.sql.shuffle.partitions", before)
    assert(a == b, "checksums must be partitioning-independent")
    val counts = graft.sources.Tables.events(spark, sf)
      .groupBy("event_type").count().collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count")).toMap
    assert(a.keySet == counts.keySet)
    a.foreach { case (t, (np, nr, fp)) =>
      assert(nr == counts(t), s"$t row mass")
      assert(np >= 1 && fp.length == 32, s"$t fingerprint shape")
    }
  }

  // ----------------------------------------------------------------- q170

  test("q170 bitmap distinct: self-verification holds, word counts bounded") {
    val rows = run("q170_bitmap_distinct").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("bitmap_matches") == 1,
        s"${r.getAs[String]("event_type")}: bitmap != COUNT(DISTINCT)")
      assert(r.getAs[Long]("n_bitmap") == r.getAs[Long]("n_exact"))
      val words = r.getAs[Long]("n_words")
      val n = r.getAs[Long]("n_exact")
      assert(words <= n, "every word carries at least one bit")
      assert(n <= words * 32, "a word carries at most 32 bits")
    }
  }

  // ----------------------------------------------------------------- q171

  test("q171 monthly growth: lags chain correctly, masses conserve") {
    val rows = run("q171_monthly_revenue_growth").collect()
    assert(rows.length >= 13, "fixture spans years, so YoY rows must exist")
    val byIdx = rows.zipWithIndex
    byIdx.foreach { case (r, i) =>
      if (i == 0) assert(r.isNullAt(r.fieldIndex("prev_m")), "first month has no prior")
      else assert(r.getAs[Double]("prev_m") == rows(i - 1).getAs[Double]("revenue"),
        s"row $i prev_m must equal prior month's revenue")
      if (i >= 12)
        assert(r.getAs[Double]("prev_y") == rows(i - 12).getAs[Double]("revenue"))
      if (!r.isNullAt(r.fieldIndex("mom_growth"))) {
        val expect = BigDecimal(
          (r.getAs[Double]("revenue") - r.getAs[Double]("prev_m"))
            / r.getAs[Double]("prev_m"))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
        assert(r.getAs[Double]("mom_growth") == expect, s"row $i growth recompute")
      }
    }
    // per-month rounded sums reassemble the global total within rounding slack
    val total = rows.map(_.getAs[Double]("revenue")).sum
    val orders = graft.sources.Tables.orders(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("o_totalprice")).head().getDouble(0)
    assert(math.abs(total - orders) <= rows.length * 1e-4 + 1e-6)
  }

  // ----------------------------------------------------------------- q200

  test("q200 HRW resharding: mass conserves, gains land only on the new node, placement recomputes") {
    val rows = run("q200_rendezvous_sharding_audit").collect()
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_before")).sum == nDocs, "before mass")
    assert(rows.map(_.getAs[Long]("n_after")).sum == nDocs, "after mass")
    assert(rows.map(_.getAs[Long]("n_lost")).sum ==
      rows.map(_.getAs[Long]("n_gained")).sum, "moves balance")
    rows.foreach { r =>
      val node = r.getAs[Long]("node")
      // HRW minimal disruption: a doc moves iff the NEW node wins it
      if (node < 16) assert(r.getAs[Long]("n_gained") == 0L,
        s"node $node gained docs — only node 16 may")
      else {
        assert(r.getAs[Long]("n_before") == 0L, "node 16 did not exist before")
        assert(r.getAs[Long]("n_gained") == r.getAs[Long]("n_after"))
        assert(r.getAs[Long]("n_lost") == 0L)
      }
    }
    // independent placement recompute straight from md5 arithmetic
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(sx: String): Long = {
      val hex = md.digest(sx.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    def owner(doc: Long, nNodes: Int): Int =
      ((0 until nNodes).map(n => (h60(s"rv:$n:$doc") >> 5) * 32 + n)
        .max % 32).toInt
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    val before = docs.map(owner(_, 16)).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val after = docs.map(owner(_, 17)).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    rows.foreach { r =>
      val node = r.getAs[Long]("node")
      assert(r.getAs[Long]("n_before") == before.getOrElse(node.toInt, 0L),
        s"node $node before recompute")
      assert(r.getAs[Long]("n_after") == after.getOrElse(node.toInt, 0L),
        s"node $node after recompute")
    }
  }

  // ----------------------------------------------------------------- q196

  test("q196 churn snapshot: leakage-free by recomputation, windows nest, label matches") {
    val rows = run("q196_churn_training_snapshot").collect()
    assert(rows.nonEmpty)
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val d0 = ev.map(_._2).max - 7
    val pre = ev.filter(_._2 < d0).groupBy(_._1)
    val post = ev.filter(e => e._2 >= d0 && e._3 == "purchase").map(_._1).toSet
    // population = exactly the users with pre-cutoff history
    assert(rows.map(_.getAs[Long]("user_id")).toSet == pre.keySet)
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val days = pre(u).map(_._2)
      // windows nest and recompute exactly
      assert(r.getAs[Long]("n_events_3d") <= r.getAs[Long]("n_events_7d"))
      assert(r.getAs[Long]("n_events_7d") <= r.getAs[Long]("n_events_21d"))
      assert(r.getAs[Long]("n_events_7d") == days.count(d => d >= d0 - 7 && d < d0))
      // the last pre-cutoff activity is strictly before the cutoff
      assert(r.getAs[Long]("days_since_last") == d0 - days.max)
      assert(r.getAs[Long]("days_since_last") >= 1)
      // label recomputes from post-cutoff purchases alone
      assert(r.getAs[Int]("label_purchase") == (if (post(u)) 1 else 0))
    }
    // class balance is a data property (the tiny fixture keeps every
    // user purchasing), but the positive class must exist at any scale
    // and the recompute above already pins each label's value exactly
    assert(rows.exists(_.getAs[Int]("label_purchase") == 1))
  }

  // ----------------------------------------------------------------- q169

  test("q169 time-decay attribution conserves revenue and agrees with q141's total") {
    val rows = run("q169_timedecay_attribution").collect()
    assert(rows.nonEmpty)
    val total169 = rows.map(_.getAs[Double]("attributed_revenue")).sum
    // last-touch assigns each purchase's full value to exactly one
    // campaign, so its total IS the purchase revenue; multi-touch must
    // redistribute, not create or destroy (slack: per-purchase Z is
    // 4-dp rounded, plus per-campaign 4-dp rounding)
    val rows141 = run("q141_last_touch_attribution").collect()
    val total141 = rows141.map(_.getAs[Double]("attributed_revenue")).sum
    assert(math.abs(total169 - total141) <= 0.01 * rows.length + total141 * 2e-4,
      s"revenue not conserved: $total169 vs $total141")
    // every purchase lands somewhere exactly once
    val n169 = rows.map(_.getAs[Long]("n_purchases"))
    val nPurch = graft.sources.Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .count()
    assert(n169.max <= nPurch)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_touches") >= r.getAs[Long]("n_purchases")
        || r.getAs[Long]("campaign") == -1L)
      assert(r.getAs[Double]("attributed_revenue") >= 0.0)
    }
  }

  // ----------------------------------------------------------------- q160

  test("q160 lifecycle audit: signup events never precede the first signup, counts nest") {
    val rows = run("q160_lifecycle_order_audit").collect()
    assert(rows.nonEmpty)
    val byType = rows.map(r => r.getAs[String]("event_type") -> r).toMap
    rows.foreach { r =>
      val total = r.getAs[Long]("n_total")
      val before = r.getAs[Long]("n_before_signup")
      val at = r.getAs[Long]("n_at_signup")
      val orphan = r.getAs[Long]("n_no_signup")
      assert(before + at + orphan <= total, "disjoint classes cannot exceed total")
      val share = BigDecimal(before.toDouble / total)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      assert(r.getAs[Double]("share_before") == share)
    }
    // by definition of MIN, no signup event is strictly before the first
    assert(byType("signup").getAs[Long]("n_before_signup") == 0L)
    // and every user's first signup ties itself
    val signupUsers = graft.sources.Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(byType("signup").getAs[Long]("n_at_signup") >= signupUsers)
  }

  // ----------------------------------------------------------------- q161

  test("q161 gap fill: grid conserved, spans match observed hours, runs bounded") {
    val rows = run("q161_hourly_gapfill_interpolation").collect()
    assert(rows.nonEmpty)
    val obs = graft.sources.Tables.events(spark, sf)
      .selectExpr("event_type", "ts_us div 3600000000 as hr")
      .distinct().collect()
      .groupBy(_.getAs[String]("event_type"))
      .map { case (t, rs) => t -> rs.map(_.getAs[Long]("hr")) }
    assert(rows.map(_.getAs[String]("event_type")).toSet == obs.keySet)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val hrs = obs(t)
      val grid = hrs.max - hrs.min + 1
      assert(r.getAs[Long]("n_hours") == grid, s"$t grid span")
      assert(r.getAs[Long]("n_observed") == hrs.distinct.length.toLong, s"$t observed")
      assert(r.getAs[Long]("n_hours") ==
        r.getAs[Long]("n_observed") + r.getAs[Long]("n_filled"), s"$t partition")
      val maxRun = r.getAs[Long]("max_gap_run")
      assert(maxRun <= r.getAs[Long]("n_filled"), s"$t run vs fills")
      assert((maxRun == 0) == (r.getAs[Long]("n_filled") == 0), s"$t run/fill flag")
      // the longest run is exactly the longest hole in the sorted hour set
      val sortedHrs = hrs.distinct.sorted
      val longest = sortedHrs.zip(sortedHrs.drop(1)).map(p => p._2 - p._1 - 1)
        .foldLeft(0L)(math.max)
      assert(maxRun == longest, s"$t longest run")
      assert(r.getAs[Long]("filled_mass_u") >= 0L)
    }
  }
}
