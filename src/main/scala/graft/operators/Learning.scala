package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.QueryDef
import graft.functions.{det, text}
import graft.sources.Tables

/** Model-training support operators: the evaluation protocol and feature
  * plumbing a training-data pipeline runs NEXT TO the corpus queries —
  * leave-one-out target encoding, reliability-diagram calibration,
  * CUSUM change-point detection, k-fold cross-validation, and the
  * hashing-trick collision audit. Continues q196/q197's theme (training
  * snapshots, split scoring) with the q178/q179 exact-statistics
  * discipline: every estimator is either exact integer/rational
  * arithmetic or an identical-per-row IEEE double routed through the
  * order-independent decimal accumulator (graft.functions.det), so the
  * DuckDB oracle hash-matches at any partitioning.
  */
object Learning {

  /** h(key) as a 60-bit non-negative int both engines compute
    * identically (see graft.functions.text.md5Hash60). */
  private def hkey(prefix: String, c: Column): Column =
    text.md5Hash60(concat(lit(prefix), c.cast("string")))

  private def hkeySql(prefix: String, x: String): String =
    text.md5Hash60Sql(s"'$prefix' || CAST($x AS VARCHAR)")

  // ---------------------------------------------------------------------
  // q203 — leave-one-out target encoding (category → held-out target mean)
  // ---------------------------------------------------------------------

  /** Target encoding with the leakage guard every feature store needs:
    * the encoded value for a row is the mean target of its category
    * EXCLUDING the row itself, via the algebraic identity
    * (Σ_cat − x) / (n_cat − 1) — no per-row "group minus self" window,
    * no self-join. Plan: one hash aggregate collapses the fact to the
    * 5-row category table, which broadcasts back onto the fact scan —
    * at 100 TB this is one shuffle of |categories| rows plus a map-side
    * join, and any number of categorical features can ride the same
    * pass through q197's explode-unpivot. Money is exact integer cents
    * (o_totalprice is 2-dp by fixture contract), so Σ_cat is
    * order-independent and the single final divide of exact integers is
    * the only IEEE op — both engines round identical bits. */
  private val q203 = QueryDef(
    "q203_loo_target_encoding",
    "leave-one-out mean-price target encoding of the customer market segment",
    Some("""
      WITH b AS (SELECT o_orderkey, c.c_mktsegment AS segment, o_totalprice,
                        CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
                 FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
      seg AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(cents) AS BIGINT) AS sum_cents
              FROM b GROUP BY 1)
      SELECT b.o_orderkey, b.segment, b.o_totalprice,
             CASE WHEN seg.n > 1
                  THEN ROUND(CAST(seg.sum_cents - b.cents AS DOUBLE)
                             / (100.0 * (seg.n - 1)), 4) + 0.0
             END AS loo_enc
      FROM b JOIN seg USING (segment)
      ORDER BY b.o_orderkey"""),
    (s, dir) => {
      val b = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_mktsegment").as("segment"),
          col("o_totalprice"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      val seg = b.groupBy("segment")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
      b.join(broadcast(seg), Seq("segment"))
        .select(col("o_orderkey"), col("segment"), col("o_totalprice"),
          when(col("n") > 1,
            round((col("sum_cents") - col("cents")).cast("double")
              / (lit(100.0) * (col("n") - 1)), 4) + 0.0).as("loo_enc"))
        .orderBy("o_orderkey")
    })

  // ---------------------------------------------------------------------
  // q204 — reliability-diagram calibration bins (predicted vs observed)
  // ---------------------------------------------------------------------

  /** Calibration audit of a propensity score: the activity score
    * clicks/(clicks+10) (add-10 pseudo-count smoothing keeps the score
    * from saturating at moderate counts) "predicts" purchase, users bucket into 10
    * fixed-width score bins, and each bin reports mean score vs
    * observed purchase rate — the reliability diagram that decides
    * whether a ranking score can be read as a probability. Fixed-width
    * binning is a pure per-row map (no ntile, no global rank window);
    * the plan is one user-keyed fact aggregate then a 10-key
    * re-aggregate — two shuffles, the second constant-size, at any
    * corpus scale. The score is one IEEE divide of exact per-user
    * integers (identical bits both engines); bin means go through the
    * decimal accumulator, rates are exact-integer ratios. */
  private val q204 = QueryDef(
    "q204_calibration_bins",
    "reliability-diagram calibration of a click-activity purchase-propensity score",
    Some("""
      WITH u AS (SELECT user_id,
                        CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT)
                          AS clicks,
                        MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                          AS pos
                 FROM events GROUP BY 1),
      b AS (SELECT CAST(FLOOR((CAST(clicks AS DOUBLE) / (clicks + 10.0)) * 10)
                        AS INT) AS bin,
                   CAST(clicks AS DOUBLE) / (clicks + 10.0) AS score, pos
            FROM u)
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(pos) AS BIGINT) AS n_pos,
             (ROUND(CAST(SUM(CAST(score AS DECIMAL(30,10))) AS DOUBLE)
                    / COUNT(*), 4) + 0.0) AS mean_score,
             (ROUND(CAST(SUM(pos) AS DOUBLE) / COUNT(*), 4) + 0.0) AS pos_rate,
             (ROUND(CAST(SUM(CAST(score AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*)
                    - CAST(SUM(pos) AS DOUBLE) / COUNT(*), 4) + 0.0) AS calib_gap
      FROM b GROUP BY bin ORDER BY bin"""),
    (s, dir) => {
      val u = Tables.events(s, dir).groupBy("user_id")
        .agg(sum(when(col("event_type") === "click", 1).otherwise(0))
          .cast("long").as("clicks"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("pos"))
      val score = col("clicks").cast("double") / (col("clicks") + lit(10.0))
      val b = u.select(floor(score * 10).cast("int").as("bin"),
        score.as("score"), col("pos"))
      val sDec = sum(col("score").cast(DecimalType(30, 10))).cast("double")
      val posD = sum(col("pos")).cast("double")
      b.groupBy("bin")
        .agg(count(lit(1)).as("n_users"),
          sum(col("pos")).cast("long").as("n_pos"),
          (round(sDec / count(lit(1)), 4) + 0.0).as("mean_score"),
          (round(posD / count(lit(1)), 4) + 0.0).as("pos_rate"),
          (round(sDec / count(lit(1)) - posD / count(lit(1)), 4) + 0.0)
            .as("calib_gap"))
        .orderBy("bin")
    })

  // ---------------------------------------------------------------------
  // q205 — CUSUM change-point detection over the daily revenue series
  // ---------------------------------------------------------------------

  /** Offline change-point detection: the CUSUM statistic
    * S_k = Σ_{i≤k} (x_i − mean) maximizes |S_k| at the most likely
    * level-shift day — the classic single-change estimator, run over
    * daily revenue. To stay EXACT the deviation is scaled by n:
    * n·x_i − total is an integer in cents·n units, so the running sum,
    * the argmax, and the tie-break are all integer comparisons — no
    * float mean ever enters the ordering. The fact table collapses to
    * the bounded day axis (~2.4k rows for this 6.5-year fixture, still
    * thousands at any corpus size) before the only window runs, q199's
    * bounded-domain window discipline; the day totals and the detected
    * change-point broadcast back for the before/after means, which are
    * single divides of exact integers rounded on both sides. */
  private val q205 = QueryDef(
    "q205_cusum_changepoint",
    "CUSUM change-point day of the daily revenue series with before/after means",
    Some("""
      WITH d AS (SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
                        CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                             AS BIGINT) AS rev_cents
                 FROM orders GROUP BY 1),
      t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(rev_cents) AS BIGINT) AS total_cents FROM d),
      c AS (SELECT day, n_days,
                   CAST(SUM(n_days * rev_cents - total_cents)
                        OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS cusum
            FROM d CROSS JOIN t),
      cp AS (SELECT day AS change_day, n_days, ABS(cusum) AS max_abs_cusum
             FROM c ORDER BY ABS(cusum) DESC, day LIMIT 1)
      SELECT change_day, n_days, max_abs_cusum,
             ROUND(CAST(SUM(CASE WHEN day <= change_day THEN rev_cents END)
                        AS DOUBLE)
                   / (100.0 * COUNT(CASE WHEN day <= change_day THEN 1 END)),
                   4) + 0.0 AS mean_before,
             CASE WHEN COUNT(CASE WHEN day > change_day THEN 1 END) > 0 THEN
               ROUND(CAST(SUM(CASE WHEN day > change_day THEN rev_cents END)
                          AS DOUBLE)
                     / (100.0 * COUNT(CASE WHEN day > change_day THEN 1 END)),
                     4) + 0.0 END AS mean_after,
             CASE WHEN COUNT(CASE WHEN day > change_day THEN 1 END) > 0 THEN
               ROUND(CAST(SUM(CASE WHEN day > change_day THEN rev_cents END)
                          AS DOUBLE)
                     / (100.0 * COUNT(CASE WHEN day > change_day THEN 1 END))
                     - CAST(SUM(CASE WHEN day <= change_day THEN rev_cents END)
                            AS DOUBLE)
                       / (100.0 * COUNT(CASE WHEN day <= change_day THEN 1 END)),
                     4) + 0.0 END AS shift_per_day
      FROM d CROSS JOIN cp
      GROUP BY change_day, n_days, max_abs_cusum
      ORDER BY change_day"""),
    (s, dir) => {
      val d = Tables.orders(s, dir)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev_cents"))
      val t = d.agg(count(lit(1)).as("n_days"), sum("rev_cents").as("total_cents"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val c = d.crossJoin(broadcast(t))
        .withColumn("cusum",
          sum(col("n_days") * col("rev_cents") - col("total_cents")).over(w))
      val cp = c.select(col("day").as("change_day"), col("n_days"),
          abs(col("cusum")).as("max_abs_cusum"))
        .orderBy(col("max_abs_cusum").desc, col("change_day")).limit(1)
      val before = when(col("day") <= col("change_day"), col("rev_cents"))
      val after = when(col("day") > col("change_day"), col("rev_cents"))
      val meanB = sum(before).cast("double") / (lit(100.0) * count(before))
      val meanA = sum(after).cast("double") / (lit(100.0) * count(after))
      d.crossJoin(broadcast(cp))
        .groupBy("change_day", "n_days", "max_abs_cusum")
        .agg((round(meanB, 4) + 0.0).as("mean_before"),
          when(count(after) > 0, round(meanA, 4) + 0.0).as("mean_after"),
          when(count(after) > 0, round(meanA - meanB, 4) + 0.0)
            .as("shift_per_day"))
        .orderBy("change_day")
    })

  // ---------------------------------------------------------------------
  // q207 — k-fold cross-validation of the mean-price baseline model
  // ---------------------------------------------------------------------

  /** The evaluation protocol itself as a distributed operator: 5-fold
    * CV where fold membership is the q57 hash-split (pure function of
    * the key — folds are stable under re-runs and ingest), the model
    * per fold is the train-fold mean via the complement identity
    * (total − fold) / (n − n_fold), and the metric is out-of-fold MSE.
    * Two fact passes: one to collapse folds to a 5-row table (which
    * broadcasts back joined with the global scalars), one to score —
    * no per-fold rescans, so k folds cost the same two shuffles as
    * one. The train mean is a single divide of exact integer cents
    * (identical bits both engines); per-row squared error is then an
    * identical IEEE double, and the MSE sum runs through the decimal
    * accumulator — order-independent at any partitioning. */
  private val q207 = QueryDef(
    "q207_kfold_cv_mse",
    "5-fold cross-validated out-of-fold MSE of the train-mean price model",
    Some(s"""
      WITH r AS (SELECT o_orderkey, o_totalprice,
                        CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
                        CAST(${hkeySql("cv:", "o_orderkey")} % 5 AS INT) AS fold
                 FROM orders),
      f AS (SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_f,
                   CAST(SUM(cents) AS BIGINT) AS cents_f
            FROM r GROUP BY 1),
      t AS (SELECT CAST(SUM(n_f) AS BIGINT) AS n,
                   CAST(SUM(cents_f) AS BIGINT) AS cents_t FROM f),
      m AS (SELECT fold, n_f, n - n_f AS n_train,
                   CAST(cents_t - cents_f AS DOUBLE) / (100.0 * (n - n_f)) AS mu
            FROM f CROSS JOIN t)
      SELECT m.fold, m.n_train, m.n_f AS n_test,
             ROUND(m.mu, 4) + 0.0 AS train_mean,
             (ROUND(CAST(SUM(CAST((r.o_totalprice - m.mu) * (r.o_totalprice - m.mu)
                                  AS DECIMAL(30,10))) AS DOUBLE) / m.n_f, 4)
              + 0.0) AS test_mse
      FROM r JOIN m USING (fold)
      GROUP BY m.fold, m.n_train, m.n_f, m.mu
      ORDER BY m.fold"""),
    (s, dir) => {
      val r = Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        (hkey("cv:", col("o_orderkey")) % 5).cast("int").as("fold"))
      val f = r.groupBy("fold")
        .agg(count(lit(1)).as("n_f"), sum("cents").as("cents_f"))
      val t = f.agg(sum("n_f").as("n"), sum("cents_f").as("cents_t"))
      val m = f.crossJoin(broadcast(t)).select(col("fold"), col("n_f"),
        (col("n") - col("n_f")).as("n_train"),
        ((col("cents_t") - col("cents_f")).cast("double")
          / (lit(100.0) * (col("n") - col("n_f")))).as("mu"))
      val err = (col("o_totalprice") - col("mu")) *
        (col("o_totalprice") - col("mu"))
      r.join(broadcast(m), Seq("fold"))
        .groupBy("fold", "n_train", "n_f", "mu")
        .agg((round(sum(err.cast(DecimalType(30, 10))).cast("double")
          / col("n_f"), 4) + 0.0).as("test_mse"))
        .select(col("fold"), col("n_train"), col("n_f").as("n_test"),
          (round(col("mu"), 4) + 0.0).as("train_mean"), col("test_mse"))
        .orderBy("fold")
    })

  // ---------------------------------------------------------------------
  // q208 — hashing-trick collision audit over the shingle vocabulary
  // ---------------------------------------------------------------------

  /** The feature-hashing audit run before committing to a hashed
    * feature space: project the distinct shingle vocabulary through
    * h(f) mod 256 and report the bucket-load histogram plus the
    * collision share (features sharing a bucket with another feature
    * lose identity under the hashing trick). Hashing is a pure per-row
    * map over the DISTINCT vocabulary — the corpus-sized shingle
    * explosion collapses to the vocab first, and everything after is
    * keyed by 256 buckets then by the tiny load domain; the summary
    * scalars broadcast onto the histogram rows. At 100 TB the vocab
    * table is the only shuffled payload, exactly like q104's
    * vocabulary queries. All counts exact integers; the share is one
    * final divide. */
  private val q208 = QueryDef(
    "q208_feature_hash_collisions",
    "bucket-load histogram and collision share of 256-bucket feature hashing",
    Some(s"""
      WITH ${text.shinglesCte},
      feat AS (SELECT DISTINCT shingle FROM sh),
      hb AS (SELECT CAST(${hkeySql("fh:", "shingle")} % 256 AS INT) AS bucket
             FROM feat),
      bl AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS bucket_load
             FROM hb GROUP BY 1),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_features FROM feat),
      su AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
                    CAST(MAX(bucket_load) AS BIGINT) AS max_load,
                    CAST(SUM(bucket_load - 1) AS BIGINT) AS collided_features
             FROM bl)
      SELECT bl.bucket_load, CAST(COUNT(*) AS BIGINT) AS n_buckets,
             tot.n_features, su.n_buckets_used, su.max_load,
             ROUND(CAST(su.collided_features AS DOUBLE) / tot.n_features, 4)
               + 0.0 AS collision_share
      FROM bl CROSS JOIN tot CROSS JOIN su
      GROUP BY bl.bucket_load, tot.n_features, su.n_buckets_used, su.max_load,
               su.collided_features
      ORDER BY bl.bucket_load"""),
    (s, dir) => {
      // the shared shingle MV, not a fresh corpus explosion (round-17:
      // this was the last text.shingles call site outside the MV build —
      // every other consumer reads the parquet-backed view; the distinct
      // over the view is a column-pruned scan + hash agg)
      val feat = Dedup.shingleSet(s, dir)
        .select("shingle").distinct()
      val hb = feat.select((hkey("fh:", col("shingle")) % 256)
        .cast("int").as("bucket"))
      val bl = hb.groupBy("bucket").agg(count(lit(1)).as("bucket_load"))
      val tot = feat.agg(count(lit(1)).as("n_features"))
      val su = bl.agg(count(lit(1)).as("n_buckets_used"),
        max("bucket_load").as("max_load"),
        sum(col("bucket_load") - 1).as("collided_features"))
      bl.groupBy("bucket_load").agg(count(lit(1)).as("n_buckets"))
        .crossJoin(broadcast(tot)).crossJoin(broadcast(su))
        .select(col("bucket_load"), col("n_buckets"), col("n_features"),
          col("n_buckets_used"), col("max_load"),
          (round(col("collided_features").cast("double")
            / col("n_features"), 4) + 0.0).as("collision_share"))
        .orderBy("bucket_load")
    })

  // ---------------------------------------------------------------------
  // q210 — split-conformal prediction interval with coverage audit
  // ---------------------------------------------------------------------

  /** Split conformal prediction, the distribution-free uncertainty
    * wrapper a production model ships with: train/calibration/test are
    * disjoint hash slices (60/20/20, q57's stable split), the model is
    * the train mean, the nonconformity score is the absolute residual,
    * and q̂ is the ⌈0.9·(n+1)⌉-th smallest calibration score — test
    * coverage of |y−ŷ| ≤ q̂ then audits the 90% guarantee. The
    * quantile is NOT a sort and NOT an interpolating percentile: calib
    * residuals quantize onto a fixed $50 grid and q̂ is the smallest
    * grid UPPER edge whose cumulative count reaches the rank — the
    * mergeable-histogram quantile a 100 TB calibration uses, with
    * ceiling-to-edge keeping the conformal validity direction
    * (conservative: coverage can only grow). Everything through the
    * rank is integer arithmetic (rank ceiling via (9(n+1)+9) div 10);
    * the only window runs over the bounded grid domain (q199's
    * discipline); train scalars, the rank, and q̂ broadcast — three
    * fact passes (train stats, calib histogram, test coverage), each
    * map-side combinable. */
  private val q210 = QueryDef(
    "q210_conformal_coverage",
    "split-conformal 90% interval via grid quantile with test-slice coverage audit",
    Some(s"""
      WITH r AS (SELECT o_totalprice,
                        CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
                        CAST(${hkeySql("conf:", "o_orderkey")} % 10 AS INT)
                          AS slice
                 FROM orders),
      tr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_train,
                    CAST(SUM(cents) AS BIGINT) AS cents_tr
             FROM r WHERE slice <= 5),
      ca AS (SELECT CAST(ROUND(ABS(o_totalprice
                                   - CAST(cents_tr AS DOUBLE)
                                     / (100.0 * n_train)) * 100) AS BIGINT)
               AS resid
             FROM r CROSS JOIN tr WHERE slice IN (6, 7)),
      nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_calib,
                    LEAST(CAST((9 * (COUNT(*) + 1) + 9) // 10 AS BIGINT),
                          CAST(COUNT(*) AS BIGINT)) AS k_rank
             FROM ca),
      cb AS (SELECT resid // 5000 AS b, CAST(COUNT(*) AS BIGINT) AS c
             FROM ca GROUP BY 1),
      cum AS (SELECT b, CAST(SUM(c) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
                            AS BIGINT) AS cum
              FROM cb),
      qh AS (SELECT CAST(MIN((b + 1) * 5000) AS BIGINT) AS qhat_cents
             FROM cum CROSS JOIN nc WHERE cum >= k_rank),
      te AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
                    CAST(SUM(CASE WHEN CAST(ROUND(ABS(o_totalprice
                             - CAST(cents_tr AS DOUBLE) / (100.0 * n_train))
                             * 100) AS BIGINT) <= qhat_cents
                             THEN 1 ELSE 0 END) AS BIGINT) AS covered
             FROM r CROSS JOIN tr CROSS JOIN qh WHERE slice >= 8)
      SELECT tr.n_train, nc.n_calib, te.n_test, nc.k_rank,
             ROUND(qh.qhat_cents / 100.0, 4) + 0.0 AS qhat,
             ROUND(CAST(te.covered AS DOUBLE) / te.n_test, 4) + 0.0 AS coverage
      FROM tr CROSS JOIN nc CROSS JOIN qh CROSS JOIN te
      ORDER BY n_train"""),
    (s, dir) => {
      val r = Tables.orders(s, dir).select(col("o_totalprice"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        (hkey("conf:", col("o_orderkey")) % 10).cast("int").as("slice"))
      val tr = r.filter(col("slice") <= 5)
        .agg(count(lit(1)).as("n_train"), sum("cents").as("cents_tr"))
      val resid = round(abs(col("o_totalprice")
        - col("cents_tr").cast("double") / (lit(100.0) * col("n_train")))
        * 100).cast("long")
      val ca = r.filter(col("slice").isin(6, 7)).crossJoin(broadcast(tr))
        .select(resid.as("resid"))
      val nc = ca.agg(count(lit(1)).as("n_calib"),
        least(expr("(9 * (count(1) + 1) + 9) div 10"), count(lit(1)))
          .as("k_rank"))
      val cb = ca.groupBy(expr("resid div 5000").as("b"))
        .agg(count(lit(1)).as("c"))
      val cum = cb.withColumn("cum", sum("c").over(Window.orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val qh = cum.crossJoin(broadcast(nc))
        .filter(col("cum") >= col("k_rank"))
        .agg(min((col("b") + 1) * 5000).as("qhat_cents"))
      val te = r.filter(col("slice") >= 8).crossJoin(broadcast(tr))
        .crossJoin(broadcast(qh))
        .agg(count(lit(1)).as("n_test"),
          sum(when(resid <= col("qhat_cents"), 1).otherwise(0)).cast("long")
            .as("covered"))
      tr.crossJoin(nc).crossJoin(qh).crossJoin(te)
        .select(col("n_train"), col("n_calib"), col("n_test"), col("k_rank"),
          (round(col("qhat_cents") / 100.0, 4) + 0.0).as("qhat"),
          (round(col("covered").cast("double") / col("n_test"), 4) + 0.0)
            .as("coverage"))
        .orderBy("n_train")
    })

  def defs: Seq[QueryDef] = Seq(q203, q204, q205, q207, q208, q210)
}
