package graft

import org.scalatest.funsuite.AnyFunSuite

/** Determinism layer (SURVEY.md §5, §7.5): the hash-compare gate demands
  * run-to-run identical results. Double-run the queries whose plans
  * contain the usual nondeterminism hazards (collect_set, window ties,
  * hash-based candidates, float sums) and require exact equality. */
class DeterminismSpec extends AnyFunSuite {
  import TestSpark._

  private val hazards = Seq(
    "q01_pricing_summary",     // double sums across partitions
    "q12_inverted_index",      // collect_set ordering
    "q20_session_windows",     // window over possibly-tied ts
    "q22_neardup_jaccard",     // join + agg ordering
    "q23_neardup_minhash_lsh", // hash candidates
    "q31_cosine_topk",         // float ranking ties
    "q45_neardup_components",  // iterative fixpoint loop
    "q56_hll_distinct_sketch", // hash-bucketed registers + float estimate
    "q59_bigram_pmi",          // rounded-PMI ordering ties
    "q65_ann_hyperplane_lsh",  // sign-of-float-sum bucketing
    "q70_equidepth_histogram", // global ntile over ties
    "q72_ann_multiprobe_lsh",  // multi-bucket candidate union
    "q74_sliding_window_distance", // chunked windows + float distance ties
    "q78_embedding_pair_topk_lsh", // probe-join candidates + float ranking
    "q80_equidepth_histogram_scale", // sampled percentile boundaries
    "q82_salted_skew_aggregation", // two-phase decimal partial merge
    "q83_embedding_neardup_lsh", // hash-bucketed candidates + float threshold
    "q84_kmeans_label_centroids", // decimal centroid sums + distance ties
    "q86_weighted_hash_sample", // hash-derived ln keys + rank ties
    "q88_kmeans_broadcast_assign", // float distance folds + argmin ties
    "q90_incremental_batch_dedup", // hash slice + best-match window ties
    "q91_revenue_gini_by_segment", // rank-over-rounded-revenue ties + decimal sums
    "q92_benchmark_decontamination", // hash slice + float threshold flag
    "q94_lm_doc_score", // decimal prob means + float rare-threshold counts
    "q97_cluster_silhouette", // float distance folds + rank ties + decimal means
    "q98_source_scorecard", // composed per-doc doubles + decimal means
    "q99_tfidf_cosine_retrieval", // decimal dots + float rank ties + hash slice
    "q100_token_budget_allocation", // decimal normalizer + float quota arithmetic
    "q101_canonical_compaction", // fixpoint MV + per-component rank ties
    "q102_embedding_quantization_error", // float quantize/reconstruct + decimal means
    "q103_hard_negative_mining", // hash-bucketed candidates + float ranking ties
    "q104_vocab_drift_by_source", // decimal chi-square sums over count ratios
    "q105_interleave_shuffle_order", // hash-rank windows + closed-form positions
    "q106_incremental_source_counts", // MV base + delta union re-aggregation
    "q107_delete_cascade_audit", // hash kill-slice + multi-table semi-join counts
    "q108_source_overlap_matrix", // hash-candidate pair view + grouped counts
    "q109_centroid_similarity", // decimal centroid sums + float dot/norm folds
    "q110_dup_cluster_profile", // iterative fixpoint MV + two-level counts
    "q111_curriculum_phases", // ntile over per-source ties
    "q112_embedding_dim_stats", // two-moment decimal sums per dim
    "q113_centroid_outlier_audit", // float distance folds + desc-rank ties
    "q114_snapshot_diff", // dual hash-slice membership flags
    "q115_user_journey_paths", // per-user window ties + path-count ties
    "q116_export_shard_plan", // hash-rank closed-form positions + mod sharding
    "q117_training_export_manifest", // MV fixpoint + rank ties + hash split/shard
    "q121_incremental_hll_registers", // MV register base + delta max-merge
    "q134_salted_skew_join", // hash-salted fan-out + decimal revenue merge
    "q137_bloom_membership_audit", // hash-derived positions + distinct set
    "q138_winsorized_segment_stats", // percentile boundaries + decimal means
    "q139_zonemap_pruning_audit", // percentile cutoffs + max-vs-cutoff flags
    "q140_pit_feature_snapshot", // per-user window frames over possibly-tied ts
    "q141_last_touch_attribution", // ignore-nulls window carry + decimal revenue
    "q143_ab_experiment_readout", // hash arms + decimal moments + float t
    "q146_decile_lift_table", // percentile boundaries + decimal spend + ratios
    "q147_hll_set_algebra", // hash registers + float estimator + set arithmetic
    "q148_revenue_trend_ols", // decimal moment sums + near-cancelling slope
    "q149_pareto_revenue_coverage", // desc-rank ties + sequential cumsum
    "q150_revenue_reconciliation_audit", // decimal line sums + percentile of ratios
    "q151_cdc_merge_compaction", // hash slices + version-rank ties + anti-join
    "q154_pareto_skyline", // float price groups + chunked running max
    "q155_cohort_ltv_curve", // sequential cum over rounded decimal cells
    "q156_signup_dn_retention", // conditional distinct counts + ratio rounding
    "q157_fuzzy_ocr_relink", // hash slice + blocked candidates + min-dist ties
    "q158_grid_quantile_sketch", // bin-count cum threshold + percentile calib
    "q159_pii_redaction_audit", // hash plant slice + regex flag/replace masses
    "q160_lifecycle_order_audit", // min-ts ties + strict/equal comparisons
    "q161_hourly_gapfill_interpolation", // ignore-nulls carries + fixed-point fill
    "q162_containment_pairs", // shingle-join candidates + round ties at 0.8
    "q163_boilerplate_fraction", // df thresholds + decimal fraction means
    "q165_correlation_matrix", // near-cancelling decimal moment arithmetic
    "q166_bootstrap_ci", // percentile-array state + rounded draw re-agg
    "q167_cuped_adjustment", // hash arms + pooled moment ratios
    "q169_timedecay_attribution", // interval-join fan-out + windowed decimal Z
    "q171_monthly_revenue_growth", // lag chains + rounded growth ratios
    "q173_event_throttling", // rank-1 over possibly-tied (ts, id)
    "q174_partition_checksums", // collect_list order pinned only by sort_array
    "q175_principal_component", // chained matvecs + vector rebuild via sort
    "q179_chi2_independence", // decimal chi-square fold over ratio cells
    "q181_double_charge_audit", // hash retry slice + price-keyed pair join
    "q182_dyadic_ema", // 10-term lag chain + rounded quotient
    "q184_peak_concurrency", // boundary ties ordered by (t, delta)
    "q185_funnel_stage_latency", // chained conditional mins + percentiles
    "q192_supplier_price_dispersion", // float min/max selections + ratio ties
    "q194_streaming_anomaly_parity", // replayed stream close + z arithmetic
    "q196_churn_training_snapshot", // data-derived cutoff + decimal spend
    "q197_gini_split_gain", // decimal impurity fold + rounded ratios
    "q198_approx_percentile_audit", // quantile sketch merge + band flags
    "q199_feature_auc", // score-domain cum window + one rounded divide
    "q200_rendezvous_sharding_audit", // hash argmax encode + modulo decode
    "q201_item_cf_cosine", // rounded-cosine ordering ties at the limit cut
    "q203_loo_target_encoding", // broadcast complement identity + rounding
    "q205_cusum_changepoint", // integer-cusum argmax tie at the limit-1 cut
    "q206_cf_holdout_precision", // neighbor/rec rank ties at truncation cuts
    "q207_kfold_cv_mse", // hash folds + decimal squared-error fold
    "q208_feature_hash_collisions", // hash-bucket loads + histogram re-agg
    "q209_linkpred_resource_allocation", // two-hop candidates + top-20 tie cut
    "q210_conformal_coverage", // hash slices + grid-cum rank threshold
    "q262_malformed_csv_policy") // corrupted-CSV rewrite + two policy reads

  hazards.foreach { name =>
    test(s"$name is run-to-run identical") {
      val fn = SparkEntry.queries(name)
      val a = fn(spark, sf).collect().toSeq
      val b = fn(spark, sf).collect().toSeq
      assert(a == b)
    }
  }
}
