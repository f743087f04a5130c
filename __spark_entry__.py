"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship pipeline on sf0.001 — mask → LOCF → sessionize →
as-of join (clicks→purchases) → expanding-window derived features.
queries()/oracle_sql(): one entry per implemented operator (SURVEY.md §2),
each with a DuckDB-equivalent SQL twin; see mpds_spark/queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from mpds_spark.operators.asof import asof_join
    from mpds_spark.operators.backfill import locf
    from mpds_spark.operators.sessionize import sessionize
    from mpds_spark.operators.windows import derived_features

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    sf_dir = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id",
        F.col("user_id").alias("entity_id"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
        "event_type",
        F.when(F.col("event_type") != "error", F.col("value")).alias("value"),
    )
    filled = locf(ev, value="value", valid_time=3600.0, default=0.0)
    sess = sessionize(filled, gap=1800.0)
    feats = derived_features(
        sess.withColumn("dss", F.coalesce("value_locf_expir", F.lit(0.0))),
        value="dss",
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "entity_id", "ts", F.col("value").alias("purchase_value")
    )
    joined = asof_join(
        feats.drop("event_type"), purchases, on="ts", by="entity_id"
    )
    return joined.select(
        "event_id",
        "entity_id",
        "ts",
        "session_id",
        "dss",
        "dss_avg",
        "dss_max",
        "dss_abs_rate_avg",
        "purchase_value",
        F.col("ts_r").alias("purchase_ts"),
    )


# The driver's CORRECTNESS snapshot caps at 50 rows, taken in dict order.
# Rotation policy (VERDICT r4 ask #3): newest-this-round queries FIRST —
# round 5 grew the catalog 84 -> 171, so 50 can't hold them all; the
# window keeps the names whose ONLY value gate would otherwise be the
# mirror (the newest batches, led by this session's additions), then the
# r4-ask overrides (multimodal_stats, tokenized_asof_features). Every name
# outside the window carries a brute-force/numpy differential pytest AND
# is mirror-EXACT at sf0.01 on final code (tools/check_correctness.py —
# the same value gate; see BENCH/BASELINE.md closing record).
_PRIORITY = [
    # new in round 5 (hundred-twelfth batch — continuation session)
    "lang_confusion_audit",
    "tokenizer_fertility",
    # new in round 5 (hundred-eleventh batch — continuation session)
    "energy_distance",
    "bimodality_coefficient",
    # new in round 5 (hundred-tenth batch — continuation session)
    "breusch_godfrey",
    "cumulative_periodogram",
    # new in round 5 (hundred-ninth batch — continuation session)
    "sign_test_wow",
    "wilcoxon_signed_rank",
    # new in round 5 (hundred-eighth batch — continuation session)
    "lorenz_asymmetry",
    "record_counts",
    # new in round 5 (hundred-seventh batch — continuation session)
    "weighted_logrank",
    "median_survival_ci",
    # new in round 5 (hundred-sixth batch — continuation session)
    "hill_numbers",
    "funnel_plot_audit",
    # new in round 5 (hundred-fifth batch — continuation session)
    "dagostino_k2",
    "medcouple",
    # new in round 5 (hundred-fourth batch — continuation session)
    "readability_scores",
    "powerlaw_mle",
    # new in round 5 (hundred-third batch — continuation session)
    "lz_complexity",
    "spectral_flatness",
    # new in round 5 (hundred-second batch — continuation session)
    "ewma_control_chart",
    "western_electric_rules",
    # new in round 5 (hundred-first batch — continuation session)
    "poisson_deviance_gof",
    "hash_collision_audit",
    # new in round 5 (one-hundredth batch — continuation session)
    "mcc_confusion",
    "pinball_loss",
    # new in round 5 (ninety-ninth batch — continuation session)
    "chow_test",
    "hodges_lehmann_ci",
    # new in round 5 (ninety-eighth batch — continuation session)
    "prewhitened_mk",
    "kupiec_pof",
    # new in round 5 (ninety-seventh batch — continuation session)
    "dersimonian_laird",
    "poisson_rate_test",
    # new in round 5 (ninety-sixth batch — continuation session)
    "siegel_slopes",
    "seasonal_sen_slope",
    # new in round 5 (ninety-fifth batch — continuation session)
    "seasonal_kendall",
    "partial_correlation",
    # new in round 5 (ninety-fourth batch — continuation session)
    "zonemap_skipping",
    "cdc_chunking",
    # new in round 5 (ninety-third batch — continuation session)
    "zero_inflation",
    "laplace_trend",
    # new in round 5 (ninety-second batch — continuation session)
    "brunner_munzel",
    "cucconi_test",
    # new in round 5 (ninety-first batch — continuation session)
    "anderson_darling_2s",
    "rle_compressibility",
    # new in round 5 (ninetieth batch — continuation session)
    "honore_sichel",
    "spiegelhalter_z",
    # new in round 5 (eighty-ninth batch — continuation session)
    "rmst",
    "quade_test",
    # new in round 5 (eighty-eighth batch — continuation session)
    "getis_ord_g",
    "conover_scale",
    # new in round 5 (eighty-seventh batch — continuation session)
    "atkinson_hoover",
    "gpd_tail_fit",
    # new in round 5 (eighty-sixth batch — continuation session)
    "fleiss_kappa",
    "icc_agreement",
    # new in round 5 (eighty-fifth batch — continuation session)
    "diebold_mariano",
    "pesaran_timmermann",
    # new in round 5 (eighty-fourth batch — continuation session)
    "jonckheere_terpstra",
    "hodges_lehmann",
    # new in round 5 (eighty-third batch — continuation session)
    "buishand_range",
    "snht_test",
    # new in round 5 (eighty-second batch — continuation session)
    "cox_stuart",
    "bartels_rank",
    # new in round 5 (eighty-first batch — continuation session)
    "turning_points",
    "difference_sign",
    # new in round 5 (eightieth batch — continuation session)
    "rare_word_profile",
    "burrows_delta",
    # new in round 5 (seventy-ninth batch — continuation session)
    "allan_variance",
    "recurrence_quantification",
    # new in round 5 (seventy-eighth batch — continuation session)
    "nelson_aalen",
    "theta_forecast",
    # new in round 5 (seventy-seventh batch — continuation session)
    "g_test",
    "mood_median_test",
    # new in round 5 (seventy-sixth batch — continuation session)
    "croston_forecast",
    "tracking_signal",
    # new in round 5 (seventy-fifth batch — continuation session)
    "moran_i",
    "geary_c",
    # new in round 5 (seventy-fourth batch — continuation session)
    "jensen_shannon",
    "hellinger_affinity",
    # new in round 5 (seventy-third batch — continuation session)
    "lin_ccc",
    "bland_altman",
    # new in round 5 (seventy-second batch — continuation session)
    "brier_decomposition",
    "youden_j",
    # new in round 5 (seventy-first batch — continuation session)
    "ndcg_eval",
    "mrr_eval",
    # new in round 5 (seventieth batch — continuation session)
    "adamic_adar",
    "hits_scores",
    # new in round 5 (sixty-ninth batch — continuation session)
    "sample_entropy",
    "spectral_entropy",
    # new in round 5 (sixty-eighth batch — continuation session)
    "grubbs_test",
    "taylor_law",
    # new in round 5 (sixty-seventh batch — continuation session)
    "pettitt_test",
    "cliffs_delta",
    # new in round 5 (sixty-sixth batch — continuation session)
    "breusch_pagan",
    "cronbach_alpha",
    # new in round 5 (sixty-fifth batch — continuation session)
    "durbin_watson",
    "bartlett_test",
    # new in round 5 (sixty-fourth batch — continuation session)
    "variance_ratio",
    "granger_causality",
    # new in round 5 (sixty-third batch — continuation session)
    "kpss_test",
    "mantel_haenszel",
    # new in round 5 (sixty-second batch — continuation session)
    "capture_recapture",
    "odds_ratio_ci",
    # new in round 5 (sixty-first batch — continuation session)
    "seasonal_strength",
    "cochran_q",
    # new in round 5 (sixtieth batch — continuation session)
    "jl_projection_audit",
    "pr_curve_ap",
    # new in round 5 (fifty-ninth batch — continuation session)
    "nb_dispersion",
    "markov_stationary",
    # new in round 5 (fifty-eighth batch — continuation session)
    "wilson_intervals",
    "mde_power",
    # new in round 5 (fifty-seventh batch — continuation session)
    "pacf_durbin",
    "ols_influence",
    # new in round 5 (fifty-sixth batch — continuation session)
    "l_moments",
    "chao1_richness",
    # new in round 5 (fifty-fifth batch — continuation session)
    "ledoit_wolf_shrinkage",
    "page_hinkley",
    # new in round 5 (fifty-fourth batch — continuation session)
    "best_split_stump",
    "tukey_hsd",
    # new in round 5 (fifty-third batch — continuation session)
    "km_confidence",
    "ses_alpha_grid",
    # new in round 5 (fifty-second batch — continuation session)
    "newman_modularity",
    "horvitz_thompson",
    # new in round 5 (fifty-first batch — continuation session)
    "kmv_distinct",
    "yule_k",
    # new in round 5 (fiftieth batch — continuation session)
    "box_cox_lambda",
    "dickey_fuller",
    # new in round 5 (forty-ninth batch — continuation session)
    "friedman_test",
    "jarque_bera",
    # new in round 5 (forty-eighth batch — continuation session)
    "ljung_box",
    "cox_ph",
    # new in round 5 (forty-seventh batch — continuation session)
    "kruskal_wallis",
    "mcnemar_test",
    # new in round 5 (forty-sixth batch — continuation session)
    "sprt_monitor",
    "sinkhorn_ot",
    # new in round 5 (forty-fifth batch — continuation session)
    "ransac_trend",
    "dft_periodogram",
    # new in round 5 (forty-fourth batch — continuation session)
    "bradley_terry",
    "pca_power_iter",
    # new in round 5 (forty-third batch — continuation session)
    "gumbel_maxima",
    "session_edit_distance",
    # new in round 5 (forty-second batch — continuation session)
    "cochran_armitage",
    "isotonic_calibration",
    # new in round 5 (forty-first batch — continuation session)
    "kneser_ney_nll",
    "levene_test",
    # new in round 5 (fortieth batch — continuation session)
    "bh_fdr",
    "eb_shrinkage",
    # new in round 5 (thirty-ninth batch — continuation session)
    "bpe_merge_step",
    "padding_waste_audit",
    # new in round 5 (thirty-eighth batch — continuation session)
    "mann_kendall",
    "runs_test",
    # new in round 5 (thirty-seventh batch — continuation session)
    "logrank_test",
    "segmented_trend",
    # new in round 5 (thirty-sixth batch — continuation session)
    "anova_twoway",
    "hurst_variance_plot",
    # new in round 5 (thirty-fifth batch — continuation session)
    "perm_entropy",
    "theil_index",
    # new in round 5 (thirty-fourth batch — continuation session)
    "degree_assortativity",
    "kendall_tau",
    "did_estimate",
    # new in round 5 (thirty-third batch — continuation session)
    "silhouette_cosine",
    "calibration_bins",
    "markov_accuracy",
    # new in round 5 (thirty-second batch — continuation session)
    "wasserstein_drift",
    "cohens_kappa",
    # new in round 5 (thirty-first batch — continuation session)
    "rank_auc",
    "knn_shapley",
    # new in round 5 (thirtieth batch — continuation session)
    "merkle_diff",
    "jackknife_ratio",
    # new in round 5 (twenty-ninth batch — continuation session)
    "source_digest",
    "lpt_partition_plan",
    "rate_shrinkage",
    # new in round 5 (twenty-eighth batch — continuation session)
    "kcenter_coreset",
    "trimmed_mean",
    # new in round 5 (twenty-seventh batch — continuation session)
    "label_propagation",
    "srm_check",
    # new in round 5 (twenty-sixth batch — continuation session)
    "quant_recall",
    "consistent_hash_audit",
    # new in round 5 (twenty-fifth batch — continuation session)
    "window_funnel",
    "burst_detect",
    # new in round 5 (twenty-fourth batch — continuation session)
    "pagerank_iter",
    "knn_eval",
    # new in round 5 (twenty-third batch — continuation session)
    "ivm_merge_audit",
    "mase_eval",
    "simpson_audit",
    # new in round 5 (twenty-second batch — continuation session)
    "pmi_pairs",
    "sax_symbols",
    "holt_trend",
    # new in round 5 (twenty-first batch — continuation session)
    "ams_f2_sketch",
    "good_turing",
    "k_anonymity",
    # new in round 5 (twentieth batch — continuation session)
    "theil_sen_slope",
    "spearman_rank",
    "cuped_adjust",
    # new in round 5 (nineteenth batch — continuation session)
    "calendar_features",
    # new in round 5 (eighteenth batch — continuation session)
    "peak_concurrency",
    "join_size_audit",
    "log2_histogram",
    # new in round 5 (seventeenth batch — continuation session)
    "hll_rolling_merge",
    "snm_pairs",
    # new in round 5 (sixteenth batch — continuation session)
    "ltv_curves",
    "fulfillment_latency",
    "log_odds_words",
    # new in round 5 (fifteenth batch — continuation session)
    "pareto_frontier",
    "linear_attribution",
    # new in round 5 (fourteenth batch — continuation session)
    "chi2_independence",
    "max_drawdown",
    "activity_streaks",
    # new in round 5 (thirteenth batch — continuation session)
    "phrase_search",
    "decayed_counts",
    "ratio_to_parent",
    # new in round 5 (twelfth batch — continuation session)
    "fk_integrity",
    "welch_pairs",
    "bloom_members",
    # new in round 5 (eleventh batch — continuation session)
    "temporal_motifs",
    "woe_encoding",
    "haar_energy",
    "fuzzy_name_pairs",
    # new in round 5 (tenth batch — continuation session)
    "hll_cardinality",
    "countmin_topk",
    # new in round 5 (ninth batch — continuation session)
    "survival_km",
    "benford_audit",
    "graph_triangles",
    # new in round 5 (eighth batch — continuation session)
    "rolling_slope",
    "interval_overlap",
    "zorder_key",
    # new in round 5 (seventh batch — continuation session)
    "token_entropy",
    "bm25_scores",
    "allen_sessions",
    "basket_lift",
    # driver-gating priority overrides (r4 asks)
    "multimodal_stats",
    "tokenized_asof_features",
    # new in round 5 (sixth batch)
    "sliding_windows",
    "local_peaks",
    "profile_events",
    "top_paths",
    "lagged_corr",
    "centroid_similarity",
    "anomaly_mad",
    "rolling_distinct",
    "feature_matrix",
    "psi_drift",
    "scd2_join",
    "rolling_median",
    "forward_label",
    "target_encode",
    "json_features",
    # new in round 5 (fifth batch)
    "trailing_features",
    "rfm_snapshot",
    "ohlc_bars",
    "quantile_transform",
    "event_pivot",
    "gini_concentration",
    "hot_key_audit",
    "rollup_activity",
    "bucketed_join",
    "dense_daily_counts",
    "temporal_split",
    # new in round 5 (fourth batch)
    "asof_tolerance",
    "gap_quantiles",
    "star_join_revenue",
    "behavior_divergence",
    "value_acf",
    "dedup_impact_report",
    "zscore_outliers",
    "session_stats",
    "streaming_windowed_counts",
    "retention_cohorts",
    "conversion_funnel",
    "hourly_seasonality",
    # new in round 5 (third batch)
    "heaps_fit",
    "term_burstiness",
    "event_burstiness",
    "transition_entropy",
    # new in round 5 (second batch)
    "length_ks_drift",
    "zipf_fit",
    "ann_recall_audit",
    "semdedup_keep",
    "quality_classifier",
    "boilerplate_segments",
    "incremental_dedup",
    "bigram_nll",
    "tfidf_top_terms",
    "domain_cap",
    "cross_source_overlap",
    # new in round 5 (first batch; rest of second batch below)
    "ewma_features",
    "cusum_changepoint",
    "token_ngram_novelty",
    "suffix_prefix_overlap",
    "vocab_coverage",
    # veterans: absent from CORRECTNESS_r04 (driver-green r03 + r4 mirror)
    "rescale_scores",
    "dedup_exact",
    "token_count",
    "quality_score",
    "ngram_jaccard",
    "minhash_signature",
    "lsh_candidates",
    "simhash",
    "doc_fingerprint",
    "lang_id",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "interpolate",
    "ordering_pairs",
    "pair_diff",
    "cross_stage_pairs",
    "event_response_prepost",
    "topk_users",
    "histogram_lift",
    "value_counts",
    "set_ops",
    "discrete_entropy_mi",
    "column_medians",
    "center_rescale",
    "sampled_pairs_det",
    "sliced_score",
    "near_dup_verified",
    "simhash64",
    "simhash_near_dups",
    "clinical_pairs",
    "embedding_near_dups",
    "embedding_near_dups_multi",
    "random_ordered_pairs",
    "asof_salted",
]


def _prioritized(d: dict) -> dict:
    out = {k: d[k] for k in _PRIORITY if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mpds_spark.queries import QUERIES

    return _prioritized(QUERIES)


def oracle_sql() -> dict[str, str]:
    from mpds_spark.queries import ORACLES

    return _prioritized(ORACLES)
