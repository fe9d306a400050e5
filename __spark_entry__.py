"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All implementations live in :mod:`opc_ua_data_pipeline_spark`; this
module only merges the per-operator-family registries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from opc_ua_data_pipeline_spark.operators import (
    alarms,
    anomaly,
    clustering,
    curation,
    dashboard,
    dedup,
    dominance,
    dq,
    graph,
    hyperfunctions,
    ingest,
    journeys,
    layout,
    marts,
    multimodal,
    pca,
    relational,
    retrieval,
    rollups,
    sampling,
    similarity,
    sketch,
    skew,
    text,
    tokenizer,
    training,
)
from opc_ua_data_pipeline_spark.session import apply_runtime_confs

_MODULES = [
    ingest,
    dominance,
    rollups,
    dashboard,
    alarms,
    anomaly,
    relational,
    journeys,
    dedup,
    graph,
    clustering,
    similarity,
    sketch,
    pca,
    text,
    tokenizer,
    multimodal,
    skew,
    sampling,
    training,
    layout,
    curation,
    hyperfunctions,
    retrieval,
    dq,
    marts,
]

# Queries kept fully implemented + value-verified in pytest
# (tests/test_oracle_parity.py runs ``all_queries()``) but EXCLUDED
# from the driver contract registry, per the round-3 verdict's trim
# directive: each is an alternate spelling of a mechanism another
# registered query already proves, so a driver window slot on it is a
# slot NOT spent re-verifying a distinct capability.
_PYTEST_ONLY = {
    # bit-identical to rollup_hourly (shares its oracle literally)
    "rollup_hourly_hierarchical",
    # three spellings of the one md5-hash-gate mixing mechanism that
    # dataset_mix keeps registered (rates differ; the gate is the op)
    "epoch_mix",
    "temperature_mix",
    "per_source_cap",
    # embedding_normalize with prefix_dims — same function, same oracle
    # family
    "embedding_matryoshka",
    # the intermediate frame of zscore_anomalies (registered)
    "rolling_zscore",
    # stage 1 of minhash_candidate_pairs (registered), which consumes
    # and therefore transitively verifies the signature table
    "minhash_signatures",
}

# The driver's correctness pass verifies the FIRST 50 registry entries
# per round; registration order rotates each round BY ROW AGE (the
# round-7 verdict's policy).  Round 11 executes the rotation round 10
# deferred (r10 verdict item 4): the window is cc_delta_assign (added
# mid-build after round 9, never yet driver-verified) plus the 39-row
# slot-51+ queue (last driver-green round 5, association_rules round
# 6) plus the 10 oldest remaining round-6-era rows.  Slots 51+ queue
# everything else oldest-green-first (r6 → r7 → r8 → r10); all 212
# contract rows also carry dual-SF dtype-strict local artifacts
# (CORRECTNESS_LOCAL_r11_*).
_PRIORITY = [
    # --- round-11 window (slots 1-50): cc_delta_assign (brand-new in
    # the inherited r9 mid-build commits, never driver-verified), the
    # full slot-51+ queue the r9/r10 verdicts deferred (last green r5
    # except association_rules r6), then the 10 alphabetically-first
    # remaining r6-era rows.  After this window no contract row's
    # latest green predates round 6 (the r10 verdict item-4 criterion).
    "cc_delta_assign",
    "cdc_dedup_ratio",
    "cdc_neardup_pairs",
    "clicked_never_purchased",
    "cohort_retention",
    "conversion_funnel",
    "corpus_cube",
    "counter_agg",
    "dataset_mix",
    "dedup_bow_groups",
    "dedup_exact",
    "dedup_incremental_new",
    "dedup_jaccard_pairs",
    "distinct_users",
    "embedding_covariance",
    "event_type_pivot",
    "feature_drift_psi",
    "histogram_rollup_percentiles",
    "incident_range_join",
    "m4_downsample",
    "media_metadata",
    "metric_pair_correlation",
    "pca_project",
    "png_features",
    "pricing_summary",
    "priority_late_items",
    "revenue_by_nation",
    "salted_event_stats",
    "sessionize",
    "shipping_priority",
    "state_durations",
    "stratified_sample",
    "time_weighted_avg",
    "top_customers",
    "trend_slope",
    "uptime_agg",
    "value_histogram",
    "value_percentiles",
    "zorder_keys",
    "association_rules",
    "benford_digit_check",
    "bracket_revenue",
    "candlestick_merge",
    "copurchase_triangles",
    "dedup_verified_near_dups",
    "dsir_importance",
    "editdist_near_dup_pairs",
    "event_path_trigrams",
    "gopher_quality_flags",
    "image_phash_pairs",
    # --- slots 51+: the remaining queue, oldest-green-first
    # (r6 era, then r7, r8, r10)
    "kmv_distinct_users",
    "kmv_source_overlap",
    "lead_lag_correlation",
    "link_prediction_topk",
    "lone_fault_suppliers",
    "metric_operator_mi",
    "multi_touch_attribution",
    "neardup_triangles",
    "operator_error_ztest",
    "pareto_front",
    "pmi_collocations",
    "repeated_ngram_ratio",
    "sliding_p95_histogram",
    "sliding_wau_sketch",
    "table_fingerprint",
    "table_profile",
    "theil_sen_trend",
    "topk_per_key",
    "window_funnel_depth",
    "alarm_feed",
    "behavioral_entropy",
    "brier_decomposition",
    "classifier_auc",
    "classifier_calibration",
    "conversion_latency_quantiles",
    "curriculum_stages",
    "cusum_changepoints",
    "degree_assortativity",
    "deviation_alarms",
    "dup_span_stats",
    "edge_alarms",
    "error_burst_windows",
    "event_burstiness",
    "ewma_smooth",
    "hampel_despike",
    "heavy_hitter_bigrams",
    "k_anonymity_audit",
    "kmeans_silhouette",
    "ks_drift",
    "latched_error",
    "latest_per_metric",
    "latest_value",
    "local_clustering",
    "lttb_downsample",
    "lttb_time_bucketed",
    "metric_operator_chi2",
    "multiset_containment_pairs",
    "prefix_jaccard_pairs",
    "query_likelihood_topk",
    "revenue_gini",
    "rollup_minute",
    "score_decile_profile",
    "seasonal_anomalies",
    "seasonal_decompose",
    "sorted_neighborhood_pairs",
    "source_budget_trim",
    "spearman_correlation",
    "survival_curve",
    "value_rank_profile",
    "winnow_fingerprints",
    "winnow_overlap_pairs",
    "winsorized_values",
    "zipf_slope",
    "zscore_anomalies",
    "alarm_list_trunc",
    "ann_ivfpq_topk",
    "bloom_contamination",
    "bm25_topk",
    "chunk_documents",
    "corpus_report",
    "decontam_recall",
    "dq_report",
    "dup_span_coverage",
    "embedding_decontamination",
    "embedding_normalize",
    "embedding_rp_project",
    "enrichment_join",
    "event_transition_matrix",
    "gapfill_interpolate",
    "hard_negative_pairs",
    "heavy_hitters_cms",
    "hybrid_search_rrf",
    "idle_rich_customers",
    "key_skew_profile",
    "line_dedup",
    "market_share",
    "media_features",
    "minhash_candidate_pairs",
    "neardup_pagerank",
    "order_count_distribution",
    "pack_stats",
    "padding_waste_report",
    "parts_supplier_breadth",
    "pq_adc_topk",
    "pq_codes",
    "promo_revenue_share",
    "quality_classifier",
    "quantile_normalized_scores",
    "quantile_sketch_rollup",
    "returned_item_losses",
    "rfm_segments",
    "rollup_hourly",
    "simhash",
    "simhash_near_dup_pairs",
    "small_quantity_revenue",
    "text_bigram_logprob",
    "tfidf_top_terms",
    "time_bucket_gapfill",
    "tokenizer_fertility",
    "top_supplier_revenue",
    "vocab_coverage",
    "wire_roundtrip",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "ann_ivfpq_recall",
    "ann_lsh_recall",
    "ann_lsh_topk",
    "approx_distinct_users",
    "approx_value_percentiles",
    "asof_last_purchase",
    "bmp_features",
    "bpe_merges",
    "bpe_segmentation",
    "brand_nation_margin",
    "bronze_telemetry",
    "cluster_best_representatives",
    "cluster_split_assign",
    "curation_pipeline",
    "dedup_clusters",
    "dup_span_scrub",
    "embedding_neardup_pairs",
    "embedding_quantize_sq8",
    "heaps_law_fit",
    "hll_rollup_merge",
    "ivfpq_assign_delta",
    "kmeans_assignments",
    "label_centroids",
    "last_running_time",
    "nearest_centroid",
    "ngram_contamination",
    "pack_sequences",
    "passage_dedup",
    "pii_scrub",
    "progress_clamp",
    "repetition_stats",
    "rollup_sliding",
    "semantic_dedup",
    "shard_assign",
    "split_assign",
    "text_corpus_stats",
    "text_fingerprints",
    "text_language_id",
    "text_quality_scores",
    "text_token_stats",
    "text_unigram_logprob",
    "text_vocab_stats",
    "threshold_alarms",
    "time_range_scan",
    "train_quality_classifier",
    "trained_budget_trim",
    "wav_features",
    "weighted_sample",
]


def _ordered(merged: dict) -> dict:
    out = {k: merged[k] for k in _PRIORITY if k in merged}
    out.update((k, v) for k, v in merged.items() if k not in out)
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the minute rollup
    (machine_stats_minute, database/init.sql:37-48) over the telemetry
    view — the reference's most load-bearing query shape."""
    apply_runtime_confs(spark)
    return rollups.q_rollup_minute(spark, "/root/testdata/sf0.001")


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """EVERY implemented query, including the pytest-only spellings —
    what tests/test_oracle_parity.py and local_correctness.py run."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return _ordered(out)


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return _ordered(out)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (driver
    contract registry: all_queries minus the pytest-only spellings)."""
    return {
        k: v for k, v in all_queries().items() if k not in _PYTEST_ONLY
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (same column names)."""
    return {
        k: v for k, v in all_oracle_sql().items() if k not in _PYTEST_ONLY
    }
