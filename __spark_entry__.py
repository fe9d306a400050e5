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
# round-7 verdict's policy).  Round 9 finishes the rotation: (a) the
# three queries brand-new in round 9, (b) the three whose
# implementation changed in round 9 (the large-star/small-star
# connected-components rewrite feeds dedup_clusters and
# cluster_best_representatives, oracles unchanged; weighted_sample's
# NULL-key exclusion, oracle updated), then (c) ALL 34 remaining round-4-era rows (the
# round-8 verdict's item 1 list, verbatim), and (d) the 8 oldest
# round-5-era rows to fill the window.  After this round no contract
# query's most recent green driver row predates round 5 — the
# round-7 "Done" criterion.  Slots 51+ queue the remaining rows
# oldest-first (round-5 era onward); everything past slot 50 carries
# dual-SF dtype-strict local artifacts (CORRECTNESS_LOCAL_r09_*).
_PRIORITY = [
    # (a) brand-new in round 9
    "train_quality_classifier",
    "trained_budget_trim",
    "ivfpq_assign_delta",
    # (b) implementation changed in round 9 (CC rewrite; the
    # weighted-sample NULL-key exclusion — engines disagreed on NULL
    # ordering, latent until NULL-key data)
    "dedup_clusters",
    "cluster_best_representatives",
    "weighted_sample",
    # (a2) also brand-new in round 9 (added after the first r9 pass)
    "cluster_split_assign",
    "heaps_law_fit",
    # (c) the 34 remaining round-4-era rows
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "bmp_features",
    "bronze_telemetry",
    "curation_pipeline",
    "dup_span_scrub",
    "embedding_neardup_pairs",
    "embedding_quantize_sq8",
    "hll_rollup_merge",
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
    "wav_features",
    # (d) oldest round-5-era rows filling the window
    "ann_ivfpq_recall",
    "ann_lsh_recall",
    "approx_distinct_users",
    "approx_value_percentiles",
    "asof_last_purchase",
    "bpe_merges",
    "bpe_segmentation",
    "brand_nation_margin",
    # --- slot 51+: remaining rows queue oldest-first for the
    # round-10 window (round-5 era onward)
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
