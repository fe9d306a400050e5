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
    dq,
    graph,
    hyperfunctions,
    ingest,
    layout,
    marts,
    multimodal,
    relational,
    retrieval,
    rollups,
    sampling,
    similarity,
    skew,
    text,
    training,
)
from opc_ua_data_pipeline_spark.session import apply_runtime_confs

_MODULES = [
    ingest,
    rollups,
    dashboard,
    alarms,
    anomaly,
    relational,
    dedup,
    graph,
    clustering,
    similarity,
    text,
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
# per round, so registration order is rotated each round.  Round 4
# front-loads (a) the 6 new queries (state_durations, ann_ivfpq_recall,
# bmp/wav_features, hll_rollup_merge, dup_span_scrub) and the 3
# hyperfunctions whose implementation changed (de-skewed two-pass —
# bit-identical, but a fresh row on the new code is the hard signal),
# then (b) the queries that have NEVER had a driver row on the
# round-3-regenerated MICROS/NTZ parquet — reference surface
# (alarms/dashboard/rollups) first, then the ANN/clustering/text/
# training families.  81 entries carry priority for 50 slots: the 31
# overflow entries (the relational/warehouse family at the tail) are
# all r1-driver-green on the old encoding AND value-verified at BOTH
# sf0.01 and sf0.1 in the committed CORRECTNESS_LOCAL_r04 artifacts;
# round 5 should front-load exactly that tail.
_PRIORITY = [
    # (a) new in round 4 / implementation changed in round 4
    "state_durations",
    "ann_ivfpq_recall",
    "bmp_features",
    "wav_features",
    "hll_rollup_merge",
    "dup_span_scrub",
    "time_weighted_avg",
    "counter_agg",
    "uptime_agg",
    # (b) never driver-checked on the regenerated parquet:
    # reference surface — alarms, dashboard, rollups, ingest
    "bronze_telemetry",
    "rollup_minute",
    "rollup_sliding",
    "latest_value",
    "latest_per_metric",
    "alarm_feed",
    "time_range_scan",
    "deviation_alarms",
    "edge_alarms",
    "latched_error",
    "threshold_alarms",
    "alarm_list_trunc",
    "progress_clamp",
    "last_running_time",
    # anomaly + embedding/ANN + clustering
    "zscore_anomalies",
    "winsorized_values",
    "kmeans_assignments",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_lsh_recall",
    "embedding_neardup_pairs",
    "semantic_dedup",
    "label_centroids",
    "nearest_centroid",
    "embedding_quantize_sq8",
    # text analysis family
    "text_token_stats",
    "text_quality_scores",
    "text_language_id",
    "text_fingerprints",
    "text_corpus_stats",
    "text_vocab_stats",
    "text_unigram_logprob",
    # curation / training / sampling
    "passage_dedup",
    "pii_scrub",
    "curation_pipeline",
    "ngram_contamination",
    "repetition_stats",
    "split_assign",
    "shard_assign",
    "pack_sequences",
    "stratified_sample",
    "dataset_mix",
    "media_metadata",
    "salted_event_stats",
    "zorder_keys",
    # relational/warehouse tail (overflow: local-artifact-verified;
    # front-load these in round 5)
    "pricing_summary",
    "revenue_by_nation",
    "top_customers",
    "shipping_priority",
    "brand_nation_margin",
    "priority_late_items",
    "sessionize",
    "distinct_users",
    "approx_distinct_users",
    "corpus_cube",
    "value_percentiles",
    "approx_value_percentiles",
    "value_rank_profile",
    "event_type_pivot",
    "asof_last_purchase",
    "incident_range_join",
    "value_histogram",
    "conversion_funnel",
    "cohort_retention",
    "clicked_never_purchased",
    "dedup_exact",
    "dedup_jaccard_pairs",
    "dedup_bow_groups",
    "dedup_incremental_new",
    "dedup_clusters",
    "enrichment_join",
    "wire_roundtrip",
    "rollup_hourly",
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
