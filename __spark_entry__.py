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
# per round, so registration order is rotated each round.  After
# round 7 every one of the 202 contract queries holds a green driver
# row (r3 ∪ … ∪ r7 union, judge-confirmed), so round 8 rotates by
# ROW AGE (the round-7 verdict's item 2): (a) queries brand-new in
# round 8, (b) queries whose implementation or oracle changed in
# round 8 (the NULL-pos_score hard-negative contract, the
# character-length tokenizer oracle, the three shared-cutpoint
# distwindow callers), then (c) the 40 contract queries whose most
# recent green row is from ROUND 3 (stamped before the decimal
# contracts, the distwindow rewrite and the dtype-strict harness
# existed), and (d) one round-4-era row to fill the window.  The 34
# remaining round-4-era rows rotate in next round; everything past
# slot 50 carries dual-SF dtype-strict local artifacts.
_PRIORITY = [
    # (a) brand-new in round 8
    "quantile_sketch_rollup",
    "embedding_decontamination",
    "decontam_recall",
    "cluster_best_representatives",
    # (b) implementation/oracle changed in round 8
    "hard_negative_pairs",
    "tokenizer_fertility",
    "quantile_normalized_scores",
    "rfm_segments",
    "padding_waste_report",
    # (c) oldest green driver rows: the round-3 era
    "ann_ivfpq_topk",
    "bloom_contamination",
    "bm25_topk",
    "chunk_documents",
    "corpus_report",
    "dq_report",
    "dup_span_coverage",
    "embedding_normalize",
    "embedding_rp_project",
    "enrichment_join",
    "event_transition_matrix",
    "gapfill_interpolate",
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
    "parts_supplier_breadth",
    "pq_adc_topk",
    "pq_codes",
    "promo_revenue_share",
    "quality_classifier",
    "returned_item_losses",
    "rollup_hourly",
    "simhash",
    "simhash_near_dup_pairs",
    "small_quantity_revenue",
    "text_bigram_logprob",
    "tfidf_top_terms",
    "time_bucket_gapfill",
    "top_supplier_revenue",
    "vocab_coverage",
    "weighted_sample",
    "wire_roundtrip",
    # (d) round-4-era fill (the rest next round)
    "alarm_list_trunc",
    # --- slot 51+ from here: the remaining round-4-era rows queue
    # for the round-9 window, then round-5-era
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
