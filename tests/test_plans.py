"""Physical-plan regression guards: the properties that make these
queries survive a 100x scale-up (pushdown, pruning, broadcast, top-k
heaps, partial aggregation) must not silently disappear."""

from __future__ import annotations

import re

import __spark_entry__ as entry_mod
from opc_ua_data_pipeline_spark.plans import assert_plan, formatted_plan

SF = "/root/testdata/sf0.01"
Q = entry_mod.all_queries()


def test_pricing_summary_scan(spark):
    plan = assert_plan(
        Q["pricing_summary"](spark, SF),
        contains=["HashAggregate"],
    )
    # the shipdate predicate must reach the parquet scan; match the
    # column inside the PushedFilters list rather than the exact
    # Catalyst-internal IsNotNull(...)/LessThanOrEqual(...) rendering,
    # which is Spark-version-sensitive
    assert re.search(r"PushedFilters: \[[^\]]*l_shipdate", plan), plan[:2000]
    # column pruning: 7 of 11 lineitem columns read
    schema = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    assert len(schema.split(",")) == 7, schema
    assert "l_orderkey" not in schema


def test_topk_queries_use_heap_not_sort(spark):
    for name in ["latest_value", "alarm_feed", "top_customers"]:
        assert_plan(Q[name](spark, SF), contains=["TakeOrderedAndProject"])


def test_dim_joins_broadcast(spark):
    """Only FIXED-SIZE dims (nation: 25 rows at every SF) carry an
    explicit broadcast hint; SF-proportional tables (customer, part,
    supplier, orders) are deliberately left to AQE/CBO — a forced
    broadcast of an SF-proportional side OOMs executors at the SF
    where lineitem is 100 TB.  So the plan must (a) broadcast nation
    and (b) still pick SOME hash/merge strategy for the customer join
    without a hint (at sf0.01 AQE happily broadcasts it on size)."""
    plan = formatted_plan(Q["revenue_by_nation"](spark, SF))
    assert "BroadcastHashJoin" in plan  # the hinted nation join
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    for name in ["top_customers", "shipping_priority", "brand_nation_margin"]:
        p = formatted_plan(Q[name](spark, SF))
        assert "NestedLoop" not in p and "CartesianProduct" not in p, name
    # the 1-row scalar subquery side must be a broadcast nested loop
    assert_plan(Q["alarm_feed"](spark, SF), contains=["BroadcastNestedLoopJoin"])


def test_metric_filter_pushdown(spark):
    # the metric equality must be a pushed parquet filter; assert the
    # column's presence in PushedFilters, not Catalyst's exact
    # EqualTo(col,lit) rendering (Spark-version-sensitive)
    plan = formatted_plan(Q["latest_value"](spark, SF))
    assert re.search(r"PushedFilters: \[[^\]]*event_type", plan), plan[:2000]


def test_latest_per_metric_is_aggregate_not_window(spark):
    """The DISTINCT ON (metric) family (machine_dashboard.json:283) is
    the hottest dashboard query — it must plan as a max_by aggregate
    with a PARTIAL (map-side-combinable) pass and O(1) state per
    metric, never a row_number window that sorts each metric's full
    history inside one task.  (Struct-buffered max_by plans as
    SortAggregate — same strategy as m4_downsample — whose partial
    pass collapses every scan partition to <= #metrics rows before
    the one shuffle; the forbidden node is Window.)"""
    plan = formatted_plan(Q["latest_per_metric"](spark, SF))
    assert "Window" not in plan, plan[:2000]
    assert "partial_max_by" in plan, plan[:2000]
    assert plan.count("Exchange") <= 2, plan[:2000]  # 1 (+AQE read)


def test_no_python_udfs_on_reference_surface(spark):
    """The reference-parity queries must stay JVM-side end-to-end
    (SURVEY.md §2.11: target zero Python UDFs on the hot path)."""
    for name in [
        "bronze_telemetry",
        "rollup_minute",
        "latest_per_metric",
        "alarm_feed",
        "deviation_alarms",
        "edge_alarms",
        "latched_error",
        "sessionize",
    ]:
        plan = formatted_plan(Q[name](spark, SF))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_lsh_has_no_distinct_exchange(spark):
    """The first-collision formulation must not reintroduce a
    post-join DISTINCT (the 100 TB bottleneck it removed): the pair
    plan is a Union of broadcast joins over the checkpointed signature
    table — no aggregates, no shuffle exchanges at all."""
    plan = formatted_plan(Q["minhash_candidate_pairs"](spark, SF))
    assert "Union" in plan
    assert "BroadcastHashJoin" in plan
    assert "HashAggregate" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_range_join_is_equi_keyed_not_nested_loop(spark):
    """The bin-bucketed range join must plan as a hash/merge join on
    (user, bin) with the range predicate as residual condition — a
    naive t BETWEEN lo AND hi join would be a nested-loop scan that
    dies at scale."""
    plan = formatted_plan(Q["incident_range_join"](spark, SF))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_contamination_broadcasts_benchmark(spark):
    """The benchmark n-gram dictionary is the small side by
    construction — it must broadcast; the corpus side must not
    shuffle for the join."""
    plan = formatted_plan(Q["ngram_contamination"](spark, SF))
    assert "BroadcastHashJoin" in plan


def test_quantize_broadcasts_codebook(spark):
    plan = formatted_plan(Q["embedding_quantize_sq8"](spark, SF))
    assert "BroadcastHashJoin" in plan


def test_single_exchange_window_ops(spark):
    """Per-key window operators over HIGH-cardinality keys pay exactly
    one shuffle.  (rolling_zscore left this list in round 6: its key
    is low-cardinality, so it now runs the distwindow two-pass — its
    plan contract lives in tests/test_distwindow.py.)"""
    for name in ["per_source_cap", "value_histogram"]:
        plan = formatted_plan(Q[name](spark, SF))
        assert plan.count("Exchange") <= 2, name  # 1 exchange (+AQE read)


def test_two_pass_windows_have_no_global_window(spark):
    """De-skewed formulations (vocab rank, value rank profile) must not
    regress to a partition-less Window or global Sort over the big
    side: every Window node's partition spec must be non-empty, and a
    RepartitionByExpression (the range-partition first pass) must be
    present."""
    for name in ["text_vocab_stats", "value_rank_profile"]:
        plan = formatted_plan(Q[name](spark, SF))
        # round 7: the two-pass rank's bucket id is a deterministic
        # column expression (distwindow.deterministic_bucket_id), so
        # the plan must show NEITHER a materialized checkpoint scan
        # (ExistingRDD — the round-6 localCheckpoint form this
        # replaced) NOR a range exchange; the only evidence of the
        # de-skew is the _dw_pid bucket in every fact-ordered window,
        # asserted below.  (The round-6 'rangepartitioning OR
        # ExistingRDD' spelling was near-vacuous — any localCheckpoint
        # produces ExistingRDD — per the round-6 advice.)
        assert "ExistingRDD" not in plan, name
        assert "rangepartitioning(" not in plan, name
        assert "_dw_pid" in plan, name
        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
            spec = m.group(1)
            # a global window's spec starts directly with the ORDER BY
            # column list; partitioned specs lead with partition cols
            # before the ordering spec — assert a partition column
            # reference exists ahead of the first ASC/DESC marker.
            head = spec.split(" ASC")[0].split(" DESC")[0]
            assert head.strip(), (name, spec)


def test_hyperfunction_windows_are_day_composite(spark):
    """The sequential hyperfunctions must keep their (key, day)
    two-pass de-skew: any window spec ordered by (time, event_id) —
    the big-side sequential pass — must carry a _day column in its
    partition spec; per-key-only windows may only order by _day (the
    tiny boundary tables)."""
    for name in [
        "time_weighted_avg",
        "counter_agg",
        "uptime_agg",
        "state_durations",
        "lttb_downsample",
    ]:
        plan = formatted_plan(Q[name](spark, SF)).lower()
        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
            spec = m.group(1)
            if "event_id" in spec:  # big-side sequential window
                assert "_day" in spec, (name, spec)


def test_kmeans_seed_selection_is_topk_heap(spark):
    """Seed picking must be a distributed top-k (TakeOrderedAndProject)
    over the corpus, not a global row_number window.  (Tested on the
    seed sub-plan directly — the full kmeans plan is behind
    localCheckpoint scans.)"""
    from opc_ua_data_pipeline_spark.operators.clustering import (
        seed_centroids,
    )
    from opc_ua_data_pipeline_spark.tables import load_table

    plan = formatted_plan(
        seed_centroids(load_table(spark, SF, "embeddings"))
    )
    assert "TakeOrderedAndProject" in plan


def test_round3_curation_plan_shapes(spark):
    """Round-3 curation operators keep their scale contracts:
    vocab_coverage and bloom_contamination join against BROADCAST
    bounded-size sides (top-K vocab / fixed-size bitmap table);
    line_dedup joins on digests with no nested loop; the per-source
    budget window is partitioned (never a global sort)."""
    plan = formatted_plan(Q["vocab_coverage"](spark, SF))
    assert "Broadcast" in plan
    assert "CartesianProduct" not in plan
    # top-K vocab must be a heap cut, not a partition-less window
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan

    plan = formatted_plan(Q["bloom_contamination"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan

    plan = formatted_plan(Q["line_dedup"](spark, SF))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan

    plan = formatted_plan(Q["source_budget_trim"](spark, SF))
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        head = m.group(1).split(" ASC")[0].split(" DESC")[0]
        assert head.strip(), m.group(1)  # window is partitioned


def test_classifier_is_scan_stage_projection(spark):
    """The quality classifier must stay a shuffle-free narrow pass —
    no exchange, no Python eval in the plan."""
    plan = formatted_plan(Q["quality_classifier"](spark, SF))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_adc_joins_broadcast_luts(spark):
    """ADC scoring must join the corpus codes against BROADCAST
    lookup tables (bounded by |queries| x codebook size) — a shuffle
    join here would move the corpus for a constant-size side.  (The
    BroadcastNestedLoopJoins in the plan are the LUT construction's
    deliberate |queries| x k cross joins — both sides constant-size —
    so only CartesianProduct is forbidden.)"""
    plan = formatted_plan(Q["pq_adc_topk"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_marts_plan_shapes(spark):
    """Warehouse-mart family (marts.py): top-k is a heap, the
    filtered-fact ratios keep their predicates in the scan, and no
    query degenerates to a nested loop / cartesian product (the
    1-row threshold/max sides are broadcast by construction)."""
    plan = formatted_plan(Q["returned_item_losses"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    # the flag equality must reach the parquet scan; match the column
    # inside the PushedFilters list rather than the exact
    # Catalyst-internal EqualTo(...) rendering, which is
    # Spark-version-sensitive
    assert re.search(r"PushedFilters: \[[^\]]*l_returnflag", plan), plan[
        :2000
    ]

    plan = formatted_plan(Q["promo_revenue_share"](spark, SF))
    assert "PushedFilters" in plan and "l_shipdate" in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan

    for name in [
        "order_count_distribution",
        "market_share",
        "parts_supplier_breadth",
    ]:
        p = formatted_plan(Q[name](spark, SF))
        assert "CartesianProduct" not in p, name

    # Q22/Q15: the 1-row aggregate side must broadcast, and the
    # anti join must stay a hash anti join
    p = formatted_plan(Q["idle_rich_customers"](spark, SF))
    assert "BroadcastNestedLoopJoin" in p  # threshold row
    assert "LeftAnti" in p and "CartesianProduct" not in p
    # global-max row: Catalyst rewrites crossJoin+equality-filter into
    # an equi BroadcastHashJoin on the max value itself — accept any
    # broadcast strategy, forbid the cartesian fallback
    p = formatted_plan(Q["top_supplier_revenue"](spark, SF))
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_round5_plan_shapes(spark):
    """Round-5 operators keep their scale contracts: the PSI monitor
    is window-free with a broadcast totals join; the histogram rollup's
    only windows run over the bounded (type, day, <=256-bin) spine,
    partitioned on (event_type, bucket); the PNG codec path carries
    exactly one Python stage (the mapInPandas codec itself)."""
    plan = formatted_plan(Q["feature_drift_psi"](spark, SF))
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan

    plan = formatted_plan(Q["histogram_rollup_percentiles"](spark, SF))
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        assert "event_type" in spec and "bucket" in spec, spec

    plan = formatted_plan(Q["png_features"](spark, SF))
    # one numbered node header per operator: encoder + decoder, no more
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 2
    assert "Exchange" not in plan  # narrow end to end


def test_bpe_and_cdc_plan_shapes(spark):
    """BPE training's corpus stage must be the word-count rollup +
    top-k heap (TakeOrderedAndProject), its per-iteration rewrite a
    broadcast 1-row join (never a cartesian product against the vocab
    table); CDC dedup must carry no window and no nested loop — its
    wide nodes are the two groupBys only."""
    from opc_ua_data_pipeline_spark.operators.tokenizer import _word_counts
    from opc_ua_data_pipeline_spark.tables import load_table

    p = formatted_plan(_word_counts(load_table(spark, SF, "documents")))
    assert "TakeOrderedAndProject" in p
    assert "HashAggregate" in p  # map-side-combinable word counts

    p = formatted_plan(Q["cdc_dedup_ratio"](spark, SF))
    assert "Window" not in p
    assert "NestedLoop" not in p and "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_candlestick_merge_plan_is_two_hash_aggs(spark):
    """The hierarchical OHLC rollup must plan as two partial/final
    aggregate pairs (hour partials, day merge) with no Window, no
    per-key sort of history, and no Python stage — min_by/max_by on
    the VARCHAR order key may surface as SortAggregate (sorting only
    GROUPED partials, still map-side combinable), never as a window
    over raw rows."""
    plan = formatted_plan(Q["candlestick_merge"](spark, SF))
    assert "Window" not in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pca_plans_stay_narrow(spark):
    """The covariance pass is the long-form explode + map-side-combine
    shape: its data-proportional stage must partial-aggregate before
    the single pos shuffle, every join after it must be a broadcast of
    the constant-size moment/pair frames, and nothing touches Python;
    the projection pass must be fully narrow — zero exchanges — with
    the basis inlined as literals."""
    plan = formatted_plan(Q["embedding_covariance"](spark, SF))
    assert "Window" not in plan
    assert "Generate" in plan  # the posexplode expansion
    assert "partial_count" in plan or "HashAggregate" in plan
    joins = re.findall(r"\(\d+\) (\w*Join\w*)", plan)
    assert joins and all("Broadcast" in j for j in joins), joins
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan

    plan = formatted_plan(Q["pca_project"](spark, SF))
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_metric_correlation_runs_on_rollup(spark):
    """The pairwise stage must consume the minute/hour ROLLUP, not raw
    rows: exactly one scan of events feeding an aggregate, a
    SortMergeJoin/ShuffledHashJoin on the bucket key (both sides the
    rollup — no broadcast of a data-proportional frame), no window, no
    Python, and exact integer aggregation (no double sums)."""
    plan = formatted_plan(Q["metric_pair_correlation"](spark, SF))
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_lttb_bucket_stats_broadcast(spark):
    """LTTB's bucket-average and per-bucket-max frames are #metrics x
    n_out rows — they must come back as broadcast joins, never a
    shuffle join against the data-proportional candidate frame; no
    Python anywhere."""
    plan = formatted_plan(Q["lttb_downsample"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_dsir_ratio_table_broadcasts(spark):
    """DSIR's log-ratio model is a CONSTANT n_buckets-row table — it
    must broadcast to the per-doc join (the whole point of hashed
    features over a Heaps-law vocab); no window, no Python."""
    plan = formatted_plan(Q["dsir_importance"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_window_funnel_has_no_window_function(spark):
    """The multi-step funnel must stay a chain of conditional min
    aggregates + user_id equi-joins: no window over the event stream,
    no nested loop, partial aggregation before every shuffle."""
    plan = formatted_plan(Q["window_funnel_depth"](spark, SF))
    assert "Window" not in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "partial_min" in plan


def test_round5c_plan_shapes(spark):
    """Round-5c operators keep their scale contracts.

    KMV: pure mergeable aggregates — no Window, no Python stage — and
    the overlap's rank windows run only over the (s1, s2) sketch pairs
    (bounded 2k-row frames), with the pairs frame broadcast.  CUSUM
    keeps the (key, day) two-pass: every sequential window (ordered by
    event_id) partitions on the day composite.  Hampel's one window is
    the BOUNDED centered frame, never unbounded history.  PMI's top-k
    is a heap; attribution joins purchases to touches by equi-key
    (never a nested loop) and its windows partition by p_eid."""
    plan = formatted_plan(Q["kmv_distinct_users"](spark, SF))
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    plan = formatted_plan(Q["kmv_source_overlap"](spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        assert "s1" in spec and "s2" in spec, spec

    plan = formatted_plan(Q["cusum_changepoints"](spark, SF)).lower()
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        if "event_id" in spec:
            assert "_day" in spec, spec

    # Hampel's FACT-side window is the bounded centered frame, never
    # unbounded history; since the round-6 distwindow rewrite the plan
    # also carries tiny offsets-table windows (partitioned on _dw_pid,
    # #keys x 64 rows) whose running frames ARE unbounded — those are
    # the de-skew bookkeeping, not a fact scan, so exempt them.
    plan = formatted_plan(Q["hampel_despike"](spark, SF))
    specs = re.findall(r"windowspecdefinition\(([^)]+?specifiedwindowframe[^)]*)", plan)
    assert specs, plan[:1500]
    for s in specs:
        if "unboundedpreceding" in s.lower():
            assert "_dw_pid" in s, s

    plan = formatted_plan(Q["pmi_collocations"](spark, SF))
    assert "TakeOrderedAndProject" in plan

    plan = formatted_plan(Q["multi_touch_attribution"](spark, SF))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan

    plan = formatted_plan(Q["event_path_trigrams"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "user_id" in m.group(1), m.group(1)


def test_bracket_revenue_pushes_derived_envelopes(spark):
    """Q19 shape: the manually-derived per-side envelope filters must
    reach the parquet scans (Catalyst cannot infer them from the
    cross-table disjunction), and the join must stay an equi hash
    join, not a nested loop over the disjunction."""
    plan = assert_plan(
        Q["bracket_revenue"](spark, SF),
        contains=["HashAggregate"],
    )
    assert re.search(r"PushedFilters: \[[^\]]*l_quantity", plan), plan[:2000]
    assert re.search(r"PushedFilters: \[[^\]]*p_brand", plan), plan[:2000]
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_lone_fault_suppliers_is_semi_plus_anti(spark):
    """Q21 shape: both decorrelated EXISTS branches must plan as
    equi-keyed semi/anti joins (the suppkey inequality riding the
    orderkey equi-key), never as nested loops."""
    plan = formatted_plan(Q["lone_fault_suppliers"](spark, SF))
    # the EXISTS/NOT EXISTS branches: equi hash joins, semi + anti
    assert re.search(r"(Hash|SortMerge)Join.*LeftSemi", plan), plan[:1500]
    assert re.search(r"(Hash|SortMerge)Join.*LeftAnti", plan), plan[:1500]
    # the only nested loop allowed is bounded_rank's k-row self-join
    # (numbered node headers count physical operators once)
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)) <= 1
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_pareto_front_single_fused_window_pass(spark):
    """The skyline's two window maxes (suffix, same-instant peers)
    share one partition+order spec, so the fact side must pay exactly
    ONE exchange + sort, and the boundary table must come back as a
    broadcast join."""
    plan = formatted_plan(Q["pareto_front"](spark, SF))
    assert "BroadcastHashJoin" in plan
    # one Window node on the fact branch, one on the tiny day-bounds
    # branch — no third pass
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 2, plan[:2000]
    assert "CartesianProduct" not in plan


def test_table_fingerprint_stays_hash_aggregable(spark):
    """Every fingerprint buffer is fixed-width BIGINT on purpose; a
    DECIMAL(38) sum or string MIN would demote the whole scan to
    SortAggregate (per-partition O(n log n) sort at 100 TB)."""
    plan = formatted_plan(Q["table_fingerprint"](spark, SF))
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan
    assert "Window" not in plan and "Join" not in plan


def test_seasonal_anomalies_broadcasts_profile(spark):
    """The (metric, hour-of-day) profile is #metrics x 24 rows: it
    must broadcast back over the fact scan — never shuffle the fact
    table — and the profile aggregate must combine map-side."""
    plan = formatted_plan(Q["seasonal_anomalies"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan


def test_round8_plan_shapes(spark):
    """Round-8 operators: the quantile-sketch rollup's windows run on
    the bounded merged spine (no global unpartitioned window, value
    filter pushed to the scan); the decontamination audit joins the
    broadcast benchmark on the bucket key (never a corpus self-join /
    cartesian); the exact recall baseline is the broadcast-nested-loop
    quadratic — over the BROADCAST bench side only."""
    import re

    plan = formatted_plan(Q["quantile_sketch_rollup"](spark, SF))
    assert re.search(r"PushedFilters: \[[^\]]*value", plan), plan[:2000]
    assert "CartesianProduct" not in plan
    # the distwindow offsets join back by broadcast
    assert "BroadcastHashJoin" in plan

    plan = formatted_plan(Q["embedding_decontamination"](spark, SF))
    assert "BroadcastHashJoin" in plan  # bucket equi-join, bench side
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan  # pure groupBy rollup, no rank pass

    plan = formatted_plan(Q["decontam_recall"](spark, SF))
    assert "CartesianProduct" not in plan
    # the exact baseline is broadcast(bench) nested-loop — present by
    # design; the corpus side must never be the broadcast side
    assert "BroadcastNestedLoopJoin" in plan
