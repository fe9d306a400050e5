"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Runs each headline query end-to-end (full materialization via the
noop sink — no driver-side collect) and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}``.

Headliners cover every operator family: ingest projection, windowed
rollup, dashboard top-k/scalar-subquery, window-function alarms,
multi-join aggregation, sessionization, dedup (hash + LSH), ANN, and
text analysis.  The quadratic Jaccard baseline is deliberately NOT a
headliner (it exists to verify LSH, not to race it).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

from opc_ua_data_pipeline_spark.session import get_spark
from opc_ua_data_pipeline_spark.tables import TABLE_NAMES, load_table

HEADLINE = [
    "bronze_telemetry",
    "rollup_minute",
    "rollup_hourly",
    "latest_per_metric",
    "alarm_feed",
    "deviation_alarms",
    "latched_error",
    "sessionize",
    "pricing_summary",
    "revenue_by_nation",
    "top_customers",
    "priority_late_items",
    "dedup_exact",
    "minhash_candidate_pairs",
    "simhash",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "text_quality_scores",
    "text_fingerprints",
    "media_features",
    # extension families added late in round 1:
    "incident_range_join",   # bin-bucketed range join
    "repetition_stats",      # corpus-prep: shuffle-free array exprs
    "stratified_sample",     # hash-gate sampling
    "nearest_centroid",      # embedding prototype assignment
    "conversion_funnel",     # event analytics
    "cohort_retention",
    "shipping_priority",     # TPC-H Q3 shape
    # curation ops added in round 2:
    "passage_dedup",         # chunk-level first-occurrence dedup
    "semantic_dedup",        # SemDeDup: bucketed cosine prune
    "pii_scrub",             # regex masking, scan-stage narrow pass
    "temperature_mix",       # data-derived keep rates + hash gate
    # curation ops added in round 3:
    "quality_classifier",    # fixed-weight logistic, scan-stage
    "vocab_coverage",        # broadcast top-K vocab OOV filter
    "line_dedup",            # corpus-level line dedup + reassembly
    "bloom_contamination",   # constant-size bitmap decontamination
    "source_budget_trim",    # per-source greedy token budget
    # retrieval + sampling ops added late in round 3:
    "chunk_documents",       # RAG chunker: narrow generator projection
    "bm25_topk",             # sparse keyword search, broadcast stats
    "heavy_hitters_cms",     # count-min sketch + exact twin
    "weighted_sample",       # sequential-Poisson weighted sample
    "text_bigram_logprob",   # bigram LM join (zip_with bigrams)
    # hyperfunctions (de-skewed in round 4) + round-4 additions:
    "time_weighted_avg",     # (metric, day) two-pass LOCF weighting
    "counter_agg",           # resets-aware delta, two-pass lag
    "uptime_agg",            # heartbeat intervals, offset-table cumsum
    "state_durations",       # state_agg: LOCF time-in-state
    "ann_ivfpq_topk",        # composed IVF-PQ index serving path
    "bmp_features",          # real container assembly + Arrow decode
    "hll_rollup_merge",      # mergeable sketch rollup (minute->hour)
    # round-5 additions:
    "png_features",          # compressed container: zlib encode+decode
    "histogram_rollup_percentiles",  # mergeable percentile rollup
    "cdc_dedup_ratio",       # content-defined chunk dedup stats
    "bpe_merges",            # iterative on-corpus tokenizer training
    # round-5b additions:
    "candlestick_merge",     # OHLC monoid: hour partials -> day
    "metric_pair_correlation",  # exact-integer Pearson on the rollup
    "lttb_downsample",       # parallel largest-triangle downsample
    "embedding_covariance",  # one-pass 2145-buffer aggregate
    "pca_project",           # driver-trained basis + narrow projection
    "dsir_importance",       # hashed n-gram importance weights
    # round-5c additions:
    "cusum_changepoints",    # prefix-min CUSUM, (key, day) two-pass
    "hampel_despike",        # rolling-median repair, integer medians
    "kmv_distinct_users",    # mergeable KMV sketch build
    "kmv_source_overlap",    # sketch-only pairwise set intersection
    "pmi_collocations",      # corpus bigram PMI mining
    "event_path_trigrams",   # per-user lead windows, tiny count space
    "multi_touch_attribution",  # purchase-touch range join + credits
    # round-5d additions:
    "seasonal_anomalies",    # broadcast hour-of-day profile scoring
    "table_fingerprint",     # pure-BIGINT HashAggregate checksums
    "pareto_front",          # skyline: one fused window pass
    # editdist_near_dup_pairs deliberately NOT a headliner: like the
    # quadratic Jaccard baseline, it is the cascade's verification
    # tail (per-pair DP cost), not a mechanism to race
    "lead_lag_correlation",  # lag-spine Pearson on the rollup
    "sliding_wau_sketch",    # daily HLL sketches, 7-day sliding union
    # round-6 additions:
    "zscore_anomalies",      # distwindow bucketed trailing frame
    "ewma_smooth",           # quantized-weight EWMA, integer-exact
    "gopher_quality_flags",  # rule-based doc gates, scan-stage narrow
    "repeated_ngram_ratio",  # per-doc top-bigram share
    "topk_per_key",          # salted two-phase exact top-k
    "rfm_segments",          # three de-skewed global quintile ranks
    "error_burst_windows",   # bucket spine + RANGE sliding sum
    # round-6b additions:
    "copurchase_triangles",  # degree-ordered triangle census
    "heavy_hitter_bigrams",  # Misra-Gries candidates + exact verify
    "sliding_p95_histogram", # mergeable day histograms, 7-day slide
    "theil_sen_trend",       # median-of-slopes on the day rollup
    "score_decile_profile",  # de-skewed global decile cut
    "conversion_latency_quantiles",  # exact p50/p90/p95 via 2-pass rank
    "metric_operator_mi",    # contingency-table MI, one fact shuffle
    # round-7 additions:
    "prefix_jaccard_pairs",  # exact AllPairs prefix join — races on
                             # the expanded-vocab view since round 7
                             # (the raw 31-word fixture degenerated it)
    "lttb_time_bucketed",    # streamable LTTB, bucket-spine neighbors
    "dup_span_stats",        # cross-doc duplicated-span audit
    "classifier_auc",        # rank-sum AUC on the score spine
    "quantile_normalized_scores",  # two-rank global quantile remap
    "metric_operator_chi2",  # full-grid chi-square + Cramér's V
    # round-7b additions:
    "winnow_fingerprints",   # sampled k-gram index, per-doc window
    "winnow_overlap_pairs",  # guaranteed-sampled candidate pairs
    "multiset_containment_pairs",  # weighted containment verify
    "classifier_calibration",  # exact reliability bins
    "brier_decomposition",   # Murphy split over the bins
    "zipf_slope",            # rank-frequency OLS on the term table
    "event_burstiness",      # Fano factor over minute buckets
    "kmeans_silhouette",     # O(n*k) centroid silhouette
    "k_anonymity_audit",     # QI equivalence-class histogram
    "padding_waste_report",  # two distwindow global ranks
    "tokenizer_fertility",   # BPE fertility per language
    "hard_negative_pairs",   # label-aware broadcast top-k
    "query_likelihood_topk", # Dirichlet LM ranking
    "local_clustering",      # per-node triangle drill-down
    "degree_assortativity",  # degree-moment Pearson over edges
    # round-8 additions:
    "quantile_sketch_rollup",      # mergeable any-q rank-sampled rollup
    "embedding_decontamination",   # broadcast-bench LSH leakage audit
    # decontam_recall deliberately NOT a headliner (round-8 ADVICE):
    # its exact side is the train x bench nested-loop baseline —
    # quadratic in SF by design, like the Jaccard/editdist
    # verification tails.  It stays a CONTRACT query (verification is
    # its job); the bench races mechanisms.
    # round-9 additions:
    "train_quality_classifier",    # full-batch logistic GD, 5 agg passes
    "trained_budget_trim",         # trained weights -> distwindow trim
    "ivfpq_assign_delta",          # frozen-codebook delta routing
    "cluster_split_assign",        # leakage-free cluster-keyed splits
    "heaps_law_fit",               # global running vocab-growth OLS
    # round 10:
    "cc_delta_assign",             # incremental CC delta maintenance
]

#: The ROUND-COMPARABLE series (round-7 verdict, item 1): the in-suite
#: numbers above accumulate JVM code-cache/GC churn across 100+
#: queries in one process, which manufactured phantom 2-9x deltas in
#: round 7 (cusum 3.26 s in-suite vs 1.18 s in a fresh process, with
#: untouched controls drifting +40-50%).  Each name here ALSO runs in
#: its own subprocess — fresh JVM, own warmup, min-of-3 warm — and
#: that series is what round-over-round comparisons should read.
#: Composition: the ~15 slowest warm headliners of BENCH_r07 plus
#: three flat controls (rollup_minute, bronze_telemetry,
#: cohort_retention) whose drift measures the estimator itself.
ISOLATED = [
    "prefix_jaccard_pairs",
    "dsir_importance",
    "pca_project",
    "cusum_changepoints",
    "tokenizer_fertility",
    "local_clustering",
    "degree_assortativity",
    "rfm_segments",
    "embedding_covariance",
    "bpe_merges",
    "deviation_alarms",
    "copurchase_triangles",
    "ann_ivfpq_topk",
    "ewma_smooth",
    "quantile_normalized_scores",
    # round-9 headliners that entered before the 'new' tier existed
    # (round-9 verdict item 4 names them for the r10 series)
    "trained_budget_trim",
    "train_quality_classifier",
    # controls
    "rollup_minute",
    "bronze_telemetry",
    "cohort_retention",
]


def _warmup(spark) -> None:
    """One-time session costs shared by every pass: JVM + parquet
    footers via a tiny noop write, then the Python worker pool +
    Arrow serializer via a 1-row mapInPandas no-op."""
    spark.range(1).write.format("noop").mode("overwrite").save()
    spark.range(1).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()


def isolated_main(name: str) -> None:
    """Child-process entry (``bench.py --isolated <name>``): time ONE
    query in a fresh JVM — cold build+run, then min-of-3 warm — and
    print one JSON line.  Fresh process per query is what makes the
    series comparable across rounds: no accumulated code-cache/GC
    state from the 100+ other headliners."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(f"bench-iso-{name}")

    import __spark_entry__ as entry_mod

    fn = entry_mod.all_queries()[name]
    _warmup(spark)

    def run_once() -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    cold = run_once()
    warm = min(run_once(), run_once(), run_once())
    print(json.dumps({"name": name, "cold": cold, "warm": warm}))


def _last_line(text: str | None) -> str:
    """Last non-empty line of a child's stderr, truncated; '' if none."""
    try:
        return [l for l in (text or "").strip().splitlines() if l.strip()][
            -1
        ][:200]
    except Exception:
        return ""


def run_isolated_series(
    sf_dir: str, names: list[str] | None = None
) -> dict[str, dict]:
    """Spawn one fresh python/JVM per isolated query; collect
    {name: {cold, warm[, tier][, reason]}}.  A failed child records
    None timings WITH a ``reason`` ('skipped_budget' | 'timeout' |
    'error: <last stderr line>') so a crash is distinguishable from a
    budget skip in the round-comparable artifact (round-8 ADVICE) —
    the suite must not die on one query.

    Hard WALL-CLOCK budget (SPARK_GRAFT_ISO_BUDGET, default 900 s):
    bench prints its stdout JSON line only at the END, so if a driver
    timeout killed the process mid-series the whole round's artifact
    would be lost (the round-2 failure mode).  Once the budget is
    spent, remaining children are skipped and recorded as None —
    a partial isolated series beats no bench line at all."""
    import subprocess

    budget = float(os.environ.get("SPARK_GRAFT_ISO_BUDGET", "900"))
    t_start = time.perf_counter()
    out: dict[str, dict] = {}
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    here = os.path.abspath(__file__)
    for name in names if names is not None else ISOLATED:
        if time.perf_counter() - t_start > budget:
            out[name] = {
                "cold": None,
                "warm": None,
                "reason": "skipped_budget",
            }
            continue
        proc = None  # else a spawn failure would read the PREVIOUS
        # iteration's stderr and misattribute it to this query
        try:
            proc = subprocess.run(
                [sys.executable, here, "--isolated", name],
                capture_output=True,
                text=True,
                timeout=600,
                env=env,
                cwd=os.path.dirname(here),
            )
            last = [
                l for l in proc.stdout.strip().splitlines() if l.startswith("{")
            ][-1]
            rec = json.loads(last)
            out[name] = {"cold": rec["cold"], "warm": rec["warm"]}
        except subprocess.TimeoutExpired:
            out[name] = {"cold": None, "warm": None, "reason": "timeout"}
        except subprocess.CalledProcessError as e:
            # run() is called without check=True so this branch is
            # defensive; CalledProcessError carries its own stderr when
            # capture_output=True, independent of the `proc` local
            err = _last_line(e.stderr)
            out[name] = {
                "cold": None,
                "warm": None,
                "reason": f"error rc={e.returncode}: {err}"
                if err
                else f"error rc={e.returncode}",
            }
        except Exception:
            err = _last_line(proc.stderr if proc is not None else None)
            rc = proc.returncode if proc is not None else None
            tag = "error" if rc in (None, 0) else f"error rc={rc}"
            out[name] = {
                "cold": None,
                "warm": None,
                "reason": f"{tag}: {err}" if err else tag,
            }
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # The PREVIOUS round's committed detail artifact, read BEFORE this
    # run overwrites it: its queries_warm is the drift reference that
    # routes suspect in-suite movers into the isolated series below.
    try:
        with open("BENCH_DETAIL_local.json") as f:
            prev_detail = json.load(f)
    except Exception:
        prev_detail = {}
    prev_warm = prev_detail.get("queries_warm", {})
    spark = get_spark("opc-ua-pipeline-bench")

    import __spark_entry__ as entry_mod

    # full union: headliners may include pytest-only registry trims
    # (e.g. temperature_mix) — the bench races mechanisms, not the
    # driver window
    queries = entry_mod.all_queries()
    # Warm up the JVM + parquet footers so the first timed query doesn't
    # absorb one-time session costs.
    queries["dedup_exact"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    # ...and the Python worker pool + Arrow serializer (also session
    # one-time costs; workers are reused across queries) via a 1-row
    # mapInPandas no-op.
    spark.range(1).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    # Two passes per query: "cold" includes one-time plan analysis +
    # whole-stage codegen compile; "warm" re-runs the identical plan so
    # codegen classes are cached and the number reflects the DATA path —
    # the component that actually scales with input size (PERF.md
    # measured >=80% of cold time is compile at sf0.1).  The headline
    # metric stays the cold total for continuity with BENCH_r01.
    def run_once(fn, data_dir: str) -> float:
        t0 = time.perf_counter()
        fn(spark, data_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        # Build the plan fresh, then fully materialize through the noop
        # sink (exercises the whole plan incl. writes, returns nothing).
        timings[name] = run_once(fn, sf_dir)
        # Warm = min of THREE re-runs (round-5 verdict item 8: the
        # min-of-two suite accumulated a ±9% whole-suite JVM-churn
        # band that made round-over-round comparison lean on mid-round
        # snapshots).  Single runs at sub-second scale on 32 threads
        # carry ±1-2 s scheduler noise; the minimum of three is the
        # stable estimator of the data-path cost.
        warm[name] = min(
            run_once(fn, sf_dir),
            run_once(fn, sf_dir),
            run_once(fn, sf_dir),
        )

    # Third pass on a re-chunked copy of the SAME rows.  The driver's
    # parquet files are each ONE row group, and parquet scans split at
    # row-group boundaries — so every query above reads its input on a
    # single core no matter how many executors exist.  That is a
    # test-data artifact: a production table (or the bronze layout the
    # ingest path writes) has many row groups/files and scans in
    # parallel.  The copy rewrites each table into 32 files (values
    # identical; nano timestamps normalized to TIMESTAMP(MICROS) the
    # same way load_table does) so these numbers show the actual
    # parallel data path — the one that scales to 100 TB.
    import shutil
    import tempfile

    chunked_dir = tempfile.mkdtemp(prefix="bench_rechunk_")
    # Range-clustered like a production table (time-series tables by
    # event time, TPC-H tables by primary key — the layout the bronze
    # write path produces), NOT round-robin: round-robin would destroy
    # the natural clustering and charge every window query an
    # artificial full sort no real deployment pays.
    cluster_key = {
        "events": "ts",
        "orders": "o_orderkey",
        "lineitem": "l_orderkey",
        "customer": "c_custkey",
        "part": "p_partkey",
        "supplier": "s_suppkey",
        "documents": "doc_id",
        "embeddings": "vec_id",
    }
    t0 = time.perf_counter()
    for t in TABLE_NAMES:
        df = load_table(spark, sf_dir, t)
        key = cluster_key.get(t)
        if key is not None:
            df = df.repartitionByRange(32, key).sortWithinPartitions(key)
        df.write.mode("overwrite").parquet(f"{chunked_dir}/{t}.parquet")
    rechunk_sec = round(time.perf_counter() - t0, 3)
    par: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        fn(spark, chunked_dir).write.format("noop").mode("overwrite").save()
        par[name] = min(run_once(fn, chunked_dir), run_once(fn, chunked_dir))
    shutil.rmtree(chunked_dir, ignore_errors=True)

    # Scale-ramp guard: warm time at the main SF vs at the 10x-smaller
    # SF.  A linear operator on 10x data should ramp well under ~15x
    # (sub-second queries are plan-build-bound and ramp near 1x); a
    # ratio beyond that is a quadratic/skew suspect worth a plan audit.
    ramp_dir = os.environ.get(
        "SPARK_GRAFT_RAMP_DIR", "/root/testdata/sf0.01"
    )
    ramp_ratio: dict[str, float] = {}
    ramp_flagged: list[str] = []
    if os.path.isdir(ramp_dir) and os.path.abspath(
        ramp_dir
    ) != os.path.abspath(sf_dir):
        for name in HEADLINE:
            fn = queries[name]
            fn(spark, ramp_dir).write.format("noop").mode(
                "overwrite"
            ).save()  # build/compile at the small SF
            small = min(run_once(fn, ramp_dir), run_once(fn, ramp_dir))
            r = round(warm[name] / small, 2) if small > 0 else None
            ramp_ratio[name] = r
            if r is not None and r > 15:
                ramp_flagged.append(name)

    # The round-comparable series: fresh process per query (see the
    # ISOLATED docstring).  Runs LAST so a child-process failure can't
    # cost the in-suite numbers.  Round-9 widening (round-8 verdict
    # item 2: all four round-8 in-suite phantom regressions sat
    # OUTSIDE the fixed 18): after the fixed tier, (a) every query
    # whose in-suite warm moved >50% vs the previous round's committed
    # detail artifact is isolated in the SAME artifact ('drift' tier,
    # largest movers first), then (b) the slowest not-yet-isolated
    # headliners fill the series to ISO_MAX_CHILDREN total.  A
    # fresh-JVM child costs ~30 s wall (measured round 9: 30 children
    # ~= 900 s), so 26 children fit the 900 s ISO budget with slack —
    # bounded so the driver's bench invocation can't run long enough
    # to be killed before the stdout line prints; the budget guard
    # turns any overrun into explicit 'skipped_budget' rows, never a
    # lost artifact.  The drift reference is only trusted when the
    # previous artifact ran at the SAME SF (an sf0.01 dev run must not
    # flag the whole suite as movers against sf0.1 numbers).
    ISO_MAX_CHILDREN = 26
    movers = []
    if prev_detail.get("sf") == sf_val:
        for name, w in warm.items():
            pw = prev_warm.get(name)
            if (
                name in ISOLATED
                or not isinstance(pw, (int, float))
                or pw <= 0
            ):
                continue
            r = w / pw
            if (r > 1.5 or r < 1 / 1.5) and max(w, pw) >= 1.0:
                movers.append((abs(math.log(r)), name))
    # 'new' tier (round-9 verdict item 4): a query benched for the
    # FIRST time this round has no prev_warm row, so the drift tier —
    # which only catches round-over-round movers — would miss it for
    # one round (trained_budget_trim entered round 9 with no iso row).
    # Every first-appearance headliner gets a fresh-JVM child the
    # round it lands, slowest first.  Keyed on prev_warm regardless of
    # SF: query NAMES are SF-independent, so a same-name row at any SF
    # means "not new".
    new_tier = sorted(
        (
            n
            for n in warm
            if n not in prev_warm and n not in ISOLATED
        ),
        key=lambda n: -warm[n],
    )[: max(0, ISO_MAX_CHILDREN - len(ISOLATED))] if prev_warm else []
    drift = [
        n
        for _, n in sorted(movers, reverse=True)[
            : max(0, ISO_MAX_CHILDREN - len(ISOLATED) - len(new_tier))
        ]
        if n not in new_tier
    ]
    fill = sorted(
        (
            n
            for n in HEADLINE
            if n not in ISOLATED and n not in drift and n not in new_tier
        ),
        key=lambda n: -warm[n],
    )[: max(0, ISO_MAX_CHILDREN - len(ISOLATED) - len(new_tier) - len(drift))]
    iso = run_isolated_series(sf_dir, ISOLATED + new_tier + drift + fill)
    for n in new_tier:
        iso[n]["tier"] = "new"
    for n in drift:
        iso[n]["tier"] = "drift"
    for n in fill:
        iso[n]["tier"] = "fill"
    iso_warm = {
        k: v["warm"] for k, v in iso.items() if v["warm"] is not None
    }

    total = round(sum(timings.values()), 3)
    # stdout carries the round-comparable core (fixed tier + drift
    # movers); the 'fill' tier is in the detail file — the driver's
    # 2000-char stdout window can't hold 50 entries.
    iso_warm_line = {
        k: round(v, 2)
        for k, v in iso_warm.items()
        if iso.get(k, {}).get("tier") != "fill"
    }
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_warm": warm,
        "warm_total": round(sum(warm.values()), 3),
        "queries_parallel_warm": par,
        "parallel_warm_total": round(sum(par.values()), 3),
        "rechunk_sec": rechunk_sec,
        "scale_ramp_vs": ramp_dir,
        "scale_ramp_warm_ratio": ramp_ratio,
        "scale_ramp_flagged": ramp_flagged,
        "queries_isolated": iso,
        "isolated_warm_total": round(sum(iso_warm.values()), 3),
        "sf": sf_val,
    }
    # Full per-pass numbers go to a FILE; stdout gets ONE compact
    # line.  The driver keeps only the last ~2000 chars of stdout and
    # parses the JSON line it finds there — round 2's line grew past
    # that window (warm + parallel dicts) and the driver recorded
    # ``parsed: null``, losing the round's benchmark entirely.
    with open("BENCH_DETAIL_local.json", "w") as f:
        json.dump(detail, f, indent=1)
    line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "warm_total": detail["warm_total"],
            "parallel_warm_total": detail["parallel_warm_total"],
            # the headline set GROWS round over round (27 in r1/r2, 36
            # in r3); totals are only comparable per query
            "n_queries": len(HEADLINE),
            # the ROUND-COMPARABLE series: fresh-process min-of-3 warm
            "queries_warm_iso": iso_warm_line,
            "scale_ramp_flagged": ramp_flagged,
            "sf": sf_val,
        }
    )
    if len(line) > 1800:  # keep headroom inside the 2000-char window
        # 65+ headliners no longer fit at full precision: keep the
        # per-query dict (the driver's only per-query record) but
        # round to 2 dp and drop separators; if it STILL overflows,
        # keep only the slowest queries — the ones a reader of
        # BENCH_r{N}.json actually needs — and count the rest.
        q2 = {k: round(v, 2) for k, v in timings.items()}
        iso2 = dict(iso_warm_line)
        while True:
            payload = {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": q2,
                "n_queries": len(HEADLINE),
                "warm_total": detail["warm_total"],
                "parallel_warm_total": detail["parallel_warm_total"],
                "queries_warm_iso": iso2,
                "scale_ramp_flagged": ramp_flagged,
                "sf": sf_val,
            }
            if len(q2) < len(timings):
                payload["queries_omitted"] = len(timings) - len(q2)
            if len(iso2) < len(iso_warm_line):
                payload["iso_omitted"] = len(iso_warm_line) - len(iso2)
            line = json.dumps(payload, separators=(",", ":"))
            if len(line) <= 1800:
                break
            if len(q2) > 10:
                q2 = dict(
                    sorted(q2.items(), key=lambda kv: -kv[1])[: len(q2) - 5]
                )
            elif len(iso2) > 10:
                # last resort: the iso dict itself (bounded at
                # ISO_MAX_CHILDREN, but a pathological drift round
                # must still never overflow the driver's window)
                iso2 = dict(
                    sorted(iso2.items(), key=lambda kv: -kv[1])[
                        : len(iso2) - 5
                    ]
                )
            else:
                break
    print(line)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--isolated":
        sys.exit(isolated_main(sys.argv[2]))
    sys.exit(main())
