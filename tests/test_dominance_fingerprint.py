"""Round-5 extension operators: Pareto-front skyline semantics vs a
brute-force dominance check, table-fingerprint invariants
(order-independence, mutation sensitivity), seasonal-anomaly profile
shape, and edit-distance verification semantics."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.operators.anomaly import seasonal_profile
from opc_ua_data_pipeline_spark.operators.dedup import (
    editdist_near_dup_pairs,
)
from opc_ua_data_pipeline_spark.operators.dominance import pareto_front
from opc_ua_data_pipeline_spark.operators.dq import table_fingerprint
from opc_ua_data_pipeline_spark.operators.ingest import telemetry
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _ts(i):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i)


def test_pareto_front_matches_bruteforce(spark):
    events = load_table(spark, SF_DIR, "events")
    got = {
        (r["key"], r["event_id"])
        for r in pareto_front(events).collect()
    }
    pts = [
        (r["event_type"], r["event_id"], r["ts"], r["value"])
        for r in events.filter(F.col("value").isNotNull()).collect()
    ]
    expect = set()
    for k, eid, ts, v in pts:
        dominated = any(
            k2 == k
            and ts2 >= ts
            and v2 >= v
            and (ts2 > ts or v2 > v)
            for k2, _, ts2, v2 in pts
        )
        if not dominated:
            expect.add((k, eid))
    assert got == expect and got


def test_pareto_front_keeps_tied_duplicates(spark):
    # two identical (ts, value) points: neither dominates -> both stay
    rows = [
        (1, _ts(0), 1, "k", 5.0, "{}"),
        (2, _ts(0), 1, "k", 5.0, "{}"),
        (3, _ts(0), 1, "k", 4.0, "{}"),  # same-ts, lower -> dominated
        (4, _ts(1), 1, "k", 5.0, "{}"),  # later, equal -> dominates 1,2
    ]
    got = sorted(
        r["event_id"] for r in pareto_front(_events(spark, rows)).collect()
    )
    assert got == [4]
    got2 = sorted(
        r["event_id"]
        for r in pareto_front(_events(spark, rows[:3])).collect()
    )
    assert got2 == [1, 2]


def test_fingerprint_order_independent_and_mutation_sensitive(spark):
    events = load_table(spark, SF_DIR, "events")
    base = {r["day"]: r for r in table_fingerprint(events).collect()}
    # arbitrary reorder/repartition: identical fingerprints
    shuffled = table_fingerprint(
        events.repartition(7, "user_id").sortWithinPartitions("value")
    )
    for r in shuffled.collect():
        b = base[r["day"]]
        assert (r["n_rows"], r["hash_sum"], r["hash_xor"]) == (
            b["n_rows"],
            b["hash_sum"],
            b["hash_xor"],
        )
    # one mutated value flips that day's fingerprint only
    mutated = events.withColumn(
        "value",
        F.when(F.col("event_id") == 0, F.col("value") + 1).otherwise(
            F.col("value")
        ),
    )
    day0 = [r for r in events.filter(F.col("event_id") == 0).collect()]
    assert day0
    changed_day = day0[0]["ts"].date()
    for r in table_fingerprint(mutated).collect():
        b = base[r["day"]]
        same = (r["hash_sum"], r["hash_xor"]) == (
            b["hash_sum"],
            b["hash_xor"],
        )
        assert same == (r["day"] != changed_day)


def test_seasonal_profile_is_broadcast_sized(spark):
    prof = seasonal_profile(telemetry(spark, SF_DIR))
    rows = prof.collect()
    keys = {(r["metric"], r["hod"]) for r in rows}
    assert len(keys) == len(rows)  # (metric, hod) is the grain
    assert all(0 <= r["hod"] <= 23 for r in rows)


def test_editdist_pairs_are_true_near_dups(spark):
    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    text = {r["doc_id"]: r["text"] for r in docs.collect()}
    out = editdist_near_dup_pairs(docs).collect()
    assert out
    for r in out:
        a, b = text[r["doc_a"]], text[r["doc_b"]]
        big = max(len(a), len(b))
        assert r["edit_sim"] >= 0.8
        # spot-invariant: edit distance is bounded by length difference
        assert r["edit_dist"] >= abs(len(a) - len(b))
        assert r["edit_dist"] <= big


# --- property: skyline ≡ brute force on adversarial tie-heavy frames ---

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def _skyline_rows(draw):
    # few distinct timestamps and values ON PURPOSE: ties in both
    # dimensions and multi-day spans are where dominance edge cases
    # (same-instant peers, equal duplicates, cross-day carry) live
    n = draw(st.integers(3, 24))
    rows = []
    for eid in range(n):
        day = draw(st.integers(0, 2))
        hour = draw(st.integers(0, 3))
        val = float(draw(st.integers(1, 4)))
        rows.append(
            (
                eid,
                datetime.datetime(2024, 1, 1 + day, hour),
                1,
                draw(st.sampled_from(["k1", "k2"])),
                val,
                "{}",
            )
        )
    return rows


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=_skyline_rows())
def test_pareto_front_property(spark, rows):
    got = {
        (r["key"], r["event_id"])
        for r in pareto_front(_events(spark, rows)).collect()
    }
    expect = set()
    for eid, ts, _, k, v, _p in rows:
        dominated = any(
            k2 == k
            and ts2 >= ts
            and v2 >= v
            and (ts2 > ts or v2 > v)
            for eid2, ts2, _, k2, v2, _q in rows
            if eid2 != eid
        )
        if not dominated:
            expect.add((k, eid))
    assert got == expect
