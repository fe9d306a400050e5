"""Property-based tests (hypothesis) — SURVEY.md §5.3: operator
semantics checked against straight-line Python mirrors of the
reference's logic, over generated inputs, not just fixtures."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.operators.alarms import deviation_alarms
from opc_ua_data_pipeline_spark.operators.ingest import type_dispatch
from opc_ua_data_pipeline_spark.operators.relational import asof_join
from opc_ua_data_pipeline_spark.schemas import OPCUA_DATA_SCHEMA

T0 = datetime(2024, 1, 1)

_slow = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


class PyDeviationTracker:
    """Line-for-line mirror of opcua_server/main.py:14-40: 3-deep
    buffer, target==0 guard, rule-1 (>10%) checked before rule-2
    (3 consecutive >2%)."""

    def __init__(self):
        self.buffer: list[float] = []

    def update(self, target: float, actual: float):
        if target == 0:
            return None
        pct = (actual - target) / target * 100
        self.buffer.append(pct)
        if len(self.buffer) > 3:
            self.buffer.pop(0)
        if abs(pct) > 10:
            return ("rule1", pct, list(self.buffer))
        if len(self.buffer) == 3 and all(abs(d) > 2 for d in self.buffer):
            return ("rule2", pct, list(self.buffer))
        return None


@given(
    st.lists(
        st.tuples(
            st.sampled_from([0.0, 50.0, 100.0]),
            st.floats(min_value=0, max_value=200, allow_nan=False),
        ),
        min_size=1,
        max_size=40,
    )
)
@_slow
def test_deviation_matches_python_reference(spark, series):
    rows = [
        (T0 + timedelta(seconds=i), "M", float(actual), None, "op")
        for i, (_, actual) in enumerate(series)
    ]
    df = spark.createDataFrame(rows, OPCUA_DATA_SCHEMA).withColumn(
        "event_id", F.monotonically_increasing_id()
    )
    targets = spark.createDataFrame(
        [(T0 + timedelta(seconds=i), float(t)) for i, (t, _) in enumerate(series)],
        "t_time timestamp, target double",
    )
    joined = df.join(targets, df.time == targets.t_time).select(
        "metric", "time", "event_id", "value_num", "target"
    )
    got = {
        r["time"]: r["alarm"]
        for r in deviation_alarms(
            joined, ["metric"], ["time"], target=F.col("target")
        ).collect()
    }

    tracker = PyDeviationTracker()
    want = {}
    for i, (target, actual) in enumerate(series):
        hit = tracker.update(target, actual)
        if hit:
            rule, pct, buf = hit
            t = T0 + timedelta(seconds=i)
            if rule == "rule1":
                want[t] = f"M: Abweichung {pct:.2f}% (>10%)"
            else:
                tr = ", ".join(f"{v:.2f}%" for v in buf)
                want[t] = f"M: 3x in Folge Abweichung >2% ({tr})"
    assert got == want


@given(
    st.lists(
        st.one_of(
            st.floats(allow_nan=False, allow_infinity=False, width=32).map(
                lambda x: str(x)
            ),
            st.sampled_from(["true", "false", "True", "False"]),
            st.text(
                alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
                min_size=1,
                max_size=8,
            ),
            st.none(),
        ),
        min_size=1,
        max_size=30,
    )
)
@_slow
def test_type_dispatch_invariants(spark, values):
    """kafka_db_agent/main.py:82-89 semantics: at most one of
    value_num/value_str per row; numeric strings parse losslessly;
    bool reprs normalize to Python capitalization."""
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id long, raw_value string"
    )
    out = {r["id"]: r for r in type_dispatch(df).collect()}
    for i, v in enumerate(values):
        r = out[i]
        assert not (r["value_num"] is not None and r["value_str"] is not None)
        if v in ("true", "True"):
            assert r["value_str"] == "True"
        elif v in ("false", "False"):
            assert r["value_str"] == "False"
        elif v is None:
            assert r["value_num"] is None and r["value_str"] is None
        else:
            try:
                f = float(v)
                # Python float() also accepts non-ASCII Unicode digits
                # (e.g. '٠', ARABIC-INDIC ZERO), which the reference's
                # wire format can never carry — its producer
                # serializes str(float), always ASCII — and which
                # Spark's double cast (correctly) rejects.  The model
                # therefore counts only ASCII-spelled numbers.
                is_num = (
                    v.isascii()
                    and not math.isnan(f)
                    and not math.isinf(f)
                )
            except ValueError:
                is_num = False
            if is_num:
                assert r["value_num"] == pytest.approx(float(v), rel=1e-6)
            else:
                assert r["value_str"] == v


@given(
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=30),
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=30),
)
@_slow
def test_asof_join_matches_pandas_merge_asof(spark, left_offsets, right_offsets):
    left = spark.createDataFrame(
        [
            (1, T0 + timedelta(seconds=o), i, float(i))
            for i, o in enumerate(sorted(set(left_offsets)))
        ],
        "user_id long, ts timestamp, event_id long, value double",
    )
    right = spark.createDataFrame(
        [
            (1, T0 + timedelta(seconds=o), float(o))
            for o in sorted(set(right_offsets))
        ],
        "user_id long, ts timestamp, rv double",
    )
    got = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(left, right, "user_id", "ts", "rv").collect()
    }
    lpd = left.toPandas().sort_values("ts")
    rpd = right.toPandas().sort_values("ts")
    merged = pd.merge_asof(lpd, rpd, on="ts", by="user_id", direction="backward")
    for _, row in merged.iterrows():
        want = None if pd.isna(row["rv"]) else row["rv"]
        assert got[row["event_id"]] == want
