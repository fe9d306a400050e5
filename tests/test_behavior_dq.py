"""Behavioral entropy + operator error z-test semantics."""

from __future__ import annotations

import datetime
import math

from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.operators.ingest import telemetry_transform
from opc_ua_data_pipeline_spark.operators.journeys import (
    EVENT_TYPES,
    behavioral_entropy,
)
from opc_ua_data_pipeline_spark.operators.dq import operator_error_ztest
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _ts(i):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i)


def test_entropy_bounds_and_extremes(spark):
    out = behavioral_entropy(load_table(spark, SF_DIR, "events")).collect()
    assert out
    hmax = math.log(len(EVENT_TYPES) + 1)  # +1: the n_other class
    for r in out:
        assert 0.0 <= r["entropy_nats"] <= hmax + 1e-9
        assert r["n_other"] == 0  # closed fixture domain holds
    # scripted account: one event type only -> zero entropy
    rows = [(i, _ts(i), 1, "click", 1.0, "{}") for i in range(10)]
    one = behavioral_entropy(_events(spark, rows)).collect()[0]
    assert one["entropy_nats"] == 0.0
    # perfectly mixed over the 5 named types -> ln(5)
    rows = [
        (i, _ts(i), 2, EVENT_TYPES[i % 5], 1.0, "{}") for i in range(10)
    ]
    mixed = behavioral_entropy(_events(spark, rows)).collect()[0]
    assert abs(mixed["entropy_nats"] - math.log(5)) < 1e-6


def test_ztest_flags_engineered_outlier(spark):
    # operator column is user_id-derived in telemetry_transform:
    # user_id % 7 != 0 -> 'op-' || user_id % 3.  users 1,2,3 -> three
    # operators; give op-1 (user 1) a far higher error share.
    rows = []
    eid = 0
    for i in range(300):
        rows.append((eid, _ts(eid), 1, "error" if i % 2 == 0 else "click",
                     1.0, '{"k": 1}'))
        eid += 1
    for user in (2, 3):
        for i in range(300):
            rows.append((eid, _ts(eid), user,
                         "error" if i % 50 == 0 else "click", 1.0,
                         '{"k": 1}'))
            eid += 1
    out = {
        r["operator"]: r
        for r in operator_error_ztest(
            telemetry_transform(_events(spark, rows))
        ).collect()
    }
    assert out["op-1"]["significant"] and out["op-1"]["z_vs_rest"] > 0
    # the clean operators sit significantly BELOW a rest that includes
    # op-1's 50% error share — negative z, also flagged
    assert out["op-2"]["z_vs_rest"] < 0
    # counts are exact
    assert out["op-1"]["n_errors"] == 150


def test_lead_lag_detects_engineered_shift(spark):
    from opc_ua_data_pipeline_spark.operators.hyperfunctions import (
        lead_lag_correlation,
    )

    # metric 'b' is metric 'a' delayed by exactly 2 hours: the lag
    # profile must peak (r = 1) at lag = +2 ('a' leads 'b').
    base = datetime.datetime(2024, 1, 1)
    vals = [5.0, 9.0, 2.0, 7.0, 4.0, 8.0, 1.0, 6.0, 3.0, 10.0,
            5.5, 8.5, 2.5, 7.5, 4.5, 9.5, 1.5, 6.5, 3.5, 0.5]
    rows = []
    eid = 0
    for i, v in enumerate(vals):
        rows.append((eid, base + datetime.timedelta(hours=i), 1, "a", v, "{}"))
        eid += 1
        rows.append(
            (eid, base + datetime.timedelta(hours=i + 2), 1, "b", v, "{}")
        )
        eid += 1
    tel = spark.createDataFrame(
        [(r[1], r[3], r[4], None, None, r[0]) for r in rows],
        "time timestamp, metric string, value_num double, "
        "value_str string, operator string, event_id long",
    )
    out = {
        r["lag"]: r["corr_value"]
        for r in lead_lag_correlation(tel).collect()
    }
    assert abs(out[2] - 1.0) < 1e-9
    assert all(abs(v) < 0.9 for lag, v in out.items() if lag != 2)
