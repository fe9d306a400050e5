"""Benford first-digit check: a log-uniform (multi-scale) series
conforms, a narrow-band series does not, and absent digits still
count their full expected share."""

from __future__ import annotations

import datetime

from opc_ua_data_pipeline_spark.operators.dq import (
    BENFORD_P,
    benford_digit_check,
)

BASE = datetime.datetime(2024, 1, 1)


def _events(spark, values, key="k"):
    rows = [
        (i, BASE + datetime.timedelta(minutes=i), 1, key, float(v), "{}")
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_log_uniform_series_conforms(spark):
    # exact Benford frequencies by construction: digit d appears
    # round(1000 * log10(1+1/d)) times at magnitudes spread over 3 decades
    vals = []
    for d, p in enumerate(BENFORD_P, start=1):
        n = round(1000 * p)
        vals += [d * 10 ** (i % 3) + 0.5 for i in range(n)]
    out = benford_digit_check(_events(spark, vals)).collect()[0]
    assert out["benford_ok"], out
    assert out["max_abs_dev"] < 0.01


def test_narrow_band_series_fails(spark):
    # every value starts with digit 5: max deviation = 1 - p5 ~ 0.94
    out = benford_digit_check(
        _events(spark, [50 + i * 0.01 for i in range(500)])
    ).collect()[0]
    assert not out["benford_ok"]
    assert out["max_abs_dev"] > 0.5


def test_absent_digits_count_their_expected_share(spark):
    # only digits 1 and 2 appear; digit-3's full share (0.125) must
    # still register in the deviation even though it never occurs
    out = benford_digit_check(
        _events(spark, [1.0] * 30 + [2.0] * 18)
    ).collect()[0]
    assert out["max_abs_dev"] >= BENFORD_P[2] - 1e-12
