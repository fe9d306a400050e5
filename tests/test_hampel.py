"""Hampel rolling-median despike: spike flagged and repaired by its
neighborhood median, smooth series untouched, MAD=0 degenerate frames
behave (any deviation flags, exact zeros don't)."""

from __future__ import annotations

import datetime

from opc_ua_data_pipeline_spark.operators.anomaly import hampel_despike

SF_DIR = "/root/testdata/sf0.01"


def _events(spark, values, key="k"):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=i), 1, key, float(v), "{}")
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_single_spike_repaired_by_neighborhood_median(spark):
    vals = [50, 51, 49, 500, 50, 52, 48, 51, 50]
    out = {r["event_id"]: r for r in hampel_despike(_events(spark, vals)).collect()}
    assert out[3]["is_spike"]
    # repaired by the frame median (a ~50 value), not the spike
    assert abs(out[3]["repaired"] - 50) < 3
    # neighbors are NOT flagged (median frames shrug off the spike)
    for i in [0, 1, 2, 4, 5, 6, 7, 8]:
        assert not out[i]["is_spike"], i
        assert out[i]["repaired"] == out[i]["value"]


def test_noisy_but_spikeless_series_untouched(spark):
    vals = [50, 53, 47, 52, 49, 54, 46, 51, 50, 48]
    out = hampel_despike(_events(spark, vals)).collect()
    assert all(not r["is_spike"] for r in out)
    assert all(r["repaired"] == r["value"] for r in out)


def test_constant_series_mad_zero_no_flags(spark):
    out = hampel_despike(_events(spark, [42.0] * 10)).collect()
    assert all(r["roll_mad"] == 0.0 for r in out)
    assert all(not r["is_spike"] for r in out)


def test_mad_zero_with_outlier_flags_the_outlier(spark):
    # frame median/MAD both 42 / 0: the single deviating value trips
    # the  dev > 0  comparison, the constants never do
    vals = [42.0] * 4 + [99.0] + [42.0] * 4
    out = {r["event_id"]: r for r in hampel_despike(_events(spark, vals)).collect()}
    assert out[4]["is_spike"] and out[4]["repaired"] == 42.0
    assert sum(r["is_spike"] for r in out.values()) == 1


def test_edge_frames_have_fewer_neighbors_but_still_work(spark):
    vals = [500, 50, 51, 49, 50, 52, 48]
    out = {r["event_id"]: r for r in hampel_despike(_events(spark, vals)).collect()}
    # first row's frame is [500, 50, 51, 49] -> median ~50.5; flagged
    assert out[0]["is_spike"]
