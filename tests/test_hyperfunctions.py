"""Semantic tests for the TimescaleDB-style hyperfunctions
(operators/hyperfunctions.py) on synthetic fixtures with known gaps
and holding periods — the oracle parity test covers the driver data;
these pin the LOCF rules themselves.
"""

from __future__ import annotations

import datetime

import pytest

from opc_ua_data_pipeline_spark.operators.hyperfunctions import (
    time_bucket_gapfill,
    time_weighted_avg,
)

pytestmark = pytest.mark.usefixtures("spark")


def _tel(spark, rows):
    """rows: (metric, iso_minute_offset_seconds, value_num)"""
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    data = [
        (base + datetime.timedelta(seconds=s), m, v, None, None, i)
        for i, (m, s, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "time timestamp, metric string, value_num double, "
        "value_str string, operator string, event_id long",
    )


def test_time_weighted_avg_holds_values_until_next_sample(spark):
    # value 10 held for 60s, then 20 held for 180s; final sample has
    # no successor -> excluded.  twa = (10*60 + 20*180) / 240 = 17.5
    tel = _tel(
        spark,
        [("m", 0, 10.0), ("m", 60, 20.0), ("m", 240, 99.0)],
    )
    r = {row["metric"]: row for row in time_weighted_avg(tel).collect()}
    assert r["m"]["time_weighted_avg"] == pytest.approx(17.5)
    assert r["m"]["total_weight_micros"] == 240_000_000
    assert r["m"]["n_weighted_samples"] == 2


def test_time_weighted_avg_differs_from_plain_avg_on_bursts(spark):
    # a burst of 3 samples at value 100 within one second, then one
    # sample at 0 held for 10 minutes: plain avg ~75, twa ~= 100 only
    # for ~1s of 600 -> near 0... LOCF weights make the burst almost
    # irrelevant.
    tel = _tel(
        spark,
        [
            ("m", 0, 100.0),
            ("m", 1, 100.0),
            ("m", 2, 100.0),
            ("m", 3, 0.0),
            ("m", 603, 0.0),
        ],
    )
    r = time_weighted_avg(tel).collect()[0]
    assert r["time_weighted_avg"] < 1.0  # burst contributes ~3s/603s


def test_gapfill_locf_fills_missing_minutes(spark):
    # samples in minute 0 and minute 3 -> minutes 1, 2 are gaps
    # carrying minute-0's average
    tel = _tel(
        spark,
        [("m", 10, 4.0), ("m", 20, 6.0), ("m", 185, 9.0)],
    )
    out = {
        row["bucket"].minute: row
        for row in time_bucket_gapfill(tel).collect()
    }
    assert sorted(out) == [0, 1, 2, 3]
    assert out[0]["avg_value"] == pytest.approx(5.0)
    assert not out[0]["is_gap"]
    assert out[1]["avg_value"] == pytest.approx(5.0) and out[1]["is_gap"]
    assert out[2]["avg_value"] == pytest.approx(5.0) and out[2]["is_gap"]
    assert out[3]["avg_value"] == pytest.approx(9.0)
    assert not out[3]["is_gap"]


def test_counter_agg_handles_resets(spark):
    from opc_ua_data_pipeline_spark.operators.hyperfunctions import (
        counter_agg,
    )

    # 0 -> 10 -> 25 -> RESET(3) -> 8: delta = 10 + 15 + 3 + 5 = 33
    tel = _tel(
        spark,
        [("c", 0, 0.0), ("c", 10, 10.0), ("c", 20, 25.0),
         ("c", 30, 3.0), ("c", 40, 8.0)],
    )
    r = counter_agg(tel).collect()[0]
    assert r["counter_delta"] == pytest.approx(33.0)
    assert r["n_resets"] == 1
    assert r["rate_per_sec"] == pytest.approx(33.0 / 40.0)


def test_trend_slope_recovers_known_line(spark):
    from opc_ua_data_pipeline_spark.operators.hyperfunctions import (
        trend_slope,
    )

    # y = 2*t_seconds + 5 exactly
    tel = _tel(
        spark,
        [("m", s, 2.0 * s + 5.0) for s in (0, 30, 60, 90, 120)],
    )
    r = trend_slope(tel).collect()[0]
    assert r["slope_per_sec"] == pytest.approx(2.0, rel=1e-6)
    assert r["intercept"] == pytest.approx(5.0, rel=1e-6)
    assert r["n_samples"] == 5


def test_m4_downsample_picks_first_last_min_max(spark):
    from opc_ua_data_pipeline_spark.operators.hyperfunctions import (
        m4_downsample,
    )

    tel = _tel(
        spark,
        [("m", 1, 5.0), ("m", 10, 1.0), ("m", 20, 9.0), ("m", 50, 3.0)],
    )
    r = m4_downsample(tel).collect()[0]
    assert r["first_value"] == 5.0
    assert r["last_value"] == 3.0
    assert r["min_value"] == 1.0
    assert r["max_value"] == 9.0
    assert r["n_samples"] == 4


def test_uptime_agg_merges_within_tolerance_and_splits_gaps(spark):
    from opc_ua_data_pipeline_spark.operators.hyperfunctions import (
        uptime_agg,
    )

    # pings at 0, 60, 120 (one interval, span 120 s), then a 10-min
    # gap, then 720, 780 (second interval, span 60 s)
    tel = _tel(
        spark,
        [("m", s, 1.0) for s in (0, 60, 120, 720, 780)],
    )
    r = uptime_agg(tel).collect()[0]
    assert r["n_intervals"] == 2
    assert r["uptime_micros"] == (120 + 60) * 1_000_000


def test_state_durations_locf_and_entries(spark):
    from opc_ua_data_pipeline_spark.operators.hyperfunctions import (
        state_durations,
    )

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # (state, offset_sec): A held 0-120, B 120-180, A re-entered at
        # 180 with no successor (contributes no duration)
        ("A", 0),
        ("A", 60),
        ("B", 120),
        ("A", 180),
    ]
    tel = spark.createDataFrame(
        [
            (base + datetime.timedelta(seconds=s), st, None, None, "op-1", i)
            for i, (st, s) in enumerate(rows)
        ],
        "time timestamp, metric string, value_num double, "
        "value_str string, operator string, event_id long",
    )
    out = {r["state"]: r for r in state_durations(tel).collect()}
    assert out["A"]["duration_micros"] == 120 * 1_000_000
    assert out["A"]["n_entries"] == 2
    assert out["A"]["n_samples"] == 3
    assert out["B"]["duration_micros"] == 60 * 1_000_000
    assert out["B"]["n_entries"] == 1


def test_deskew_carries_across_day_boundaries(spark):
    """The (metric, day) two-pass formulations must stitch the lead/
    lag/interval chain across a midnight boundary exactly as a full-
    history window would: last-of-day sees next day's first sample,
    first-of-day sees previous day's last value, and an interval open
    at midnight stays ONE interval."""
    from opc_ua_data_pipeline_spark.operators.hyperfunctions import (
        counter_agg,
        time_weighted_avg,
        uptime_agg,
    )

    # 23:59:00 day 1 -> 00:01:00 and 00:02:00 day 2
    tel = _tel(spark, [("m", 86340, 10.0), ("m", 86460, 20.0), ("m", 86520, 5.0)])
    twa = time_weighted_avg(tel).collect()[0]
    # 10 held 120 s across midnight, 20 held 60 s
    assert twa["time_weighted_avg"] == pytest.approx((10 * 120 + 20 * 60) / 180)
    assert twa["total_weight_micros"] == 180 * 1_000_000

    c = counter_agg(tel).collect()[0]
    assert c["counter_delta"] == pytest.approx(15.0)  # +10 then reset to 5
    assert c["n_resets"] == 1

    u = uptime_agg(tel).collect()[0]
    assert u["n_intervals"] == 1  # 120 s gap at midnight is within tolerance
    assert u["uptime_micros"] == 180 * 1_000_000


def test_gapfill_interpolate_linear(spark):
    from opc_ua_data_pipeline_spark.operators.hyperfunctions import (
        gapfill_interpolate,
    )

    # minute-0 avg 0.0, minute-3 avg 9.0 -> gaps at minutes 1, 2
    # interpolate to 3.0 and 6.0 (exact thirds of the 3-minute span)
    tel = _tel(spark, [("m", 0, 0.0), ("m", 185, 9.0)])
    out = {
        row["bucket"].minute: row for row in gapfill_interpolate(tel).collect()
    }
    assert sorted(out) == [0, 1, 2, 3]
    assert out[0]["value"] == 0.0 and not out[0]["is_gap"]
    assert out[1]["value"] == pytest.approx(3.0) and out[1]["is_gap"]
    assert out[2]["value"] == pytest.approx(6.0) and out[2]["is_gap"]
    assert out[3]["value"] == 9.0 and not out[3]["is_gap"]


def test_candlestick_hour_partials_and_merge(spark):
    from opc_ua_data_pipeline_spark.operators.hyperfunctions import (
        candlestick_agg,
        candlestick_merge,
    )

    # two hours in one day: OHLC per hour, then the merged day candle
    # must take open from hour 0 and close from hour 1
    tel = _tel(
        spark,
        [
            ("m", 0, 5.0),       # h0 open
            ("m", 60, 9.0),      # h0 high
            ("m", 120, 1.0),     # h0 low
            ("m", 180, 4.0),     # h0 close
            ("m", 3600, 7.0),    # h1 open
            ("m", 3660, 2.0),    # h1 low + close
        ],
    )
    hours = {r["bucket"].hour: r for r in candlestick_agg(tel).collect()}
    assert hours[0]["open_value"] == 5.0
    assert hours[0]["high_value"] == 9.0
    assert hours[0]["low_value"] == 1.0
    assert hours[0]["close_value"] == 4.0
    assert hours[0]["n_samples"] == 4
    assert hours[1]["open_value"] == 7.0 and hours[1]["close_value"] == 2.0

    day = candlestick_merge(tel).collect()[0]
    assert day["open_value"] == 5.0    # from hour 0's open
    assert day["close_value"] == 2.0   # from hour 1's close
    assert day["high_value"] == 9.0 and day["low_value"] == 1.0
    assert day["n_samples"] == 6


def test_candlestick_merge_equals_direct_day_candles(spark):
    """The monoid identity on driver data: merging hour partials must
    equal computing the day candle directly from raw rows."""
    import pyspark.sql.functions as F

    from opc_ua_data_pipeline_spark.operators.hyperfunctions import (
        _order_key,
        candlestick_merge,
    )
    from opc_ua_data_pipeline_spark.operators.ingest import telemetry

    tel = telemetry(spark, "/root/testdata/sf0.001")
    merged = candlestick_merge(tel)
    key = _order_key()
    direct = (
        tel.filter(F.col("value_num").isNotNull())
        .groupBy("metric", F.to_date("time").alias("day"))
        .agg(
            F.min_by("value_num", key).alias("open_value"),
            F.max("value_num").alias("high_value"),
            F.min("value_num").alias("low_value"),
            F.max_by("value_num", key).alias("close_value"),
            F.count(F.lit(1)).alias("n_samples"),
        )
    )
    cols = merged.columns
    a = sorted(map(tuple, merged.select(*cols).collect()))
    b = sorted(map(tuple, direct.select(*cols).collect()))
    assert a == b and len(a) > 0


def test_metric_pair_correlation_known_series(spark):
    from opc_ua_data_pipeline_spark.operators.hyperfunctions import (
        metric_pair_correlation,
    )

    # three metrics sampled in the same hours: b = 2a (r=1),
    # c = -a + 100 (r=-1 with a), d constant (zero variance -> NULL)
    rows = []
    for h, x in enumerate([10.0, 20.0, 15.0, 30.0]):
        rows += [
            ("a", h * 3600, x),
            ("b", h * 3600 + 1, 2 * x),
            ("c", h * 3600 + 2, 100 - x),
            ("d", h * 3600 + 3, 7.0),
        ]
    tel = _tel(spark, rows)
    out = {
        (r["metric_a"], r["metric_b"]): r
        for r in metric_pair_correlation(tel).collect()
    }
    assert out[("a", "b")]["corr_value"] == pytest.approx(1.0)
    assert out[("a", "c")]["corr_value"] == pytest.approx(-1.0)
    assert out[("b", "c")]["corr_value"] == pytest.approx(-1.0)
    assert out[("a", "d")]["corr_value"] is None  # zero variance
    assert out[("a", "b")]["n_buckets"] == 4


def test_metric_pair_correlation_inner_alignment(spark):
    from opc_ua_data_pipeline_spark.operators.hyperfunctions import (
        metric_pair_correlation,
    )

    # metric f shares only 2 of a's 4 hours -> n_buckets counts the
    # intersection only
    rows = [("a", h * 3600, v) for h, v in enumerate([1.0, 2.0, 3.0, 4.0])]
    rows += [("f", 0, 5.0), ("f", 3600, 3.0)]
    out = {
        (r["metric_a"], r["metric_b"]): r
        for r in metric_pair_correlation(_tel(spark, rows)).collect()
    }
    assert out[("a", "f")]["n_buckets"] == 2


def test_lttb_small_series_passes_through(spark):
    from opc_ua_data_pipeline_spark.operators.hyperfunctions import (
        lttb_downsample,
    )

    tel = _tel(spark, [("m", s * 60, float(s)) for s in range(5)])
    out = sorted(
        lttb_downsample(tel).collect(), key=lambda r: r["bucket_idx"]
    )
    assert len(out) == 5  # n <= n_out: every point kept
    assert [r["value"] for r in out] == [0.0, 1.0, 2.0, 3.0, 4.0]


def test_lttb_keeps_ends_and_spike(spark):
    from opc_ua_data_pipeline_spark.operators.hyperfunctions import (
        lttb_downsample,
    )

    # 200 flat samples with one huge spike: the spike's bucket must
    # select the spike (largest triangle), and both ends must be kept
    rows = [("m", s * 60, 1.0 if s != 123 else 500.0) for s in range(200)]
    out = lttb_downsample(_tel(spark, rows), n_out=20).collect()
    assert len(out) == 20
    vals = {r["bucket_idx"]: r["value"] for r in out}
    assert vals[0] == 1.0 and vals[19] == 1.0  # first/last samples
    assert 500.0 in vals.values()  # the spike survives downsampling


def _lttb_reference(points, n_out):
    """Strict sequential LTTB (anchor = previously SELECTED point) —
    the textbook algorithm, as a pure-Python oracle for the
    parallel-anchor variant's fidelity test."""
    n = len(points)
    if n <= n_out:
        return points
    b_mid = n_out - 2
    buckets = [[] for _ in range(b_mid)]
    for k in range(1, n - 1):
        buckets[(k - 1) * b_mid // (n - 2)].append(points[k])
    selected = [points[0]]
    for i, bucket in enumerate(buckets):
        if i + 1 < b_mid:
            nxt = buckets[i + 1]
            ax = sum(p[0] for p in nxt) / len(nxt)
            ay = sum(p[1] for p in nxt) / len(nxt)
        else:
            ax, ay = points[-1][0], points[-1][1]
        a = selected[-1]
        best = max(
            bucket,
            key=lambda p: abs(
                (a[0] - ax) * (p[1] - a[1]) - (a[0] - p[0]) * (ay - a[1])
            ),
        )
        selected.append(best)
    selected.append(points[-1])
    return selected


def _interp_error(selected, points):
    """Max abs error of the downsampled polyline vs the raw series."""
    import bisect

    sel = sorted(selected)
    xs = [p[0] for p in sel]
    worst = 0.0
    for x, y in points:
        i = min(max(bisect.bisect_right(xs, x) - 1, 0), len(sel) - 2)
        (x0, y0), (x1, y1) = sel[i], sel[i + 1]
        yy = y0 + (y1 - y0) * ((x - x0) / (x1 - x0)) if x1 != x0 else y0
        worst = max(worst, abs(yy - y))
    return worst


@pytest.mark.parametrize("kind", ["smooth", "noisy"])
def test_lttb_parallel_reconstruction_tracks_strict(spark, kind):
    """The parallel-anchor variant selects DIFFERENT points than the
    sequential algorithm (anchor-sensitive argmaxes), but must match
    its reconstruction fidelity — the property a downsample exists
    for.  Bound: max interpolation error <= strict's x1.5."""
    import math

    from opc_ua_data_pipeline_spark.operators.hyperfunctions import (
        lttb_downsample,
    )

    def val(s):
        if kind == "smooth":
            return math.sin(s / 40.0) * 10 + s * 0.01
        # deterministic LCG noise
        return ((s * 1103515245 + 12345) % 2**31) / 2**31 * 100

    rows = [("m", s * 60, val(s)) for s in range(2000)]
    tel = _tel(spark, rows)
    got = lttb_downsample(tel, n_out=50).collect()
    pts = [(float(s * 60) * 1e6, val(s)) for s in range(2000)]
    mine = [(r["time"].timestamp() * 1e6, r["value"]) for r in got]
    # strip the fixture's epoch offset consistently
    t0 = min(p[0] for p in mine) - 0.0
    mine = [(p[0] - t0, p[1]) for p in mine]
    strict = _lttb_reference(pts, 50)
    assert len(mine) == 50
    e_mine = _interp_error(mine, pts)
    e_strict = _interp_error(strict, pts)
    assert e_mine <= e_strict * 1.5, (kind, e_mine, e_strict)
