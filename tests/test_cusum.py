"""CUSUM change-point operator: closed prefix-min form ≡ the textbook
max(0, s+d) recursion, the (key, day) de-skew ≡ the single-window
spelling bit-for-bit, and drift actually trips the alarm."""

from __future__ import annotations

import datetime

from pyspark.sql import Window
from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.operators.anomaly import (
    CUSUM_SLACK_DIV,
    cusum_changepoints,
    cusum_scores,
)
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def _events(spark, values, key="k"):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(hours=6 * i), 1, key, float(v), "{}")
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_closed_form_equals_textbook_recursion(spark):
    vals = [50, 52, 47, 60, 61, 62, 63, 64, 40, 39, 38, 37, 55, 50]
    out = {
        r["event_id"]: r
        for r in cusum_scores(_events(spark, vals)).collect()
    }
    target = sum(int(v * 1_000_000) for v in vals) // len(vals)
    slack = target // CUSUM_SLACK_DIV
    s_hi = s_lo = 0
    for i, v in enumerate(vals):
        x = int(v * 1_000_000)
        s_hi = max(0, s_hi + (x - target - slack))
        s_lo = max(0, s_lo + (target - slack - x))
        assert out[i]["cusum_high"] == s_hi, (i, out[i]["cusum_high"], s_hi)
        assert out[i]["cusum_low"] == s_lo, (i, out[i]["cusum_low"], s_lo)


def test_deskew_matches_single_window(spark):
    """The (key, day) two-pass must be bit-identical to a bare
    full-history window on the real corpus."""
    ev = load_table(spark, SF_DIR, "events")
    two_pass = cusum_scores(ev)

    x = ev.filter(F.col("value").isNotNull()).select(
        F.col("event_type").alias("key"),
        "ts",
        "event_id",
        F.expr(
            "CAST(CAST(value AS DECIMAL(28,6)) * 1000000 AS BIGINT)"
        ).alias("x"),
    )
    target = x.groupBy("key").agg(
        F.expr("SUM(x) DIV COUNT(*)").alias("target")
    )
    s = x.join(F.broadcast(target), "key").withColumn(
        "slack", F.expr(f"target DIV {CUSUM_SLACK_DIV}")
    )
    w = (
        Window.partitionBy("key")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d_hi = F.col("x") - F.col("target") - F.col("slack")
    d_lo = F.col("target") - F.col("slack") - F.col("x")
    s = (
        s.withColumn("p_hi", F.sum(d_hi).over(w))
        .withColumn("p_lo", F.sum(d_lo).over(w))
    )
    s = s.withColumn("m_hi", F.min("p_hi").over(w)).withColumn(
        "m_lo", F.min("p_lo").over(w)
    )
    direct = s.select(
        "key",
        "event_id",
        (F.col("p_hi") - F.least(F.lit(0), F.col("m_hi"))).alias("cusum_high"),
        (F.col("p_lo") - F.least(F.lit(0), F.col("m_lo"))).alias("cusum_low"),
    )
    a = {
        (r["key"], r["event_id"]): (r["cusum_high"], r["cusum_low"])
        for r in two_pass.collect()
    }
    b = {
        (r["key"], r["event_id"]): (r["cusum_high"], r["cusum_low"])
        for r in direct.collect()
    }
    assert a == b


def test_mean_shift_trips_both_sides_around_the_step(spark):
    """Flat at 50 then a persistent step to 70.  The target is the
    series' own mean (60), so the PRE-step regime drifts the low side
    and the POST-step regime drifts the high side: the low alarm must
    fire before the step, the high alarm only after it — the step
    timestamp separates the two alarm onsets."""
    step_at = datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=6 * 40)
    vals = [50.0] * 40 + [70.0] * 40
    out = cusum_changepoints(_events(spark, vals), h_mult=2).collect()[0]
    assert out["n_high_alarms"] > 0 and out["n_low_alarms"] > 0
    assert out["first_low_ts"] < step_at <= out["first_high_ts"]


def test_small_fluctuations_inside_slack_never_alarm(spark):
    vals = [50.0, 51.0, 49.0, 50.5, 49.5] * 20
    out = cusum_changepoints(_events(spark, vals)).collect()[0]
    assert out["n_high_alarms"] == 0 and out["n_low_alarms"] == 0
