"""Property: the (key, day) two-pass de-skewed hyperfunctions are
EXTENSIONALLY EQUAL to their naive single-window forms on arbitrary
multi-day inputs — the boundary-carry logic (next day's first sample,
previous day's last value, per-day flag offsets) must reproduce the
full-history lead/lag/cumsum bit-for-bit, including timestamps that
land exactly on midnight, duplicate timestamps, and days with a single
sample."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.operators.hyperfunctions import (
    counter_agg,
    state_durations,
    time_weighted_avg,
    uptime_agg,
)

_BASE = datetime.datetime(2024, 1, 1)


@st.composite
def telemetry_rows(draw):
    """Up to 3 metrics x up to 25 samples spread over ~4 days,
    including exact-midnight offsets and duplicate timestamps."""
    n = draw(st.integers(min_value=2, max_value=25))
    rows = []
    for i in range(n):
        metric = draw(st.sampled_from(["m0", "m1", "m2"]))
        # seconds offset over 4 days; multiples of large steps make
        # exact midnight boundaries and >tolerance gaps likely
        off = draw(
            st.integers(min_value=0, max_value=4 * 86400)
        )
        if draw(st.booleans()):
            off = (off // 43200) * 43200  # snap to half-day boundaries
        value = draw(
            st.floats(
                min_value=-1e6,
                max_value=1e6,
                allow_nan=False,
                allow_infinity=False,
            )
        )
        operator = draw(st.sampled_from([None, "op-0", "op-1"]))
        rows.append(
            (
                _BASE + datetime.timedelta(seconds=off),
                metric,
                value,
                None,
                operator,
                i,
            )
        )
    return rows


def _df(spark, rows):
    return spark.createDataFrame(
        rows,
        "time timestamp, metric string, value_num double, "
        "value_str string, operator string, event_id long",
    )


def _naive_twa(tel):
    w = Window.partitionBy("metric").orderBy("time", "event_id")
    dt = (
        F.unix_micros(F.lead("time").over(w)) - F.unix_micros(F.col("time"))
    ).alias("dt")
    samples = (
        tel.filter(F.col("value_num").isNotNull())
        .select("metric", "time", "event_id", "value_num")
        .withColumn("dt", dt)
        .filter(F.col("dt").isNotNull())
    )
    return samples.groupBy("metric").agg(
        F.try_divide(
            F.sum(
                (F.col("value_num") * F.col("dt").cast("double")).cast(
                    "decimal(38,6)"
                )
            ).cast("double"),
            F.sum("dt").cast("double"),
        ).alias("time_weighted_avg"),
        F.sum("dt").alias("total_weight_micros"),
        F.count(F.lit(1)).alias("n_weighted_samples"),
    )


def _naive_counter(tel):
    w = Window.partitionBy("metric").orderBy("time", "event_id")
    samples = (
        tel.filter(F.col("value_num").isNotNull())
        .select("metric", "time", "event_id", "value_num")
        .withColumn("prev", F.lag("value_num").over(w))
    )
    inc = (
        F.when(F.col("prev").isNull(), F.lit(None).cast("double"))
        .when(
            F.col("value_num") >= F.col("prev"),
            F.col("value_num") - F.col("prev"),
        )
        .otherwise(F.col("value_num"))
    )
    return samples.groupBy("metric").agg(
        F.sum(inc.cast("decimal(38,6)")).cast("double").alias("counter_delta"),
        F.count(F.when(F.col("value_num") < F.col("prev"), 1)).alias(
            "n_resets"
        ),
    )


def _naive_uptime(tel, tolerance_sec=120):
    w = Window.partitionBy("metric").orderBy("time", "event_id")
    gap = F.unix_micros(F.col("time")) - F.unix_micros(F.lag("time").over(w))
    flag = F.when(
        gap.isNull() | (gap > tolerance_sec * 1_000_000), 1
    ).otherwise(0)
    flagged = tel.select("metric", "time", "event_id").withColumn(
        "interval_id",
        F.sum(flag).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    intervals = flagged.groupBy("metric", "interval_id").agg(
        (F.unix_micros(F.max("time")) - F.unix_micros(F.min("time"))).alias(
            "span"
        )
    )
    return intervals.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("span").cast("bigint").alias("uptime_micros"),
    )


def _naive_state_durations(tel):
    w = Window.partitionBy("operator").orderBy("time", "event_id")
    rows = tel.filter(F.col("operator").isNotNull()).select(
        "operator", "metric", "time", "event_id"
    )
    dt = F.unix_micros(F.lead("time").over(w)) - F.unix_micros(
        F.col("time")
    )
    prev_state = F.lag("metric").over(w)
    entered = F.when(
        prev_state.isNull() | (prev_state != F.col("metric")), 1
    ).otherwise(0)
    return (
        rows.select(
            "operator",
            F.col("metric").alias("state"),
            dt.alias("dt"),
            entered.alias("entered"),
        )
        .groupBy("operator", "state")
        .agg(
            F.coalesce(F.sum("dt"), F.lit(0))
            .cast("bigint")
            .alias("duration_micros"),
            F.sum("entered").cast("bigint").alias("n_entries"),
            F.count(F.lit(1)).alias("n_samples"),
        )
    )


def _rows(df, cols):
    return sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=telemetry_rows())
def test_deskewed_equals_naive(spark, rows):
    tel = _df(spark, rows)
    assert _rows(
        time_weighted_avg(tel),
        ["metric", "time_weighted_avg", "total_weight_micros",
         "n_weighted_samples"],
    ) == _rows(
        _naive_twa(tel),
        ["metric", "time_weighted_avg", "total_weight_micros",
         "n_weighted_samples"],
    )
    assert _rows(
        counter_agg(tel), ["metric", "counter_delta", "n_resets"]
    ) == _rows(_naive_counter(tel), ["metric", "counter_delta", "n_resets"])
    assert _rows(
        uptime_agg(tel), ["metric", "n_intervals", "uptime_micros"]
    ) == _rows(
        _naive_uptime(tel), ["metric", "n_intervals", "uptime_micros"]
    )
    sd_cols = ["operator", "state", "duration_micros", "n_entries",
               "n_samples"]
    assert _rows(state_durations(tel), sd_cols) == _rows(
        _naive_state_durations(tel), sd_cols
    )
