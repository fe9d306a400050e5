"""distwindow: the de-skew decompositions must be bit-identical to
the naive single-window forms, and the de-skewed operators' physical
plans must never partition a fact-ordered window on a bare
low-cardinality key (the 100 TB single-task funnel)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from opc_ua_data_pipeline_spark.operators.distwindow import (
    bounded_frame_apply,
    keyed_prefix_last,
    keyed_running_totals,
    ntile_expr,
)

SF = "/root/testdata/sf0.01"


def _toy(spark, n=257, keys=3):
    # deterministic, includes a NULL key group and NULL values
    rows = []
    for i in range(n):
        k = None if i % 29 == 7 else f"k{i % keys}"
        v = None if i % 13 == 5 else float((i * 37) % 101)
        rows.append(Row(id=i, key=k, ord=(i * 17) % n, value=v))
    return spark.createDataFrame(rows)


def test_bounded_frame_matches_bare_window(spark):
    """Tiny buckets force a carry at every edge; trailing and centered
    frames must equal the bare-Window spelling row for row — including
    NULL key groups and NULL values."""
    df = _toy(spark)
    for lo, hi in [(-5, -1), (-3, 3), (0, 4)]:
        got = bounded_frame_apply(
            df,
            key_cols=["key"],
            order_cols=["ord", "id"],
            lo=lo,
            hi=hi,
            exprs={
                "n": lambda w: F.count(F.lit(1)).over(w),
                "s": lambda w: F.sum(
                    F.col("value").cast("decimal(28,6)")
                ).over(w),
                "arr": lambda w: F.array_sort(
                    F.collect_list("value").over(w)
                ),
            },
            bucket_rows=8,  # far below the frame-count scale: max carries
            range_parts=7,
        )
        w = (
            Window.partitionBy("key")
            .orderBy("ord", "id")
            .rowsBetween(lo, hi)
        )
        want = df.select(
            "*",
            F.count(F.lit(1)).over(w).alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)")).over(w).alias("s"),
            F.array_sort(F.collect_list("value").over(w)).alias("arr"),
        )
        assert sorted(map(str, got.collect())) == sorted(
            map(str, want.collect())
        ), (lo, hi)


def test_bounded_frame_rejects_undersized_bucket(spark):
    df = _toy(spark, n=16)
    with pytest.raises(ValueError):
        bounded_frame_apply(
            df, ["key"], ["ord", "id"], -9, 0, {}, bucket_rows=8
        )


def test_keyed_running_totals_matches_bare_window(spark):
    df = _toy(spark).withColumn(
        "w", F.coalesce(F.col("value").cast("long"), F.lit(0))
    )
    got = keyed_running_totals(
        df,
        key_cols=["key"],
        order_by=[("ord", False), "id"],
        weights={"cum_w": "w"},
        range_parts=7,
    )
    w_ord = Window.partitionBy("key").orderBy(
        F.col("ord").desc(), F.col("id")
    )
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    want = df.select(
        "*",
        F.row_number().over(w_ord).alias("_rank"),
        F.count(F.lit(1))
        .over(Window.partitionBy("key"))
        .alias("_n"),
        F.sum("w").over(w_run).alias("cum_w"),
    )
    cols = ["id", "key", "_rank", "_n", "cum_w"]
    assert sorted(map(str, got.select(*cols).collect())) == sorted(
        map(str, want.select(*cols).collect())
    )


def test_keyed_prefix_last_matches_bare_window(spark):
    df = _toy(spark).withColumn(
        "marker", F.when(F.col("id") % 11 == 0, F.concat(F.lit("m"), "id"))
    )
    got = keyed_prefix_last(
        df,
        key_cols=["key"],
        order_cols=["ord", "id"],
        value_col="marker",
        out_col="latched",
        range_parts=7,
    )
    w = (
        Window.partitionBy("key")
        .orderBy("ord", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = df.withColumn(
        "latched", F.last("marker", ignorenulls=True).over(w)
    )
    cols = ["id", "key", "latched"]
    assert sorted(map(str, got.select(*cols).collect())) == sorted(
        map(str, want.select(*cols).collect())
    )


def test_ntile_expr_matches_builtin(spark):
    df = _toy(spark)
    for k in (1, 2, 4, 7, 500):  # 500 > any group size: q=0 guard
        w = Window.partitionBy("key").orderBy("ord", "id")
        want = df.select(
            "id", F.ntile(k).over(w).alias("stage")
        )
        ranked = keyed_running_totals(
            df, ["key"], ["ord", "id"], range_parts=7
        )
        got = ranked.select(
            "id",
            ntile_expr(F.col("_rank"), F.col("_n"), k).alias("stage"),
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), k


# ---------------------------------------------------------------------------
# Plan locks: no fact-ordered window on a bare low-cardinality key
# ---------------------------------------------------------------------------

_LOW_CARD = {"event_type", "metric", "operator", "source", "key"}
_FACT_ORDER = {
    "ts",
    "time",
    "event_id",
    "doc_id",
    "quality_score",
    "mean_logprob",
    "value",
    "value_num",
}
_DESKEW_MARKS = {"_dw_pid", "_dw_bkt", "_day", "user_id"}

DESKEWED = [
    "zscore_anomalies",
    "rolling_zscore",
    "hampel_despike",
    "deviation_alarms",
    "edge_alarms",
    "latched_error",
    "source_budget_trim",
    "curriculum_stages",
]


def _window_specs(df) -> list[tuple[set[str], set[str]]]:
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    out = []
    for spec in re.findall(r"windowspecdefinition\(([^)]*)", plan):
        parts = [a.strip() for a in spec.split(",")]
        part_cols, order_cols = set(), set()
        for a in parts:
            name = a.split("#", 1)[0]
            if " ASC" in a or " DESC" in a:
                order_cols.add(name)
            elif not a.startswith("specifiedwindowframe"):
                part_cols.add(name)
        out.append((part_cols, order_cols))
    return out


@pytest.mark.parametrize("name", DESKEWED)
def test_no_bare_low_cardinality_fact_window(spark, name):
    """Every window that orders by fact columns must carry a de-skew
    partition column (_dw_pid / _dw_bkt / _day); windows partitioned
    on the bare key alone may only order by _dw_pid (the #keys x
    #partitions counts table)."""
    q = entry_mod.all_queries()
    for part_cols, order_cols in _window_specs(q[name](spark, SF)):
        if order_cols & _FACT_ORDER:
            assert part_cols & _DESKEW_MARKS, (
                name,
                part_cols,
                order_cols,
            )


def test_trailing_prefix_sums_match_bare_window(spark):
    """The O(1)/row prefix-difference trailing frame must equal the
    naive -k..-1 rows-frame spelling row for row — including the
    SUM-is-NULL-when-frame-all-NULL contract, NULL key groups, and
    carries forced at every tiny-bucket edge."""
    from opc_ua_data_pipeline_spark.operators.distwindow import (
        trailing_frame_sums,
    )

    df = _toy(spark)
    for k in (1, 5, 7):
        got = {
            r.id: (r.n_prev, r.s)
            for r in trailing_frame_sums(
                df,
                key_cols=["key"],
                order_cols=["ord", "id"],
                n_prev=k,
                sums={"s": F.col("value").cast("decimal(28,6)")},
                bucket_rows=8,
            ).collect()
        }
        w = (
            Window.partitionBy("key")
            .orderBy("ord", "id")
            .rowsBetween(-k, -1)
        )
        want = {
            r.id: (r.n_prev, r.s)
            for r in df.select(
                "id",
                F.count(F.lit(1)).over(w).alias("n_prev"),
                F.sum(F.col("value").cast("decimal(28,6)"))
                .over(w)
                .alias("s"),
            ).collect()
        }
        assert got == want
