"""Property tests for round-5 primitives.

``bounded_rank`` must be extensionally equal to the ``row_number``
window it replaced, on arbitrary frames with ties in the leading sort
column and mixed asc/desc directions; the histogram percentile
thresholds must equal the real ceil(q*n) on arbitrary n (the
positive-only ``div`` identities are easy to get off by one).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.functions.ranking import bounded_rank


@st.composite
def frames(draw):
    n = draw(st.integers(min_value=1, max_value=24))
    # scores from a tiny domain so ties are common; ids unique
    scores = draw(
        st.lists(
            st.integers(min_value=0, max_value=4),
            min_size=n,
            max_size=n,
        )
    )
    return [(i, float(s)) for i, s in enumerate(scores)]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=frames(), desc=st.booleans())
def test_bounded_rank_equals_row_number_window(spark, rows, desc):
    df = spark.createDataFrame(rows, "id long, score double")
    direction = "desc" if desc else "asc"
    got = {
        r["id"]: r["rank"]
        for r in bounded_rank(
            df, [("score", direction), ("id", "asc")]
        ).collect()
    }
    w = Window.partitionBy(F.lit(0)).orderBy(
        F.col("score").desc() if desc else F.col("score").asc(),
        F.col("id").asc(),
    )
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_percentile_rank_thresholds_equal_ceil(spark):
    """(n+1) div 2 == ceil(n/2) and (19n+19) div 20 == ceil(19n/20)
    for every n the rollup can see."""
    import math

    df = spark.range(1, 2001).selectExpr(
        "id AS n",
        "(n + 1) div 2 AS k50",
        "(19 * n + 19) div 20 AS k95",
    )
    for r in df.collect():
        n = r["n"]
        assert r["k50"] == math.ceil(n / 2), n
        assert r["k95"] == math.ceil(19 * n / 20), n
