"""Plan introspection helpers — guard the physical properties the
engine's scale story depends on (SURVEY.md §4)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def assert_plan(df: DataFrame, *, contains: list[str] = (), absent: list[str] = ()) -> str:
    """Assert physical-plan properties; returns the plan for messages."""
    plan = formatted_plan(df)
    for needle in contains:
        assert needle in plan, f"expected {needle!r} in plan:\n{plan}"
    for needle in absent:
        assert needle not in plan, f"unwanted {needle!r} in plan:\n{plan}"
    return plan
