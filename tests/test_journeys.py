"""Journey analytics: trigram paths follow per-user event order; the
U-shaped attribution credit sums to 1 per purchase, honors the
trailing window, and splits endpoints/middles correctly."""

from __future__ import annotations

import datetime

from opc_ua_data_pipeline_spark.operators.journeys import (
    event_path_trigrams,
    multi_touch_attribution,
)

BASE = datetime.datetime(2024, 1, 1)


def _events(spark, rows):
    """rows: (event_id, minutes, user_id, event_type, value)"""
    data = [
        (eid, BASE + datetime.timedelta(minutes=m), uid, et, float(v), "{}")
        for eid, m, uid, et, v in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_trigram_paths_respect_user_order_and_boundaries(spark):
    ev = _events(
        spark,
        [
            (0, 0, 1, "view", 0),
            (1, 1, 1, "click", 0),
            (2, 2, 1, "purchase", 0),
            (3, 0, 2, "view", 0),
            (4, 1, 2, "click", 0),
            (5, 2, 2, "purchase", 0),
            # user 3 has only 2 events: no trigram
            (6, 0, 3, "view", 0),
            (7, 1, 3, "click", 0),
        ],
    )
    out = {r["path"]: r for r in event_path_trigrams(ev).collect()}
    assert out == {
        "view>click>purchase": out["view>click>purchase"]
    }
    r = out["view>click>purchase"]
    assert r["n_occurrences"] == 2 and r["n_users"] == 2 and r["rank"] == 1


def test_attribution_credit_shapes(spark):
    # user 1: single touch -> 1.0; user 2: two touches -> 0.5 each;
    # user 3: four touches -> 0.4 first, 0.4 last, 0.1 each middle
    ev = _events(
        spark,
        [
            (0, 0, 1, "click", 0),
            (1, 10, 1, "purchase", 100),
            (10, 0, 2, "click", 0),
            (11, 5, 2, "view", 0),
            (12, 10, 2, "purchase", 100),
            (20, 0, 3, "click", 0),
            (21, 1, 3, "view", 0),
            (22, 2, 3, "view", 0),
            (23, 3, 3, "click", 0),
            (24, 10, 3, "purchase", 100),
        ],
    )
    out = {r["touch_type"]: r for r in multi_touch_attribution(ev).collect()}
    # clicks: u1 1.0 + u2 first 0.5 + u3 first 0.4 + u3 last 0.4 = 2.3
    assert abs(out["click"]["total_credit"] - 2.3) < 1e-9
    # views: u2 last 0.5 + u3 two middles 0.1 + 0.1 = 0.7
    assert abs(out["view"]["total_credit"] - 0.7) < 1e-9
    # all credit conserved: 3 purchases -> 3.0 total
    assert abs(out["click"]["total_credit"] + out["view"]["total_credit"] - 3.0) < 1e-9
    assert abs(
        out["click"]["attributed_revenue"] + out["view"]["attributed_revenue"] - 300.0
    ) < 1e-6


def test_attribution_window_excludes_stale_touches(spark):
    stale_min = -(8 * 24 * 60)  # 8 days before the purchase
    ev = _events(
        spark,
        [
            (0, stale_min, 1, "click", 0),
            (1, -5, 1, "view", 0),
            (2, 0, 1, "purchase", 50),
        ],
    )
    out = {r["touch_type"]: r for r in multi_touch_attribution(ev).collect()}
    assert "click" not in out  # outside the 7-day window
    assert out["view"]["n_touches"] == 1
    assert out["view"]["total_credit"] == 1.0
    assert out["view"]["attributed_revenue"] == 50.0


def test_touch_after_purchase_gets_no_credit(spark):
    ev = _events(
        spark,
        [
            (0, 5, 1, "click", 0),  # after the purchase
            (1, 0, 1, "purchase", 50),
            (2, -1, 1, "view", 0),
        ],
    )
    out = {r["touch_type"]: r for r in multi_touch_attribution(ev).collect()}
    assert "click" not in out and out["view"]["total_credit"] == 1.0
