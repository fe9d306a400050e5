"""Deterministic KLL-style streaming quantiles: exact n, state bounded
by cap x levels (never the stream), estimates inside the stated
deterministic rank-error envelope, and replay-reproducible."""

from __future__ import annotations

import glob
import math
import os
from collections import defaultdict

from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.streaming.ingest import file_stream
from opc_ua_data_pipeline_spark.streaming.quantile import (
    KLL_CAP,
    kll_quantile_stream,
)
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _replay_dir(spark, rows, schema, d, chunks=4):
    d.mkdir()
    n = max(1, len(rows) // chunks)
    for i in range(chunks):
        chunk = rows[i * n :] if i == chunks - 1 else rows[i * n : (i + 1) * n]
        if chunk:
            spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
                str(d / f"c{i}")
            )
    for i, f in enumerate(sorted(glob.glob(str(d / "c*" / "part-*.parquet")))):
        os.rename(f, str(d / f"{i:02d}.parquet"))
    for i, f in enumerate(sorted(glob.glob(str(d / "*.parquet")))):
        os.utime(f, (1700000000 + i * 60, 1700000000 + i * 60))


def _run(spark, df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}").collect()


def _finals(rows):
    last: dict = {}
    for r in rows:
        if r.event_type not in last or r.seq > last[r.event_type].seq:
            last[r.event_type] = r
    return last


def test_kll_stream_envelope_state_and_replay(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    rows = ev.orderBy("ts", "event_id").collect()
    d = tmp_path / "replay_kll"
    _replay_dir(spark, rows, ev.schema, d)

    out = _run(spark, kll_quantile_stream(file_stream(spark, str(d))), "kllq")
    finals = _finals(out)
    assert finals and max(r.seq for r in out) > 1

    raw = defaultdict(list)
    for r in ev.filter(F.col("value").isNotNull()).collect():
        raw[r.event_type].append(r.value)
    assert set(finals) == set(raw)

    import bisect

    for et, vals in raw.items():
        vals.sort()
        n = len(vals)
        fin = finals[et]
        assert fin.n == n  # counts are exact (weights telescope)
        # state bounded: cap items per level, L <= log2(n/cap) + 2
        levels = math.floor(math.log2(max(n / KLL_CAP, 1))) + 2
        assert fin.n_state_items <= KLL_CAP * levels + levels
        # deterministic rank-error envelope (module docstring):
        # n*L/cap + 2^(L+1)
        envelope = n * levels / KLL_CAP + 2 ** (levels + 1)
        for q, est in ((0.5, fin.p50_est), (0.95, fin.p95_est)):
            k = max(1, math.ceil(q * n))
            lo = bisect.bisect_left(vals, est) + 1
            hi = bisect.bisect_right(vals, est)
            dist = 0 if lo <= k <= hi else min(abs(k - lo), abs(k - hi))
            assert dist <= envelope, (et, q, est, k, lo, hi, envelope)

    # replay-reproducible: the deterministic compaction rebuilds the
    # IDENTICAL sketch from the same replay
    out2 = _run(spark, kll_quantile_stream(file_stream(spark, str(d))), "kllq2")
    f2 = _finals(out2)
    for et, fin in finals.items():
        assert (f2[et].n, f2[et].p50_est, f2[et].p95_est) == (
            fin.n,
            fin.p50_est,
            fin.p95_est,
        )


def test_kll_compact_weight_exact_and_odd_carry():
    """The represented weight (sum of 2^level over items) equals the
    exact n after ANY compaction history — odd-sized buffers carry
    one item at their level instead of over-promoting (round-8
    ADVICE: buf[::2] on an odd buffer inflated weight past n)."""
    from opc_ua_data_pipeline_spark.streaming.quantile import _compact

    levels: dict = {}
    ncomp = 0
    n = 0
    i = 0
    for chunk in [7, 8, 9, 13, 5, 11] * 60:
        buf = levels.setdefault(0, [])
        for _ in range(chunk):
            buf.append(float((i * 37) % 101))
            i += 1
        n += chunk
        ncomp = _compact(levels, 33, ncomp)
    assert ncomp > 0
    w = sum((1 << l) * len(b) for l, b in levels.items())
    assert w == n
    # replay determinism: same inputs + same counter -> same sketch
    levels2: dict = {}
    nc2 = 0
    j = 0
    for chunk in [7, 8, 9, 13, 5, 11] * 60:
        buf = levels2.setdefault(0, [])
        for _ in range(chunk):
            buf.append(float((j * 37) % 101))
            j += 1
        nc2 = _compact(levels2, 33, nc2)
    assert (nc2, levels2) == (ncomp, levels)
