"""Streaming Misra-Gries twin: the k-bounded per-group histogram is
O(k) keyed state, each micro-batch MG-merges with the shared batch
kernel, and the exact verify stage fed the streamed candidates
returns output IDENTICAL to batch heavy_hitter_bigrams — the
CMS-twin test pattern (stream candidates ⊇ heavy set; verify stage
unchanged)."""

from __future__ import annotations

import glob
import os

from opc_ua_data_pipeline_spark.operators.sketch import (
    _mg_candidates,
    heavy_hitter_bigrams,
    verify_heavy_hitters,
)
from opc_ua_data_pipeline_spark.streaming.sketch import mg_candidates_stream
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _order_files(d):
    for i, f in enumerate(sorted(glob.glob(str(d / "*.parquet")))):
        os.utime(f, (1700000000 + i * 60, 1700000000 + i * 60))


def _run_stream(spark, df, name):
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
    return spark.sql(f"SELECT * FROM {name}")


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
    _order_files(d)


DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _doc_stream(spark, d):
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )


def _final_candidates(rows) -> set:
    """Union of each group's LAST emitted survivor set (memory sink
    appends one row per group per micro-batch, in batch order)."""
    last: dict = {}
    for r in rows:
        last[r["grp"]] = r
    out: set = set()
    for r in last.values():
        out.update(r["candidates"])
    return out


def test_mg_stream_candidates_cover_and_verify_identical(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    rows = docs.orderBy("doc_id").collect()
    d = tmp_path / "replay"
    _replay_dir(spark, rows, docs.schema, d)

    out = _run_stream(
        spark, mg_candidates_stream(_doc_stream(spark, d)), "mg_stream"
    ).collect()
    assert len({r["grp"] for r in out}) > 1  # state actually sharded
    assert max(r["n_batches"] for r in out) > 1  # genuinely multi-batch
    stream_cands = _final_candidates(out)

    batch_cands = {
        r["bg"] for r in _mg_candidates(docs, 8192).distinct().collect()
    }
    # both sketches only PRUNE: each must contain every true heavy
    # hitter, so the verified outputs must coincide exactly
    want = {
        (r["bigram"], r["n_occurrences"], r["share"])
        for r in heavy_hitter_bigrams(docs).collect()
    }
    assert {bg for bg, _, _ in want} <= stream_cands
    assert {bg for bg, _, _ in want} <= batch_cands

    cands_df = spark.createDataFrame(
        [(c,) for c in sorted(stream_cands)], "bg string"
    )
    got = {
        (r["bigram"], r["n_occurrences"], r["share"])
        for r in verify_heavy_hitters(docs, cands_df).collect()
    }
    assert got == want


def test_mg_stream_state_is_k_bounded(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    rows = docs.orderBy("doc_id").collect()
    d = tmp_path / "replay"
    _replay_dir(spark, rows, docs.schema, d, chunks=3)

    k = 64  # tiny k so the cut actually fires on the fixture
    out = _run_stream(
        spark,
        mg_candidates_stream(_doc_stream(spark, d), k=k),
        "mg_small",
    ).collect()
    assert out and all(len(r["candidates"]) <= k for r in out)
