"""Streaming embedding decontamination twin: latest per-key rows
equal the batch audit (bit-identical scores), arrival order cannot
change the flag set, and at-least-once redelivery is idempotent."""

from __future__ import annotations

import glob
import os

from opc_ua_data_pipeline_spark.operators.similarity import (
    embedding_decontamination,
)
from opc_ua_data_pipeline_spark.streaming.decontam import (
    bench_side,
    decontam_flag_stream,
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


def _vec_stream(spark, d, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )


def _finals(rows):
    last: dict = {}
    for r in rows:
        if r.vec_id not in last or r.seq > last[r.vec_id].seq:
            last[r.vec_id] = r
    return sorted(
        (r.vec_id, r.n_bench_hits, r.max_score) for r in last.values()
    )


def test_stream_decontam_equals_batch_and_redelivery_idempotent(
    spark, tmp_path
):
    emb = load_table(spark, SF_DIR, "embeddings")
    bench = bench_side(emb)
    rows = emb.orderBy("vec_id").collect()

    d1 = tmp_path / "fwd"
    _replay_dir(spark, rows, emb.schema, d1)
    out = _run(
        spark,
        decontam_flag_stream(_vec_stream(spark, d1, emb.schema), bench),
        "dec_fwd",
    )
    assert out and max(r.seq for r in out) >= 1
    fin = _finals(out)

    want = sorted(
        (r.vec_id, r.n_bench_hits, r.max_score)
        for r in embedding_decontamination(emb).collect()
    )
    assert fin == want  # batch ≡ stream, scores bit-identical

    # reversed arrival + a RE-DELIVERED chunk (at-least-once): the
    # b_id set union absorbs duplicates, finals unchanged
    rev = list(reversed(rows)) + rows[: len(rows) // 3]
    d2 = tmp_path / "rev_dup"
    _replay_dir(spark, rev, emb.schema, d2, chunks=5)
    out2 = _run(
        spark,
        decontam_flag_stream(_vec_stream(spark, d2, emb.schema), bench),
        "dec_rev",
    )
    assert _finals(out2) == want
