"""Streaming sequential-Poisson sample: the final emitted sample is
bit-identical to batch weighted_sample_topk (priorities, membership,
ranks), state is k-bounded, and micro-batching cannot change it."""

from __future__ import annotations

import glob
import os

from opc_ua_data_pipeline_spark.operators.sampling import (
    weighted_sample_topk,
)
from opc_ua_data_pipeline_spark.streaming.sampling import (
    weighted_sample_stream,
)
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"

DOCS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _replay_dir(spark, rows, schema, d, chunks=3):
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


def _doc_stream(spark, d):
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )


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


def _final_sample(rows):
    last = max(r.seq for r in rows)
    return sorted(
        (r.sample_rank, r.doc_id, r.weight, r.priority)
        for r in rows
        if r.seq == last
    )


def test_stream_sample_equals_batch_and_is_order_insensitive(
    spark, tmp_path
):
    docs = load_table(spark, SF_DIR, "documents")
    fwd = docs.orderBy("doc_id").collect()
    rev = list(reversed(fwd))
    d1, d2 = tmp_path / "fwd", tmp_path / "rev"
    _replay_dir(spark, fwd, docs.schema, d1)
    _replay_dir(spark, rev, docs.schema, d2)

    a = _run(spark, weighted_sample_stream(_doc_stream(spark, d1)), "ws_fwd")
    b = _run(spark, weighted_sample_stream(_doc_stream(spark, d2)), "ws_rev")
    assert max(r.seq for r in a) > 1  # genuinely multi-batch
    fin_a, fin_b = _final_sample(a), _final_sample(b)
    assert fin_a == fin_b  # arrival order cannot change the sample

    want = sorted(
        (r.sample_rank, r.doc_id, r.weight, r.priority)
        for r in weighted_sample_topk(docs, "n_chars", "doc_id").collect()
    )
    assert fin_a == want  # bit-identical to the batch operator

    # k-bounded state: no emission ever exceeds k rows
    from opc_ua_data_pipeline_spark.operators.sampling import (
        WEIGHTED_SAMPLE_K,
    )

    per_seq: dict = {}
    for r in a:
        per_seq[r.seq] = per_seq.get(r.seq, 0) + 1
    assert all(n <= WEIGHTED_SAMPLE_K for n in per_seq.values())


def test_stream_sample_tolerates_nulls_and_redelivery(spark, tmp_path):
    """Round-8 ADVICE hazards: NULL weights coerce like the batch
    greatest(weight,1) instead of raising int(NaN); NULL keys are
    skipped; a re-delivered duplicate key occupies ONE sample slot."""
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR, "documents")
    rows = docs.orderBy("doc_id").collect()
    hazards_df = spark.createDataFrame(
        [
            (1_000_000, "x", "en", "s", None),  # NULL weight
            (None, "y", "en", "s", 5),  # NULL key
        ],
        docs.schema,
    )
    all_rows = rows + hazards_df.collect() + rows[:40]  # redelivery
    d = tmp_path / "haz"
    _replay_dir(spark, all_rows, docs.schema, d)

    out = _run(spark, weighted_sample_stream(_doc_stream(spark, d)), "ws_haz")
    fin = _final_sample(out)
    ids = [t[1] for t in fin]
    assert len(ids) == len(set(ids))  # no key holds two slots
    assert None not in ids

    # membership + priorities + ranks equal the batch operator on the
    # same hazard universe — the batch operator itself excludes NULL
    # keys (round-9 fix), so no pre-filter is needed here (weight
    # column excluded: the twin emits the coerced greatest(weight,1)
    # for NULL weights)
    uni = docs.unionAll(hazards_df)
    want = sorted(
        (r.sample_rank, r.doc_id, r.priority)
        for r in weighted_sample_topk(uni, "n_chars", "doc_id").collect()
    )
    assert sorted((t[0], t[1], t[3]) for t in fin) == want
