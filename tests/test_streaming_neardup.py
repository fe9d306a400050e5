"""Online near-dup filter: row-wise band keys ≡ aggregate form, and the
stream-static LSH join ≡ the batch candidate pairs across the same
(historical, new) split."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.operators.dedup import (
    minhash_band_keys_rowwise,
    minhash_candidate_pairs,
    minhash_signatures_wide,
    BAND_SIZE,
    N_SEEDS,
)
from opc_ua_data_pipeline_spark.streaming.dedup import neardup_filter_stream
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_rowwise_band_keys_match_aggregate_form(spark):
    docs = load_table(spark, SF_DIR, "documents")
    n_bands = N_SEEDS // BAND_SIZE
    wide = minhash_signatures_wide(docs)
    agg_keys = wide.select(
        "doc_id",
        *[
            F.concat_ws(
                ",",
                *[F.col(f"sig_{b * BAND_SIZE + i}") for i in range(BAND_SIZE)],
            ).alias(f"bk_{b}")
            for b in range(n_bands)
        ],
    )
    cols = ["doc_id"] + [f"bk_{b}" for b in range(n_bands)]
    a = {r["doc_id"]: tuple(r[c] for c in cols[1:]) for r in agg_keys.collect()}
    b = {
        r["doc_id"]: tuple(r[c] for c in cols[1:])
        for r in minhash_band_keys_rowwise(docs).select(*cols).collect()
    }
    assert a == b
    assert len(a) > 0


def test_stream_neardup_matches_batch_candidates(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()
    half = n_docs // 2
    hist = docs.filter(F.col("doc_id") < half)
    new = docs.filter(F.col("doc_id") >= half)

    # Historical index, built batch-side once.
    index = minhash_band_keys_rowwise(hist).select(
        "doc_id", "bk_0", "bk_1", "bk_2", "bk_3"
    )

    # Replay the new docs as a 2-file stream.
    rows = new.orderBy("doc_id").collect()
    d = tmp_path / "replay"
    d.mkdir()
    mid = len(rows) // 2
    for i, chunk in enumerate([rows[:mid], rows[mid:]]):
        spark.createDataFrame(chunk, new.schema).coalesce(1).write.parquet(
            str(d / f"c{i}")
        )
    for i, f in enumerate(sorted(glob.glob(str(d / "c*" / "part-*.parquet")))):
        os.rename(f, str(d / f"{i:02d}.parquet"))
    for i, f in enumerate(sorted(glob.glob(str(d / "*.parquet")))):
        os.utime(f, (1700000000 + i * 60, 1700000000 + i * 60))

    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        neardup_filter_stream(stream, index)
        .writeStream.format("memory")
        .queryName("neardup")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        (r["doc_id"], r["dup_doc_id"])
        for r in spark.sql("SELECT * FROM neardup").collect()
    )
    # Batch twin: candidate pairs over the full corpus restricted to
    # (historical, new) cross pairs; batch emits doc_a < doc_b, and all
    # historical ids are < half <= new ids.
    want = sorted(
        (r["doc_b"], r["doc_a"])
        for r in minhash_candidate_pairs(docs)
        .filter((F.col("doc_a") < half) & (F.col("doc_b") >= half))
        .collect()
    )
    assert got == want
    assert len(got) > 0
