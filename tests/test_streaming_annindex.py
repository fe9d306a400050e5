"""Streaming IVF-PQ delta routing: stateless frozen-codebook routing
of arriving vectors equals the batch ivfpq_assign_delta assignments,
under any micro-batching, and already-indexed vectors never emit."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.operators.clustering import (
    DELTA_MOD,
    ivfpq_assign_delta,
)
from opc_ua_data_pipeline_spark.streaming.annindex import ivfpq_route_stream
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


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


def test_stream_routing_equals_batch_delta(spark, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.col("vec_id") % DELTA_MOD != 0)
    rows = emb.orderBy("vec_id").collect()
    d = tmp_path / "vecs"
    _replay_dir(spark, rows, emb.schema, d)

    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    got = sorted(
        tuple(int(x) for x in r)
        for r in _run(spark, ivfpq_route_stream(stream, base), "route")
    )
    want = sorted(
        tuple(int(x) for x in r)
        for r in ivfpq_assign_delta(emb, base).collect()
    )
    assert got == want
    # nothing already indexed leaked through the anti join
    base_ids = {r.vec_id for r in base.select("vec_id").collect()}
    assert not ({t[0] for t in got} & base_ids)
