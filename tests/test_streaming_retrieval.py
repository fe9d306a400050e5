"""Streaming RAG chunk ingest (streaming/retrieval.py): the
stateless chunker replayed over a multi-batch file stream must equal
the batch chunker row-for-row, and the checkpointed sink must write
nothing new on restart (exactly-once)."""

from __future__ import annotations

import glob
import os

from opc_ua_data_pipeline_spark.operators.retrieval import chunk_documents
from opc_ua_data_pipeline_spark.streaming.retrieval import start_chunk_ingest
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _replay_dir(spark, docs, path):
    rows = docs.orderBy("doc_id").collect()
    path.mkdir()
    mid = len(rows) // 2
    for i, chunk in enumerate([rows[:mid], rows[mid:]]):
        spark.createDataFrame(chunk, docs.schema).coalesce(1).write.parquet(
            str(path / f"c{i}")
        )
    for i, f in enumerate(sorted(glob.glob(str(path / "c*" / "part-*.parquet")))):
        os.rename(f, str(path / f"{i:02d}.parquet"))
    for i, f in enumerate(sorted(glob.glob(str(path / "*.parquet")))):
        os.utime(f, (1700000000 + i * 60, 1700000000 + i * 60))


def test_chunk_ingest_matches_batch_and_restart(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    want = sorted(
        (r.doc_id, r.chunk_id, r.chunk_start, r.chunk_text)
        for r in chunk_documents(docs).collect()
    )
    assert len(want) > len(docs.columns)  # chunks outnumber docs

    d = tmp_path / "in"
    _replay_dir(spark, docs, d)
    out = str(tmp_path / "chunks")
    ckpt = str(tmp_path / "ckpt")

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = start_chunk_ingest(stream, out, ckpt)
    q.awaitTermination()

    got = sorted(
        (r.doc_id, r.chunk_id, r.chunk_start, r.chunk_text)
        for r in spark.read.parquet(out).collect()
    )
    assert got == want

    # restart from the same checkpoint, no new input -> no new rows
    stream2 = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q2 = start_chunk_ingest(stream2, out, ckpt)
    q2.awaitTermination()
    assert spark.read.parquet(out).count() == len(want)


def test_cms_sketch_stream_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from opc_ua_data_pipeline_spark.operators.retrieval import (
        CMS_DEPTH,
        _cms_bucket,
    )
    from opc_ua_data_pipeline_spark.operators.text import _toks
    from opc_ua_data_pipeline_spark.streaming.retrieval import (
        cms_sketch_stream,
    )

    docs = load_table(spark, SF_DIR, "documents")
    want = {
        (r.j, r.bucket): r["count"]
        for r in (
            docs.select(F.explode(_toks()).alias("term"))
            .select(
                "term",
                F.explode(
                    F.array(*[F.lit(j) for j in range(CMS_DEPTH)])
                ).alias("j"),
            )
            .withColumn("bucket", _cms_bucket(F.col("term"), F.col("j")))
            .groupBy("j", "bucket")
            .count()
            .collect()
        )
    }

    d = tmp_path / "in"
    _replay_dir(spark, docs, d)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        cms_sketch_stream(stream)
        .writeStream.format("memory")
        .queryName("cms_sketch")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.j, r.bucket): r.bcnt
        for r in spark.sql("SELECT * FROM cms_sketch").collect()
    }
    assert got == want
    assert len(got) > 0
    # state is the counter grid: never more than d x w rows
    assert len(got) <= CMS_DEPTH * 64
