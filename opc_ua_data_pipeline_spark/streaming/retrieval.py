"""Streaming RAG indexing: chunk documents as they arrive.

The batch chunker (operators/retrieval.chunk_documents) is a pure
generator projection — no aggregation, no state — so its streaming
twin is the SAME function applied to a streaming DataFrame: Spark
plans the posexplode identically for batch and micro-batch inputs,
and equality is row-for-row by construction (asserted in
tests/test_streaming_retrieval.py anyway, against a multi-file
replay with a checkpoint restart).

This is the ingestion half of a streaming RAG index: documents land,
chunks append exactly-once to a chunk table partitioned by source;
embedding/scoring stages compose downstream (similarity.py /
streaming/curation.py show both shapes).  The pipeline's only state
is the sink checkpoint — restart-safe exactly-once for free, the
same guarantee as the telemetry bronze path (start_bronze_ingest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.retrieval import (
    CHUNK_OVERLAP,
    CHUNK_SIZE,
    CMS_DEPTH,
    _cms_bucket,
    chunk_documents,
)
from ..operators.text import _toks


def chunk_stream(
    stream_docs: DataFrame,
    size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """The batch chunker IS the streaming chunker (stateless)."""
    return chunk_documents(stream_docs, size=size, overlap=overlap)


def start_chunk_ingest(
    stream_docs: DataFrame,
    table_path: str,
    checkpoint: str,
):
    """documents stream -> overlapping chunks -> exactly-once parquet
    append partitioned by source."""
    return (
        chunk_stream(stream_docs)
        .writeStream.format("parquet")
        .option("path", table_path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("source")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def cms_sketch_stream(stream_docs: DataFrame) -> DataFrame:
    """Streaming count-min sketch maintenance: the (j, bucket) counter
    table as a streaming aggregation over arriving documents.

    The sketch is THE streaming-native frequency structure — state is
    the constant d x w counter grid (4x64 rows here), never the vocab,
    so ``complete`` output mode is safe at any stream length: this is
    the shape that keeps heavy-hitter tracking O(1)-state while exact
    term counting would grow with the vocabulary.  Totals equal the
    batch sketch built from the same documents (md5 positions are
    content-deterministic), asserted in
    tests/test_streaming_retrieval.py.
    """
    occ = stream_docs.select(F.explode(_toks()).alias("term"))
    buckets = occ.select(
        "term",
        F.explode(F.array(*[F.lit(j) for j in range(CMS_DEPTH)])).alias("j"),
    ).withColumn("bucket", _cms_bucket(F.col("term"), F.col("j")))
    return buckets.groupBy("j", "bucket").agg(
        F.count(F.lit(1)).alias("bcnt")
    )
