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

from ..operators.retrieval import CHUNK_OVERLAP, CHUNK_SIZE, chunk_documents


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
