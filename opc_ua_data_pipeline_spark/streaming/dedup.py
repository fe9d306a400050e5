"""Streaming deduplication — exactly-once semantics over a
duplicate-delivering transport.

The reference's delivery chain is uncoordinated at-least/at-most-once
(kafka_db_agent/main.py:55,99 — auto-commit decoupled from the DB
commit; hydration_agent/main.py:86 — fire-and-forget producer): a
crash between poll and commit replays rows into Postgres.  The
Spark-native repair is state-store dedup in the stream itself:
``dropDuplicatesWithinWatermark`` keeps each key's first arrival and
drops re-deliveries, while the watermark bounds the key state — state
size is O(keys per watermark window), not O(stream length), which is
what makes it safe on an unbounded 100 TB/day feed.

Two variants:
* ``dedup_stream`` — by delivery key (event_id): transport-level
  exactly-once, the direct fix for the reference's replay gap;
* ``content_dedup_stream`` — by content digest: the streaming twin of
  batch ``dedup.exact_dedup`` for document feeds (same md5 key, so a
  doc re-crawled within the watermark window dedups online and the
  batch pass catches the rest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEDUP_WATERMARK = "30 minutes"


def dedup_stream(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    watermark: str = DEDUP_WATERMARK,
) -> DataFrame:
    """Keep the first arrival per key; drop re-deliveries that arrive
    within the watermark horizon (the only ones a replaying transport
    can produce — re-delivery lag is bounded by consumer-group
    rebalance/restart time, far under the watermark)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def content_dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = DEDUP_WATERMARK,
) -> DataFrame:
    """Exact-content streaming dedup: md5(text) as the state key —
    one 32-char key per distinct doc in the window, not the doc
    itself, so state stays small even for large payloads."""
    return (
        docs.withColumn("content_hash", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def neardup_filter_stream(
    stream_docs: DataFrame,
    band_index: DataFrame,
    n_bands: int = 4,
) -> DataFrame:
    """Online near-duplicate detection against a historical corpus.

    The LLM-pipeline shape: documents arrive as a stream; the
    historical corpus is summarized once into a band-key index
    (``dedup.minhash_band_keys_rowwise`` over the corpus — #docs rows
    of n_bands short keys, NOT the documents themselves).  Each
    arriving doc computes its band keys as a narrow per-row projection
    (no aggregation, no state) and stream-static equi-joins the index
    per band; the first-collision condition (earlier bands must
    differ) makes each (new, historical) candidate pair appear exactly
    once, so no post-join dedup state is needed — the whole pipeline
    is stateless on the stream side.

    At 100 TB the index is a bucketed/broadcastable table keyed by
    band_key; the stream side stays a projection.  Returns
    (doc_id, dup_doc_id) candidate pairs; exact-verification composes
    downstream exactly as in the batch LSH->verify pipeline.
    """
    from ..operators.dedup import minhash_band_keys_rowwise

    keyed = minhash_band_keys_rowwise(stream_docs)
    parts = []
    for b in range(n_bands):
        idx = band_index.select(
            F.col("doc_id").alias("dup_doc_id"),
            *[F.col(f"bk_{j}").alias(f"i_bk_{j}") for j in range(n_bands)],
        )
        cond = (F.col(f"bk_{b}") == F.col(f"i_bk_{b}")) & (
            F.col("doc_id") != F.col("dup_doc_id")
        )
        for j in range(b):
            cond = cond & (F.col(f"bk_{j}") != F.col(f"i_bk_{j}"))
        parts.append(
            keyed.join(idx, cond).select("doc_id", "dup_doc_id")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
