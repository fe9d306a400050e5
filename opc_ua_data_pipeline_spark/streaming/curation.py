"""Streaming curation: decontaminate documents as they arrive.

The batch pipeline (operators/training.bloom_contamination) probes a
(word_idx, bits) Bloom TABLE; a stream wants the stateless spelling —
the same trade as ``dedup.minhash_band_keys_rowwise`` vs the aggregate
signatures.  Here the bitmap (bounded by the FP-rate budget: 2^20 bits
= ~16.6k longs, NOT by benchmark or corpus size) is materialized ONCE
driver-side into an array literal, so every arriving document scores
itself in a single narrow projection: per-row n-grams, 4 md5 windows
per gram, 4 array lookups — no joins, no aggregation, no state.  That
makes it composable with any source/sink and exactly-once for free.

At 100 TB of STREAM this is the right shape (the bitmap is fixed-size
and rides in the plan); if the bitmap ever had to grow past broadcast
size the batch TABLE-join spelling takes over.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.text import _toks
from ..operators.training import (
    BLOOM_BITS_LOG2,
    BLOOM_K,
    CONTAM_N,
    _word_ngrams,
    bloom_build,
)


def bloom_bitmap_local(benchmark: DataFrame, n: int = CONTAM_N) -> list[int]:
    """Collect the Bloom table into a dense driver-side list (index =
    word_idx).  Bounded by M = 2^BLOOM_BITS_LOG2 bits (~16.6k longs),
    independent of benchmark size — the one collect in this module,
    and it is of the SKETCH, never of data."""
    n_words = (1 << BLOOM_BITS_LOG2) // 63 + 1
    dense = [0] * n_words
    for row in bloom_build(benchmark, n).collect():
        dense[row["word_idx"]] = row["bits"]
    return dense


def _flagged_fn(bm: Column):
    """Lambda factory: gram Column -> all-K-bloom-positions-set
    Column, against the in-plan bitmap ``bm``."""

    def flagged(g: Column) -> Column:
        h = F.md5(g)
        hit = F.lit(True)
        for i in range(BLOOM_K):
            p = F.conv(F.substring(h, 1 + 5 * i, 5), 16, 10).cast("long")
            word = F.element_at(bm, (p / F.lit(63)).cast("int") + 1)
            # call_function: the SQL shiftright takes a COLUMN shift
            # amount; the PySpark F.shiftright wrapper only takes int.
            bit = F.call_function(
                "shiftright", word, (p % 63).cast("int")
            ).bitwiseAND(F.lit(1))
            hit = hit & (bit == 1)
        return hit

    return flagged


def bloom_flag_stream(
    stream_docs: DataFrame,
    bitmap: list[int],
    n: int = CONTAM_N,
    text_col: str = "text",
) -> DataFrame:
    """Per-document contamination stats as a stateless stream
    projection: (doc_id, n_grams, n_flagged, bloom_ratio) — the same
    contract columns as batch ``bloom_contamination``, and the same
    universe (documents with at least one full n-gram); equality is
    asserted row-for-row in tests/test_streaming_curation.py.
    """
    bm = F.lit(bitmap)
    toks = _toks(text_col)
    grams = F.array_distinct(_word_ngrams(toks, n))
    n_grams = F.size(grams)
    n_flagged = F.size(F.filter(grams, _flagged_fn(bm)))
    return (
        stream_docs.filter(F.size(toks) >= n)
        .select(
            "doc_id",
            n_grams.cast("long").alias("n_grams"),
            n_flagged.cast("long").alias("n_flagged"),
            (n_flagged.cast("double") / n_grams).alias("bloom_ratio"),
        )
    )


MAX_BLOOM_RATIO = 0.05


def curate_projection(
    stream_docs: DataFrame,
    bitmap: list[int],
    n: int = CONTAM_N,
    max_bloom_ratio: float = MAX_BLOOM_RATIO,
) -> DataFrame:
    """The full curation pass as ONE narrow projection: PII scrub,
    classifier score + keep, Bloom contamination ratio, then the
    filter.  A single select — deliberately NOT a join of the three
    per-operator frames, which on a stream would be stream-stream
    self-joins requiring watermark state for no reason.  Stateless,
    so it composes with any source and inherits exactly-once from
    the sink checkpoint alone.
    """
    from ..operators.curation import CLF_THRESHOLD, quality_score_col
    from ..operators.text import PII_RULES

    clean = F.col("text")
    for _, pat, repl in PII_RULES:
        clean = F.regexp_replace(clean, pat, repl)
    score = quality_score_col()
    toks = _toks()
    grams = F.array_distinct(_word_ngrams(toks, n))
    flag_fn = _flagged_fn(F.lit(bitmap))
    n_grams = F.size(grams)
    n_flagged = F.size(F.filter(grams, flag_fn))
    return (
        stream_docs.select(
            "doc_id",
            "lang",
            "source",
            clean.alias("clean_text"),
            F.size(toks).cast("long").alias("n_tokens"),
            score.alias("quality_score"),
            n_grams.cast("long").alias("n_grams"),
            n_flagged.cast("long").alias("n_flagged"),
            (n_flagged.cast("double") / n_grams).alias("bloom_ratio"),
        )
        .filter(
            (F.col("quality_score") >= CLF_THRESHOLD)
            & (
                (F.col("n_grams") == 0)
                | (F.col("bloom_ratio") <= max_bloom_ratio)
            )
        )
    )


def start_corpus_ingest(
    stream_docs: DataFrame,
    bitmap: list[int],
    table_path: str,
    checkpoint: str,
    max_bloom_ratio: float = MAX_BLOOM_RATIO,
):
    """End-to-end streaming corpus curation: PII scrub -> quality
    classify -> Bloom decontaminate -> exactly-once parquet append,
    partitioned by source.

    Every stage is the STATELESS spelling (one projection + the
    in-plan bitmap), so the whole pipeline's only state is the sink
    checkpoint — restart-safe exactly-once for free, same guarantee
    as the telemetry bronze path (start_bronze_ingest).  Documents
    failing the classifier threshold or exceeding the contamination
    budget are dropped before the write; kept rows carry their scores
    so downstream mixing can re-weight without recomputing.
    """
    curated = curate_projection(stream_docs, bitmap, max_bloom_ratio=max_bloom_ratio)
    return (
        curated.writeStream.format("parquet")
        .option("path", table_path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("source")
        .outputMode("append")
        .start()
    )


def streaming_calibration_partials(docs_stream: DataFrame) -> DataFrame:
    """Running per-bin calibration partials over a document stream:
    the same (bin, n_docs, npos, ssum) state operators/curation.py's
    ``_cal_binned`` computes in batch, as an unwindowed streaming
    aggregation (counts and DECIMAL sums — mergeable, so update mode
    maintains them exactly; finalize with
    ``curation.calibration_finalize`` to get the reliability rows).

    State is bounded by CAL_BINS rows FOREVER — the ideal streaming
    aggregate: no watermark needed, no state growth, every batch
    folds in map-side-combined partials.
    """
    from ..operators.curation import CAL_BINS, quality_score_col

    base = docs_stream.select(
        quality_score_col().alias("s"),
        (F.col("lang") == "en").cast("long").alias("y"),
    ).filter(F.col("s").isNotNull())
    return (
        base.selectExpr(
            f"LEAST(CAST(FLOOR(CAST(s AS DECIMAL(18,9)) * {CAL_BINS})"
            f" AS INT), {CAL_BINS - 1}) AS bin",
            "CAST(s AS DECIMAL(18,9)) AS sd",
            "y",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("y").alias("npos"),
            F.sum("sd").alias("ssum"),
        )
    )
