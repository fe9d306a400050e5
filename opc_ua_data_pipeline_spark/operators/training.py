"""Training-corpus preparation operators (extension phase).

The curation steps between "raw documents" and "training shards" that
aren't dedup or quality scoring: benchmark decontamination, repetition
(boilerplate) signals, deterministic train/val/test splits, TF-IDF
term weighting, and shard assignment for the final write-out.

Scale shapes:
* contamination is the only join here — the benchmark n-gram set is
  the small side by construction (benchmarks are thousands of docs,
  corpora are billions), so it is ``broadcast()``; the corpus side
  stays a single narrow pass.
* repetition stats are pure per-row array expressions — no explode, no
  shuffle, whole-stage codegen end to end.
* split/shard assignment reuses the md5 hash-gate idea from
  operators/sampling.py: content-deterministic, layout-independent,
  and identically computable by any engine (the oracle included).
* TF-IDF shuffles once by term (df) and once by doc (top-k window) —
  both partial-aggregated; scores are ``tf * ln(N/df)`` on exact
  integer inputs, so doubles are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.materialize import materialize

from ..tables import load_table

_TOKS = "list_filter(string_split(text, ' '), t -> t <> '')"  # DuckDB side


def _toks(text_col: str = "text") -> Column:
    return F.filter(F.split(F.col(text_col), " "), lambda t: t != "")


def _word_ngrams(words: Column, n: int) -> Column:
    """Word n-grams as strings, one per start position (JVM array ops,
    no explode until the caller needs one).

    Built as a chain of ``zip_with`` over shifted slices — each step
    extends every (k-1)-gram by the word k-1 positions ahead, so the
    whole construction is O(n·L) per row.  (The tempting
    ``transform(sequence(1, L-n+1), i -> slice(words, i, n))`` is
    O(L²) — a fresh slice per position — and its ``sequence(1, 0)``
    edge for L = n-1 counts DOWN, emitting bogus grams.)
    """
    grams = words
    for k in range(2, n + 1):
        grams = F.zip_with(
            F.slice(grams, 1, F.greatest(F.size(grams) - 1, F.lit(0))),
            F.slice(
                words, k, F.greatest(F.size(words) - (k - 1), F.lit(0))
            ),
            lambda a, c: F.concat_ws(" ", a, c),
        )
    return grams


CONTAM_N = 5
BENCHMARK_SOURCE = "src0"


def _doc_ngrams_exploded(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, gram) rows via posexplode + window ``lead`` — n-gram
    construction that stays inside whole-stage codegen.  3-4× faster
    than building per-row gram arrays with higher-order functions
    (those run interpreted) when the grams get exploded anyway; the
    window shuffle doubles as the explode's distribution."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    ex = docs.select("doc_id", F.posexplode(_toks()).alias("pos", "w"))
    gram = F.concat_ws(
        " ", "w", *[F.lead("w", i).over(w) for i in range(1, n)]
    )
    return (
        ex.select(
            "doc_id",
            gram.alias("gram"),
            F.lead("w", n - 1).over(w).alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .select("doc_id", "gram")
    )


def ngram_contamination(
    docs: DataFrame, benchmark: DataFrame, n: int = CONTAM_N
) -> DataFrame:
    """Benchmark decontamination: for every corpus doc, how many of its
    distinct word n-grams appear verbatim in the benchmark set.

    The benchmark n-gram dictionary is exploded, deduped, and
    broadcast — corpus docs stream past it in one narrow pass
    (explode -> broadcast left join -> re-aggregate by doc_id; the only
    shuffles are the window/distinct on (doc, gram) and the per-doc
    count, partial-aggregated map-side).
    """
    bench_grams = F.broadcast(
        _doc_ngrams_exploded(benchmark, n).select("gram").distinct()
    ).withColumn("hit", F.lit(1))
    doc_grams = _doc_ngrams_exploded(docs, n).distinct()
    return (
        doc_grams.join(bench_grams, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count("hit").alias("n_contaminated"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_contaminated",
            (F.col("n_contaminated") / F.col("n_grams")).alias(
                "contamination_ratio"
            ),
        )
    )


#: Bloom decontamination parameters.  M = 2^20 bits (128 KiB bitmap as
#: 16,384 longs); K = 4 positions per gram, carved as disjoint 5-hex
#: (20-bit) windows of ONE md5 digest — exactly log2(M) bits each, so
#: no modulo bias and one digest per gram.  With B distinct benchmark
#: grams the per-gram false-positive rate is (1-e^(-K·B/M))^K — at
#: B=10^4 that is ~2·10^-6; scale M with the benchmark to hold the
#: rate (2^30 bits = 128 MiB still broadcasts).
BLOOM_BITS_LOG2 = 20
BLOOM_K = 4


def _bloom_positions(gram: Column) -> list[Column]:
    """K 20-bit positions from disjoint md5 hex windows (JVM-side)."""
    h = F.md5(gram)
    return [
        F.conv(F.substring(h, 1 + 5 * i, 5), 16, 10).cast("long")
        for i in range(BLOOM_K)
    ]


def bloom_build(benchmark: DataFrame, n: int = CONTAM_N) -> DataFrame:
    """Build the benchmark's Bloom bitmap AS A TABLE: (word_idx, bits).

    This is the 100 TB replacement for broadcasting the raw benchmark
    n-gram dictionary (``ngram_contamination``): the dictionary grows
    with the benchmark corpus, but the bitmap is a CONSTANT-size
    artifact (<= 2^(BLOOM_BITS_LOG2-6) longs) chosen for the target
    false-positive rate — it broadcasts no matter how large the
    benchmark gets.  Build shape: distinct grams -> K (word, bit)
    pairs -> groupBy(word) bit_or, all map-side combinable.
    """
    grams = _doc_ngrams_exploded(benchmark, n).select("gram").distinct()
    pos = F.explode(F.array(*_bloom_positions(F.col("gram")))).alias("p")
    # 63-bit words (bit lanes 0..62): bit 63 is the sign bit, whose
    # shift/overflow semantics differ across engines (DuckDB raises on
    # 1<<63); wasting one lane per word keeps every value positive and
    # every shift engine-identical.
    return (
        grams.select(pos)
        .selectExpr("p div 63 AS word_idx", "p % 63 AS bit")
        .groupBy("word_idx")
        .agg(F.expr("bit_or(shiftleft(1L, CAST(bit AS INT))) AS bits"))
    )


def bloom_contamination(
    docs: DataFrame, benchmark: DataFrame, n: int = CONTAM_N
) -> DataFrame:
    """Decontamination via the Bloom bitmap: a gram is flagged iff all
    K of its bit positions are set.

    Probe shape: distinct (doc, gram) -> K position rows -> ONE
    equi-join against the (broadcast, fixed-size) bitmap table ->
    all-K vote per gram -> per-doc counts.  Flags are a superset of
    the exact ``ngram_contamination`` hits (Bloom filters have no
    false negatives); the false-positive margin is the documented
    (1-e^(-K·B/M))^K.  Fully deterministic — md5 positions — so the
    flagged set is engine-exact and oracle-checkable, unlike
    sketch-library blooms with platform-dependent hashing.
    """
    bloom = bloom_build(benchmark, n)
    doc_grams = _doc_ngrams_exploded(docs, n).distinct()
    # Wide probe: the K positions stay COLUMNS and each takes its own
    # broadcast join against the bitmap — no position explode (K× the
    # rows) and no (doc, gram) re-aggregation shuffle afterwards; the
    # all-K vote is a plain boolean AND in the projection.
    staged = doc_grams
    for i, p in enumerate(_bloom_positions(F.col("gram"))):
        staged = staged.withColumn(f"_p{i}", p)
    hit = F.lit(True)
    for i in range(BLOOM_K):
        side = F.broadcast(
            bloom.selectExpr(f"word_idx AS _w{i}", f"bits AS _bits{i}")
        )
        staged = staged.join(
            side, F.expr(f"_p{i} div 63 = _w{i}"), "left"
        )
        hit = hit & F.coalesce(
            F.expr(
                f"(shiftright(_bits{i}, CAST(_p{i} % 63 AS INT)) & 1) = 1"
            ),
            F.lit(False),
        )
    flagged = staged.select(
        "doc_id", hit.cast("int").alias("all_set")
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("all_set").alias("n_flagged"),
        )
        .select(
            "doc_id",
            "n_grams",
            F.col("n_flagged").cast("bigint").alias("n_flagged"),
            (F.col("n_flagged") / F.col("n_grams")).alias("bloom_ratio"),
        )
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition signals: the fraction of duplicate word
    {1,2,3}-grams per document.  Pure per-row array expressions —
    no explode, no shuffle; ratios are BIGINT/BIGINT (bit-exact).

    Each gram level is materialized ONCE as a named column and the
    next level derives from it (3-grams extend the 2-gram column, not
    a fresh chain), because higher-order array functions run
    interpreted — outside whole-stage codegen's subexpression
    elimination — so repeated expression trees really do run
    repeatedly.  Measured ~25% off the warm data path at sf0.1.
    """
    words = _toks()
    staged = (
        docs.select("doc_id", words.alias("_g1"))
        .withColumn(
            "_g2",
            F.zip_with(
                F.slice(
                    F.col("_g1"),
                    1,
                    F.greatest(F.size("_g1") - 1, F.lit(0)),
                ),
                F.slice(
                    F.col("_g1"),
                    2,
                    F.greatest(F.size("_g1") - 1, F.lit(0)),
                ),
                lambda a, c: F.concat_ws(" ", a, c),
            ),
        )
        .withColumn(
            "_g3",
            F.zip_with(
                F.slice(
                    F.col("_g2"),
                    1,
                    F.greatest(F.size("_g2") - 1, F.lit(0)),
                ),
                F.slice(
                    F.col("_g1"),
                    3,
                    F.greatest(F.size("_g1") - 2, F.lit(0)),
                ),
                lambda a, c: F.concat_ws(" ", a, c),
            ),
        )
    )
    cols = ["doc_id"]
    for n in (1, 2, 3):
        grams = F.col(f"_g{n}")
        total = F.size(grams)
        distinct = F.size(F.array_distinct(grams))
        cols += [
            total.cast("long").alias(f"n_grams_{n}"),
            F.when(total > 0, (total - distinct) / total)
            .otherwise(F.lit(0.0))
            .alias(f"dup_ratio_{n}"),
        ]
    return staged.select(*cols)


#: (lo, hi) half-open md5-prefix ranges; 98% / 1% / 1%.
SPLITS = [
    ("train", 0.0, 0.98),
    ("val", 0.98, 0.99),
    ("test", 0.99, 1.0),
]
SPLIT_SALT = "split"


def _hex_at(fraction: float) -> str:
    return format(min(int(fraction * 16**8), 16**8 - 1), "08x")


def split_assign(docs: DataFrame, key: str = "doc_id") -> DataFrame:
    """Deterministic train/val/test assignment via the md5 hash gate:
    the same document lands in the same split on every run, engine,
    and partitioning — the property that keeps eval sets honest across
    pipeline re-runs."""
    h = F.substring(
        F.md5(F.concat(F.col(key).cast("string"), F.lit(":" + SPLIT_SALT))),
        1,
        8,
    )
    assign = F.lit(None).cast("string")
    for name, lo, hi in reversed(SPLITS):
        cond = h >= F.lit(_hex_at(lo)) if lo > 0 else F.lit(True)
        assign = F.when(cond & (h < F.lit(_hex_at(hi)) if hi < 1.0 else F.lit(True)), F.lit(name)).otherwise(assign)
    return docs.select("doc_id", "lang", "source", assign.alias("split"))


N_SHARDS = 16


def shard_assign(docs: DataFrame, key: str = "doc_id") -> DataFrame:
    """Global deterministic shuffle + sharding for training write-out:
    shard = first md5 hex digit (16 shards), position = rank of the
    digest within the shard.  Hash order is a uniform random-but-fixed
    permutation of the corpus — exactly the "shuffle once, shard, then
    read sequentially" layout large training jobs want.  One shuffle,
    partitioned by shard (16 ~equal cells, no skew by construction)."""
    h = F.md5(F.concat(F.col(key).cast("string"), F.lit(":shard")))
    w = Window.partitionBy("shard").orderBy("shuffle_key")
    return (
        docs.select(
            "doc_id",
            (
                F.instr(
                    F.lit("0123456789abcdef"), F.substring(h, 1, 1)
                ) - 1
            ).cast("int").alias("shard"),
            h.alias("shuffle_key"),
        )
        .withColumn("pos", F.row_number().over(w))
    )


TFIDF_TOP_K = 5


def tfidf_top_terms(docs: DataFrame, k: int = TFIDF_TOP_K) -> DataFrame:
    """Per-document top-k TF-IDF terms.

    tf from one explode+groupBy(doc, term); df re-aggregated from the
    tf table (reuses that shuffle's output, no second scan); N is a
    1-row aggregate broadcast into the score projection.  ``ln`` is
    libm — JVM and other engines disagree in the last ulp — so the
    contract score is ``tf * ln(N/df)`` rounded to DECIMAL(18,9)
    (ulp noise collapses; scores that are mathematically equal, e.g.
    2·ln(10) vs ln(100), become decimal-equal) and the top-k ranking
    orders by that rounded score with the term string as tie-break.

    The ROUNDED score is re-cast to DOUBLE for the output column:
    a DECIMAL output canonicalizes as ``decimal.Decimal`` objects in
    Spark's toPandas but float64 in other engines' pandas bridges, so
    identical values hash differently (observed: driver hash mismatch
    in round 2 with bit-equal values).  decimal(18,9)→double is the
    correctly-rounded nearest double on both engines, so equality of
    the decimals implies equality of the doubles.
    """
    tf = (
        docs.select("doc_id", F.explode(_toks()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (
                F.col("tf").cast("double")
                * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double"))
            ).cast("decimal(18,9)").cast("double").alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


PACK_BUDGET = 512


def pack_sequences(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """Sequence packing, concatenate-then-chunk style: documents are
    laid head-to-tail in deterministic md5 order and the token stream
    is cut every ``budget`` tokens (the GPT-style packing where a
    document may span a sequence boundary — zero padding waste, no
    sequential repacking loop).

    The concatenation order lives INSIDE each of the 16 hash shards,
    so the layout is one window per shard (parallel, never a global
    sort), composes with ``shard_assign``, and every engine computes
    the identical (pack, offset) for every doc — the whole thing is
    an integer cumsum.

    Output: (doc_id, shard, n_tokens, pack_id, offset,
    spans_boundary); ``offset`` is the doc's start inside its pack.
    """
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shard")))
    n_tok = F.size(_toks())
    base = docs.select(
        "doc_id",
        (
            F.instr(F.lit("0123456789abcdef"), F.substring(h, 1, 1)) - 1
        ).cast("int").alias("shard"),
        h.alias("hkey"),
        n_tok.cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("hkey")
    start = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    end = start + F.col("n_tokens")
    return base.select(
        "doc_id",
        "shard",
        "n_tokens",
        (F.col("shard") * 1_000_000 + F.floor(start / budget)).alias(
            "pack_id"
        ),
        (start % budget).cast("long").alias("offset"),
        (F.floor(start / budget) != F.floor((end - 1) / budget)).alias(
            "spans_boundary"
        ),
    )


def pack_stats(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """Packing-efficiency rollup over :func:`pack_sequences`: per
    shard, how many packs the token stream cuts into, the padding
    waste of the final partial pack, and how many documents straddle
    a pack boundary — the numbers a training job reads to size its
    batch pipeline.  Because concatenate-then-chunk lays tokens
    contiguously, n_packs = ceil(total_tokens/budget) exactly; all
    arithmetic is integer + one exact int/int double division."""
    packed = pack_sequences(docs, budget)
    # integer `div`, not floor(double /): a per-shard token total past
    # 2^53 would lose exactness in double division at real scale.
    n_packs = F.expr(
        f"(SUM(n_tokens) + {budget - 1}) div {budget}"
    ).cast("bigint")
    return packed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        n_packs.alias("n_packs"),
        (n_packs * budget - F.sum("n_tokens")).alias("waste_tokens"),
        (
            F.sum("n_tokens").cast("double") / (n_packs * budget)
        ).alias("fill_ratio"),
        F.count(F.when(F.col("spans_boundary"), 1)).alias("n_spanning"),
    )


MIN_TOKENS = 20
MIN_TTR = 0.30
MAX_CONTAMINATION = 0.05


def curation_pipeline(docs: DataFrame, benchmark: DataFrame) -> DataFrame:
    """The full curation flow composed end to end:

    quality filter → exact-dedup keep-list → benchmark
    decontamination → deterministic split assignment.

    Each stage is one of the verified operators above chained as plain
    DataFrames, so Catalyst fuses the quality filter into the scan,
    keeps the dedup groupBy and the contamination join in one
    pipeline, and the whole thing stays a single lazy plan — the point
    of building curation on a query engine rather than as N batch
    scripts with intermediate files (which is what the reference's
    process-per-hop architecture would force).
    """
    toks = _toks()
    n = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) / n
    kept = docs.filter((n >= MIN_TOKENS) & (ttr >= MIN_TTR))
    keep_ids = (
        kept.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    deduped = kept.join(keep_ids, "doc_id")
    clean_ids = (
        ngram_contamination(deduped, benchmark)
        .filter(F.col("contamination_ratio") <= MAX_CONTAMINATION)
        .select("doc_id")
    )
    return split_assign(deduped.join(clean_ids, "doc_id"))


# ---------------------------------------------------------------------------
# Driver-contract queries + oracles
# ---------------------------------------------------------------------------


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_contamination(
        docs.filter(F.col("source") != BENCHMARK_SOURCE),
        docs.filter(F.col("source") == BENCHMARK_SOURCE),
    )


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_stats(load_table(spark, sf_dir, "documents"))


def q_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return split_assign(load_table(spark, sf_dir, "documents"))


def q_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shard_assign(load_table(spark, sf_dir, "documents"))


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_top_terms(load_table(spark, sf_dir, "documents"))


def q_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return curation_pipeline(
        docs.filter(F.col("source") != BENCHMARK_SOURCE),
        docs.filter(F.col("source") == BENCHMARK_SOURCE),
    )


def q_bloom_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return bloom_contamination(
        docs.filter(F.col("source") != BENCHMARK_SOURCE),
        docs.filter(F.col("source") == BENCHMARK_SOURCE),
    )


SPAN_N = 4
SPAN_MIN_DOCS = 2


def dup_span_coverage(
    docs: DataFrame, n: int = SPAN_N, min_docs: int = SPAN_MIN_DOCS
) -> DataFrame:
    """Cross-document duplicate-span coverage: per document, how many
    token positions sit inside an n-gram that also occurs in >=
    ``min_docs`` documents — the gram-granular approximation of
    exact-substring dedup (the suffix-array step of "Deduplicating
    Training Data Makes Language Models Better"): a high coverage
    ratio marks boilerplate/mirrored passages that survive
    document-level dedup.

    Interval-union arithmetic makes this exact, not a gram count:
    overlapping flagged grams [s, s+n-1] merge via one per-doc window
    (``covered += min(n, s - prev_s)``), so repeated text isn't
    double-counted.  All integers except the final ratio (one double
    divide, identical both engines).

    At 100 TB: one (gram -> distinct-doc count) aggregate (the same
    shuffle profile as df counting; Zipf head handled by AQE skew
    split), an equi-join back, and a per-document window — partitioned
    by doc_id, so parallelism is #docs and state is one lag value.
    """
    toked = docs.select("doc_id", _toks().alias("ts"))
    grams = toked.select(
        "doc_id",
        F.posexplode(_word_ngrams(F.col("ts"), n)).alias("pos0", "gram"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "gram")
    dup = (
        grams.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("gram")
    )
    flagged = grams.join(dup, "gram").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    cov = (
        flagged.withColumn("prev", F.lag("pos").over(w))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_dup_grams"),
            F.sum(
                F.when(F.col("prev").isNull(), F.lit(n)).otherwise(
                    F.least(F.lit(n), F.col("pos") - F.col("prev"))
                )
            ).alias("covered_tokens"),
        )
    )
    return (
        toked.join(cov, "doc_id", "left")
        .select(
            "doc_id",
            F.size("ts").cast("long").alias("n_tokens"),
            F.greatest(F.size("ts") - F.lit(n - 1), F.lit(0))
            .cast("long")
            .alias("n_grams"),
            F.coalesce(F.col("n_dup_grams"), F.lit(0))
            .cast("long")
            .alias("n_dup_grams"),
            F.coalesce(F.col("covered_tokens"), F.lit(0))
            .cast("long")
            .alias("covered_tokens"),
            F.when(F.size("ts") == 0, F.lit(0.0))
            .otherwise(
                F.coalesce(F.col("covered_tokens"), F.lit(0)).cast("double")
                / F.size("ts").cast("double")
            )
            .alias("dup_coverage_ratio"),
        )
    )


def q_dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dup_span_coverage(load_table(spark, sf_dir, "documents"))


def dup_span_scrub(
    docs: DataFrame, n: int = SPAN_N, min_docs: int = SPAN_MIN_DOCS
) -> DataFrame:
    """The REMOVAL half of exact-substring dedup (Lee et al. 2021):
    cut every token that sits inside a cross-document duplicate
    n-gram (the spans dup_span_coverage measures) and reassemble the
    survivors in order — boilerplate/mirrored passages disappear from
    every document that carries them while unique prose is untouched.

    Scale shape: covered positions are ENUMERATED, not tested —
    each flagged gram start s emits sequence(max(s, prev+n), s+n-1)
    (the lag window de-overlaps, so total covered rows <= n_tokens,
    linear), then one LEFT ANTI join drops covered token positions
    and one per-doc aggregation rebuilds the text.  No per-token
    membership probe against a per-doc span array (which would be
    O(tokens x spans) in boilerplate-heavy docs).
    """
    toked = docs.select("doc_id", _toks().alias("ts"))
    grams = toked.select(
        "doc_id",
        F.posexplode(_word_ngrams(F.col("ts"), n)).alias("pos0", "gram"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "gram")
    dup = (
        grams.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("gram")
    )
    flagged = grams.join(dup, "gram").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    covered = (
        flagged.withColumn("prev", F.lag("pos").over(w))
        .select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.when(F.col("prev").isNull(), F.col("pos")).otherwise(
                        F.greatest(F.col("pos"), F.col("prev") + n)
                    ),
                    F.col("pos") + (n - 1),
                )
            ).alias("p"),
        )
    )
    tokens = toked.select(
        "doc_id", F.posexplode("ts").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "tok")
    kept = tokens.join(covered, ["doc_id", "p"], "left_anti")
    clean = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("kept_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "tok"))),
                lambda s: s.tok,
            ),
            " ",
        ).alias("clean_text"),
    )
    return toked.join(clean, "doc_id", "left").select(
        "doc_id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("kept_tokens", F.lit(0)).cast("long").alias(
            "kept_tokens"
        ),
        F.size("ts").cast("long").alias("n_tokens"),
    )


def q_dup_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dup_span_scrub(load_table(spark, sf_dir, "documents"))


QUERIES = {
    "ngram_contamination": q_contamination,
    "dup_span_coverage": q_dup_span_coverage,
    "dup_span_scrub": q_dup_span_scrub,
    "bloom_contamination": q_bloom_contamination,
    "repetition_stats": q_repetition,
    "split_assign": q_split,
    "shard_assign": q_shard,
    "tfidf_top_terms": q_tfidf,
    "curation_pipeline": q_curation,
    "pack_sequences": lambda spark, sf: pack_sequences(
        load_table(spark, sf, "documents")
    ),
    "pack_stats": lambda spark, sf: pack_stats(
        load_table(spark, sf, "documents")
    ),
}

_NG = "list_transform(generate_series(1, greatest(len(w) - {m}, 0)), i -> array_to_string(w[i:i+{m}], ' '))"


def _ng(n: int) -> str:
    return _NG.format(m=n - 1)


_SPLIT_CASE = "CASE "
for _name, _lo, _hi in SPLITS:
    _conds = []
    if _lo > 0:
        _conds.append(f"h >= '{_hex_at(_lo)}'")
    if _hi < 1.0:
        _conds.append(f"h < '{_hex_at(_hi)}'")
    _SPLIT_CASE += f"WHEN {' AND '.join(_conds) or 'TRUE'} THEN '{_name}' "
_SPLIT_CASE += "END"

def _hex5_sql(h_expr: str, off: int) -> str:
    """SQL for the 20-bit int value of 5 hex chars of ``h_expr``
    starting at 1-based ``off`` (DuckDB has no conv())."""
    e = "0"
    for i in range(5):
        e = (
            f"({e} * 16 + (strpos('0123456789abcdef', "
            f"substr({h_expr}, {off + i}, 1)) - 1))"
        )
    return e


_BLOOM_POS_LIST = (
    "["
    + ", ".join(_hex5_sql("h", 1 + 5 * i) for i in range(BLOOM_K))
    + "]"
)

ORACLES = {
    "bloom_contamination": f"""
WITH toks AS (
  SELECT doc_id, source, {_TOKS} AS w FROM documents
),
ng AS (SELECT doc_id, source, {_ng(CONTAM_N)} AS grams FROM toks),
bench_grams AS (SELECT DISTINCT UNNEST(grams) AS gram FROM ng
                WHERE source = '{BENCHMARK_SOURCE}'),
bench_pos AS (
  SELECT UNNEST({_BLOOM_POS_LIST}) AS p
  FROM (SELECT md5(gram) AS h FROM bench_grams)
),
bloom AS (
  SELECT p // 63 AS word_idx,
         bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INT)) AS bits
  FROM bench_pos GROUP BY 1
),
doc_grams AS (SELECT DISTINCT doc_id, UNNEST(list_distinct(grams)) AS gram
              FROM ng WHERE source <> '{BENCHMARK_SOURCE}'),
probes AS (
  SELECT doc_id, gram, UNNEST({_BLOOM_POS_LIST}) AS p
  FROM (SELECT doc_id, gram, md5(gram) AS h FROM doc_grams)
),
hits AS (
  SELECT doc_id, gram,
         COALESCE(((bits >> CAST(p % 63 AS INT)) & 1) = 1, FALSE) AS hit
  FROM probes LEFT JOIN bloom ON p // 63 = word_idx
),
per_gram AS (
  SELECT doc_id, gram, MIN(CASE WHEN hit THEN 1 ELSE 0 END) AS all_set
  FROM hits GROUP BY doc_id, gram
)
SELECT doc_id,
       COUNT(*) AS n_grams,
       CAST(SUM(all_set) AS BIGINT) AS n_flagged,
       CAST(SUM(all_set) AS DOUBLE) / COUNT(*) AS bloom_ratio
FROM per_gram
GROUP BY doc_id
""",
    "ngram_contamination": f"""
WITH toks AS (
  SELECT doc_id, source, {_TOKS} AS w FROM documents
),
ng AS (SELECT doc_id, source, {_ng(CONTAM_N)} AS grams FROM toks),
bench AS (SELECT DISTINCT UNNEST(grams) AS gram FROM ng
          WHERE source = '{BENCHMARK_SOURCE}'),
doc_grams AS (SELECT doc_id, UNNEST(list_distinct(grams)) AS gram
              FROM ng WHERE source <> '{BENCHMARK_SOURCE}')
SELECT doc_id,
       COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN gram IN (SELECT gram FROM bench) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_contaminated,
       CAST(SUM(CASE WHEN gram IN (SELECT gram FROM bench) THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*) AS contamination_ratio
FROM doc_grams
GROUP BY doc_id
""",
    "dup_span_coverage": f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
grams AS (
  SELECT doc_id,
         UNNEST({_ng(SPAN_N)}) AS gram,
         UNNEST(generate_series(1, greatest(len(w) - {SPAN_N - 1}, 0)))
           AS pos
  FROM toks
),
dup AS (
  SELECT gram FROM (
    SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM grams GROUP BY gram
  ) WHERE nd >= {SPAN_MIN_DOCS}
),
flagged AS (
  SELECT doc_id, pos,
         LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM grams JOIN dup USING (gram)
),
cov AS (
  SELECT doc_id,
         COUNT(*) AS n_dup_grams,
         SUM(CASE WHEN prev IS NULL THEN {SPAN_N}
                  ELSE least({SPAN_N}, pos - prev) END) AS covered
  FROM flagged GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(w) AS BIGINT) AS n_tokens,
       CAST(greatest(len(w) - {SPAN_N - 1}, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(c.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
       CAST(COALESCE(c.covered, 0) AS BIGINT) AS covered_tokens,
       CASE WHEN len(w) = 0 THEN 0.0
            ELSE CAST(COALESCE(c.covered, 0) AS DOUBLE)
                 / CAST(len(w) AS DOUBLE) END AS dup_coverage_ratio
FROM toks t LEFT JOIN cov c ON t.doc_id = c.doc_id
""",
    "dup_span_scrub": f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
grams AS (
  SELECT doc_id,
         UNNEST({_ng(SPAN_N)}) AS gram,
         UNNEST(generate_series(1, greatest(len(w) - {SPAN_N - 1}, 0)))
           AS pos
  FROM toks
),
dup AS (
  SELECT gram FROM (
    SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM grams GROUP BY gram
  ) WHERE nd >= {SPAN_MIN_DOCS}
),
flagged AS (
  SELECT doc_id, pos,
         LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM grams JOIN dup USING (gram)
),
covered AS (
  SELECT doc_id,
         UNNEST(generate_series(
           CASE WHEN prev IS NULL THEN pos
                ELSE greatest(pos, prev + {SPAN_N}) END,
           pos + {SPAN_N - 1})) AS p
  FROM flagged
),
tokens AS (
  SELECT doc_id, UNNEST(w) AS tok,
         UNNEST(generate_series(1, len(w))) AS p
  FROM toks
),
kept AS (
  SELECT t.doc_id, t.p, t.tok
  FROM tokens t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.p = c.p
  WHERE c.p IS NULL
),
clean AS (
  SELECT doc_id, COUNT(*) AS kept_tokens,
         string_agg(tok, ' ' ORDER BY p) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       COALESCE(c.clean_text, '') AS clean_text,
       CAST(COALESCE(c.kept_tokens, 0) AS BIGINT) AS kept_tokens,
       CAST(len(w) AS BIGINT) AS n_tokens
FROM toks t LEFT JOIN clean c ON t.doc_id = c.doc_id
""",
    "repetition_stats": f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
ng AS (
  SELECT doc_id, w AS g1, {_ng(2)} AS g2, {_ng(3)} AS g3 FROM toks
)
SELECT doc_id,
       CAST(len(g1) AS BIGINT) AS n_grams_1,
       CASE WHEN len(g1) > 0 THEN CAST(len(g1) - len(list_distinct(g1)) AS DOUBLE) / len(g1) ELSE 0.0 END AS dup_ratio_1,
       CAST(len(g2) AS BIGINT) AS n_grams_2,
       CASE WHEN len(g2) > 0 THEN CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2) ELSE 0.0 END AS dup_ratio_2,
       CAST(len(g3) AS BIGINT) AS n_grams_3,
       CASE WHEN len(g3) > 0 THEN CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3) ELSE 0.0 END AS dup_ratio_3
FROM ng
""",
    "split_assign": f"""
SELECT doc_id, lang, source, {_SPLIT_CASE} AS split
FROM (SELECT *, substr(md5(CAST(doc_id AS VARCHAR) || ':{SPLIT_SALT}'), 1, 8) AS h
      FROM documents)
""",
    "shard_assign": """
WITH hashed AS (
  SELECT doc_id,
         md5(CAST(doc_id AS VARCHAR) || ':shard') AS shuffle_key
  FROM documents
)
SELECT doc_id,
       CAST(strpos('0123456789abcdef', substr(shuffle_key, 1, 1)) - 1 AS INTEGER) AS shard,
       shuffle_key,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY strpos('0123456789abcdef', substr(shuffle_key, 1, 1))
         ORDER BY shuffle_key) AS INTEGER) AS pos
FROM hashed
""",
    "pack_sequences": f"""
WITH base AS (
  SELECT doc_id,
         CAST(strpos('0123456789abcdef',
                     substr(md5(CAST(doc_id AS VARCHAR) || ':shard'), 1, 1))
              - 1 AS INTEGER) AS shard,
         md5(CAST(doc_id AS VARCHAR) || ':shard') AS hkey,
         CAST(len({_TOKS}) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT *,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY hkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS start
  FROM base
)
SELECT doc_id, shard, n_tokens,
       CAST(shard * 1000000 + (start // {PACK_BUDGET}) AS BIGINT) AS pack_id,
       CAST(start % {PACK_BUDGET} AS BIGINT) AS offset,
       (start // {PACK_BUDGET})
         <> ((start + n_tokens - 1) // {PACK_BUDGET}) AS spans_boundary
FROM c
""",
    "pack_stats": f"""
WITH base AS (
  SELECT doc_id,
         CAST(strpos('0123456789abcdef',
                     substr(md5(CAST(doc_id AS VARCHAR) || ':shard'), 1, 1))
              - 1 AS INTEGER) AS shard,
         md5(CAST(doc_id AS VARCHAR) || ':shard') AS hkey,
         CAST(len({_TOKS}) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT *,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY hkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS start
  FROM base
)
SELECT shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST((SUM(n_tokens) + {PACK_BUDGET - 1}) // {PACK_BUDGET} AS BIGINT)
         AS n_packs,
       CAST(((SUM(n_tokens) + {PACK_BUDGET - 1}) // {PACK_BUDGET})
              * {PACK_BUDGET} - SUM(n_tokens) AS BIGINT) AS waste_tokens,
       CAST(SUM(n_tokens) AS DOUBLE)
         / (((SUM(n_tokens) + {PACK_BUDGET - 1}) // {PACK_BUDGET})
            * {PACK_BUDGET}) AS fill_ratio,
       CAST(COUNT(*) FILTER (WHERE (start // {PACK_BUDGET})
              <> ((start + n_tokens - 1) // {PACK_BUDGET})) AS BIGINT)
         AS n_spanning
FROM c
GROUP BY shard
""",
    "curation_pipeline": f"""
WITH w0 AS (
  SELECT *, {_TOKS} AS w FROM documents WHERE source <> '{BENCHMARK_SOURCE}'
),
kept AS (
  SELECT * FROM w0
  WHERE len(w) >= {MIN_TOKENS}
    AND CAST(len(list_distinct(w)) AS DOUBLE) / len(w) >= {MIN_TTR}
),
keepers AS (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
dd AS (SELECT k.* FROM kept k JOIN keepers USING (doc_id)),
bench AS (
  SELECT DISTINCT UNNEST(grams) AS gram FROM (
    SELECT {_ng(CONTAM_N)} AS grams FROM (
      SELECT {_TOKS} AS w FROM documents
      WHERE source = '{BENCHMARK_SOURCE}'))
),
doc_grams AS (
  SELECT doc_id, UNNEST(list_distinct({_ng(CONTAM_N)})) AS gram FROM dd
),
contam AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN gram IN (SELECT gram FROM bench)
                       THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS ratio
  FROM doc_grams GROUP BY doc_id
),
clean AS (SELECT doc_id FROM contam WHERE ratio <= {MAX_CONTAMINATION})
SELECT doc_id, lang, source, {_SPLIT_CASE} AS split
FROM (SELECT dd.*,
             substr(md5(CAST(dd.doc_id AS VARCHAR) || ':{SPLIT_SALT}'), 1, 8)
               AS h
      FROM dd JOIN clean USING (doc_id))
""",
    "tfidf_top_terms": f"""
WITH tf AS (
  SELECT doc_id, UNNEST({_TOKS}) AS term FROM documents
),
tfc AS (SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY 1, 2),
dfc AS (SELECT term, COUNT(*) AS df FROM tfc GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, tfc.term, tf, df,
         -- decimal(18,9) round collapses libm ulp noise; the final
         -- DOUBLE cast matches Spark's output dtype (a DECIMAL column
         -- canonicalizes as Decimal objects vs float64 across engines
         -- and hash-mismatches on bit-equal values).
         CAST(CAST(CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))
              AS DECIMAL(18,9)) AS DOUBLE) AS tfidf
  FROM tfc JOIN dfc ON tfc.term = dfc.term CROSS JOIN n
)
SELECT doc_id, term, tf, df, tfidf,
       CAST(rank AS INTEGER) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
      FROM scored)
WHERE rank <= {TFIDF_TOP_K}
""",
}


# ---------------------------------------------------------------------------
# Padding-waste report for length-bucketed batching (round 7b)
# ---------------------------------------------------------------------------

#: fixed micro-batch size the report evaluates (sequences per batch).
PAD_BATCH_SIZE = 32


def padding_waste_report(
    docs: DataFrame, batch_size: int = PAD_BATCH_SIZE
) -> DataFrame:
    """Padding overhead of two batching policies at a fixed batch
    size: arrival order (``by_doc_id``) vs global length-sorted
    (``length_sorted``) — every sequence in a batch pads to the batch
    max, so the report quantifies exactly how many pad tokens
    length-bucketing saves (the standard justification for sorted
    batching in LLM pre-training input pipelines).

    Scale shape: each policy's global order is the deterministic
    two-pass distributed rank (distwindow.attach_keyed_row_number —
    range-partition + local row_number, no single-task sort); batch
    ids are pure arithmetic on the rank; per-batch max/sum/count and
    the final per-policy rollup are map-side-combinable groupBys on
    exact integers.  The two final ratios are the only float ops,
    ulp-collapsed at DECIMAL(18,9).
    """
    from .distwindow import attach_keyed_row_number, sample_cutpoints

    base = docs.select(
        "doc_id", F.size(_toks()).cast("long").alias("n_tokens")
    ).transform(materialize)
    # ^ 2-column doc-sized frame read FIVE ways (the cutpoint sketch
    # plus two branches per policy) — materialized once (round 10)
    # instead of re-tokenizing the corpus per branch; persist() at
    # cluster scale.
    # both policies' bucket cutpoints in ONE sketch job (round-8:
    # sample_cutpoints amortizes the per-rank-pass driver job)
    cuts = sample_cutpoints(base, ["doc_id", "n_tokens"])

    def policy(name: str, order_cols: list[str]) -> DataFrame:
        ranked = attach_keyed_row_number(
            base, [], order_cols, rn_col="rn",
            cuts=cuts.get(order_cols[0]),
        )
        per_batch = (
            ranked.select(
                F.expr(f"CAST((rn - 1) DIV {batch_size} AS BIGINT)").alias(
                    "batch"
                ),
                "n_tokens",
            )
            .groupBy("batch")
            .agg(
                F.count(F.lit(1)).alias("n_seq"),
                F.max("n_tokens").alias("max_len"),
                F.sum("n_tokens").alias("tok_sum"),
            )
        )
        return per_batch.agg(
            F.count(F.lit(1)).alias("n_batches"),
            F.sum("tok_sum").alias("total_tokens"),
            F.sum(F.col("n_seq") * F.col("max_len")).alias("padded_tokens"),
        ).selectExpr(
            f"'{name}' AS policy",
            "CAST(n_batches AS BIGINT) AS n_batches",
            "CAST(total_tokens AS BIGINT) AS total_tokens",
            "CAST(padded_tokens AS BIGINT) AS padded_tokens",
            "CAST(CAST(CAST(padded_tokens - total_tokens AS DOUBLE)"
            " / padded_tokens AS DECIMAL(18,9)) AS DOUBLE) AS waste_frac",
        )

    return policy("by_doc_id", ["doc_id"]).unionAll(
        policy("length_sorted", ["n_tokens", "doc_id"])
    )


def q_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    return padding_waste_report(load_table(spark, sf_dir, "documents"))


QUERIES["padding_waste_report"] = q_padding_waste

_PAD_POLICY_SQL = """
  SELECT '{name}' AS policy,
         CAST(COUNT(*) AS BIGINT) AS n_batches,
         CAST(SUM(tok_sum) AS BIGINT) AS total_tokens,
         CAST(SUM(n_seq * max_len) AS BIGINT) AS padded_tokens,
         CAST(CAST(CAST(SUM(n_seq * max_len) - SUM(tok_sum) AS DOUBLE)
              / SUM(n_seq * max_len) AS DECIMAL(18,9)) AS DOUBLE)
           AS waste_frac
  FROM (
    SELECT batch, COUNT(*) AS n_seq, MAX(n_tokens) AS max_len,
           SUM(n_tokens) AS tok_sum
    FROM (
      SELECT (ROW_NUMBER() OVER (ORDER BY {order}) - 1)
               // {bs} AS batch,
             n_tokens
      FROM base
    ) GROUP BY 1
  )
"""

ORACLES["padding_waste_report"] = (
    """
WITH base AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
              AS BIGINT) AS n_tokens
  FROM documents
)
"""
    + _PAD_POLICY_SQL.format(
        name="by_doc_id", order="doc_id", bs=PAD_BATCH_SIZE
    )
    + "UNION ALL"
    + _PAD_POLICY_SQL.format(
        name="length_sorted", order="n_tokens, doc_id", bs=PAD_BATCH_SIZE
    )
)
