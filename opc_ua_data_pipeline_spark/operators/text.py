"""Text analysis for training-data curation (extension phase).

All operators are single-pass, shuffle-free projections (or one
groupBy for corpus stats) over `documents` — the shape that matters
at 100 TB, where text quality filtering is a narrow map ahead of the
expensive dedup/tokenize stages.  Zero Python UDFs: everything is
built-in string/array expressions inside whole-stage codegen.

Ratios are BIGINT/BIGINT divisions (exact inputs), so results are
bit-identical across engines without rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.materialize import materialize

from ..functions.ranking import bounded_rank
from ..tables import load_table

#: Tiny per-language stopword lists for the n-gram language heuristic.
#: (Real pipelines use fastText-style models; the *operator shape* —
#: token-set scoring + argmax — is what scales.)
LANG_STOPWORDS = {
    "en": ["the", "a", "of"],
    "de": ["der", "die", "das"],
    "fr": ["le", "la", "les"],
    "es": ["el", "los", "una"],
}

QUALITY_STOPWORDS = ["the", "a", "of", "and", "to"]


def _toks(text_col: str = "text") -> Column:
    return F.filter(F.split(F.col(text_col), " "), lambda t: t != "")


#: BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation —
#: explicit classes only, so Java regex and RE2 agree.
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def token_stats(df: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens, BPE-ish regex tokens,
    distinct tokens, byte/char sizes, mean token length — the unigram
    stats every curation pipeline records per document."""
    toks = _toks()
    return df.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0)).alias(
            "n_bpe_tokens"
        ),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.length("text").alias("n_chars_measured"),
        F.octet_length("text").alias("n_bytes"),
        F.try_divide(
            F.aggregate(
                F.transform(toks, lambda t: F.length(t).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
            F.size(toks),
        ).alias("mean_token_len"),  # NULL on token-less docs (= DuckDB)
    )


#: (name, pattern, replacement) — patterns restricted to the syntax
#: Java regex and RE2 (DuckDB) interpret identically: explicit
#: classes, bounded repeats, \b word boundaries; no backrefs or
#: lookaround (RE2 has neither).
PII_RULES = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing: mask emails, phone numbers, and IPv4 addresses
    with typed placeholder tokens and count the redactions per
    category (counted on the ORIGINAL text, so the counts are
    independent of rule order).  A narrow, shuffle-free projection —
    at 100 TB this runs inside the scan stage ahead of dedup, which
    is the point: scrub before any text leaves the ingest pass.

    The fixture corpus contains no PII (counts are all zero there);
    tests/test_curation_ops.py exercises the rules on injected
    fixtures with real-shaped PII strings.
    """
    clean = F.col(text_col)
    counts = []
    for name, pat, repl in PII_RULES:
        counts.append(
            F.size(F.regexp_extract_all(text_col, F.lit(pat), 0)).alias(
                f"n_{name}"
            )
        )
        clean = F.regexp_replace(clean, pat, repl)
    return df.select("doc_id", clean.alias("clean_text"), *counts)


def quality_scores(df: DataFrame) -> DataFrame:
    """Quality scoring: length, stopword ratio, type-token ratio,
    short-doc flag — standard heuristic filters (C4/Gopher style)."""
    toks = _toks()
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in QUALITY_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_distinct = F.size(F.array_distinct(toks))
    return df.select(
        "doc_id",
        "lang",
        n.alias("n_tokens"),
        F.try_divide(n_stop, n).alias("stopword_ratio"),
        F.try_divide(n_distinct, n).alias("type_token_ratio"),
        (n < 30).alias("too_short"),
    )


def language_id(df: DataFrame) -> DataFrame:
    """Language-ID heuristic: score = stopword hits per language,
    argmax with deterministic tie-break on language order."""
    toks = _toks()
    scores = [
        F.size(
            F.filter(toks, lambda t: F.array_contains(F.array(*[F.lit(w) for w in ws]), t))
        ).alias(f"score_{lang}")
        for lang, ws in LANG_STOPWORDS.items()
    ]
    scored = df.select("doc_id", "lang", *scores)
    langs = list(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    guess = F.lit("unk")
    for lang in reversed(langs):  # earlier langs win ties
        guess = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(guess)
    return scored.select("doc_id", "lang", *[f"score_{lang}" for lang in langs], guess.alias("lang_guess"))


ROLL_BASE = 131
ROLL_MOD = 1 << 48  # keeps acc*131+255 < 2^63: exact BIGINT in both engines


def fingerprints(df: DataFrame) -> DataFrame:
    """Document fingerprinting: exact digest, order-insensitive
    bag-of-words digest (sorted distinct tokens), and a polynomial
    rolling hash over the raw characters — the canonical-form keys
    used before any pairwise near-dup work.  The rolling hash is a
    pure-integer left fold (acc*B + chr mod 2^48), bit-identical
    across engines."""
    toks = _toks()
    # split('') materializes the char array in one pass — per-index
    # substring() re-scans the string per character (quadratic).
    chars = F.transform(
        F.split(F.col("text"), ""),
        lambda ch: F.ascii(ch).cast("bigint"),
    )
    rolling = F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * ROLL_BASE + c) % ROLL_MOD,
    )
    return df.select(
        "doc_id",
        F.md5("text").alias("exact_fp"),
        F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " ")).alias("bow_fp"),
        rolling.alias("rolling_fp"),
    )


def vocab_stats(df: DataFrame) -> DataFrame:
    """Corpus vocabulary table: term frequency, document frequency,
    rank, and cumulative corpus share — what a tokenizer-training or
    vocab-pruning pass reads first.  One explode + one shuffle on the
    term; rank and cumulative share run over #distinct-terms rows (the
    already-aggregated table, not the corpus).

    The vocabulary itself grows with the corpus (Heaps' law — 10^7-10^8
    terms at 100 TB), so the global rank is NOT a bare
    ``Window.orderBy`` (single-task sort over the whole vocab): it is
    the distributed two-pass rank of
    :func:`distwindow.keyed_running_totals` (deterministic
    sampled-boundary buckets + broadcast offset table).  Rank and
    cumulative sums are integer arithmetic, so the result is
    bit-identical to the single-window form; shares are BIGINT/BIGINT
    divisions — bit-exact across engines."""
    from .distwindow import keyed_running_totals

    tf = (
        df.select("doc_id", F.explode(_toks()).alias("term"))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )
    total = tf.agg(F.sum("n_occurrences").alias("total_occ"))
    ranked = keyed_running_totals(
        tf,
        [],
        [("n_occurrences", False), "term"],
        weights={"_cum": "n_occurrences"},
        range_parts=32,
    )
    return ranked.crossJoin(F.broadcast(total)).select(
        "term",
        "n_occurrences",
        "n_docs",
        F.col("_rank").cast("int").alias("rank"),
        (F.col("_cum") / F.col("total_occ")).alias("cum_share"),
    )


def unigram_logprob_scores(df: DataFrame) -> DataFrame:
    """Perplexity-proxy quality score: mean unigram log-probability of
    each document under the corpus's own unigram LM (the statistical
    upgrade of the heuristic filters — rare-token salads score low,
    fluent-ish text scores high; real pipelines swap in KenLM, the
    operator shape is identical).

    The vocabulary (term → ln p) joins back to the exploded documents
    on the term key.  No forced broadcast: the vocabulary grows with
    the corpus (Heaps' law), so the hint that is right at test SF OOMs
    executors at 100 TB — AQE picks broadcast while the LM is small
    and a shuffle join once it isn't (the term key is Zipf-skewed, so
    AQE's skew-join split handles the head terms; a production
    variant would cap the vocab at top-K + an OOV floor, which makes
    the LM fixed-size and broadcastable again, but that changes the
    score and so isn't the oracle-checked form).  ``ln`` is libm and
    the per-group sum order is engine-specific, so each token's
    logprob is rounded to DECIMAL(18,9) first (collapses the ulp
    noise — see tfidf) and summed exactly (associative), divided once
    at the end.
    """
    tf = (
        df.select(F.explode(_toks()).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    total = tf.agg(F.sum("n_occ").alias("total_occ"))
    lm = tf.crossJoin(F.broadcast(total)).select(
        "term",
        F.log(
            F.col("n_occ").cast("double") / F.col("total_occ").cast("double")
        )
        .cast("decimal(18,9)")
        .alias("lp"),
    )
    doc_terms = df.select("doc_id", F.explode(_toks()).alias("term"))
    return (
        doc_terms.join(lm, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum("lp").cast("double") / F.count(F.lit(1))).alias(
                "mean_logprob"
            ),
        )
    )


#: Add-k smoothing constant for the bigram LM (0.5 = Jeffreys prior;
#: exactly representable in binary so the smoothed ratios are built
#: from error-free operands on both engines).
BIGRAM_SMOOTH_K = 0.5


def _bigram_arr(ts: "Column") -> "Column":
    """Adjacent-token bigrams ('w1 w2' strings) from an ALREADY
    MATERIALIZED token-array column.  zip_with over two slices — O(n)
    per row.  (The tempting transform(sequence(1, n-1), i ->
    element_at(ts, i) || element_at(ts, i+1)) spelling is O(n²) when
    ``ts`` is an expression: higher-order lambdas re-evaluate their
    argument expression per element, so each element_at re-tokenized
    the document — measured 15x slower at sf0.1.)  The when-guard
    exists because Spark's sequence/slice arithmetic on size<2 would
    produce negative lengths."""
    return F.when(
        F.size(ts) >= 2,
        F.zip_with(
            F.slice(ts, 1, F.size(ts) - 1),
            F.slice(ts, 2, F.size(ts) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _bigrams(text_col: str = "text") -> "Column":
    """Bigrams straight from a text column (tests/small frames; the
    operator body pre-projects the token array instead — see
    :func:`_bigram_arr`)."""
    return _bigram_arr(_toks(text_col))


def bigram_logprob_scores(df: DataFrame) -> DataFrame:
    """Fluency score under a corpus-trained BIGRAM language model with
    add-k smoothing — the next step up from
    :func:`unigram_logprob_scores` toward the KenLM-style perplexity
    filters real curation pipelines deploy (same operator shape: train
    counts on the corpus, join scores back on a key).

    ``P(w2|w1) = (c(w1 w2) + k) / (c(w1) + k·V)`` with V = unigram
    vocabulary size; a document's score is the mean ln P over its
    bigrams (docs with <2 tokens have no bigrams and drop out — the
    length filters run upstream of any LM filter anyway).

    Exactness: each bigram's logprob is rounded to DECIMAL(18,9)
    (ulp-collapse, tfidf precedent) and the per-doc sum is exact
    decimal addition; one double divide at the end.

    At 100 TB: two count aggregates (bigram table ≲ corpus tokens,
    unigram table = vocab), one 1-row vocab-size broadcast, then an
    equi-join of exploded doc bigrams against the LM — same Zipf-skew
    profile as the unigram join (AQE skew split handles the head; a
    production top-K + backoff variant makes the LM broadcastable but
    changes the score, so it isn't the oracle-checked form).
    """
    toked = df.select("doc_id", _toks().alias("ts"))
    uni = (
        toked.select(F.explode("ts").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("n_w1"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    big = (
        toked.select(F.explode(_bigram_arr(F.col("ts"))).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("n_bg"))
    )
    k = BIGRAM_SMOOTH_K
    lm = (
        big.withColumn("w1", F.split("bg", " ")[0])
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bg",
            F.log(
                (F.col("n_bg").cast("double") + F.lit(k))
                / (
                    F.col("n_w1").cast("double")
                    + F.lit(k) * F.col("v").cast("double")
                )
            )
            .cast("decimal(18,9)")
            .alias("lp"),
        )
    )
    doc_bg = toked.select("doc_id", F.explode(_bigram_arr(F.col("ts"))).alias("bg"))
    return (
        doc_bg.join(lm, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.sum("lp").cast("double") / F.count(F.lit(1))).alias(
                "mean_bigram_logprob"
            ),
        )
    )


def corpus_stats(df: DataFrame) -> DataFrame:
    """Corpus rollup by (lang, source): doc counts and size stats —
    one partial-aggregated shuffle."""
    return (
        df.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.octet_length("text")).alias("total_bytes"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Driver-contract queries
# ---------------------------------------------------------------------------


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_stats(load_table(spark, sf_dir, "documents"))


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_scores(load_table(spark, sf_dir, "documents"))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return language_id(load_table(spark, sf_dir, "documents"))


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprints(load_table(spark, sf_dir, "documents"))


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_stats(load_table(spark, sf_dir, "documents"))


#: PMI collocation mining thresholds: a bigram must occur at least
#: MIN_COUNT times corpus-wide (rare pairs have unreliable, inflated
#: PMI), and the contract reports the TOP_K strongest collocations.
PMI_MIN_COUNT = 5
PMI_TOP_K = 50


def pmi_collocations(
    df: DataFrame, min_count: int = PMI_MIN_COUNT, k: int = PMI_TOP_K
) -> DataFrame:
    """Corpus collocations by pointwise mutual information — the
    classic phrase-mining signal (Church & Hanks 1990; word2vec's
    phrase pass uses the same count ratio): word pairs that co-occur
    far more than their unigram frequencies predict
    (``PMI = ln( p(w1 w2) / (p(w1) p(w2)) )``) are names, idioms and
    technical terms a tokenizer or phrase vocabulary should keep
    whole.

    Determinism: counts are exact; the score is built from exact
    integers cast to double in one PINNED expression —
    ``ln((n_bg·N·N) / (B·n1·n2))`` evaluated left-associatively on
    both engines — then DECIMAL(18,9)-rounded (the module's ln
    ulp-collapse contract) before ranking, with the bigram string as
    the tie-break.

    Scale shape: one corpus-proportional shuffle to bigram counts
    (map-side combinable), two vocab-sized joins to attach unigram
    counts, 1-row totals broadcast; the top-k is
    TakeOrderedAndProject + the Window-free bounded rank.
    """
    toked = df.select(_toks().alias("ts"))
    uni = (
        toked.select(F.explode("ts").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    totals = uni.agg(F.sum("n_w").cast("bigint").alias("n_tokens"))
    bg = (
        toked.select(F.explode(_bigram_arr(F.col("ts"))).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("n_bg"))
    )
    btot = bg.agg(F.sum("n_bg").cast("bigint").alias("n_bigrams"))
    j = (
        bg.filter(F.col("n_bg") >= min_count)
        .withColumn("w1", F.split_part(F.col("bg"), F.lit(" "), F.lit(1)))
        .withColumn("w2", F.split_part(F.col("bg"), F.lit(" "), F.lit(2)))
        .join(uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2")), "w2")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(btot))
    )
    d = lambda c: F.col(c).cast("double")
    pmi = (
        F.log(
            (d("n_bg") * d("n_tokens") * d("n_tokens"))
            / (d("n_bigrams") * d("n_w1") * d("n_w2"))
        )
        .cast("decimal(18,9)")
        .cast("double")
    )
    scored = j.select(
        "bg",
        "w1",
        "w2",
        F.col("n_bg").alias("n_bigram"),
        "n_w1",
        "n_w2",
        pmi.alias("pmi"),
    )
    topk = scored.orderBy(F.col("pmi").desc(), F.col("bg").asc()).limit(k)
    ranked = bounded_rank(topk, [("pmi", "desc"), ("bg", "asc")], "rank")
    return ranked.select(
        "w1", "w2", "n_bigram", "n_w1", "n_w2", "pmi", "rank"
    )


#: Gopher repetition gate: a document whose single most frequent
#: 2-gram covers more than this fraction of all its 2-gram slots is
#: template/spam-shaped (Rae et al. 2021 §A1.1 uses 0.18-0.20 over
#: the n-gram family; this operator pins the 2-gram member).
REP_TOP_BIGRAM_MAX = 0.18


def repeated_ngram_ratio(docs: DataFrame) -> DataFrame:
    """Per-document repeated-2-gram statistics — the repetition half
    of the Gopher rule set (curation.gopher_quality_flags holds the
    length/lexicon half): total and distinct bigram counts, the top
    bigram's share of all bigram slots, and the repetitive flag.

    Scale shape: explode to (doc_id, bigram) -> ONE map-side-
    combinable count shuffle keyed on the high-cardinality composite
    -> per-doc reduce -> left join back to the doc spine (both sides
    hash-partitioned on doc_id).  Counts are exact integers; the two
    fractions are single int/int double divisions; flags are
    NULL-free on both engines (docs with < 2 tokens have zero
    bigrams and abstain with NULL fractions, FALSE flag).
    """
    toked = docs.select("doc_id", _toks().alias("ts"))
    bgs = toked.select(
        "doc_id", F.explode(_bigram_arr(F.col("ts"))).alias("bg")
    )
    counts = bgs.groupBy("doc_id", "bg").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("_nb"),
        F.max("c").alias("_top"),
        F.count(F.lit(1)).alias("_nd"),
    )
    joined = docs.select("doc_id").join(per_doc, "doc_id", "left")
    top_frac = F.try_divide(F.col("_top").cast("double"), F.col("_nb"))
    distinct_frac = F.try_divide(
        F.col("_nd").cast("double"), F.col("_nb")
    )
    return joined.select(
        "doc_id",
        F.coalesce(F.col("_nb"), F.lit(0)).cast("bigint").alias("n_bigrams"),
        F.coalesce(F.col("_top"), F.lit(0))
        .cast("bigint")
        .alias("top_bigram_n"),
        F.coalesce(F.col("_nd"), F.lit(0))
        .cast("bigint")
        .alias("n_distinct_bigrams"),
        top_frac.alias("top_bigram_frac"),
        distinct_frac.alias("distinct_bigram_frac"),
        F.coalesce(top_frac > REP_TOP_BIGRAM_MAX, F.lit(False)).alias(
            "flag_repetitive"
        ),
    )


QUERIES = {
    "text_token_stats": q_token_stats,
    "repeated_ngram_ratio": lambda spark, sf: repeated_ngram_ratio(
        load_table(spark, sf, "documents")
    ),
    "text_quality_scores": q_quality,
    "text_language_id": q_lang_id,
    "text_fingerprints": q_fingerprints,
    "text_corpus_stats": q_corpus_stats,
    "text_vocab_stats": lambda spark, sf: vocab_stats(
        load_table(spark, sf, "documents")
    ),
    "text_unigram_logprob": lambda spark, sf: unigram_logprob_scores(
        load_table(spark, sf, "documents")
    ),
    "text_bigram_logprob": lambda spark, sf: bigram_logprob_scores(
        load_table(spark, sf, "documents")
    ),
    "pii_scrub": lambda spark, sf: pii_scrub(
        load_table(spark, sf, "documents")
    ),
    "pmi_collocations": lambda spark, sf: pmi_collocations(
        load_table(spark, sf, "documents")
    ),
}


def _pii_scrub_sql() -> str:
    clean = "text"
    counts = []
    for name, pat, repl in PII_RULES:
        counts.append(
            f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
        )
        clean = f"regexp_replace({clean}, '{pat}', '{repl}', 'g')"
    cols = ",\n       ".join(counts)
    return f"""
SELECT doc_id,
       {clean} AS clean_text,
       {cols}
FROM documents
"""

_TOKS = "list_filter(string_split(text, ' '), t -> t <> '')"

ORACLE_REPEATED_NGRAM = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS ts FROM documents),
bgs AS (
  SELECT doc_id,
         UNNEST(list_transform(range(1, len(ts)),
                               i -> ts[i] || ' ' || ts[i + 1])) AS bg
  FROM toks
),
counts AS (SELECT doc_id, bg, COUNT(*) AS c FROM bgs GROUP BY 1, 2),
per_doc AS (
  SELECT doc_id, SUM(c) AS nb, MAX(c) AS topn, COUNT(*) AS nd
  FROM counts GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(nb, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(topn, 0) AS BIGINT) AS top_bigram_n,
       CAST(COALESCE(nd, 0) AS BIGINT) AS n_distinct_bigrams,
       CAST(topn AS DOUBLE) / nb AS top_bigram_frac,
       CAST(nd AS DOUBLE) / nb AS distinct_bigram_frac,
       COALESCE(CAST(topn AS DOUBLE) / nb > {REP_TOP_BIGRAM_MAX}, FALSE)
         AS flag_repetitive
FROM documents d LEFT JOIN per_doc USING (doc_id)
"""


def _stop_hits(words: list[str]) -> str:
    arr = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return f"len(list_filter({_TOKS}, t -> list_contains({arr}, t)))"


_LANG_SCORES = ",\n       ".join(
    f"{_stop_hits(ws)} AS score_{lang}" for lang, ws in LANG_STOPWORDS.items()
)

_BEST = "GREATEST(" + ", ".join(f"score_{lang}" for lang in LANG_STOPWORDS) + ")"
_GUESS = "CASE "
for _lang in LANG_STOPWORDS:
    _GUESS += f"WHEN score_{_lang} = {_BEST} AND {_BEST} > 0 THEN '{_lang}' "
_GUESS += "ELSE 'unk' END"

ORACLES = {
    "repeated_ngram_ratio": ORACLE_REPEATED_NGRAM,
    "text_token_stats": f"""
SELECT doc_id,
       len({_TOKS}) AS n_tokens,
       len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_bpe_tokens,
       len(list_distinct({_TOKS})) AS n_distinct_tokens,
       length(text) AS n_chars_measured,
       strlen(text) AS n_bytes,
       CASE WHEN len({_TOKS}) = 0 THEN NULL
            ELSE CAST(list_reduce(list_transform({_TOKS},
                                                 t -> CAST(length(t) AS BIGINT)),
                                  (acc, x) -> acc + x) AS DOUBLE)
                 / len({_TOKS}) END AS mean_token_len
FROM documents
""",
    "text_quality_scores": f"""
SELECT doc_id, lang,
       len({_TOKS}) AS n_tokens,
       CAST({_stop_hits(QUALITY_STOPWORDS)} AS DOUBLE) / len({_TOKS}) AS stopword_ratio,
       CAST(len(list_distinct({_TOKS})) AS DOUBLE) / len({_TOKS}) AS type_token_ratio,
       len({_TOKS}) < 30 AS too_short
FROM documents
""",
    "text_language_id": f"""
SELECT doc_id, lang,
       {_LANG_SCORES},
       {_GUESS} AS lang_guess
FROM (SELECT doc_id, lang, text FROM documents)
""",
    "text_fingerprints": f"""
SELECT doc_id,
       md5(text) AS exact_fp,
       md5(COALESCE(array_to_string(list_sort(list_distinct({_TOKS})), ' '),
                    '')) AS bow_fp,
       CASE WHEN length(text) = 0 THEN CAST(0 AS BIGINT)
            ELSE list_reduce(
              list_transform(generate_series(1, length(text)),
                             i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)),
              (acc, c) -> (acc * {ROLL_BASE} + c) % {ROLL_MOD}) END AS rolling_fp
FROM documents
""",
    "text_corpus_stats": """
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars
FROM documents
GROUP BY lang, source
""",
    "text_unigram_logprob": f"""
WITH tf AS (
  SELECT term, COUNT(*) AS n_occ
  FROM (SELECT UNNEST({_TOKS}) AS term FROM documents)
  GROUP BY term
),
total AS (SELECT SUM(n_occ) AS total_occ FROM tf),
lm AS (
  SELECT term,
         CAST(ln(CAST(n_occ AS DOUBLE) / CAST(total_occ AS DOUBLE))
              AS DECIMAL(18,9)) AS lp
  FROM tf CROSS JOIN total
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS mean_logprob
FROM (SELECT doc_id, UNNEST({_TOKS}) AS term FROM documents) dt
JOIN lm ON dt.term = lm.term
GROUP BY doc_id
""",
    "text_bigram_logprob": f"""
WITH uni AS (
  SELECT w1, COUNT(*) AS n_w1
  FROM (SELECT UNNEST({_TOKS}) AS w1 FROM documents)
  GROUP BY w1
),
vocab AS (SELECT COUNT(*) AS v FROM uni),
big AS (
  SELECT bg, COUNT(*) AS n_bg
  FROM (
    SELECT UNNEST(list_transform(range(1, len(ts)),
                                 i -> ts[i] || ' ' || ts[i + 1])) AS bg
    FROM (SELECT {_TOKS} AS ts FROM documents)
  )
  GROUP BY bg
),
lm AS (
  SELECT bg,
         CAST(ln((CAST(n_bg AS DOUBLE) + {BIGRAM_SMOOTH_K!r})
                 / (CAST(n_w1 AS DOUBLE)
                    + {BIGRAM_SMOOTH_K!r} * CAST(v AS DOUBLE)))
              AS DECIMAL(18,9)) AS lp
  FROM big
  JOIN uni ON string_split(bg, ' ')[1] = uni.w1
  CROSS JOIN vocab
)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS mean_bigram_logprob
FROM (
  SELECT doc_id,
         UNNEST(list_transform(range(1, len(ts)),
                               i -> ts[i] || ' ' || ts[i + 1])) AS bg
  FROM (SELECT doc_id, {_TOKS} AS ts FROM documents)
) db
JOIN lm ON db.bg = lm.bg
GROUP BY doc_id
""",
    "text_vocab_stats": f"""
WITH tf AS (
  SELECT term, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
  FROM (SELECT doc_id, UNNEST({_TOKS}) AS term FROM documents)
  GROUP BY term
),
total AS (SELECT SUM(n_occurrences) AS total_occ FROM tf)
SELECT term, n_occurrences, n_docs,
       CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, term)
            AS INTEGER) AS rank,
       CAST(SUM(n_occurrences) OVER (ORDER BY n_occurrences DESC, term
                                     ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         / total_occ AS cum_share
FROM tf CROSS JOIN total
""",
}

ORACLES["pii_scrub"] = _pii_scrub_sql()

ORACLES["pmi_collocations"] = f"""
WITH t AS (SELECT {_TOKS} AS ts FROM documents),
uni AS (
  SELECT w, COUNT(*) AS n_w
  FROM (SELECT UNNEST(ts) AS w FROM t) GROUP BY w
),
tot AS (SELECT CAST(SUM(n_w) AS BIGINT) AS n_tokens FROM uni),
big AS (
  SELECT bg, COUNT(*) AS n_bg
  FROM (
    SELECT UNNEST(list_transform(range(1, len(ts)),
                                 i -> ts[i] || ' ' || ts[i + 1])) AS bg
    FROM t
  )
  GROUP BY bg
),
btot AS (SELECT CAST(SUM(n_bg) AS BIGINT) AS n_bigrams FROM big),
j AS (
  SELECT bg, n_bg,
         string_split(bg, ' ')[1] AS w1,
         string_split(bg, ' ')[2] AS w2,
         u1.n_w AS n_w1, u2.n_w AS n_w2,
         n_tokens, n_bigrams
  FROM big
  JOIN uni u1 ON string_split(bg, ' ')[1] = u1.w
  JOIN uni u2 ON string_split(bg, ' ')[2] = u2.w
  CROSS JOIN tot CROSS JOIN btot
  WHERE n_bg >= {PMI_MIN_COUNT}
),
scored AS (
  SELECT bg, w1, w2, n_bg AS n_bigram, n_w1, n_w2,
         CAST(CAST(ln((CAST(n_bg AS DOUBLE) * CAST(n_tokens AS DOUBLE)
                       * CAST(n_tokens AS DOUBLE))
                      / (CAST(n_bigrams AS DOUBLE) * CAST(n_w1 AS DOUBLE)
                         * CAST(n_w2 AS DOUBLE)))
                   AS DECIMAL(18,9)) AS DOUBLE) AS pmi
  FROM j
)
SELECT w1, w2, n_bigram, n_w1, n_w2, pmi,
       CAST(ROW_NUMBER() OVER (ORDER BY pmi DESC, bg) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= {PMI_TOP_K}
"""


# ---------------------------------------------------------------------------
# Zipf rank-frequency slope (round 7b)
# ---------------------------------------------------------------------------

#: OLS fit is restricted to the top ZIPF_MAX_RANK terms per source —
#: the head of the rank-frequency curve, and a hard bound on the
#: windowed table regardless of vocabulary size.
ZIPF_MAX_RANK = 1000


def zipf_slope(docs: DataFrame, max_rank: int = ZIPF_MAX_RANK) -> DataFrame:
    """Per-source Zipf exponent: the OLS slope of ln(frequency) on
    ln(rank) over the top ``max_rank`` terms — Zipf's law predicts
    ~-1 for natural text; a materially flatter slope is the classic
    fingerprint of templated/synthetic corpora (and a drift alarm
    when a source's slope moves between snapshots).

    Scale shape: one map-side-combinable (source, token) count is
    the only corpus-scale pass; ranking runs on the AGGREGATED term
    table (vocabulary-sized, further capped at max_rank rows per
    source), so the rank window's low-cardinality key is fine — its
    input is bounded by vocabulary, never by corpus.  ln() values
    collapse at DECIMAL(18,9), sums accumulate in DECIMAL, and the
    slope is one double expression over exact sums (the lead-lag
    moment pattern).
    """
    cnt = (
        docs.select(F.explode(_toks()).alias("tok"), "source")
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    win = Window.partitionBy("source").orderBy(
        F.col("c").desc(), F.col("tok")
    )
    ranked = cnt.select(
        "source", "c", F.row_number().over(win).alias("rank")
    ).filter(F.col("rank") <= max_rank)
    agg = (
        ranked.selectExpr(
            "source",
            "CAST(LN(CAST(rank AS DOUBLE)) AS DECIMAL(18,9)) AS x",
            "CAST(LN(CAST(c AS DOUBLE)) AS DECIMAL(18,9)) AS y",
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.expr("CAST(SUM(x) AS DOUBLE)").alias("sx"),
            F.expr("CAST(SUM(y) AS DOUBLE)").alias("sy"),
            F.expr("CAST(SUM(x * y) AS DOUBLE)").alias("sxy"),
            F.expr("CAST(SUM(x * x) AS DOUBLE)").alias("sxx"),
        )
    )
    return agg.selectExpr(
        "source",
        "CAST(n_terms AS BIGINT) AS n_terms",
        "CAST(CAST(try_divide(n_terms * sxy - sx * sy,"
        " n_terms * sxx - sx * sx) AS DECIMAL(18,9)) AS DOUBLE)"
        " AS zipf_slope",
    )


QUERIES["zipf_slope"] = lambda spark, sf: zipf_slope(
    load_table(spark, sf, "documents")
)

ORACLES["zipf_slope"] = f"""
WITH cnt AS (
  SELECT source, UNNEST({_TOKS}) AS tok, 1 AS one
  FROM documents
),
agg AS (
  SELECT source, tok, COUNT(*) AS c FROM cnt GROUP BY 1, 2
),
ranked AS (
  SELECT source, c,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY c DESC, tok) AS rank
  FROM agg
  QUALIFY rank <= {ZIPF_MAX_RANK}
),
xy AS (
  SELECT source,
         CAST(LN(CAST(rank AS DOUBLE)) AS DECIMAL(18,9)) AS x,
         CAST(LN(CAST(c AS DOUBLE)) AS DECIMAL(18,9)) AS y
  FROM ranked
),
m AS (
  SELECT source, COUNT(*) AS n_terms,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * y) AS DOUBLE) AS sxy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx
  FROM xy GROUP BY 1
)
SELECT source, CAST(n_terms AS BIGINT) AS n_terms,
       CAST(CAST((n_terms * sxy - sx * sy)
            / NULLIF(n_terms * sxx - sx * sx, 0)
            AS DECIMAL(18,9)) AS DOUBLE) AS zipf_slope
FROM m
"""


# ---------------------------------------------------------------------------
# Heaps' law vocabulary-growth fit (round 9)
# ---------------------------------------------------------------------------


def heaps_law_fit(docs: DataFrame) -> DataFrame:
    """Heaps'-law fit V(N) = K·N^beta of the corpus's vocabulary
    growth curve — the companion diagnostic to :func:`zipf_slope`
    (natural text: beta ~ 0.4-0.6; templated/synthetic corpora grow
    vocabulary much slower, and a beta shift between snapshots flags
    an ingest-mix change).  Observations are the cumulative
    (tokens-so-far, distinct-terms-so-far) after each document in
    doc_id order; the fit is OLS of ln V on ln N.

    Scale shapes:
    * cumulative DISTINCT is NOT a running set: each term contributes
      at its FIRST document only, so one (term -> min doc_id)
      aggregate turns the running distinct into a running SUM of
      per-doc new-term counts — vocabulary-sized intermediate, no
      state, no rescan;
    * both running sums come from distwindow.keyed_running_totals
      with key_cols=[] (the de-skewed GLOBAL prefix sum: range
      partitions + broadcast offsets — never a single-task window);
    * ln() observations collapse at DECIMAL(18,9); the moment sums
      accumulate exactly in DECIMAL (the zipf_slope pattern) and the
      slope/intercept are one double expression over exact sums.
    """
    from .distwindow import keyed_running_totals

    toks = docs.select("doc_id", F.explode(_toks()).alias("tok"))
    newt = (
        toks.groupBy("tok")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("nv"))
    )
    spine = (
        docs.select("doc_id", F.size(_toks()).alias("nt"))
        .join(newt, "doc_id", "left")
        .select("doc_id", "nt", F.coalesce("nv", F.lit(0)).alias("nv"))
        # doc-count-sized 3-int spine, materialized ONCE (round 10):
        # the global prefix-sum pass reads it three ways and would
        # re-run the corpus explode + two groupBys + join per branch.
        # persist() at cluster scale.
        .transform(materialize)
    )
    cum = keyed_running_totals(
        spine,
        key_cols=[],
        order_by=["doc_id"],
        weights={"cum_tokens": "nt", "cum_vocab": "nv"},
    )
    pts = cum.filter(
        (F.col("cum_tokens") > 0) & (F.col("cum_vocab") > 0)
    ).selectExpr(
        "CAST(LN(CAST(cum_tokens AS DOUBLE)) AS DECIMAL(18,9)) AS x",
        "CAST(LN(CAST(cum_vocab AS DOUBLE)) AS DECIMAL(18,9)) AS y",
    )
    m = pts.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.expr("CAST(SUM(x) AS DOUBLE)").alias("sx"),
        F.expr("CAST(SUM(y) AS DOUBLE)").alias("sy"),
        F.expr("CAST(SUM(x * y) AS DOUBLE)").alias("sxy"),
        F.expr("CAST(SUM(x * x) AS DOUBLE)").alias("sxx"),
    )
    return m.selectExpr(
        "CAST(n_points AS BIGINT) AS n_points",
        "CAST(CAST(try_divide(n_points * sxy - sx * sy,"
        " n_points * sxx - sx * sx) AS DECIMAL(18,9)) AS DOUBLE)"
        " AS heaps_beta",
        "CAST(CAST(try_divide(sy - try_divide(n_points * sxy - sx * sy,"
        " n_points * sxx - sx * sx) * sx, n_points) AS DECIMAL(18,9))"
        " AS DOUBLE) AS heaps_log_k",
    )


QUERIES["heaps_law_fit"] = lambda spark, sf: heaps_law_fit(
    load_table(spark, sf, "documents")
)

ORACLES["heaps_law_fit"] = f"""
WITH toks AS (
  SELECT doc_id, UNNEST({_TOKS}) AS tok FROM documents
),
newt AS (
  SELECT doc_id, COUNT(*) AS nv FROM (
    SELECT tok, MIN(doc_id) AS doc_id FROM toks GROUP BY tok
  ) GROUP BY doc_id
),
spine AS (
  SELECT d.doc_id, len({_TOKS}) AS nt, COALESCE(n.nv, 0) AS nv
  FROM documents d LEFT JOIN newt n USING (doc_id)
),
cum AS (
  SELECT doc_id,
         CAST(SUM(nt) OVER (ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_tokens,
         CAST(SUM(nv) OVER (ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_vocab
  FROM spine
),
xy AS (
  SELECT CAST(LN(CAST(cum_tokens AS DOUBLE)) AS DECIMAL(18,9)) AS x,
         CAST(LN(CAST(cum_vocab AS DOUBLE)) AS DECIMAL(18,9)) AS y
  FROM cum WHERE cum_tokens > 0 AND cum_vocab > 0
),
m AS (
  SELECT COUNT(*) AS n_points,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * y) AS DOUBLE) AS sxy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx
  FROM xy
)
SELECT CAST(n_points AS BIGINT) AS n_points,
       CAST(CAST((n_points * sxy - sx * sy)
                 / (n_points * sxx - sx * sx) AS DECIMAL(18,9)) AS DOUBLE)
         AS heaps_beta,
       CAST(CAST((sy - (n_points * sxy - sx * sy)
                       / (n_points * sxx - sx * sx) * sx)
                 / n_points AS DECIMAL(18,9)) AS DOUBLE) AS heaps_log_k
FROM m
"""
