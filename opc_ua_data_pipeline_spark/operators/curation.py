"""Round-3 curation operators: classifier scoring, budgeted source
trim, vocabulary-coverage filtering, corpus-level line dedup.

These are the remaining standard steps of a training-data curation
pipeline (alongside dedup.py / text.py / sampling.py / training.py):

* ``quality_classifier`` — a fixed-weight logistic model over the
  interpretable quality features (the deployed form of a fasttext-
  style quality classifier: at inference time it IS a dot product +
  sigmoid, which is exactly expressible as a narrow projection);
* ``source_budget_trim`` — keep the best documents per source until
  a per-source token budget is exhausted (the "data mixing under a
  token budget" step of corpus assembly);
* ``vocab_coverage`` — fraction of a document's tokens covered by
  the top-K corpus vocabulary (OOV-rate filter);
* ``line_dedup`` — CCNet-style corpus-level line deduplication:
  drop every line whose exact content repeats across the corpus at
  least ``threshold`` times, and reassemble documents.

Scale notes (100 TB):
* the classifier and coverage scores are shuffle-free narrow
  projections (coverage joins against a BROADCAST top-K vocab);
* ``source_budget_trim`` is one window per source — parallel across
  sources; the per-source sort is the operator's semantic (documented
  cardinality assumption: #sources >> #executors is not required,
  but a single source's rows must fit a task's sort spill budget,
  which Spark satisfies by spilling to disk);
* ``line_dedup`` shuffles (line_hash) once for the counts and once
  to join them back — both hash-partitioned equi-shuffles; the
  reassembly groupBy(doc_id) is the third. No stage is quadratic
  and no driver-side state exists.

The driver corpus has single-line documents and no duplicate texts,
so ``line_dedup``'s contract row mostly exercises the identity path
end-to-end (split -> count -> join -> reassemble); the real
multi-line/dup semantics are pinned by tests/test_curation_r3.py on
synthetic fixtures.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.materialize import materialize

from ..tables import load_table
from .text import (
    _TOKS,
    _bigrams,
    _stop_hits,
    _toks,
    QUALITY_STOPWORDS,
    unigram_logprob_scores,
)

# ---------------------------------------------------------------------------
# Quality classifier (fixed-weight logistic regression)
# ---------------------------------------------------------------------------

#: Fixed (deployed) classifier weights.  Features are the
#: interpretable quality signals; weights are constants of the
#: operator contract, as they would be after training offline.
CLF_BIAS = -3.0
CLF_W_LOG_TOKENS = 0.6
CLF_W_STOPWORD = 2.5
CLF_W_TTR = 1.5
CLF_W_MEAN_LEN = 0.1
CLF_THRESHOLD = 0.5


def quality_score_col(text_col: str = "text") -> Column:
    """The classifier score as a reusable Column expression (also the
    streaming composition's building block — stateless by
    construction).  Written in the exact textual order of the oracle
    SQL so the double-arithmetic association matches term for term.
    """
    toks = _toks(text_col)
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in QUALITY_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_distinct = F.size(F.array_distinct(toks))
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    z = (
        F.lit(CLF_BIAS)
        + F.lit(CLF_W_LOG_TOKENS) * F.log(F.lit(1.0) + n.cast("double"))
        + F.lit(CLF_W_STOPWORD) * F.try_divide(n_stop.cast("double"), n)
        + F.lit(CLF_W_TTR) * F.try_divide(n_distinct.cast("double"), n)
        + F.lit(CLF_W_MEAN_LEN) * F.try_divide(sum_len.cast("double"), n)
    )
    return (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).cast(
        "decimal(18,9)"
    ).cast("double")


def quality_classifier(docs: DataFrame) -> DataFrame:
    """Score documents with a fixed-weight logistic model.

    score = sigmoid(b + w·[ln(1+n_tokens), stopword_ratio,
    type_token_ratio, mean_token_len]).  All ratio features are exact
    integer-over-integer double divisions (bit-identical across
    engines); ``ln``/``exp`` are libm, so the published score is
    rounded to DECIMAL(18,9) and re-cast to DOUBLE — the same ulp-
    collapsing contract as tfidf_top_terms — and the keep label is
    computed from the ROUNDED score so both engines threshold the
    same number.
    """
    score = quality_score_col()
    return docs.select(
        "doc_id",
        "source",
        F.size(_toks()).alias("n_tokens"),
        score.alias("quality_score"),
        F.coalesce(score >= CLF_THRESHOLD, F.lit(False)).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Per-source token-budget trim
# ---------------------------------------------------------------------------

SOURCE_TOKEN_BUDGET = 3000


def source_budget_trim(
    docs: DataFrame, budget: int = SOURCE_TOKEN_BUDGET
) -> DataFrame:
    """Keep the highest-quality documents of each source until the
    source's token budget is exhausted (greedy by classifier score,
    doc_id tie-break; a document is kept iff its RUNNING token total
    stays within budget).

    NOT a ``Window.partitionBy(source)`` running sum — source is
    low-cardinality, so that window sorts each source's ENTIRE corpus
    in one task at any scale.  The running total instead comes from
    :func:`distwindow.keyed_running_totals`: range-partition on
    (source, -score, doc_id), local running sums, broadcast
    per-partition offsets — exact integer arithmetic throughout, so
    every engine agrees on the cut point and the oracle keeps the
    naive single-window SQL as proof.
    """
    from .distwindow import keyed_running_totals

    # narrow scored projection materialized ONCE (round 10): the rank
    # pass reads its input three ways (sketch/window/counts) and would
    # re-run the per-token classifier per branch.  persist() at scale.
    scored = quality_classifier(docs).transform(materialize)
    ranked = keyed_running_totals(
        scored,
        key_cols=["source"],
        order_by=[("quality_score", False), "doc_id"],
        weights={"cum_tokens": "n_tokens"},
    )
    return ranked.filter(F.col("cum_tokens") <= budget).select(
        "doc_id", "source", "n_tokens", "quality_score", "cum_tokens"
    )


# ---------------------------------------------------------------------------
# Trained quality classifier (deterministic full-batch logistic GD)
# ---------------------------------------------------------------------------

#: Pinned training hyperparameters — constants of the contract, like
#: KMEANS_ITERS / PQ_ITERS (clustering.py): determinism requires the
#: iteration count to be part of the operator's definition.
#: lr=0.2 is the largest probed rate with a strictly DECREASING mse
#: trajectory at every test SF (0.5 oscillates on the mean-token-len
#: feature's ~5x scale); the convergence test pins the decrease.
CLF_TRAIN_LR = 0.2
CLF_TRAIN_ITERS = 4


def _clf_feature_frame(docs: DataFrame) -> DataFrame:
    """The training design matrix: the four quality features of
    :func:`quality_classifier` plus a DISTILLATION label — the
    rule-based Gopher keep flag (:func:`gopher_quality_flags`), the
    standard "smooth the heuristic gates into a score" setup when no
    human labels exist (the documents table has none).

    Exactness: the three ratio features are int/int IEEE divisions;
    the one libm feature (ln(1+n)) is published ulp-collapsed to
    DECIMAL(18,9) so both engines train on the same design matrix.
    Empty documents carry no features and are excluded from training
    (WHERE n_tokens > 0 on both engines).
    """
    toks = _toks()
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in QUALITY_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_distinct = F.size(F.array_distinct(toks))
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    mean_len = sum_len.cast("double") / n
    alpha_frac = n_alpha.cast("double") / n
    keep = (
        (n >= GOPHER_MIN_WORDS)
        & (n <= GOPHER_MAX_WORDS)
        & (mean_len >= GOPHER_MIN_MEAN_LEN)
        & (mean_len <= GOPHER_MAX_MEAN_LEN)
        & (alpha_frac >= GOPHER_MIN_ALPHA_FRAC)
        & (n_stop >= GOPHER_MIN_STOP_HITS)
    )
    return docs.filter(F.size(_toks()) > 0).select(
        "doc_id",
        F.log(F.lit(1.0) + n.cast("double"))
        .cast("decimal(18,9)")
        .cast("double")
        .alias("x1"),
        (n_stop.cast("double") / n).alias("x2"),
        (n_distinct.cast("double") / n).alias("x3"),
        mean_len.alias("x4"),
        F.when(keep, F.lit(1.0)).otherwise(F.lit(0.0)).alias("y"),
    )


def _clf_sigmoid(z):
    """p = sigmoid(z), ulp-collapsed to DECIMAL(18,9) — the one libm
    call per step, published identically on both engines (the
    quality_classifier contract)."""
    return (
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
        .cast("decimal(18,9)")
        .cast("double")
    )


def _round12(x: float) -> float:
    """Publication/iteration rounding to 12 dp, ROUND_HALF_UP on the
    exact binary double — the same result as Spark's
    CAST(x AS DECIMAL(18,12)) and DuckDB's CAST (both round ties away
    from zero), so every engine iterates on IDENTICAL weights (the
    pagerank per-iteration collapse pattern, graph.py)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(x).quantize(Decimal("1E-12"), ROUND_HALF_UP))


def _clf_train_loop(
    docs: DataFrame,
    lr: float = CLF_TRAIN_LR,
    n_iter: int = CLF_TRAIN_ITERS,
) -> tuple[list[tuple], list[float]]:
    """Deterministic full-batch gradient descent on the logistic loss
    — the iterative-trained-model pattern of kmeans/BPE/PCA
    (clustering.py:122): every step is one map-side-combinable
    6-buffer aggregate (count + five DECIMAL(28,12)-exact sums); the
    driver holds exactly FIVE doubles (the weights) plus the loop
    counter, so the one ``first()`` per step is of the MODEL, never
    of data — the sanctioned bounded collect (BPE argmax precedent).

    Returns (per-iteration rows, final weights).  Row t carries the
    weights in force at step t and the resulting mean squared
    residual; iterations and learning rate are pinned constants, init
    is zero (the loss is convex — no seed needed), and every update
    is plain IEEE double arithmetic on engine-identical inputs, so
    the whole trajectory has an exact unrolled-CTE DuckDB oracle.

    100 TB shape: the design matrix is 5 doubles/doc materialized
    once (localCheckpoint — ~40 B/doc, 0.05% of the corpus; swap for
    persist/checkpoint on a cluster); each of the pinned 3+1 steps is
    a single narrow aggregate.  At that scale you'd train on a
    hash-gated deterministic sample (sampling.py) — same machinery.
    """
    feat = _clf_feature_frame(docs).transform(materialize)
    w = [0.0, 0.0, 0.0, 0.0, 0.0]  # bias, w1..w4
    rows: list[tuple] = []
    for t in range(n_iter + 1):
        z = (
            F.lit(w[0])
            + F.lit(w[1]) * F.col("x1")
            + F.lit(w[2]) * F.col("x2")
            + F.lit(w[3]) * F.col("x3")
            + F.lit(w[4]) * F.col("x4")
        )
        r = _clf_sigmoid(z) - F.col("y")
        agg = feat.select(
            r.alias("r"), "x1", "x2", "x3", "x4"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("r").cast("decimal(28,12)")).alias("gb"),
            F.sum((F.col("r") * F.col("x1")).cast("decimal(28,12)")).alias(
                "g1"
            ),
            F.sum((F.col("r") * F.col("x2")).cast("decimal(28,12)")).alias(
                "g2"
            ),
            F.sum((F.col("r") * F.col("x3")).cast("decimal(28,12)")).alias(
                "g3"
            ),
            F.sum((F.col("r") * F.col("x4")).cast("decimal(28,12)")).alias(
                "g4"
            ),
            F.sum((F.col("r") * F.col("r")).cast("decimal(28,12)")).alias(
                "se"
            ),
        ).first()
        n = agg["n"]
        rows.append(
            (t, w[0], w[1], w[2], w[3], w[4], _round12(float(agg["se"]) / n))
        )
        if t < n_iter:
            grads = [
                float(agg["gb"]) / n,
                float(agg["g1"]) / n,
                float(agg["g2"]) / n,
                float(agg["g3"]) / n,
                float(agg["g4"]) / n,
            ]
            # per-iteration ulp collapse: a rare residual straddle in
            # the 9-dp sigmoid rounding perturbs a gradient sum by
            # ~1e-15; collapsing the UPDATED weights to 12 dp keeps
            # both engines iterating on bit-identical weights instead
            # of letting the ulp ride the whole trajectory
            w = [_round12(w[j] - lr * grads[j]) for j in range(5)]
    return rows, w


def train_quality_classifier(
    docs: DataFrame,
    lr: float = CLF_TRAIN_LR,
    n_iter: int = CLF_TRAIN_ITERS,
) -> DataFrame:
    """The weight trajectory of :func:`_clf_train_loop` as a frame:
    (iter, bias, w_log_tokens, w_stopword, w_ttr, w_mean_len, mse) —
    one row per step incl. the final trained weights (iter=n_iter),
    whose mse is evaluated but not stepped.  The mse column is the
    convergence certificate tests/test_trained_classifier.py pins
    (strictly decreasing)."""
    rows, _ = _clf_train_loop(docs, lr, n_iter)
    return docs.sparkSession.createDataFrame(
        rows,
        "iter int, bias double, w_log_tokens double, w_stopword double,"
        " w_ttr double, w_mean_len double, mse double",
    )


def trained_score_col(weights: list[float], text_col: str = "text"):
    """Serving-side score under TRAINED weights — the same feature
    spelling as the training design matrix (rounded ln(1+n); ratios
    via try_divide, NULL on empty docs) so the model scores exactly
    the features it was fit on."""
    toks = _toks(text_col)
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in QUALITY_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_distinct = F.size(F.array_distinct(toks))
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    x1 = (
        F.log(F.lit(1.0) + n.cast("double"))
        .cast("decimal(18,9)")
        .cast("double")
    )
    z = (
        F.lit(weights[0])
        + F.lit(weights[1]) * x1
        + F.lit(weights[2]) * F.try_divide(n_stop.cast("double"), n)
        + F.lit(weights[3]) * F.try_divide(n_distinct.cast("double"), n)
        + F.lit(weights[4]) * F.try_divide(sum_len.cast("double"), n)
    )
    return _clf_sigmoid(z)


def trained_budget_trim(
    docs: DataFrame,
    budget: int = SOURCE_TOKEN_BUDGET,
    lr: float = CLF_TRAIN_LR,
    n_iter: int = CLF_TRAIN_ITERS,
) -> DataFrame:
    """:func:`source_budget_trim` wired to the TRAINED classifier
    (round-8 verdict item 3's consumer): train, then keep each
    source's best documents under the trained score until the token
    budget is spent — the same distwindow two-pass running total, so
    the only new cost over the fixed-weight trim is the pinned
    training passes."""
    _, w = _clf_train_loop(docs, lr, n_iter)
    from .distwindow import keyed_running_totals

    scored = docs.select(
        "doc_id",
        "source",
        F.size(_toks()).alias("n_tokens"),
        trained_score_col(w).alias("quality_score"),
    ).transform(materialize)
    # ^ materialize the 4-column scored projection ONCE (round 10):
    # the rank pass below reads its input three ways (cutpoint
    # sketch, window branch, counts branch) and would re-run the
    # per-token scoring expression per branch — the
    # quantile_normalize_scores precedent (curation.py, r8).  Narrow
    # by construction; persist() at cluster scale.
    ranked = keyed_running_totals(
        scored,
        key_cols=["source"],
        order_by=[("quality_score", False), "doc_id"],
        weights={"cum_tokens": "n_tokens"},
    )
    return ranked.filter(F.col("cum_tokens") <= budget).select(
        "doc_id", "source", "n_tokens", "quality_score", "cum_tokens"
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage (OOV-rate filter)
# ---------------------------------------------------------------------------

TOP_VOCAB_K = 50
MIN_COVERAGE = 0.5


def vocab_coverage(docs: DataFrame, k: int = TOP_VOCAB_K) -> DataFrame:
    """Per-document coverage by the top-``k`` corpus vocabulary.

    The vocabulary (rank by total occurrences desc, term tie-break —
    the same ranking as text.vocab_stats) is a bounded top-k, so it
    broadcasts; coverage is then a shuffle-free per-row array scan —
    no explode+join per token, the hot path never leaves the scan
    stage.  coverage = covered_tokens / n_tokens is an exact int/int
    double division.
    """
    tf = (
        docs.select(F.explode(_toks()).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    # Top-k via orderBy+limit -> TakeOrderedAndProject (per-partition
    # heap + k-row driver merge), NOT a global row_number window: the
    # vocabulary table is corpus-vocabulary-sized (millions of terms
    # at 100 TB) and a partition-less window funnels it through one
    # task's sort.
    top = tf.orderBy(F.col("n_occ").desc(), F.col("term")).limit(k).select(
        "term"
    )
    toks = _toks()
    per_doc = docs.join(
        F.broadcast(top.agg(F.collect_set("term").alias("vocab"))),
        how="cross",
    )
    covered = F.size(
        F.filter(F.col("_toks"), lambda t: F.array_contains(F.col("vocab"), t))
    )
    n = F.size(F.col("_toks"))
    return (
        per_doc.withColumn("_toks", toks)
        .select(
            "doc_id",
            n.alias("n_tokens"),
            covered.alias("n_covered"),
            F.try_divide(covered.cast("double"), n).alias("coverage"),
            F.coalesce(
                F.try_divide(covered.cast("double"), n) >= MIN_COVERAGE,
                F.lit(False),  # token-less docs are filtered, not NULL
            ).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# Gopher-style heuristic quality gates
# ---------------------------------------------------------------------------

# The rule-based document filters of Rae et al. 2021 (Gopher, §A1.1) —
# the standard pre-filter ahead of any model-based classifier, and the
# one every large-scale text pipeline re-implements: word-count
# bounds, mean-word-length bounds, minimum alphabetic-word fraction,
# and a minimum stop-word hit count (the "is this prose at all" test).
# Every feature is an exact int/int double division over the
# whitespace tokenization shared with quality_classifier, so the
# flags are engine-deterministic; flags on empty documents are FALSE
# (not NULL) on both engines — boolean NULLs cross the two pandas
# bridges differently and are banned from contract outputs.
#
# 100 TB shape: a shuffle-free narrow projection — every feature
# comes from the document's own token array in the scan stage, no
# joins, no windows, no corpus statistics.

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3.0
GOPHER_MAX_MEAN_LEN = 10.0
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOP_HITS = 2


def gopher_quality_flags(docs: DataFrame) -> DataFrame:
    toks = _toks()
    n = F.size(toks)
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    stop_arr = F.array(*[F.lit(s) for s in QUALITY_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    mean_len = F.try_divide(sum_len.cast("double"), n)
    alpha_frac = F.try_divide(n_alpha.cast("double"), n)
    f_words = (n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS)
    f_len = (mean_len >= GOPHER_MIN_MEAN_LEN) & (
        mean_len <= GOPHER_MAX_MEAN_LEN
    )
    f_alpha = alpha_frac >= GOPHER_MIN_ALPHA_FRAC
    f_stop = n_stop >= GOPHER_MIN_STOP_HITS
    return docs.select(
        "doc_id",
        "source",
        n.alias("n_words"),
        mean_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_frac"),
        n_stop.alias("stop_hits"),
        F.coalesce(f_words, F.lit(False)).alias("pass_word_count"),
        F.coalesce(f_len, F.lit(False)).alias("pass_mean_len"),
        F.coalesce(f_alpha, F.lit(False)).alias("pass_alpha_frac"),
        F.coalesce(f_stop, F.lit(False)).alias("pass_stop_hits"),
        F.coalesce(
            f_words & f_len & f_alpha & f_stop, F.lit(False)
        ).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Corpus report card
# ---------------------------------------------------------------------------


def corpus_report(docs: DataFrame) -> DataFrame:
    """Per-source corpus health report: doc counts, token volume,
    mean classifier quality, and keep rate — the one-page summary a
    curation run publishes per ingest batch.

    The mean of the (double) quality scores sums as DECIMAL(18,9) —
    the scores are 9-dp-rounded by construction so the decimal cast
    is lossless, the sum is associative (partition-order-free), and
    one final division yields the identical double everywhere.
    """
    scored = quality_classifier(docs)
    n = F.count(F.lit(1))
    return scored.groupBy("source").agg(
        n.alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        (F.sum("n_tokens").cast("double") / n).alias("mean_tokens"),
        (
            F.sum(F.col("quality_score").cast("decimal(18,9)")).cast(
                "double"
            )
            / n
        ).alias("mean_quality"),
        (F.sum(F.col("keep").cast("int")).cast("double") / n).alias(
            "keep_rate"
        ),
    )


# ---------------------------------------------------------------------------
# Curriculum staging by LM difficulty
# ---------------------------------------------------------------------------

N_CURRICULUM_STAGES = 4


def curriculum_stages(
    docs: DataFrame, n_stages: int = N_CURRICULUM_STAGES
) -> DataFrame:
    """Difficulty-ordered curriculum assignment: stage 1 holds each
    source's most fluent quarter (highest mean unigram log-prob —
    the perplexity proxy from text.unigram_logprob_scores), stage
    ``n_stages`` its hardest.  Easy-to-hard data ordering is the
    standard curriculum schedule; staging WITHIN source keeps the mix
    of domains constant across stages.

    NOT an ``NTILE`` window per source (low-cardinality funnel, as in
    source_budget_trim): the de-skewed two-pass rank plus the closed-
    form NTILE in (rank, n) — distwindow.ntile_expr, the
    value_rank_profile decomposition — gives the identical stage
    labels with partitions bounded by range-partition size.  Ordering
    ties break on doc_id and the score itself is decimal-summed, so
    the stage boundaries are engine-exact.
    """
    from .distwindow import keyed_running_totals, ntile_expr

    scored = unigram_logprob_scores(docs)
    joined = docs.select("doc_id", "source").join(scored, "doc_id")
    ranked = keyed_running_totals(
        joined,
        key_cols=["source"],
        order_by=[("mean_logprob", False), "doc_id"],
    )
    return ranked.select(
        "doc_id",
        "source",
        "n_tokens",
        "mean_logprob",
        ntile_expr(F.col("_rank"), F.col("_n"), n_stages).alias("stage"),
    )


# ---------------------------------------------------------------------------
# Corpus-level line dedup (CCNet-style)
# ---------------------------------------------------------------------------

LINE_DUP_THRESHOLD = 2


def line_dedup(
    docs: DataFrame, threshold: int = LINE_DUP_THRESHOLD
) -> DataFrame:
    """Drop every (trimmed, non-empty) line whose exact content occurs
    at least ``threshold`` times across the corpus; reassemble each
    document from its kept lines in original order.

    Shape: posexplode lines -> groupBy(md5(line)) counts -> equi-join
    back on the digest (hash-partitioned; the digest keeps the
    shuffle key 32 bytes regardless of line length) -> groupBy(doc_id)
    ordered reassembly.  Three shuffles, none quadratic, nothing on
    the driver.
    """
    lines = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.transform(F.split("text", "\n"), lambda l: F.trim(l)),
                lambda l: l != "",
            )
        ).alias("pos", "line"),
    ).withColumn("lh", F.md5("line"))
    counts = lines.groupBy("lh").agg(F.count(F.lit(1)).alias("n_occ"))
    kept = (
        lines.join(counts, "lh")
        .withColumn("is_dup", F.col("n_occ") >= threshold)
    )
    assembled = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.count(F.when(~F.col("is_dup"), 1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("is_dup"),
                            F.struct(F.col("pos"), F.col("line")),
                        )
                    )
                ),
                lambda s: s.getField("line"),
            ),
            "\n",
        ).alias("clean_text"),
    )
    # Left join keeps documents whose every line was empty/blank.
    return (
        docs.select("doc_id")
        .join(assembled, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


# ---------------------------------------------------------------------------
# Score-decile calibration profile
# ---------------------------------------------------------------------------

SCORE_DECILES = 10


def score_decile_profile(docs: DataFrame) -> DataFrame:
    """Per-decile profile of the quality-classifier score distribution
    — the calibration/drift artifact an ML-ops loop diffs week over
    week (PSI's decile-grain sibling): rank ALL docs by score, cut
    into 10 equal buckets, and summarize each (count, score range,
    mean tokens, keep share).

    The naive spelling is ``NTILE(10) OVER (ORDER BY score)`` — an
    unpartitioned single-task sort of the whole corpus.  Here the
    decile comes from the distwindow GLOBAL two-pass rank +
    closed-form ntile (the rfm_segments machinery), so no task ever
    sees more than a range partition; the profile aggregate after it
    is 10 groups, map-side combinable.  avg_tokens is an exact
    BIGINT sum with ONE IEEE division; scores are already
    DECIMAL(18,9)-collapsed doubles, so min/max hash exactly.
    """
    from .distwindow import keyed_running_totals, ntile_expr

    # materialized once for the same three-branch reason as
    # source_budget_trim (round 10); persist() at cluster scale
    scored = quality_classifier(docs).transform(materialize)
    t = keyed_running_totals(
        scored,
        [],
        [("quality_score", False), "doc_id"],
        rank_col="_rank",
        n_col="_n",
    )
    dec = ntile_expr(F.col("_rank"), F.col("_n"), SCORE_DECILES)
    return (
        t.withColumn("decile", dec)
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("quality_score").alias("max_score"),
            F.min("quality_score").alias("min_score"),
            (
                F.sum("n_tokens").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_tokens"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_keep"),
        )
    )


# ---------------------------------------------------------------------------
# Driver-contract queries + DuckDB oracles
# ---------------------------------------------------------------------------


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_classifier(load_table(spark, sf_dir, "documents"))


def q_score_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return score_decile_profile(load_table(spark, sf_dir, "documents"))


def q_source_budget_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return source_budget_trim(load_table(spark, sf_dir, "documents"))


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_coverage(load_table(spark, sf_dir, "documents"))


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return line_dedup(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# DSIR-style importance weighting (hashed n-gram LM ratio)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 512
DSIR_TARGET_LANG = "en"


def dsir_importance(
    df: DataFrame,
    target_lang: str = DSIR_TARGET_LANG,
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Importance weights for Data Selection via Importance Resampling
    (the DSIR recipe: hashed-n-gram bag models of a TARGET slice vs
    the RAW corpus; per-doc weight = log p_target(x) - log p_raw(x);
    downstream, resample proportional to the weight — the selection
    step this repo already owns as ``sampling.weighted_sample_topk``).

    Features: unigrams + adjacent bigrams hashed to ``n_buckets``
    buckets (md5 first 4 hex chars mod B — the one hash both engines
    spell identically).  Both bag models are add-one smoothed over
    the full bucket range, so buckets the target never hits
    contribute a finite penalty instead of -inf.

    Scale shape: two bucket-count aggregates (map-side combinable,
    output = B rows each), one broadcast of the B-row log-ratio
    table, one groupBy(doc).  The model tables are CONSTANT-SIZE by
    construction — unlike a raw-vocab LM there is no Heaps-law growth,
    which is the point of hashed features at 100 TB.  ``ln`` is libm,
    so each bucket's log-ratio is rounded to DECIMAL(18,9) before the
    exact decimal per-doc sum (the unigram-LM contract).  Token-less
    docs keep weight 0 (empty product = ratio 1), keeping the
    operator total on degenerate corpora.
    """
    # ONE tokenize+hash pass: everything downstream (both bag models,
    # the totals, the per-doc weighted sum) derives from the compact
    # (doc, lang, bucket, cnt) frame — <= min(#feats, B) rows per doc.
    # The three consumers share the identical aggregate subtree, so
    # Spark's exchange reuse materializes the shuffle once (measured
    # 2.7 -> ~1 s warm at sf0.1: the corpus-wide md5 was the cost).
    occ = df.select(
        "doc_id",
        "lang",
        F.explode(F.concat(_toks(), _bigrams())).alias("g"),
    ).select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5("g"), 1, 4), 16, 10).cast("bigint")
            % n_buckets
        )
        .cast("int")
        .alias("b"),
    )
    doc_b = occ.groupBy("doc_id", "lang", "b").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    spark = df.sparkSession
    spine = spark.range(n_buckets).select(F.col("id").cast("int").alias("b"))
    raw_counts = doc_b.groupBy("b").agg(F.sum("cnt").alias("n_raw"))
    tgt_counts = (
        doc_b.filter(F.col("lang") == target_lang)
        .groupBy("b")
        .agg(F.sum("cnt").alias("n_tgt"))
    )
    totals = doc_b.agg(F.sum("cnt").alias("r_total")).crossJoin(
        doc_b.filter(F.col("lang") == target_lang).agg(
            F.coalesce(F.sum("cnt"), F.lit(0)).alias("t_total")
        )
    )
    ratio = (
        spine.join(raw_counts, "b", "left")
        .join(tgt_counts, "b", "left")
        .crossJoin(F.broadcast(totals))
        .selectExpr(
            "b",
            f"CAST(ln(CAST(COALESCE(n_tgt, 0) + 1 AS DOUBLE)"
            f" / CAST(t_total + {n_buckets} AS DOUBLE))"
            f" - ln(CAST(COALESCE(n_raw, 0) + 1 AS DOUBLE)"
            f" / CAST(r_total + {n_buckets} AS DOUBLE))"
            " AS DECIMAL(18,9)) AS delta",
        )
    )
    # sum(cnt * delta) == sum of cnt copies of delta — but only if the
    # product stays exact: BIGINT(= DECIMAL(20,0)) x DECIMAL(18,9)
    # needs precision 39 > 38, and Spark silently rounds the overflow
    # (caught by the oracle at the 1e-8 digit).  A per-(doc, bucket)
    # count fits DECIMAL(10,0), keeping the product at (29,9): exact,
    # bit-identical to the oracle's per-occurrence sum.
    per_doc = (
        doc_b.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_feats"),
            F.expr(
                "CAST(SUM(CAST(cnt AS DECIMAL(10,0)) * delta) AS DOUBLE)"
            ).alias("log_importance"),
        )
    )
    return (
        df.select("doc_id", "lang")
        .join(per_doc, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "lang",
            "CAST(COALESCE(n_feats, 0) AS BIGINT) AS n_feats",
            "COALESCE(log_importance, 0.0) AS log_importance",
        )
    )


def q_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dsir_importance(load_table(spark, sf_dir, "documents"))


def q_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curriculum_stages(load_table(spark, sf_dir, "documents"))


def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_report(load_table(spark, sf_dir, "documents"))


def q_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gopher_quality_flags(load_table(spark, sf_dir, "documents"))


def classifier_auc(docs: DataFrame, pos_lang: str = "en") -> DataFrame:
    """ROC-AUC of the quality classifier's score as a predictor of a
    binary document label (default: lang == 'en') — the evaluation a
    curation pipeline publishes next to the classifier itself
    (filter-vs-filter agreement; Mann-Whitney U ≡ AUC).

    Exactness: AUC is computed from the rank-sum with MID-RANK tie
    handling — per distinct (already DECIMAL(18,9)-collapsed) score,
    (count, positives) aggregate first, then the cumulative count
    runs over the distinct-score spine via
    :func:`distwindow.keyed_running_totals` (never a global sort).
    Doubled average rank ``2*cum - c + 1`` keeps everything integer;
    the rank-sum accumulates in DECIMAL(38,0) (HUGEINT in the oracle
    — at 10^10 docs the sum reaches ~2N², past int64), and the only
    float op is the final one division of exact operands.  Output is
    one row: (n_pos, n_neg, auc).
    """
    from .distwindow import keyed_running_totals

    per = (
        docs.select(
            quality_score_col().alias("s"),
            (F.col("lang") == pos_lang).cast("long").alias("p"),
        )
        .filter(F.col("s").isNotNull())
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("p").alias("np"))
        # distinct-score-sized; the rank pass below reads it three
        # ways (sketch/window/counts) and would re-run the corpus
        # scan + classifier + groupBy per branch (round 10; the
        # quantile_normalize_scores precedent).  persist() at scale.
        .transform(materialize)
    )
    cum = keyed_running_totals(per, [], ["s"], weights={"cumc": "c"})
    r2 = 2 * F.col("cumc") - F.col("c") + 1
    agg = cum.agg(
        F.sum("np").alias("n_pos"),
        F.sum(F.col("c") - F.col("np")).alias("n_neg"),
        F.sum((F.col("np") * r2).cast("decimal(38,0)")).alias("rsum2"),
    )
    num = F.col("rsum2") - (
        F.col("n_pos").cast("decimal(38,0)") * (F.col("n_pos") + 1)
    )
    den = (
        F.lit(2).cast("decimal(38,0)")
        * F.col("n_pos")
        * F.col("n_neg")
    )
    return agg.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.try_divide(num.cast("double"), den.cast("double")).alias("auc"),
    )


def q_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return classifier_auc(load_table(spark, sf_dir, "documents"))


def quantile_normalize_scores(docs: DataFrame) -> DataFrame:
    """Cross-source score calibration by quantile normalization: map
    each document's per-source score quantile onto the GLOBAL score
    distribution (the value at the same quantile position), so
    per-source classifier bias stops skewing downstream budget trims
    and curriculum stages — the calibration step a multi-source
    curation pipeline runs before comparing scores across domains.

    Exact-arithmetic formulation (no interpolation, no parity risk):
    with per-source rank r_s of n_s and global size N, the target
    global rank is ``g = 1 + ((r_s - 1) * (N - 1)) DIV (n_s - 1)``
    (single-doc sources map to the global median rank) — all integer;
    norm_score is then the ACTUAL global score at rank g, fetched by
    an integer equi-join against the globally ranked frame.  Both
    rank passes are :func:`distwindow.keyed_running_totals`
    (deterministic buckets, no per-source or global sort task); the
    rank join shuffles on uniform integers.
    """
    from .distwindow import keyed_running_totals, sample_cutpoints

    scored = docs.select(
        "doc_id", "source", quality_score_col().alias("quality_score")
    ).filter(F.col("quality_score").isNotNull())
    # materialize the 3-column scored projection ONCE: the two rank
    # passes below would otherwise re-run the per-token classifier
    # expression ~6x (each pass = quantile sample + window branch +
    # counts branch).  This is a NARROW checkpoint by construction —
    # not the full-width fact materialization round 7 removed from
    # distwindow — and measured 3.8 s -> ~1.5 s warm at sf0.1.  At
    # cluster scale, persist() is the executor-loss-tolerant form.
    scored = scored.transform(materialize)
    # one cutpoint-sketch job shared by BOTH rank passes (they order
    # by the same column over the same frame)
    cuts = sample_cutpoints(scored, ["quality_score"]).get("quality_score")
    per_src = keyed_running_totals(
        scored,
        ["source"],
        ["quality_score", "doc_id"],
        rank_col="_rs",
        n_col="_ns",
        cuts=cuts,
    )
    glob = keyed_running_totals(
        scored,
        [],
        ["quality_score", "doc_id"],
        rank_col="_rg",
        n_col="_n",
        cuts=cuts,
    )
    # integer target rank: 1 + ((rs-1)*(N-1)) DIV (ns-1) — DECIMAL(38,0)
    # product (past int64 at 10^10 rows), integral DIV (== floor on
    # positives, DuckDB's // twin), no float anywhere
    g = F.expr(
        "CASE WHEN _ns > 1 THEN"
        " 1 + CAST((CAST(_rs - 1 AS DECIMAL(38,0)) * (_n - 1))"
        " DIV (_ns - 1) AS BIGINT)"
        " ELSE 1 + (_n - 1) DIV 2 END"
    )
    mapped = per_src.crossJoin(
        F.broadcast(glob.agg(F.max("_n").alias("_n")))
    ).select(
        "doc_id",
        "source",
        "quality_score",
        g.alias("_g"),
    )
    lookup = glob.select(
        F.col("_rg").alias("_g"), F.col("quality_score").alias("norm_score")
    )
    return mapped.join(lookup, "_g").select(
        "doc_id", "source", "quality_score", "norm_score"
    )


def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quantile_normalize_scores(load_table(spark, sf_dir, "documents"))


QUERIES = {
    "dsir_importance": q_dsir,
    "quality_classifier": q_quality_classifier,
    "source_budget_trim": q_source_budget_trim,
    "vocab_coverage": q_vocab_coverage,
    "line_dedup": q_line_dedup,
    "curriculum_stages": q_curriculum,
    "corpus_report": q_corpus_report,
    "gopher_quality_flags": q_gopher,
    "score_decile_profile": q_score_deciles,
    "classifier_auc": q_classifier_auc,
    "quantile_normalized_scores": q_quantile_normalize,
}

# z written in the same textual order as the Column expression above
# so both engines associate the double additions identically.
_Z_SQL = (
    f"{CLF_BIAS} "
    f"+ {CLF_W_LOG_TOKENS} * ln(1.0 + CAST(len({_TOKS}) AS DOUBLE)) "
    f"+ {CLF_W_STOPWORD} * (CAST({_stop_hits(QUALITY_STOPWORDS)} AS DOUBLE) / len({_TOKS})) "
    f"+ {CLF_W_TTR} * (CAST(len(list_distinct({_TOKS})) AS DOUBLE) / len({_TOKS})) "
    f"+ {CLF_W_MEAN_LEN} * (CASE WHEN len({_TOKS}) = 0 THEN NULL "
    f"ELSE CAST(list_reduce(list_transform({_TOKS}, "
    f"t -> CAST(length(t) AS BIGINT)), (acc, x) -> acc + x) AS DOUBLE) "
    f"/ len({_TOKS}) END)"
)

_SCORE_SQL = f"CAST(CAST(1.0 / (1.0 + exp(-({_Z_SQL}))) AS DECIMAL(18,9)) AS DOUBLE)"

_SUM_LEN_SQL = (
    f"CASE WHEN len({_TOKS}) = 0 THEN 0 "
    f"ELSE list_reduce(list_transform({_TOKS}, "
    f"t -> CAST(length(t) AS BIGINT)), (acc, x) -> acc + x) END"
)
_MEAN_LEN_SQL = (
    f"CAST({_SUM_LEN_SQL} AS DOUBLE) / NULLIF(len({_TOKS}), 0)"
)
_ALPHA_FRAC_SQL = (
    f"CAST(len(list_filter({_TOKS}, t -> regexp_matches(t, '[a-z]'))) "
    f"AS DOUBLE) / NULLIF(len({_TOKS}), 0)"
)

_GOPHER_SQL = f"""
SELECT doc_id, source,
       CAST(len({_TOKS}) AS INT) AS n_words,
       {_MEAN_LEN_SQL} AS mean_word_len,
       {_ALPHA_FRAC_SQL} AS alpha_frac,
       CAST({_stop_hits(QUALITY_STOPWORDS)} AS INT) AS stop_hits,
       COALESCE(len({_TOKS}) >= {GOPHER_MIN_WORDS}
                AND len({_TOKS}) <= {GOPHER_MAX_WORDS}, FALSE)
         AS pass_word_count,
       COALESCE({_MEAN_LEN_SQL} >= {GOPHER_MIN_MEAN_LEN}
                AND {_MEAN_LEN_SQL} <= {GOPHER_MAX_MEAN_LEN}, FALSE)
         AS pass_mean_len,
       COALESCE({_ALPHA_FRAC_SQL} >= {GOPHER_MIN_ALPHA_FRAC}, FALSE)
         AS pass_alpha_frac,
       COALESCE({_stop_hits(QUALITY_STOPWORDS)} >= {GOPHER_MIN_STOP_HITS},
                FALSE) AS pass_stop_hits,
       COALESCE(len({_TOKS}) >= {GOPHER_MIN_WORDS}
                AND len({_TOKS}) <= {GOPHER_MAX_WORDS}
                AND {_MEAN_LEN_SQL} >= {GOPHER_MIN_MEAN_LEN}
                AND {_MEAN_LEN_SQL} <= {GOPHER_MAX_MEAN_LEN}
                AND {_ALPHA_FRAC_SQL} >= {GOPHER_MIN_ALPHA_FRAC}
                AND {_stop_hits(QUALITY_STOPWORDS)}
                    >= {GOPHER_MIN_STOP_HITS}, FALSE) AS keep
FROM documents
"""

_CLF_SQL = f"""
SELECT doc_id, source,
       len({_TOKS}) AS n_tokens,
       {_SCORE_SQL} AS quality_score,
       COALESCE({_SCORE_SQL} >= {CLF_THRESHOLD}, FALSE) AS keep
FROM documents
"""

def _hex4_sql(md5_expr: str) -> str:
    """16-bit int of the first 4 hex chars (DuckDB has no conv()) —
    the cdc spelling, shared bucket hash with the Spark side's
    conv(substring(md5, 1, 4), 16, 10)."""
    e = "0"
    for i in range(4):
        e = (
            f"({e} * 16 + (strpos('0123456789abcdef', "
            f"substr({md5_expr}, {i + 1}, 1)) - 1))"
        )
    return e


_DSIR_SQL = f"""
WITH toks AS (SELECT doc_id, lang, {_TOKS} AS ts FROM documents),
grams AS (
  SELECT doc_id, lang,
         UNNEST(ts || list_transform(range(1, len(ts)),
                                     i -> ts[i] || ' ' || ts[i + 1])) AS g
  FROM toks
),
occ AS (
  SELECT doc_id, lang,
         CAST({_hex4_sql('md5(g)')} % {DSIR_BUCKETS} AS INT) AS b
  FROM grams
),
raw_c AS (SELECT b, COUNT(*) AS n_raw FROM occ GROUP BY b),
tgt_c AS (SELECT b, COUNT(*) AS n_tgt FROM occ
          WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b),
tot AS (SELECT (SELECT COUNT(*) FROM occ) AS r_total,
               (SELECT COUNT(*) FROM occ
                WHERE lang = '{DSIR_TARGET_LANG}') AS t_total),
spine AS (SELECT CAST(UNNEST(range(0, {DSIR_BUCKETS})) AS INT) AS b),
ratio AS (
  SELECT s.b,
         CAST(ln(CAST(COALESCE(n_tgt, 0) + 1 AS DOUBLE)
                 / CAST(t_total + {DSIR_BUCKETS} AS DOUBLE))
              - ln(CAST(COALESCE(n_raw, 0) + 1 AS DOUBLE)
                   / CAST(r_total + {DSIR_BUCKETS} AS DOUBLE))
              AS DECIMAL(18,9)) AS delta
  FROM spine s
  LEFT JOIN raw_c USING (b)
  LEFT JOIN tgt_c USING (b)
  CROSS JOIN tot
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_feats,
         CAST(SUM(delta) AS DOUBLE) AS log_importance
  FROM occ JOIN ratio USING (b) GROUP BY doc_id
)
SELECT d.doc_id, d.lang,
       CAST(COALESCE(p.n_feats, 0) AS BIGINT) AS n_feats,
       COALESCE(p.log_importance, 0.0) AS log_importance
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""

ORACLES = {
    "dsir_importance": _DSIR_SQL,
    "quality_classifier": _CLF_SQL,
    "gopher_quality_flags": _GOPHER_SQL,
    "source_budget_trim": f"""
WITH scored AS (
  SELECT doc_id, source,
         len({_TOKS}) AS n_tokens,
         {_SCORE_SQL} AS quality_score
  FROM documents
)
SELECT doc_id, source, n_tokens, quality_score, cum_tokens
FROM (
  SELECT *,
         -- CAST: DuckDB integer SUM yields HUGEINT -> float64 in
         -- pandas, which hash-mismatches Spark's BIGINT on equal
         -- values (the repo's standing oracle rule for integer sums)
         CAST(SUM(n_tokens) OVER (PARTITION BY source
                                  ORDER BY quality_score DESC, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_tokens
  FROM scored
)
WHERE cum_tokens <= {SOURCE_TOKEN_BUDGET}
""",
    "vocab_coverage": f"""
WITH tf AS (
  SELECT term, COUNT(*) AS n_occ
  FROM (SELECT UNNEST({_TOKS}) AS term FROM documents)
  GROUP BY term
),
vocab AS (
  SELECT list(term) AS v
  FROM (SELECT term FROM (
          SELECT term, ROW_NUMBER() OVER (ORDER BY n_occ DESC, term) AS r
          FROM tf) WHERE r <= {TOP_VOCAB_K})
)
SELECT doc_id,
       len({_TOKS}) AS n_tokens,
       len(list_filter({_TOKS}, t -> list_contains(v, t))) AS n_covered,
       CAST(len(list_filter({_TOKS}, t -> list_contains(v, t))) AS DOUBLE)
         / len({_TOKS}) AS coverage,
       COALESCE(CAST(len(list_filter({_TOKS}, t -> list_contains(v, t)))
                     AS DOUBLE)
                / len({_TOKS}) >= {MIN_COVERAGE}, FALSE) AS keep
FROM documents CROSS JOIN vocab
""",
    "corpus_report": f"""
WITH scored AS (
  SELECT doc_id, source,
         len({_TOKS}) AS n_tokens,
         {_SCORE_SQL} AS quality_score,
         COALESCE({_SCORE_SQL} >= {CLF_THRESHOLD}, FALSE) AS keep
  FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS mean_tokens,
       CAST(SUM(CAST(quality_score AS DECIMAL(18,9))) AS DOUBLE)
         / COUNT(*) AS mean_quality,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS keep_rate
FROM scored
GROUP BY source
""",
    "curriculum_stages": f"""
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
),
scored AS (
  SELECT doc_id,
         COUNT(*) AS n_tokens,
         CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS mean_logprob
  FROM (SELECT doc_id, UNNEST({_TOKS}) AS term FROM documents) dt
  JOIN lm ON dt.term = lm.term
  GROUP BY doc_id
)
SELECT s.doc_id, d.source, n_tokens, mean_logprob,
       CAST(NTILE({N_CURRICULUM_STAGES})
              OVER (PARTITION BY d.source
                    ORDER BY mean_logprob DESC, s.doc_id) AS INTEGER)
         AS stage
FROM scored s JOIN documents d ON s.doc_id = d.doc_id
""",
    "line_dedup": f"""
WITH lines AS (
  SELECT doc_id,
         UNNEST(ls) AS line,
         UNNEST(range(1, len(ls) + 1)) AS pos
  FROM (SELECT doc_id,
               list_filter(list_transform(string_split(text, chr(10)),
                                          l -> trim(l)),
                           l -> l <> '') AS ls
        FROM documents)
),
counts AS (SELECT line, COUNT(*) AS n_occ FROM lines GROUP BY line),
assembled AS (
  SELECT doc_id,
         COUNT(*) AS n_lines,
         COUNT(*) FILTER (WHERE n_occ < {LINE_DUP_THRESHOLD}) AS n_kept,
         COALESCE(string_agg(line, chr(10) ORDER BY pos)
                    FILTER (WHERE n_occ < {LINE_DUP_THRESHOLD}), '')
           AS clean_text
  FROM lines JOIN counts USING (line)
  GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(n_lines, 0) AS n_lines,
       COALESCE(n_kept, 0) AS n_kept,
       COALESCE(clean_text, '') AS clean_text
FROM documents d LEFT JOIN assembled a ON d.doc_id = a.doc_id
""",
}

# the oracle is the naive unpartitioned-NTILE spelling
# score_decile_profile exists to avoid (rfm_segments precedent)
ORACLES["classifier_auc"] = f"""
WITH scored AS (
  SELECT {_SCORE_SQL} AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS p
  FROM documents
),
per AS (
  SELECT s, COUNT(*) AS c, SUM(p) AS np
  FROM scored WHERE s IS NOT NULL GROUP BY 1
),
cum AS (
  SELECT s, c, np,
         SUM(c) OVER (ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cumc
  FROM per
),
agg AS (
  SELECT SUM(np) AS n_pos, SUM(c - np) AS n_neg,
         SUM(CAST(np AS HUGEINT) * (2 * cumc - c + 1)) AS rsum2
  FROM cum
)
SELECT CAST(n_pos AS BIGINT) AS n_pos,
       CAST(n_neg AS BIGINT) AS n_neg,
       CAST(rsum2 - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS DOUBLE)
         / CAST(2 * CAST(n_pos AS HUGEINT) * n_neg AS DOUBLE) AS auc
FROM agg
"""

ORACLES["quantile_normalized_scores"] = f"""
WITH scored AS (
  SELECT doc_id, source, {_SCORE_SQL} AS quality_score
  FROM documents
  WHERE {_SCORE_SQL} IS NOT NULL
),
r AS (
  SELECT doc_id, source, quality_score,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY quality_score, doc_id) AS rs,
         COUNT(*) OVER (PARTITION BY source) AS ns,
         ROW_NUMBER() OVER (ORDER BY quality_score, doc_id) AS rg,
         COUNT(*) OVER () AS n
  FROM scored
),
m AS (
  SELECT doc_id, source, quality_score,
         CASE WHEN ns > 1 THEN
           1 + CAST((CAST(rs - 1 AS HUGEINT) * (n - 1)) // (ns - 1)
                    AS BIGINT)
         ELSE 1 + (n - 1) // 2 END AS g
  FROM r
)
SELECT m.doc_id, m.source, m.quality_score,
       t.quality_score AS norm_score
FROM m JOIN r t ON t.rg = m.g
"""

ORACLES["score_decile_profile"] = f"""
WITH scored AS ({_CLF_SQL}),
dec AS (
  SELECT *,
         NTILE({SCORE_DECILES}) OVER (ORDER BY quality_score DESC, doc_id)
           AS decile
  FROM scored
)
SELECT CAST(decile AS INT) AS decile,
       COUNT(*) AS n_docs,
       MAX(quality_score) AS max_score,
       MIN(quality_score) AS min_score,
       CAST(SUM(n_tokens) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS avg_tokens,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
FROM dec
GROUP BY decile
"""


# ---------------------------------------------------------------------------
# Classifier calibration: reliability bins + Brier decomposition (round 7b)
# ---------------------------------------------------------------------------

#: number of equal-width reliability bins over the [0,1] score range.
CAL_BINS = 10


def _cal_binned(docs: DataFrame, pos_lang: str, nbins: int) -> DataFrame:
    """Per-bin exact aggregates shared by both calibration queries:
    (bin, n_docs, npos, ssum DECIMAL, t2sum DECIMAL) where t2 is the
    per-row squared error (s - y)^2 collapsed at DECIMAL(33,15)."""
    base = docs.select(
        quality_score_col().alias("s"),
        (F.col("lang") == pos_lang).cast("long").alias("y"),
    ).filter(F.col("s").isNotNull())
    return (
        base.selectExpr(
            f"LEAST(CAST(FLOOR(CAST(s AS DECIMAL(18,9)) * {nbins})"
            f" AS INT), {nbins - 1}) AS bin",
            "CAST(s AS DECIMAL(18,9)) AS sd",
            "y",
            "CAST((s - CAST(y AS DOUBLE)) * (s - CAST(y AS DOUBLE))"
            " AS DECIMAL(33,15)) AS t2",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("y").alias("npos"),
            F.sum("sd").alias("ssum"),
            F.sum("t2").alias("t2sum"),
        )
    )


def classifier_calibration(
    docs: DataFrame, pos_lang: str = "en", nbins: int = CAL_BINS
) -> DataFrame:
    """Reliability diagram for the quality classifier: equal-width
    score bins with exact counts, mean predicted score, and the
    empirical positive rate (label: lang == pos_lang, the same proxy
    classifier_auc evaluates).  A well-calibrated filter has
    mean_score ~ frac_pos per bin; the gap is what
    :func:`brier_decomposition` charges as reliability.

    Exactness: scores are already DECIMAL(18,9)-collapsed doubles;
    binning multiplies IN DECIMAL (no float-edge bin flips), sums
    accumulate in DECIMAL, and the two output ratios are single
    divides of exact operands, ulp-collapsed.  One map-side-
    combinable groupBy on a <= nbins key space — scan-bound at any
    scale.
    """
    return calibration_finalize(_cal_binned(docs, pos_lang, nbins))


def calibration_finalize(per_bin: DataFrame) -> DataFrame:
    """Finalize per-bin partials (bin, n_docs, npos, ssum) into the
    calibration rows — shared by the batch operator and the streaming
    twin (the partials are sums, hence mergeable across batches)."""
    return per_bin.selectExpr(
        "bin",
        "n_docs",
        "CAST(npos AS BIGINT) AS n_pos",
        "CAST(CAST(CAST(ssum AS DOUBLE) / n_docs AS DECIMAL(18,9))"
        " AS DOUBLE) AS mean_score",
        "CAST(CAST(CAST(npos AS DOUBLE) / n_docs AS DECIMAL(18,9))"
        " AS DOUBLE) AS frac_pos",
    )


def brier_decomposition(
    docs: DataFrame, pos_lang: str = "en", nbins: int = CAL_BINS
) -> DataFrame:
    """Murphy (1973) decomposition of the classifier's Brier score
    over the reliability bins: BRIER = RELIABILITY - RESOLUTION +
    UNCERTAINTY (exact for bin-conditional means; with fixed-width
    bins the identity holds up to within-bin score variance, which
    the separately-summed brier column exposes).  One row:
    (n_docs, brier, reliability, resolution, uncertainty).

    Exactness: every sum is DECIMAL (per-row squared errors collapsed
    at DECIMAL(33,15) — deterministic in both engines); per-bin
    means collapse at DECIMAL(18,9) before the squared-gap terms,
    which collapse again before the final <= nbins-row DECIMAL sum,
    so no float addition ever depends on row order.
    """
    per = _cal_binned(docs, pos_lang, nbins)
    glob = per.agg(
        F.sum("n_docs").alias("n_total"),
        F.sum("npos").alias("p_total"),
        F.sum("t2sum").alias("b_total"),
    ).selectExpr(
        "n_total",
        "b_total",
        "CAST(CAST(CAST(p_total AS DOUBLE) / n_total AS DECIMAL(18,9))"
        " AS DOUBLE) AS ybar",
    )
    terms = per.crossJoin(F.broadcast(glob)).selectExpr(
        "n_total",
        "b_total",
        "ybar",
        "CAST(CAST(CAST(ssum AS DOUBLE) / n_docs AS DECIMAL(18,9))"
        " AS DOUBLE) AS sbar_k",
        "CAST(CAST(CAST(npos AS DOUBLE) / n_docs AS DECIMAL(18,9))"
        " AS DOUBLE) AS ybar_k",
        "n_docs",
    )
    return (
        terms.selectExpr(
            "n_total",
            "b_total",
            "ybar",
            "CAST(n_docs * (sbar_k - ybar_k) * (sbar_k - ybar_k)"
            " AS DECIMAL(33,15)) AS rel_t",
            "CAST(n_docs * (ybar_k - ybar) * (ybar_k - ybar)"
            " AS DECIMAL(33,15)) AS res_t",
        )
        .groupBy("n_total", "b_total", "ybar")
        .agg(F.sum("rel_t").alias("rel"), F.sum("res_t").alias("res"))
        .selectExpr(
            "CAST(n_total AS BIGINT) AS n_docs",
            "CAST(CAST(CAST(b_total AS DOUBLE) / n_total"
            " AS DECIMAL(18,9)) AS DOUBLE) AS brier",
            "CAST(CAST(CAST(rel AS DOUBLE) / n_total AS DECIMAL(18,9))"
            " AS DOUBLE) AS reliability",
            "CAST(CAST(CAST(res AS DOUBLE) / n_total AS DECIMAL(18,9))"
            " AS DOUBLE) AS resolution",
            "CAST(CAST(ybar * (1.0 - ybar) AS DECIMAL(18,9)) AS DOUBLE)"
            " AS uncertainty",
        )
    )


def q_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    return classifier_calibration(load_table(spark, sf_dir, "documents"))


def q_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return brier_decomposition(load_table(spark, sf_dir, "documents"))


QUERIES["classifier_calibration"] = q_classifier_calibration
QUERIES["brier_decomposition"] = q_brier_decomposition

_CAL_BASE_SQL = f"""
base AS (
  SELECT {_SCORE_SQL} AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
  WHERE {_SCORE_SQL} IS NOT NULL
),
binned AS (
  SELECT LEAST(CAST(FLOOR(CAST(s AS DECIMAL(18,9)) * {CAL_BINS})
               AS INT), {CAL_BINS - 1}) AS bin,
         CAST(s AS DECIMAL(18,9)) AS sd,
         y,
         CAST((s - CAST(y AS DOUBLE)) * (s - CAST(y AS DOUBLE))
              AS DECIMAL(33,15)) AS t2
  FROM base
),
per AS (
  SELECT bin, COUNT(*) AS n_docs, SUM(y) AS npos,
         SUM(sd) AS ssum, SUM(t2) AS t2sum
  FROM binned GROUP BY 1
)"""

ORACLES["classifier_calibration"] = f"""
WITH {_CAL_BASE_SQL}
SELECT bin,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(npos AS BIGINT) AS n_pos,
       CAST(CAST(CAST(ssum AS DOUBLE) / n_docs AS DECIMAL(18,9))
            AS DOUBLE) AS mean_score,
       CAST(CAST(CAST(npos AS DOUBLE) / n_docs AS DECIMAL(18,9))
            AS DOUBLE) AS frac_pos
FROM per
"""

ORACLES["brier_decomposition"] = f"""
WITH {_CAL_BASE_SQL},
gtot AS (
  SELECT SUM(n_docs) AS n_total, SUM(t2sum) AS b_total,
         CAST(CAST(CAST(SUM(npos) AS DOUBLE) / SUM(n_docs)
              AS DECIMAL(18,9)) AS DOUBLE) AS ybar
  FROM per
),
terms AS (
  SELECT n_total, b_total, ybar,
         CAST(n_docs * (CAST(CAST(CAST(ssum AS DOUBLE) / n_docs
                AS DECIMAL(18,9)) AS DOUBLE)
              - CAST(CAST(CAST(npos AS DOUBLE) / n_docs
                AS DECIMAL(18,9)) AS DOUBLE))
            * (CAST(CAST(CAST(ssum AS DOUBLE) / n_docs
                AS DECIMAL(18,9)) AS DOUBLE)
              - CAST(CAST(CAST(npos AS DOUBLE) / n_docs
                AS DECIMAL(18,9)) AS DOUBLE))
              AS DECIMAL(33,15)) AS rel_t,
         CAST(n_docs * (CAST(CAST(CAST(npos AS DOUBLE) / n_docs
                AS DECIMAL(18,9)) AS DOUBLE) - ybar)
            * (CAST(CAST(CAST(npos AS DOUBLE) / n_docs
                AS DECIMAL(18,9)) AS DOUBLE) - ybar)
              AS DECIMAL(33,15)) AS res_t
  FROM per, gtot
)
SELECT CAST(n_total AS BIGINT) AS n_docs,
       CAST(CAST(CAST(b_total AS DOUBLE) / n_total AS DECIMAL(18,9))
            AS DOUBLE) AS brier,
       CAST(CAST(CAST(SUM(rel_t) AS DOUBLE) / n_total
            AS DECIMAL(18,9)) AS DOUBLE) AS reliability,
       CAST(CAST(CAST(SUM(res_t) AS DOUBLE) / n_total
            AS DECIMAL(18,9)) AS DOUBLE) AS resolution,
       CAST(CAST(ybar * (1.0 - ybar) AS DECIMAL(18,9)) AS DOUBLE)
         AS uncertainty
FROM terms
GROUP BY n_total, b_total, ybar
"""


# ---------------------------------------------------------------------------
# Trained-classifier contract queries + unrolled-GD oracle (round 9)
# ---------------------------------------------------------------------------


def q_train_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return train_quality_classifier(load_table(spark, sf_dir, "documents"))


def q_trained_budget_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return trained_budget_trim(load_table(spark, sf_dir, "documents"))


QUERIES["train_quality_classifier"] = q_train_quality_classifier
QUERIES["trained_budget_trim"] = q_trained_budget_trim

# Feature spellings of the training design matrix — written in the
# exact shape of _clf_feature_frame so both engines fit the same
# matrix (ratios are exact int/int IEEE divisions; the one libm
# feature ln(1+n) is ulp-collapsed to DECIMAL(18,9)).
_TRAIN_X1 = (
    f"CAST(CAST(ln(1.0 + CAST(len({_TOKS}) AS DOUBLE)) AS DECIMAL(18,9))"
    f" AS DOUBLE)"
)
_TRAIN_X2 = (
    f"(CAST({_stop_hits(QUALITY_STOPWORDS)} AS DOUBLE) / len({_TOKS}))"
)
_TRAIN_X3 = f"(CAST(len(list_distinct({_TOKS})) AS DOUBLE) / len({_TOKS}))"
_TRAIN_X4 = f"(CAST({_SUM_LEN_SQL} AS DOUBLE) / len({_TOKS}))"
_TRAIN_Y = f"""CASE WHEN COALESCE(
       len({_TOKS}) >= {GOPHER_MIN_WORDS}
       AND len({_TOKS}) <= {GOPHER_MAX_WORDS}
       AND {_MEAN_LEN_SQL} >= {GOPHER_MIN_MEAN_LEN}
       AND {_MEAN_LEN_SQL} <= {GOPHER_MAX_MEAN_LEN}
       AND {_ALPHA_FRAC_SQL} >= {GOPHER_MIN_ALPHA_FRAC}
       AND {_stop_hits(QUALITY_STOPWORDS)} >= {GOPHER_MIN_STOP_HITS},
       FALSE) THEN 1.0 ELSE 0.0 END"""

#: serving-side spellings (NULL-safe on empty docs, matching
#: trained_score_col's try_divide)
_SERVE_X2 = (
    f"(CAST({_stop_hits(QUALITY_STOPWORDS)} AS DOUBLE)"
    f" / NULLIF(len({_TOKS}), 0))"
)
_SERVE_X3 = (
    f"(CAST(len(list_distinct({_TOKS})) AS DOUBLE)"
    f" / NULLIF(len({_TOKS}), 0))"
)


def _clf_train_ctes(
    lr: float = CLF_TRAIN_LR, n_iter: int = CLF_TRAIN_ITERS
) -> str:
    """The gradient-descent loop of _clf_train_loop unrolled into a
    WITH-clause body (the kmeans_cte_body pattern, clustering.py):
    it{t} carries the step-t weights, s{t} the step-t gradient sums —
    every arithmetic op mirrors the Spark side textually, so the
    weight trajectory is double-for-double identical."""
    ctes = [
        f"""clf_feat AS (
  SELECT doc_id, {_TRAIN_X1} AS x1, {_TRAIN_X2} AS x2,
         {_TRAIN_X3} AS x3, {_TRAIN_X4} AS x4,
         {_TRAIN_Y} AS y
  FROM documents WHERE len({_TOKS}) > 0
)""",
        "it0 AS (SELECT CAST(0.0 AS DOUBLE) AS b, CAST(0.0 AS DOUBLE) AS w1,"
        " CAST(0.0 AS DOUBLE) AS w2, CAST(0.0 AS DOUBLE) AS w3,"
        " CAST(0.0 AS DOUBLE) AS w4",
    ]
    ctes[1] += ")"
    for t in range(n_iter + 1):
        ctes.append(
            f"""s{t} AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(r AS DECIMAL(28,12))) AS gb,
         SUM(CAST(r * x1 AS DECIMAL(28,12))) AS g1,
         SUM(CAST(r * x2 AS DECIMAL(28,12))) AS g2,
         SUM(CAST(r * x3 AS DECIMAL(28,12))) AS g3,
         SUM(CAST(r * x4 AS DECIMAL(28,12))) AS g4,
         SUM(CAST(r * r AS DECIMAL(28,12))) AS se
  FROM (SELECT x1, x2, x3, x4,
               CAST(CAST(1.0 / (1.0 + exp(-(b + w1 * x1 + w2 * x2
                    + w3 * x3 + w4 * x4))) AS DECIMAL(18,9)) AS DOUBLE)
                 - y AS r
        FROM clf_feat CROSS JOIN it{t})
)"""
        )
        if t < n_iter:
            # the updated weights collapse to DECIMAL(18,12) exactly
            # like the Spark side's _round12 — both engines iterate
            # on bit-identical weights
            upd = ",\n         ".join(
                f"CAST(CAST({c} - {lr} * (CAST(g{g} AS DOUBLE) / n)"
                f" AS DECIMAL(18,12)) AS DOUBLE) AS {c}"
                for c, g in (
                    ("b", "b"),
                    ("w1", "1"),
                    ("w2", "2"),
                    ("w3", "3"),
                    ("w4", "4"),
                )
            )
            ctes.append(
                f"""it{t + 1} AS (
  SELECT {upd}
  FROM it{t} CROSS JOIN s{t}
)"""
            )
    return ",\n".join(ctes)


def _train_clf_oracle(
    lr: float = CLF_TRAIN_LR, n_iter: int = CLF_TRAIN_ITERS
) -> str:
    selects = [
        f"SELECT CAST({t} AS INTEGER) AS iter, b AS bias,"
        f" w1 AS w_log_tokens, w2 AS w_stopword, w3 AS w_ttr,"
        f" w4 AS w_mean_len,"
        f" CAST(CAST(CAST(se AS DOUBLE) / n AS DECIMAL(18,12)) AS DOUBLE)"
        f" AS mse"
        f" FROM it{t} CROSS JOIN s{t}"
        for t in range(n_iter + 1)
    ]
    return (
        "WITH "
        + _clf_train_ctes(lr, n_iter)
        + "\n"
        + "\nUNION ALL\n".join(selects)
    )


def _trained_trim_oracle(
    lr: float = CLF_TRAIN_LR, n_iter: int = CLF_TRAIN_ITERS
) -> str:
    return f"""
WITH {_clf_train_ctes(lr, n_iter)},
scored AS (
  SELECT doc_id, source, len({_TOKS}) AS n_tokens,
         CAST(CAST(1.0 / (1.0 + exp(-(b + w1 * {_TRAIN_X1}
              + w2 * {_SERVE_X2} + w3 * {_SERVE_X3}
              + w4 * {_MEAN_LEN_SQL}))) AS DECIMAL(18,9)) AS DOUBLE)
           AS quality_score
  FROM documents CROSS JOIN it{n_iter}
)
SELECT doc_id, source, n_tokens, quality_score, cum_tokens
FROM (
  SELECT *,
         CAST(SUM(n_tokens) OVER (PARTITION BY source
                                  ORDER BY quality_score DESC, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_tokens
  FROM scored
)
WHERE cum_tokens <= {SOURCE_TOKEN_BUDGET}
"""


ORACLES["train_quality_classifier"] = _train_clf_oracle()
ORACLES["trained_budget_trim"] = _trained_trim_oracle()
