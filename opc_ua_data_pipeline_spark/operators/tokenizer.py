"""On-corpus BPE tokenizer training — the iterative-algorithm pattern
(see clustering.py) applied to the tokenizer-training half of a
training-data platform.

Industrial BPE trainers (GPT-2's, SentencePiece's BPE mode) never
iterate over the corpus: they roll the corpus up to a (word, count)
table once, then run every merge iteration against that vocabulary.
The Spark shape is exactly that:

* ONE map-side-combinable shuffle collapses the corpus to word counts
  (at 100 TB this is the only data-proportional stage);
* the top-``VOCAB_K`` word table is constant-size; each of the
  ``N_MERGES`` iterations computes pair counts over it (a vocab-sized
  groupBy), picks the argmax pair deterministically, and rewrites the
  symbol sequences with the collected pair as plain literals —
  per-iteration cost is INDEPENDENT of corpus size;
* nothing iterates on the driver except the loop counter and the
  N_MERGES 1-row argmax results (the output merge table itself); the
  word table's lineage grows by one replace() per merge over a
  ``localCheckpoint``'ed k-row base, so recompute stays bounded and
  no per-iteration materialization job is paid (round-10 change; the
  r9 spelling checkpointed every iteration).

Determinism: pair argmax breaks ties on (count DESC, lhs ASC,
rhs ASC); the merge rewrite is SQL ``replace`` on the space-delimited
symbol string (left-to-right, non-overlapping — the greedy-left BPE
rule, and the same semantics in Spark and DuckDB), so even this
ITERATIVE trainer has an exact unrolled-CTE DuckDB oracle.

Reference parity: the reference pipeline has no tokenizer surface;
this belongs to the training-data extension mandate (SURVEY.md §2
extension families) next to text.py's token statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.materialize import materialize

from ..tables import load_table
from .text import _TOKS, _toks

VOCAB_K = 48
N_MERGES = 6

#: end-of-word marker symbol (its merges produce suffix tokens like
#: ``s</w>`` — the classic BPE word-boundary treatment)
EOW = "</w>"


def _word_counts(docs: DataFrame, k: int = VOCAB_K) -> DataFrame:
    """Corpus → top-k (word, count): the one data-proportional stage."""
    return (
        docs.select(F.explode(_toks()).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(k)
    )


def bpe_merges(
    docs: DataFrame, k: int = VOCAB_K, n_merges: int = N_MERGES
) -> DataFrame:
    """Train ``n_merges`` BPE merges on the corpus's top-``k`` words;
    return the merge table (iteration, lhs, rhs, merged, pair_count)
    — the artifact a tokenizer ships."""
    spark = docs.sparkSession
    words = _word_counts(docs, k).select(
        "word",
        "cnt",
        F.concat(
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.substring(F.col("word"), i, F.lit(1)),
                ),
            ),
            F.lit(" " + EOW),
        ).alias("seq"),
    ).transform(materialize)

    merges: list[tuple] = []
    for it in range(1, n_merges + 1):
        pairs = (
            words.select("cnt", F.split("seq", " ").alias("s"))
            # a fully-merged word's seq is ONE symbol: sequence(1,
            # size-1) would descend through 0 and ANSI element_at
            # would throw; such words contribute no pairs (the DuckDB
            # twin's generate_series(1, 0) is empty for the same rows)
            .filter(F.size("s") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(s) - 1), k -> "
                        "named_struct('lhs', element_at(s, k), "
                        "'rhs', element_at(s, k + 1)))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.sum("cnt").alias("total"))
        )
        top1 = pairs.orderBy(
            F.col("total").desc(), F.col("lhs").asc(), F.col("rhs").asc()
        ).limit(1)
        row = top1.collect()[0]  # 1 bounded row per iteration (output)
        merges.append(
            (it, row["lhs"], row["rhs"], row["lhs"] + row["rhs"], row["total"])
        )
        # rewrite with the COLLECTED pair as Column literals (round 10):
        # the r9 spelling crossJoin(broadcast(top1)) + localCheckpoint
        # paid a broadcast build and a materialization job per
        # iteration on a k-row frame whose lineage grows by one
        # replace() per merge — recompute is cheaper than either.
        # F.lit() goes through Literal, never the SQL parser, so corpus
        # symbols with quotes remain safe; the replace() semantics and
        # values are identical to the joined spelling.
        words = words.select(
            "word",
            "cnt",
            F.trim(
                F.replace(
                    F.concat(F.lit(" "), F.col("seq"), F.lit(" ")),
                    F.lit(f" {row['lhs']} {row['rhs']} "),
                    F.lit(f" {row['lhs']}{row['rhs']} "),
                )
            ).alias("seq"),
        )
    return spark.createDataFrame(
        merges,
        "iteration int, lhs string, rhs string, merged string, "
        "pair_count bigint",
    )


def bpe_segment(
    docs: DataFrame, merge_table: DataFrame
) -> DataFrame:
    """Apply a trained merge list to the corpus words: per-doc token
    sequences under the learned vocabulary (space-joined symbol
    strings).  The merge table is tiny and ordered — applying it is a
    broadcast of the collected merges folded into one expression
    chain, a narrow per-row pass over any corpus size."""
    rows = sorted(
        merge_table.collect(), key=lambda r: r["iteration"]
    )  # bounded: n_merges rows
    seq = F.concat(
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.length("word")),
                lambda i: F.substring(F.col("word"), i, F.lit(1)),
            ),
        ),
        F.lit(" " + EOW),
    )
    out = F.concat(F.lit(" "), seq, F.lit(" "))
    for r in rows:
        out = F.replace(
            out,
            F.lit(f" {r['lhs']} {r['rhs']} "),
            F.lit(f" {r['lhs']}{r['rhs']} "),
        )
    return docs.select(F.explode(_toks()).alias("word")).distinct().select(
        "word", F.trim(out).alias("segmented")
    )


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_merges(load_table(spark, sf_dir, "documents"))


QUERIES = {"bpe_merges": q_bpe_merges}


def _bpe_ctes(k: int, n_merges: int) -> list[str]:
    """Shared CTE chain: word counts, char seqs, then one (pairs,
    argmax, rewrite) triple per iteration — exactly the loop body."""
    ctes = [
        f"""wc AS (
  SELECT t AS word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT UNNEST({_TOKS}) AS t FROM documents)
  GROUP BY 1 ORDER BY cnt DESC, word ASC LIMIT {k})""",
        f"""w0 AS (
  SELECT word, cnt,
         array_to_string(list_transform(generate_series(1, length(word)),
                                        i -> substr(word, i, 1)), ' ')
           || ' {EOW}' AS seq
  FROM wc)""",
    ]
    for i in range(1, n_merges + 1):
        ctes.append(
            f"""p{i} AS (
  SELECT l AS lhs, r AS rhs, CAST(SUM(cnt) AS BIGINT) AS total
  FROM (SELECT cnt, list_extract(s, g.k) AS l, list_extract(s, g.k + 1) AS r
        FROM (SELECT cnt, string_split(seq, ' ') AS s FROM w{i - 1}),
             UNNEST(generate_series(1, len(s) - 1)) AS g(k))
  GROUP BY 1, 2)"""
        )
        ctes.append(
            f"""m{i} AS (
  SELECT lhs, rhs, total FROM p{i}
  ORDER BY total DESC, lhs ASC, rhs ASC LIMIT 1)"""
        )
        ctes.append(
            f"""w{i} AS (
  SELECT word, cnt,
         trim(replace(' ' || seq || ' ',
                      (SELECT ' ' || lhs || ' ' || rhs || ' ' FROM m{i}),
                      (SELECT ' ' || lhs || rhs || ' ' FROM m{i}))) AS seq
  FROM w{i - 1})"""
        )
    return ctes


def _bpe_oracle(k: int = VOCAB_K, n_merges: int = N_MERGES) -> str:
    selects = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS INTEGER) AS iteration, lhs, rhs, "
        f"lhs || rhs AS merged, total AS pair_count FROM m{i}"
        for i in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(_bpe_ctes(k, n_merges)) + "\n" + selects


ORACLES = {"bpe_merges": _bpe_oracle()}


def q_bpe_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train on the corpus, then segment EVERY distinct corpus word
    under the learned merges — the apply half of the tokenizer, as a
    contract query (training + application in one verified chain)."""
    docs = load_table(spark, sf_dir, "documents")
    return bpe_segment(docs, bpe_merges(docs))


QUERIES["bpe_segmentation"] = q_bpe_segmentation


def _bpe_segment_oracle(k: int = VOCAB_K, n_merges: int = N_MERGES) -> str:
    """The trained replace chain applied to all distinct words: reuse
    the trainer's CTEs through m{n}, then fold the merges over every
    word's padded symbol string via scalar subqueries."""
    ctes = ",\n".join(_bpe_ctes(k, n_merges))
    seq0 = (
        "' ' || array_to_string(list_transform("
        "generate_series(1, length(word)), i -> substr(word, i, 1)), ' ')"
        f" || ' {EOW} '"
    )
    expr = seq0
    for i in range(1, n_merges + 1):
        expr = (
            f"replace({expr}, "
            f"(SELECT ' ' || lhs || ' ' || rhs || ' ' FROM m{i}), "
            f"(SELECT ' ' || lhs || rhs || ' ' FROM m{i}))"
        )
    return f"""WITH {ctes},
wall AS (
  SELECT DISTINCT t AS word
  FROM (SELECT UNNEST({_TOKS}) AS t FROM documents)
)
SELECT word, trim({expr}) AS segmented FROM wall
"""


ORACLES["bpe_segmentation"] = _bpe_segment_oracle()


# ---------------------------------------------------------------------------
# Tokenizer fertility per language (round 7b)
# ---------------------------------------------------------------------------


def tokenizer_fertility(docs: DataFrame) -> DataFrame:
    """Per-language fertility of the corpus-trained BPE tokenizer:
    subword tokens per word and characters per subword token — THE
    cross-lingual tokenizer-equity numbers (a language with 2x the
    fertility pays 2x the sequence length for the same text, so
    budget/packing decisions made in tokens are biased against it).

    Scale shape: the merge table and the distinct-word segmentation
    map are vocabulary-bounded; the map broadcast-joins to per-
    (lang, word) counts (one map-side-combinable groupBy over the
    corpus scan), so the corpus is touched once and never shuffled
    by more than the (lang, word) rollup.  Counts are exact
    integers; the two ratios ulp-collapse at DECIMAL(18,9).
    """
    seg = bpe_segment(docs, bpe_merges(docs))
    per_word = seg.select(
        "word",
        F.size(F.split("segmented", " ")).cast("long").alias("n_sub"),
        F.length("word").cast("long").alias("n_chars"),
    )
    wl = (
        docs.select("lang", F.explode(_toks()).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        wl.join(F.broadcast(per_word), "word")
        .groupBy("lang")
        .agg(
            F.sum("c").alias("n_words"),
            F.sum(F.col("c") * F.col("n_sub")).alias("n_tokens"),
            F.sum(F.col("c") * F.col("n_chars")).alias("n_chars"),
        )
        .selectExpr(
            "lang",
            "CAST(n_words AS BIGINT) AS n_words",
            "CAST(n_tokens AS BIGINT) AS n_tokens",
            "CAST(n_chars AS BIGINT) AS n_chars",
            "CAST(CAST(CAST(n_tokens AS DOUBLE) / n_words"
            " AS DECIMAL(18,9)) AS DOUBLE) AS fertility",
            "CAST(CAST(CAST(n_chars AS DOUBLE) / n_tokens"
            " AS DECIMAL(18,9)) AS DOUBLE) AS chars_per_token",
        )
    )


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tokenizer_fertility(load_table(spark, sf_dir, "documents"))


QUERIES["tokenizer_fertility"] = q_tokenizer_fertility


def _fertility_oracle(k: int = VOCAB_K, n_merges: int = N_MERGES) -> str:
    ctes = ",\n".join(_bpe_ctes(k, n_merges))
    seq0 = (
        "' ' || array_to_string(list_transform("
        "generate_series(1, length(word)), i -> substr(word, i, 1)), ' ')"
        f" || ' {EOW} '"
    )
    expr = seq0
    for i in range(1, n_merges + 1):
        expr = (
            f"replace({expr}, "
            f"(SELECT ' ' || lhs || ' ' || rhs || ' ' FROM m{i}), "
            f"(SELECT ' ' || lhs || rhs || ' ' FROM m{i}))"
        )
    return f"""WITH {ctes},
wall AS (
  SELECT DISTINCT t AS word
  FROM (SELECT UNNEST({_TOKS}) AS t FROM documents)
),
segmap AS (
  SELECT word,
         CAST(len(string_split(trim({expr}), ' ')) AS BIGINT) AS n_sub,
         CAST(length(word) AS BIGINT) AS n_chars
  FROM wall
),
wl AS (
  SELECT lang, t AS word, COUNT(*) AS c
  FROM (SELECT lang, UNNEST({_TOKS}) AS t FROM documents)
  GROUP BY 1, 2
)
SELECT lang,
       CAST(SUM(c) AS BIGINT) AS n_words,
       CAST(SUM(c * n_sub) AS BIGINT) AS n_tokens,
       CAST(SUM(c * n_chars) AS BIGINT) AS n_chars,
       CAST(CAST(CAST(SUM(c * n_sub) AS DOUBLE) / SUM(c)
            AS DECIMAL(18,9)) AS DOUBLE) AS fertility,
       CAST(CAST(CAST(SUM(c * n_chars) AS DOUBLE) / SUM(c * n_sub)
            AS DECIMAL(18,9)) AS DOUBLE) AS chars_per_token
FROM wl JOIN segmap USING (word)
GROUP BY lang
"""


ORACLES["tokenizer_fertility"] = _fertility_oracle()
