"""Deduplication operators for training-data pipelines (extension phase).

Exact and near-duplicate detection over the `documents` table, each
designed for the 100 TB path:

* exact:   hash-groupBy — one shuffle on a 128-bit digest, survivors
           chosen deterministically (min doc_id).
* n-gram Jaccard: exact pairwise similarity via token inverted index —
           the *oracle baseline*; the token self-join is quadratic in
           posting-list length, so at scale it exists to verify...
* MinHash+LSH: ...this, the scale path: constant-size signatures per
           doc, band buckets, candidate pairs only within buckets.
           Signature agreement estimates Jaccard without touching
           token sets again.
* SimHash: bit-majority fingerprint; near-dups differ in few bits.

Portability note: every hash is md5 (the one digest Spark and DuckDB
share); minhash signatures are *lexicographic minima of hex strings*
(identical total order in both engines) rather than ints, so oracle
parity needs no int-parsing of hex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

N_SEEDS = 16  # minhash signature length
BAND_SIZE = 4  # seeds per LSH band -> 4 bands


def tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id -> distinct token set (whitespace tokenization)."""
    return (
        df.select("doc_id", F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )


def exact_duplicates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: md5 digest groupBy; emits one row per distinct
    content with the surviving doc and the duplicate count."""
    return (
        df.select("doc_id", F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


def jaccard_pairs(df: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Exact n-gram (1-gram) Jaccard similarity via inverted index.

    Token self-join -> co-occurrence counts -> |A∩B| / (|A|+|B|-|A∩B|).
    Quadratic in posting-list length: this is the correctness baseline
    that LSH candidates are verified against, not the 100 TB scan.
    Jaccard is a ratio of exact BIGINTs -> bit-identical across engines.
    """
    toks = tokens(df)
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = toks.alias("a"), toks.alias("b")
    common = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = (
        common.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common")
                / (F.col("sa.sz") + F.col("sb.sz") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold)


def minhash_signatures(df: DataFrame, n_seeds: int = N_SEEDS) -> DataFrame:
    """MinHash signatures: sig[s] = min over tokens of md5(s || ':' || tok).

    One row per (doc_id, seed) with the lexicographic-min hex digest —
    a drop of the int-conversion step that classic minhash uses, with
    the same uniformity (md5 is uniform on hex strings) and a total
    order both engines agree on.  Scale: explode(tokens) x n_seeds is
    a map-side expansion; the min-agg shuffles #docs x n_seeds rows.
    """
    seeds = F.array(*[F.lit(s) for s in range(n_seeds)])
    return (
        tokens(df)
        .select("doc_id", F.explode(seeds).alias("seed"), F.col("tok"))
        .select(
            "doc_id",
            "seed",
            F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("tok"))).alias("h"),
        )
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("sig"))
    )


def lsh_bands(sigs: DataFrame, band_size: int = BAND_SIZE) -> DataFrame:
    """Group signature positions into bands; band key = concatenated
    in-order signature values.  Docs sharing any band key are
    candidate near-duplicates."""
    return (
        sigs.withColumn("band", (F.col("seed") / band_size).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "sig"))),
                    lambda x: x["sig"],
                ),
                ",",
            ).alias("band_key")
        )
    )


def minhash_candidate_pairs(df: DataFrame) -> DataFrame:
    """MinHash+LSH near-dup candidates: equi-join on (band, band_key).

    The 100 TB path: the only join is on band buckets (tiny keys,
    uniform by hash), never on token sets; verification (exact
    Jaccard on candidates only) composes with :func:`jaccard_pairs`.
    """
    bands = lsh_bands(minhash_signatures(df))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash(df: DataFrame, n_bits: int = 60) -> DataFrame:
    """SimHash fingerprint: per-bit majority vote over token digests.

    Bits come from md5 hex nibbles ((hex digit >> b) & 1 for b in
    0..3), mirrored verbatim in the SQL oracle so both engines build
    the identical 60-bit integer.  Scale: tokens x 60 bit-positions is
    map-side; the vote is one groupBy(doc_id) with partial aggregation.
    """
    nhex = n_bits // 4
    positions = F.array(*[F.lit(i) for i in range(nhex)])
    bits = F.array(*[F.lit(b) for b in range(4)])
    tok_h = tokens(df).select("doc_id", F.md5("tok").alias("h"))
    per_bit = (
        tok_h.select("doc_id", "h", F.explode(positions).alias("j"))
        .select(
            "doc_id",
            "j",
            (
                F.instr(
                    F.lit("0123456789abcdef"),
                    F.substring(F.col("h"), F.col("j") + 1, 1),
                )
                - 1
            ).alias("nib"),
            F.explode(bits).alias("b"),
        )
        .select(
            "doc_id",
            (F.col("j") * 4 + F.col("b")).alias("bit_pos"),
            # (nib >> b) & 1, written as floor-div/mod because shiftright
            # takes a literal shift; mirrors the SQL oracle verbatim.
            (
                (
                    F.floor(F.col("nib") / F.pow(F.lit(2.0), F.col("b"))).cast("long")
                    % 2
                )
                * 2
                - 1
            ).alias("vote"),
        )
    )
    # Integer shifts, NOT pow(2, bit): Spark's double->decimal cast goes
    # through the shortest string repr (BigDecimal.valueOf), so 2^59 as a
    # double loses its low bits on the decimal side while DuckDB casts the
    # exact binary value — pure BIGINT arithmetic sidesteps the hazard.
    return (
        per_bit.groupBy("doc_id", "bit_pos")
        .agg(F.sum("vote").alias("v"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("v") > 0,
                    F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit_pos AS INT))"),
                ).otherwise(F.lit(0).cast("bigint"))
            )
            .cast("long")
            .alias("simhash")
        )
    )


# ---------------------------------------------------------------------------
# Driver-contract queries
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_duplicates(load_table(spark, sf_dir, "documents"))


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jaccard_pairs(load_table(spark, sf_dir, "documents"))


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_signatures(load_table(spark, sf_dir, "documents"))


def q_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_candidate_pairs(load_table(spark, sf_dir, "documents"))


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(load_table(spark, sf_dir, "documents"))


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_jaccard_pairs": q_jaccard_pairs,
    "minhash_signatures": q_minhash_signatures,
    "minhash_candidate_pairs": q_minhash_candidates,
    "simhash": q_simhash,
}

_TOKENS_SQL = """
  SELECT DISTINCT doc_id, tok
  FROM documents, UNNEST(string_split(text, ' ')) AS t(tok)
  WHERE tok <> ''
"""

_SEEDS_SQL = f"(SELECT UNNEST(generate_series(0, {N_SEEDS - 1})) AS seed)"

_SIGS_SQL = f"""
  SELECT doc_id, seed,
         MIN(md5(CAST(seed AS VARCHAR) || ':' || tok)) AS sig
  FROM ({_TOKENS_SQL}) toks CROSS JOIN {_SEEDS_SQL}
  GROUP BY doc_id, seed
"""

_BANDS_SQL = f"""
  SELECT doc_id, CAST(seed // {BAND_SIZE} AS INT) AS band,
         string_agg(sig, ',' ORDER BY seed) AS band_key
  FROM ({_SIGS_SQL})
  GROUP BY doc_id, 2
"""

ORACLES = {
    "dedup_exact": """
SELECT md5(text) AS content_hash,
       MIN(doc_id) AS keep_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
""",
    "dedup_jaccard_pairs": f"""
WITH toks AS ({_TOKENS_SQL}),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common) AS jaccard
FROM common
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common) >= 0.5
""",
    "minhash_signatures": _SIGS_SQL,
    "minhash_candidate_pairs": f"""
WITH bands AS ({_BANDS_SQL})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a
JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
            AND a.doc_id < b.doc_id
""",
    "simhash": """
WITH toks AS (
  SELECT DISTINCT doc_id, tok
  FROM documents, UNNEST(string_split(text, ' ')) AS t(tok)
  WHERE tok <> ''
),
votes AS (
  SELECT doc_id,
         j * 4 + b AS bit_pos,
         SUM(((strpos('0123456789abcdef', substr(md5(tok), j + 1, 1)) - 1)
              // CAST(pow(2, b) AS INT)) % 2 * 2 - 1) AS v
  FROM toks
  CROSS JOIN (SELECT UNNEST(generate_series(0, 14)) AS j)
  CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS b)
  GROUP BY doc_id, 2
)
SELECT doc_id,
       CAST(SUM(CASE WHEN v > 0
                     THEN (CAST(1 AS BIGINT) << bit_pos)
                     ELSE 0 END) AS BIGINT) AS simhash
FROM votes
GROUP BY doc_id
""",
}
