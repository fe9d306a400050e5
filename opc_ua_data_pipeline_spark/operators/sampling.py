"""Deterministic sampling and dataset mixing for training pipelines.

`sample()`/`sampleBy()` are seed-deterministic only for a fixed
partitioning — a repartition or a different cluster changes the
sample.  Training-data pipelines need content-deterministic sampling
(same row set on every run, every engine, every layout), so the
selector here is a *hash gate*: keep a row iff the md5 of its key
(+ salt) starts below a hex threshold.  That makes samples
reproducible, mergeable across incremental runs, and — because the
gate is a plain string comparison on a digest both engines share —
oracle-checkable in DuckDB.

The same gate implements weighted dataset mixing (per-source rates),
the standard recipe for combining corpora at different epochs/weights.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.ranking import bounded_rank
from ..tables import load_table


def _hex_threshold(fraction: float) -> str:
    """fraction in [0,1] -> 8-hex-digit threshold on the md5 prefix."""
    return format(min(int(fraction * 16**8), 16**8 - 1), "08x")


def hash_gate(key: Column, fraction: float, salt: str = "0") -> Column:
    """True for ~fraction of keys, deterministically."""
    return F.substring(
        F.md5(F.concat(key.cast("string"), F.lit(":" + salt))), 1, 8
    ) < F.lit(_hex_threshold(fraction))


def _gate_sql(key: str, fraction: float, salt: str = "0") -> str:
    return (
        f"substr(md5(CAST({key} AS VARCHAR) || ':{salt}'), 1, 8)"
        f" < '{_hex_threshold(fraction)}'"
    )


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict[str, float], key: str,
    salt: str = "0",
) -> DataFrame:
    """Per-stratum rates (e.g. keep all errors, 10% of clicks): a
    narrow filter, no shuffle, stable under any partitioning."""
    keep = F.lit(False)
    for stratum, frac in fractions.items():
        keep = F.when(
            F.col(strata_col) == stratum, hash_gate(F.col(key), frac, salt)
        ).otherwise(keep)
    return df.filter(keep)


def mix_datasets(
    df: DataFrame, source_col: str, weights: dict[str, float], key: str,
    salt: str = "mix",
) -> DataFrame:
    """Weighted corpus mixing: identical mechanics, named for the
    pipeline role (weights are per-source keep rates)."""
    return stratified_sample(df, source_col, weights, key, salt)


SOURCE_CAP = 20


def per_key_cap(
    df: DataFrame, key_col: str, id_col: str, cap: int = SOURCE_CAP,
    salt: str = "cap",
) -> DataFrame:
    """Cap each key at N rows, picked by md5 order — the "at most N
    docs per domain" rule that stops any single crawl source from
    dominating a mixed corpus.  The hash order makes the kept subset
    a uniform, content-deterministic sample per key (same rows on
    every run/engine/layout), unlike LIMIT-per-group which keeps
    whatever the scan happened to read first.  One shuffle on the
    key; heavy keys cost O(rows log cap) via the window top-N."""
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    w = Window.partitionBy(key_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def temperature_mix(
    df: DataFrame, source_col: str, key: str, salt: str = "temp"
) -> DataFrame:
    """Temperature-based source rebalancing: keep-rate per source is
    ``sqrt(n_min / n_s)`` — the alpha = 1/2 (temperature T = 2) case of
    the multilingual-training recipe p(s) ∝ n_s^alpha, normalized so
    the smallest source keeps 100%.  Unlike the static-weight mixers
    above, the rates come from the DATA (a count aggregate), not a
    config dict, so the operator is two stages: a tiny per-source
    count (full map-side combine, #sources rows out) broadcast back
    onto the stream, then the usual hash gate.

    alpha is pinned to 1/2 on purpose: sqrt is IEEE-correctly-rounded
    on every engine, so the rate doubles are bit-identical across
    Spark and DuckDB — an arbitrary ``pow(n, alpha)`` is only
    faithfully-rounded and could disagree in the last ulp, flipping a
    hash-gate decision at the boundary.  The gate itself compares
    ``int(md5[:8], 16) / 2^32`` (exact: both operands < 2^53) against
    the rate, so membership is content-deterministic under any
    partitioning, engine, or layout.

    At 100 TB: the counts aggregate shuffles #sources rows, the rate
    join is a broadcast, the gate is a narrow filter — no skew, no
    driver round-trip.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    n_min = counts.agg(F.min("__n").alias("__n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        source_col,
        (
            F.sqrt(F.col("__n_min").cast("double"))
            / F.sqrt(F.col("__n").cast("double"))
        ).alias("keep_rate"),
    )
    hex_frac = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(key).cast("string"), F.lit(":" + salt))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    cols = [*df.columns, "keep_rate"]
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(hex_frac < F.col("keep_rate"))
        .select(*cols)
    )


EPOCH_WEIGHTS = {"en": 2.5, "de": 1.0, "fr": 1.0, "es": 0.5, "zh": 0.25}


def mix_with_epochs(
    df: DataFrame, source_col: str, weights: dict[str, float], key: str,
    salt: str = "mixep",
) -> DataFrame:
    """Weighted mixing with UPsampling: weight 2.5 means two full
    copies of the source plus a deterministic half (the "N epochs of
    Wikipedia" recipe).  Each row explodes into ceil(w) epoch
    candidates; full epochs always survive, the fractional one passes
    an epoch-salted hash gate — so reruns, engines, and layouts all
    keep the identical multiset, and downstream shuffles see the
    ``epoch`` column for decorrelation."""
    n_epochs = F.lit(None).cast("int")
    keep_frac = F.lit(None).cast("string")
    for s, w in weights.items():
        n_epochs = F.when(
            F.col(source_col) == s, F.lit(int(math.ceil(w)))
        ).otherwise(n_epochs)
        frac = w - math.floor(w)
        keep_frac = F.when(
            F.col(source_col) == s, F.lit(_hex_threshold(frac))
        ).otherwise(keep_frac)
    full_epochs = F.lit(None).cast("int")
    for s, w in weights.items():
        full_epochs = F.when(
            F.col(source_col) == s, F.lit(int(math.floor(w)))
        ).otherwise(full_epochs)
    exploded = df.withColumn(
        "epoch", F.explode(F.sequence(F.lit(0), n_epochs - 1))
    )
    gate = (
        F.substring(
            F.md5(
                F.concat(
                    F.col(key).cast("string"),
                    F.lit(":" + salt),
                    F.col("epoch").cast("string"),
                )
            ),
            1,
            8,
        )
        < keep_frac
    )
    return exploded.filter((F.col("epoch") < full_epochs) | gate)


SAMPLE_FRACTIONS = {
    "click": 0.1,
    "view": 0.1,
    "purchase": 0.5,
    "signup": 1.0,
    "error": 1.0,
}

MIX_WEIGHTS = {"en": 0.8, "de": 0.5, "fr": 0.5, "es": 0.25, "zh": 0.25}


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stratified_sample(
        load_table(spark, sf_dir, "events"), "event_type", SAMPLE_FRACTIONS,
        key="event_id",
    )


def q_dataset_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mix_datasets(
        load_table(spark, sf_dir, "documents"), "lang", MIX_WEIGHTS,
        key="doc_id",
    )


def q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return per_key_cap(
        load_table(spark, sf_dir, "documents"), "source", "doc_id"
    )


def q_epoch_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mix_with_epochs(
        load_table(spark, sf_dir, "documents"), "lang", EPOCH_WEIGHTS,
        key="doc_id",
    )


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return temperature_mix(
        load_table(spark, sf_dir, "events"), "event_type", key="event_id"
    )


WEIGHTED_SAMPLE_K = 100


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str,
    key: str,
    k: int = WEIGHTED_SAMPLE_K,
    salt: str = "ws",
) -> DataFrame:
    """Sequential Poisson sampling (Ohlsson): a deterministic weighted
    sample WITHOUT replacement of size k — inclusion probability
    approximately proportional to ``weight_col``.

    Each row gets a priority ``q = u / w`` where
    ``u = (int(md5(key||salt)[:8], 16) + 1) / 2^32`` and
    ``w = max(weight, 1)``; the sample is the k SMALLEST priorities.
    Unlike the exponential-sort scheme (``-ln(u)/w``), this needs NO
    libm call: u is exact (integer + power-of-two divide, both
    error-free) and q is one IEEE division (correctly rounded), so
    the priorities are bit-identical on every engine with no
    ulp-collapse contract.

    At 100 TB: a narrow projection + TakeOrderedAndProject (per-
    partition k-row heaps, k-row driver merge) — no shuffle of the
    corpus, no coordination state, reproducible under any layout.

    NULL keys carry no identity and are EXCLUDED from the sample
    (round-9 review): their md5 priority is NULL, and Spark's
    ascending sort puts NULLs FIRST while DuckDB's puts them LAST —
    without the filter a NULL-key row would silently take rank 1 on
    one engine and be dropped on the other.  The streaming twin
    (streaming/sampling.py) skips them identically.
    """
    df = df.filter(F.col(key).isNotNull())
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(key).cast("string"), F.lit(":" + salt))),
            1,
            8,
        ),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(4294967296.0)
    w_ = F.greatest(F.col(weight_col), F.lit(1)).cast("double")
    scored = df.select(
        F.col(key),
        F.col(weight_col).alias("weight"),
        (u / w_).alias("priority"),
    )
    topk = scored.orderBy(F.col("priority").asc(), F.col(key).asc()).limit(k)
    # Window-free rank over the k-row frame (functions/ranking.py)
    return bounded_rank(
        topk, [("priority", "asc"), (key, "asc")], "sample_rank"
    )


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weighted_sample_topk(
        load_table(spark, sf_dir, "documents"), "n_chars", "doc_id"
    )


QUERIES = {
    "stratified_sample": q_stratified_sample,
    "weighted_sample": q_weighted_sample,
    "dataset_mix": q_dataset_mix,
    "per_source_cap": q_source_cap,
    "epoch_mix": q_epoch_mix,
    "temperature_mix": q_temperature_mix,
}


def _case_sql(col: str, rates: dict[str, float], key: str, salt: str) -> str:
    whens = " ".join(
        f"WHEN {col} = '{s}' THEN {_gate_sql(key, f, salt)}"
        for s, f in rates.items()
    )
    return f"CASE {whens} ELSE FALSE END"


ORACLES = {
    "stratified_sample": f"""
SELECT * FROM events
WHERE {_case_sql("event_type", SAMPLE_FRACTIONS, "event_id", "0")}
""",
    "dataset_mix": f"""
SELECT * FROM documents
WHERE {_case_sql("lang", MIX_WEIGHTS, "doc_id", "mix")}
""",
    "per_source_cap": f"""
SELECT doc_id, text, lang, source, n_chars FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY source
    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':cap'), doc_id) AS rn
  FROM documents
) WHERE rn <= {SOURCE_CAP}
""",
}


def _epoch_case(expr: str, fn) -> str:
    whens = " ".join(
        f"WHEN lang = '{s}' THEN {fn(w)}" for s, w in EPOCH_WEIGHTS.items()
    )
    return f"CASE {whens} END"


_N_EPOCHS = _epoch_case("lang", lambda w: int(math.ceil(w)))
_FULL_EPOCHS = _epoch_case("lang", lambda w: int(math.floor(w)))
_FRAC_THRESH = _epoch_case(
    "lang", lambda w: f"'{_hex_threshold(w - math.floor(w))}'"
)

ORACLES["temperature_mix"] = """
WITH counts AS (
  SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
),
mn AS (SELECT MIN(n) AS n_min FROM counts),
rates AS (
  SELECT event_type,
         sqrt(CAST(n_min AS DOUBLE)) / sqrt(CAST(n AS DOUBLE)) AS keep_rate
  FROM counts CROSS JOIN mn
)
SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value, e.props,
       r.keep_rate
FROM events e JOIN rates r ON e.event_type = r.event_type
WHERE CAST(('0x' || substr(md5(CAST(e.event_id AS VARCHAR) || ':temp'), 1, 8))
           AS UBIGINT) / 4294967296.0 < r.keep_rate
"""

ORACLES["epoch_mix"] = f"""
SELECT doc_id, text, lang, source, n_chars, CAST(epoch AS INTEGER) AS epoch
FROM (
  SELECT d.*, UNNEST(generate_series(0, ({_N_EPOCHS}) - 1)) AS epoch
  FROM documents d
)
WHERE epoch < ({_FULL_EPOCHS})
   OR substr(md5(CAST(doc_id AS VARCHAR) || ':mixep' || CAST(epoch AS VARCHAR)),
             1, 8) < ({_FRAC_THRESH})
"""

ORACLES["weighted_sample"] = f"""
WITH scored AS (
  SELECT doc_id,
         n_chars AS weight,
         (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':ws'), 1, 8))
               AS BIGINT) + 1.0) / 4294967296.0
           / CAST(greatest(n_chars, 1) AS DOUBLE) AS priority
  FROM documents
  WHERE doc_id IS NOT NULL
)
SELECT doc_id, weight, priority,
       CAST(ROW_NUMBER() OVER (ORDER BY priority, doc_id) AS INTEGER)
         AS sample_rank
FROM scored
QUALIFY sample_rank <= {WEIGHTED_SAMPLE_K}
"""
