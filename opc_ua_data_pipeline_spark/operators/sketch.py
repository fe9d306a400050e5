"""KMV (k-minimum-values) sketches — the set-OPERATION half of the
re-aggregatable serving layout.

The reference's dashboards only ever need per-stream distinct counts
(covered by ``rollups.hll_rollup_merge``), but a serving layer over
100 TB of telemetry/corpus data also needs DISTINCT INTERSECTIONS —
"how many users did both X and Y", "how much vocabulary do two
sources share" — and HLL cannot answer those: register-max union is
its only merge.  The KMV/theta-sketch family (Bar-Yossef et al. 2002;
Apache DataSketches' theta sketch) closes that gap: keep the k
smallest hash values of each set; the k-th smallest estimates density
(``(k-1) / (kth / 2^60)``), and because the sketches are plain sorted
hash arrays, union (merge-sort, cut at k) and intersection (membership
among the union's top-k) are closed-form over the sketches alone.

Unlike the JVM HLL sketch objects, this implementation is
ENGINE-EXACT end to end: the hash is the repo-standard md5 prefix
(60-bit, sign-safe BIGINT — 15 hex chars, the same avoid-the-sign-bit
rule as the Bloom words in training.py), the sketch is a sorted
BIGINT array, and the only floats in the output are correctly-rounded
IEEE ops over exact integers — so the contract is a hash match, not a
bounded-error check.

Scale shapes:

* ``kmv_sketches``: the per-key top-k-min is built as a true
  mergeable aggregate — per-(key, shard) partials (``collect_set``
  bounded by ~distinct/NSHARDS per group; the shard count plays the
  role shuffle partitions play everywhere else) merged by
  flatten + sort + cut.  No windows, no full-history sort per
  low-cardinality key: set semantics + the final sort make the result
  independent of partitioning and arrival order, which is exactly the
  mergeability a serving layer stores partials under
  (tests/test_sketch_kmv.py pins shard-merge ≡ direct build).
* ``kmv_source_overlap``: sketches are #sources x k rows — the
  pairwise comparison runs on sketches only; the corpus is never
  joined against itself (contrast dedup_jaccard_pairs, the documented
  quadratic verification baseline).  The per-pair rank window is
  bounded at 2k rows by construction (the histogram-rollup bounded-
  spine precedent), never data-proportional.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table
from .training import _toks

#: sketch size — k-1 = 255 gives ~6% relative error on the distinct
#: estimate; small enough that a #keys x k sketch table is always
#: broadcast-scale.
KMV_K = 256
#: shard count for the partial-build stage; scales with data volume
#: the way spark.sql.shuffle.partitions does (it bounds the
#: collect_set buffer per group at ~distinct/NSHARDS).
KMV_NSHARDS = 64

_TWO60 = float(1 << 60)


def _h60(col: Column, salt: str) -> Column:
    """Repo-standard deterministic 60-bit hash: md5 prefix, 15 hex
    chars so the BIGINT is always positive (the sign-bit rule from
    the Bloom words, training.py)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(col.cast("string"), F.lit(":" + salt))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")


def _h60_sql(expr: str, salt: str) -> str:
    """DuckDB twin of :func:`_h60` (DuckDB has no conv; hex-literal
    cast is exact for 60 bits)."""
    return (
        f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR) || ':{salt}'), "
        "1, 15)) AS BIGINT)"
    )


def _estimate(n_sketch: Column, kth: Column) -> Column:
    """distinct_est: exact size below k, else ``(k-1)/(kth/2^60)``.

    kth/2^60 is a BIGINT→DOUBLE conversion (correctly rounded,
    identical cross-engine) then a power-of-two divide (exact); the
    outer divide is one IEEE rounding — bit-identical on every
    engine, the weighted_sample no-libm trick.
    """
    return F.when(n_sketch < F.lit(KMV_K), n_sketch.cast("double")).otherwise(
        F.lit(float(KMV_K - 1)) / (kth.cast("double") / F.lit(_TWO60))
    )


_EST_SQL = (
    f"CASE WHEN {{n}} < {KMV_K} THEN CAST({{n}} AS DOUBLE) "
    f"ELSE {KMV_K - 1}.0 / (CAST({{kth}} AS DOUBLE) / {_TWO60!r}) END"
)


def kmv_sketches(df: DataFrame, key_col: str, val: Column, salt: str) -> DataFrame:
    """One sorted-array KMV sketch per ``key_col`` over the distinct
    hashed values of ``val`` → ``(key, sketch array<bigint>)``.

    Two mergeable aggregate hops: (key, h % NSHARDS) partials, then a
    flatten+sort+cut merge — the exact shape a serving layer uses to
    combine stored partial sketches.
    """
    hashed = df.select(F.col(key_col).alias("key"), _h60(val, salt).alias("h"))
    partials = hashed.groupBy(
        "key", (F.col("h") % KMV_NSHARDS).alias("_shard")
    ).agg(F.slice(F.array_sort(F.collect_set("h")), 1, KMV_K).alias("part"))
    return partials.groupBy("key").agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("part"))), 1, KMV_K).alias(
            "sketch"
        )
    )


def kmv_distinct(events: DataFrame) -> DataFrame:
    """Per-event_type distinct-user estimate from the KMV sketch,
    with the exact count alongside (cheap at test scale; at 100 TB
    the exact column is the one you drop — the sketch is the point).
    """
    sk = kmv_sketches(events, "event_type", F.col("user_id"), "kmv")
    est = sk.select(
        F.col("key").alias("event_type"),
        F.size("sketch").alias("n_sketch"),
        F.element_at("sketch", -1).alias("kth_hash"),
        _estimate(F.size("sketch"), F.element_at("sketch", -1)).alias(
            "distinct_est"
        ),
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type")


def kmv_source_overlap(docs: DataFrame) -> DataFrame:
    """Pairwise vocabulary overlap between document sources via KMV
    sketches — the distinct-INTERSECTION query HLL cannot answer.

    For each unordered source pair (s1 < s2): group the union of the
    two sketches per hash, rank ascending, keep
    ``k_used = min(k, |union|)`` smallest, and count members present
    in BOTH sketches.  ``jaccard_est = n_common / k_used`` (the
    standard KMV Jaccard estimator);
    ``union_est`` is the KMV estimate read off the kept set's largest
    hash (the union of two KMV sketches cut at k IS the KMV sketch of
    the union); ``intersection_est = jaccard_est * union_est``.

    Input to everything past the sketch build is #sources x k rows;
    the pairs frame is broadcast; the rank window is bounded at 2k
    rows per (s1, s2) partition by construction.
    """
    toks = docs.select("source", F.explode(_toks("text")).alias("tok"))
    sk = kmv_sketches(toks, "source", F.col("tok"), "kmvv")
    rows = sk.select(F.col("key").alias("source"), F.explode("sketch").alias("h"))
    srcs = rows.select("source").distinct()
    pairs = srcs.select(F.col("source").alias("s1")).join(
        srcs.select(F.col("source").alias("s2")), F.col("s1") < F.col("s2")
    )
    mem = (
        F.broadcast(pairs)
        .join(rows, (rows.source == F.col("s1")) | (rows.source == F.col("s2")))
        .groupBy("s1", "s2", "h")
        .agg(
            F.max(F.when(F.col("source") == F.col("s1"), 1).otherwise(0)).alias(
                "in1"
            ),
            F.max(F.when(F.col("source") == F.col("s2"), 1).otherwise(0)).alias(
                "in2"
            ),
        )
    )
    # bounded window: <= 2k rows per (s1, s2) by construction
    w = Window.partitionBy("s1", "s2").orderBy("h")
    kept = mem.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= KMV_K
    )
    agg = kept.groupBy("s1", "s2").agg(
        F.count(F.lit(1)).alias("k_used"),
        F.sum(F.col("in1") * F.col("in2")).alias("n_common"),
        F.max("h").alias("kth_union"),
    )
    jac = F.col("n_common").cast("double") / F.col("k_used").cast("double")
    uest = _estimate(F.col("k_used"), F.col("kth_union"))
    return agg.select(
        "s1",
        "s2",
        "k_used",
        "n_common",
        jac.alias("jaccard_est"),
        uest.alias("union_est"),
        (jac * uest).alias("intersection_est"),
    )


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmv_distinct(load_table(spark, sf_dir, "events"))


def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmv_source_overlap(load_table(spark, sf_dir, "documents"))


QUERIES = {
    "kmv_distinct_users": q_kmv_distinct,
    "kmv_source_overlap": q_kmv_overlap,
}

_H_USER = _h60_sql("user_id", "kmv")
_H_TOK = _h60_sql("tok", "kmvv")
_TOKS_SQL = "list_filter(string_split(text, ' '), t -> t <> '')"

ORACLES = {
    "kmv_distinct_users": f"""
WITH hashed AS (
  SELECT DISTINCT event_type, {_H_USER} AS h FROM events
),
ranked AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk
  FROM hashed
),
sk AS (
  SELECT event_type,
         CAST(COUNT(*) AS INTEGER) AS n_sketch,
         MAX(h) AS kth_hash
  FROM ranked WHERE rk <= {KMV_K}
  GROUP BY event_type
)
SELECT s.event_type, s.n_sketch, s.kth_hash,
       {_EST_SQL.format(n="s.n_sketch", kth="s.kth_hash")} AS distinct_est,
       e.exact_distinct
FROM sk s
JOIN (SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY event_type) e USING (event_type)
""",
    "kmv_source_overlap": f"""
WITH toks AS (
  SELECT source, UNNEST({_TOKS_SQL}) AS tok FROM documents
),
hashed AS (
  SELECT DISTINCT source, {_H_TOK} AS h FROM toks
),
sk AS (
  SELECT source, h,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rk
  FROM hashed QUALIFY rk <= {KMV_K}
),
pairs AS (
  SELECT a.source AS s1, b.source AS s2
  FROM (SELECT DISTINCT source FROM sk) a,
       (SELECT DISTINCT source FROM sk) b
  WHERE a.source < b.source
),
mem AS (
  SELECT p.s1, p.s2, sk.h,
         MAX(CASE WHEN sk.source = p.s1 THEN 1 ELSE 0 END) AS in1,
         MAX(CASE WHEN sk.source = p.s2 THEN 1 ELSE 0 END) AS in2
  FROM pairs p JOIN sk ON sk.source IN (p.s1, p.s2)
  GROUP BY p.s1, p.s2, sk.h
),
kept AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY s1, s2 ORDER BY h) AS rk
  FROM mem QUALIFY rk <= {KMV_K}
),
agg AS (
  SELECT s1, s2, COUNT(*) AS k_used,
         CAST(SUM(in1 * in2) AS BIGINT) AS n_common,
         MAX(h) AS kth_union
  FROM kept GROUP BY s1, s2
)
SELECT s1, s2, k_used, n_common,
       CAST(n_common AS DOUBLE) / CAST(k_used AS DOUBLE) AS jaccard_est,
       {_EST_SQL.format(n="k_used", kth="kth_union")} AS union_est,
       (CAST(n_common AS DOUBLE) / CAST(k_used AS DOUBLE))
         * ({_EST_SQL.format(n="k_used", kth="kth_union")}) AS intersection_est
FROM agg
""",
}
