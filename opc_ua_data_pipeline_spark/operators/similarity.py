"""Similarity search over embedding columns (extension phase).

`embeddings` is ``(vec_id bigint, embedding array<float>, label int)``.

* brute-force cosine top-k — the correctness baseline: broadcast the
  (small) query set against the full corpus; per-pair cosine via a
  left-fold over zipped arrays.
* LSH-bucketed ANN — the scale path: a sign-bit sketch partitions the
  corpus; candidates are only same-bucket vectors, turning the cross
  join into an equi-join on the bucket key.

Determinism: float32 elements widen to float64 exactly, products of
two float32s are exact in float64, and both engines fold the sum
strictly left-to-right (Spark ``aggregate``, DuckDB ``list_reduce``),
so cosine scores are bit-identical and the top-k cut is stable with
the (score DESC, vec_id ASC) tiebreak.

At 100 TB the fold stays JVM-side (no Python); for heavier kernels
(batched matmul top-k) the mapInPandas variant in
:mod:`.multimodal` shows the Arrow-batched pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table

TOP_K = 10
N_QUERIES = 5  # vec_id < 5 are the query vectors in the demo queries
SIGN_BITS = 4  # leading dimensions used for the LSH sign sketch


def _dot(a: Column, b: Column) -> Column:
    """Left-fold dot product over double-widened arrays (order-pinned)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def _norm(e: Column) -> Column:
    return F.sqrt(_dot(e, e))


def _pair_score() -> Column:
    """cosine from a per-pair dot and precomputed per-side norms —
    norms are evaluated once per vector, not once per pair (3x fewer
    folds on the hot path), with bit-identical results since sqrt of
    the same fold is the same double whenever it is computed."""
    return _dot(F.col("q_emb"), F.col("c_emb")) / (
        F.col("q_norm") * F.col("c_norm")
    )


def brute_force_topk(
    queries: DataFrame, corpus: DataFrame, k: int = TOP_K
) -> DataFrame:
    """Exact top-k cosine neighbors: broadcast(queries) x corpus.

    The corpus side streams — no shuffle of the 100 TB side; the only
    exchange is the per-query top-k (TakeOrdered within row_number
    window over a key space of |queries|).
    """
    q = queries.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_norm"),
    )
    c = corpus.select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_emb"),
        _norm(F.col("embedding")).alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", _pair_score().alias("score"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "score", "rank")
    )


def sign_bucket(emb: Column, n_bits: int = SIGN_BITS) -> Column:
    """Sign sketch over the leading dims: a random-hyperplane LSH with
    axis-aligned planes (deterministic, engine-portable)."""
    bits = [
        F.when(F.element_at(emb, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(n_bits)
    ]
    return F.concat(*bits)


def lsh_topk(queries: DataFrame, corpus: DataFrame, k: int = TOP_K) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign
    bucket.  The cross join becomes an equi-join on the bucket key —
    at 100 TB each bucket is a hash-partition-local scan, and recall
    is tunable via n_bits (fewer bits = more candidates)."""
    q = queries.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_norm"),
        sign_bucket(F.col("embedding")).alias("bucket"),
    )
    c = corpus.select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_emb"),
        _norm(F.col("embedding")).alias("c_norm"),
        sign_bucket(F.col("embedding")).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", _pair_score().alias("score"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "score", "rank")
    )


def centroid_topk(queries: DataFrame, corpus: DataFrame, k: int = TOP_K) -> DataFrame:
    """IVF-flavored ANN: the `label` column plays the coarse-quantizer
    cell id (in a real IVF the cells come from k-means over a sample);
    probe only the query's own cell."""
    q = queries.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_norm"),
        "label",
    )
    c = corpus.select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_emb"),
        _norm(F.col("embedding")).alias("c_norm"),
        "label",
    )
    scored = (
        c.join(F.broadcast(q), "label")
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", _pair_score().alias("score"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "score", "rank")
    )


#: Real corpora use ~0.9; the synthetic embeddings are near-orthogonal
#: (max pairwise cosine ~0.51), so the demo threshold sits at the tail
#: of that distribution to keep the query's output non-degenerate.
NEARDUP_THRESHOLD = 0.35


def embedding_neardup_pairs(
    corpus: DataFrame, threshold: float = NEARDUP_THRESHOLD
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the dedup family's
    semantic variant): candidates restricted to the same sign bucket,
    scored, thresholded.  The sketch makes the pair space
    sum-of-squares of bucket sizes instead of |corpus|^2 — the same
    LSH argument as minhash_candidate_pairs, applied to vectors."""
    c1 = corpus.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_norm"),
        sign_bucket(F.col("embedding")).alias("bucket"),
    )
    c2 = corpus.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("c_emb"),
        _norm(F.col("embedding")).alias("c_norm"),
        sign_bucket(F.col("embedding")).alias("bucket"),
    )
    return (
        c1.join(c2, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", _pair_score().alias("score"))
        .filter(F.col("score") >= threshold)
    )


# ---------------------------------------------------------------------------
# Driver-contract queries
# ---------------------------------------------------------------------------


def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(emb.filter(F.col("vec_id") < N_QUERIES), emb)


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(emb.filter(F.col("vec_id") < N_QUERIES), emb)


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return centroid_topk(emb.filter(F.col("vec_id") < N_QUERIES), emb)


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_neardup_pairs(load_table(spark, sf_dir, "embeddings"))


QUERIES = {
    "ann_bruteforce_topk": q_ann_bruteforce,
    "ann_lsh_topk": q_ann_lsh,
    "ann_ivf_topk": q_ann_ivf,
    "embedding_neardup_pairs": q_embedding_neardup,
}

# DuckDB-side cosine with the SAME left-fold order as Spark's aggregate().
_COS_SQL = """
  list_reduce(list_transform(generate_series(1, len({a})),
                             i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)),
              (acc, p) -> acc + p)
  / (sqrt(list_reduce(list_transform(generate_series(1, len({a})),
                                     i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)),
                      (acc, p) -> acc + p))
     * sqrt(list_reduce(list_transform(generate_series(1, len({b})),
                                       i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)),
                        (acc, p) -> acc + p)))
"""

_BUCKET_SQL = """
  (CASE WHEN {e}[1] >= 0 THEN '1' ELSE '0' END ||
   CASE WHEN {e}[2] >= 0 THEN '1' ELSE '0' END ||
   CASE WHEN {e}[3] >= 0 THEN '1' ELSE '0' END ||
   CASE WHEN {e}[4] >= 0 THEN '1' ELSE '0' END)
"""


def _topk_sql(candidate_pred: str) -> str:
    cos = _COS_SQL.format(a="q.embedding", b="c.embedding")
    return f"""
WITH scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         {cos} AS score
  FROM embeddings q JOIN embeddings c
    ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id AND ({candidate_pred})
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY score DESC, c_id ASC) AS rank
  FROM scored
)
SELECT q_id, c_id, score, rank FROM ranked WHERE rank <= {TOP_K}
"""


ORACLES = {
    "ann_bruteforce_topk": _topk_sql("TRUE"),
    "ann_lsh_topk": _topk_sql(
        _BUCKET_SQL.format(e="q.embedding") + " = " + _BUCKET_SQL.format(e="c.embedding")
    ),
    "ann_ivf_topk": _topk_sql("q.label = c.label"),
    "embedding_neardup_pairs": f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_COS_SQL.format(a="a.embedding", b="b.embedding")} AS score
FROM embeddings a JOIN embeddings b
  ON a.vec_id < b.vec_id
 AND {_BUCKET_SQL.format(e="a.embedding")} = {_BUCKET_SQL.format(e="b.embedding")}
WHERE {_COS_SQL.format(a="a.embedding", b="b.embedding")} >= {NEARDUP_THRESHOLD}
""",
}
