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


def _arrow_pair_scorer(threshold: float, dim: int):
    """Arrow-batched cosine scorer for the bucketed pair path (round
    11, guide §4.2): the candidate join's output is pair-quadratic in
    bucket size and each pair paid an INTERPRETED JVM fold (zip_with +
    aggregate higher-order functions do not participate in whole-stage
    codegen — the round-10 argmin probe measured the same effect), so
    the per-pair kernel moves to one vectorized NumPy pass per Arrow
    batch.  Bit-exactness is preserved by replaying the exact IEEE
    sequence of `_pair_score`: float32 widens to float64 exactly, each
    elementwise product is one f64 multiply, and the dot accumulates
    STRICTLY LEFT-TO-RIGHT over dimensions — vectorized across the
    PAIR axis, looped over the dim axis — matching Spark's
    ``aggregate`` fold and DuckDB's ``list_reduce`` step for step;
    sqrt/divide/>= are single IEEE ops on both engines."""

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        def mat(col):
            arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
            off = arr.offsets.to_numpy()
            assert len(off) == 0 or (np.diff(off) == dim).all()
            flat = arr.values.to_numpy(zero_copy_only=False)
            base = off[0] if len(off) else 0
            return (
                np.asarray(flat, dtype=np.float64)[
                    base : base + (len(off) - 1) * dim
                ].reshape(-1, dim)
            )

        for b in batches:
            if b.num_rows == 0:
                continue
            qa = mat(b.column("q_emb"))
            ca = mat(b.column("c_emb"))
            prod = qa * ca
            qq = qa * qa
            cc = ca * ca
            dot = prod[:, 0].copy()
            qn = qq[:, 0].copy()
            cn = cc[:, 0].copy()
            for j in range(1, dim):  # strict left fold per pair
                dot += prod[:, j]
                qn += qq[:, j]
                cn += cc[:, j]
            score = dot / (np.sqrt(qn) * np.sqrt(cn))
            keep = score >= threshold
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("id_a").filter(pa.array(keep)),
                    b.column("id_b").filter(pa.array(keep)),
                    pa.array(score[keep], type=pa.float64()),
                ],
                names=["id_a", "id_b", "score"],
            )

    return fn


def embedding_neardup_pairs(
    corpus: DataFrame, threshold: float = NEARDUP_THRESHOLD
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the dedup family's
    semantic variant): candidates restricted to the same sign bucket,
    scored, thresholded.  The sketch makes the pair space
    sum-of-squares of bucket sizes instead of |corpus|^2 — the same
    LSH argument as minhash_candidate_pairs, applied to vectors.

    Scoring runs in the Arrow/NumPy kernel (:func:`_arrow_pair_scorer`
    — round 11): the pair list is the ONE quadratic-volume scoring
    path in the similarity family (the topk paths score only
    |queries|×bucket), and the interpreted JVM fold dominated it.
    Only the four needed columns cross the Python boundary, and the
    threshold filter runs inside the kernel so non-pairs never ship
    back.  Values are bit-identical (strict left-fold replay — see the
    scorer's docstring), re-proved against the unchanged quadratic
    SQL oracle."""
    from .clustering import EMBED_DIM

    c1 = corpus.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("q_emb"),
        sign_bucket(F.col("embedding")).alias("bucket"),
    )
    c2 = corpus.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("c_emb"),
        sign_bucket(F.col("embedding")).alias("bucket"),
    )
    return (
        c1.join(c2, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "q_emb", "c_emb")
        .mapInArrow(
            _arrow_pair_scorer(threshold, EMBED_DIM),
            "id_a bigint, id_b bigint, score double",
        )
    )


def semantic_dedup(
    corpus: DataFrame, threshold: float = NEARDUP_THRESHOLD
) -> DataFrame:
    """SemDeDup-style pruning: within each LSH bucket (the stand-in
    for a k-means cluster), drop every vector that has a near-dup
    (cosine >= threshold) with a smaller vec_id — the greedy
    keep-first-representative rule, made deterministic by the id
    order.  Survivors are the corpus with semantic redundancy removed.

    The plan is the near-dup pair join (bucketed, never all-pairs)
    feeding a LEFT ANTI join — both shuffle on keys that scale, and
    the anti join's right side is only the dominated ids, not the
    corpus.  At 100 TB this is exactly the SemDeDup shape: cluster,
    intra-cluster pair scan, representative filter.
    """
    removed = embedding_neardup_pairs(corpus, threshold).select(
        F.col("id_b").alias("vec_id")
    )
    return corpus.join(removed, "vec_id", "left_anti").select(
        "vec_id", "label", sign_bucket(F.col("embedding")).alias("bucket")
    )


def label_centroids(corpus: DataFrame) -> DataFrame:
    """Per-label centroid, flattened to (label, pos, mean_val, n_vecs).

    One posexplode + one (label, pos) groupBy — #labels × #dims result
    rows regardless of corpus size, partial-aggregated map-side.
    Elements sum as DECIMAL(28,6) (exact, associative — order-free
    across partitions), divided once as double, so the centroid is the
    same double in every engine; float32 never lands exactly on a 6-dp
    midpoint (decimal midpoints are not finite binary fractions), so
    rounding-mode differences cannot trigger.
    """
    exploded = corpus.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    )
    # float32 → double BEFORE the decimal cast: Spark's float→decimal
    # rounds the float's 7-digit shortest repr (which often ends right
    # on the 6-dp cut), while engines that round the exact binary value
    # disagree there; the double's 17-digit repr pins both to the same
    # rounding of the same number.
    return exploded.groupBy("label", "pos").agg(
        (
            F.sum(F.col("v").cast("double").cast("decimal(28,6)")).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("mean_val"),
        F.count(F.lit(1)).alias("n_vecs"),
    )


def nearest_centroid(corpus: DataFrame) -> DataFrame:
    """Assign every vector to its nearest label centroid (squared L2)
    — prototype classification, and exactly one Lloyd iteration of
    k-means seeded by the labels (iterate = re-label + recompute
    centroids; each step is these same two operators).

    The #labels-row centroid table is broadcast; distance is the
    usual order-pinned left fold, so scores and the (dist, label)
    argmin tie-break are engine-exact.
    """
    cent = (
        label_centroids(corpus)
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mean_val"))),
                lambda s: s.mean_val,
            ).alias("centroid")
        )
        .select(F.col("label").alias("c_label"), "centroid")
    )
    # (Round-10 probe: a collected-centroid argmin expression measured
    # slower here — interpreted HOF re-evaluation per consumed field;
    # see clustering._assign's docstring.  The broadcast crossJoin +
    # window stays.)
    sq = F.zip_with(
        F.col("embedding"),
        F.col("centroid"),
        lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
    )
    dist = F.aggregate(sq, F.lit(0.0), lambda acc, d: acc + d)
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dist").asc(), F.col("c_label").asc()
    )
    return (
        corpus.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "label",
            F.col("c_label"),
            dist.alias("dist"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == 1)
        .select(
            "vec_id",
            "label",
            F.col("c_label").alias("nearest_label"),
            "dist",
        )
    )


def quantize_sq8(corpus: DataFrame) -> DataFrame:
    """Scalar (SQ8) quantization: per-dimension min/max over the
    corpus → each float32 element becomes one uint8 code — the
    standard 4× memory cut before ANN serving.

    The 2×#dims codebook is a tiny aggregate broadcast back over the
    corpus; codes are ``floor((v-min)/scale + 0.5)`` clamped to
    [0,255] — floor of identical doubles, engine-deterministic (no
    round(), whose half-way rule differs by engine).  Output is
    flattened (vec_id, pos, code) plus the codebook columns so the
    dequantizer is self-contained.
    """
    ex = corpus.select("vec_id", F.posexplode("embedding").alias("pos", "v"))
    book = ex.groupBy("pos").agg(
        F.min(F.col("v").cast("double")).alias("lo"),
        F.max(F.col("v").cast("double")).alias("hi"),
    )
    scale = (F.col("hi") - F.col("lo")) / 255.0
    code = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.greatest(
                F.floor(
                    (F.col("v").cast("double") - F.col("lo")) / scale + 0.5
                ),
                F.lit(0),
            ),
            F.lit(255),
        )
    ).cast("int")
    return (
        ex.join(F.broadcast(book), "pos")
        .select("vec_id", "pos", code.alias("code"), "lo", "hi")
    )


MATRYOSHKA_DIMS = 16


def normalize_embeddings(
    corpus: DataFrame, prefix_dims: int | None = None
) -> DataFrame:
    """Embedding preprocessing: L2-normalize, optionally after
    truncating to the leading ``prefix_dims`` (matryoshka-style
    dimension reduction — prefix then renormalize, the serving trick
    that trades recall for a dims/``prefix_dims`` memory cut).

    Output is flattened (vec_id, pos, val, norm): the driver
    canonicalizer can hash scalars but not array cells, and the flat
    shape is what columnar ANN stores ingest anyway.  Exactness: the
    norm is sqrt of the order-pinned left fold of exact float32→
    double squares — sqrt is IEEE-correctly-rounded, so both engines
    produce the identical double, and each division x/norm is then
    identical too.  Zero vectors pass through with NULL values
    (divide-by-zero guard).  Shuffle-free narrow pass.
    """
    emb = F.col("embedding")
    if prefix_dims is not None:
        emb = F.slice(emb, 1, prefix_dims)
    staged = corpus.select("vec_id", emb.alias("e"))
    norm = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("e"),
                F.col("e"),
                lambda x, y: x.cast("double") * y.cast("double"),
            ),
            F.lit(0.0),
            lambda acc, p: acc + p,
        )
    )
    return (
        staged.withColumn("norm", norm)
        .select(
            "vec_id",
            "norm",
            F.posexplode("e").alias("pos", "v"),
        )
        .select(
            "vec_id",
            "pos",
            F.when(
                F.col("norm") != 0, F.col("v").cast("double") / F.col("norm")
            ).alias("val"),
            "norm",
        )
    )


def lsh_recall(queries: DataFrame, corpus: DataFrame, k: int = TOP_K) -> DataFrame:
    """Recall@k of the sign-LSH ANN against the exact top-k — the
    evaluation loop every ANN deployment runs before trusting an
    index.  Both sides are the existing operators; the metric join is
    per-query counting (ints), recall = hits / |exact top-k| — the
    per-query exact result count, not the constant k, so a corpus
    smaller than k can still score 1.0 (mirrors ivfpq_recall)."""
    exact = brute_force_topk(queries, corpus, k).select(
        "q_id", F.col("c_id").alias("exact_id")
    )
    approx = lsh_topk(queries, corpus, k).select(
        "q_id", F.col("c_id").alias("approx_id")
    )
    hits = (
        exact.join(
            approx,
            (exact.q_id == approx.q_id)
            & (exact.exact_id == approx.approx_id),
        )
        .groupBy(exact.q_id.alias("q_id"))
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        exact.groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("_n_exact"))
        .join(hits, "q_id", "left")
        .select(
            "q_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.try_divide(
                F.coalesce("n_hits", F.lit(0)), F.col("_n_exact")
            ).alias("recall_at_k"),
        )
    )


#: every DECON_BENCH_MOD-th vector plays the held-out benchmark/eval
#: set in the decontamination demo (5% of the corpus); the rest is
#: the training corpus to be scrubbed.
DECON_BENCH_MOD = 20
#: flag threshold — sits at the tail of the synthetic corpus's
#: near-orthogonal cosine distribution (max pairwise ~0.51) so the
#: audit is non-degenerate at every SF, same calibration note as
#: NEARDUP_THRESHOLD.
DECON_THRESHOLD = 0.3


def _decon_sides(
    corpus: DataFrame, bench_mod: int
) -> tuple[DataFrame, DataFrame]:
    bench = corpus.filter(F.col("vec_id") % bench_mod == 0).select(
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_norm"),
        sign_bucket(F.col("embedding")).alias("bucket"),
    )
    train = corpus.filter(F.col("vec_id") % bench_mod != 0).select(
        F.col("vec_id").alias("t_id"),
        F.col("embedding").alias("c_emb"),
        _norm(F.col("embedding")).alias("c_norm"),
        sign_bucket(F.col("embedding")).alias("bucket"),
    )
    return bench, train


def embedding_decontamination(
    corpus: DataFrame,
    threshold: float = DECON_THRESHOLD,
    bench_mod: int = DECON_BENCH_MOD,
) -> DataFrame:
    """Embedding-space decontamination audit — the DENSE complement of
    the token-space ``bloom_contamination`` / ``ngram_contamination``
    gates (training.py): flag every training vector whose cosine
    against ANY benchmark vector reaches ``threshold`` (the
    eval-set-leakage scrub an LLM data pipeline runs before
    training; paraphrased leaks that n-gram overlap misses are
    exactly what the embedding space catches).

    Scale shape: the benchmark set is broadcast (eval suites are
    small by definition) and the ONLY corpus-side work is a
    bucket-equi-join against it — the sign-LSH bucket reuses the
    ann_lsh machinery, so the corpus never joins itself and never
    cross-joins; per train vector the candidate set is the bucket's
    benchmark slice.  The bucket restriction is the recall trade
    every LSH index makes; :func:`decontam_recall` measures it
    against the exact quadratic flags on the same corpus.
    """
    bench, train = _decon_sides(corpus, bench_mod)
    return (
        train.join(F.broadcast(bench), "bucket")
        .select("t_id", "b_id", _pair_score().alias("score"))
        .filter(F.col("score") >= threshold)
        .groupBy(F.col("t_id").alias("vec_id"))
        .agg(
            F.count(F.lit(1)).alias("n_bench_hits"),
            F.max("score").alias("max_score"),
        )
    )


def _decon_exact_flags(
    corpus: DataFrame, threshold: float, bench_mod: int
) -> DataFrame:
    """Exact (bucket-free) flag set — the quadratic verification
    baseline, analogous to brute_force_topk vs lsh_topk."""
    bench, train = _decon_sides(corpus, bench_mod)
    return (
        train.drop("bucket")
        .crossJoin(F.broadcast(bench.drop("bucket")))
        .select("t_id", _pair_score().alias("score"))
        .filter(F.col("score") >= threshold)
        .select(F.col("t_id").alias("vec_id"))
        .distinct()
    )


def decontam_recall(
    corpus: DataFrame,
    threshold: float = DECON_THRESHOLD,
    bench_mod: int = DECON_BENCH_MOD,
) -> DataFrame:
    """Recall of the LSH-bucketed decontamination against the exact
    quadratic flags — the index-trust evaluation, sibling of
    :func:`lsh_recall` / ``ivfpq_recall``: one row with the exact
    flag count, how many the bucketed audit caught, and the ratio
    (ulp-collapsed double; NULL when nothing is flagged exactly)."""
    exact = _decon_exact_flags(corpus, threshold, bench_mod)
    caught = exact.join(
        embedding_decontamination(corpus, threshold, bench_mod).select(
            "vec_id"
        ),
        "vec_id",
        "left_semi",
    )
    return (
        exact.agg(F.count(F.lit(1)).alias("n_exact"))
        .crossJoin(caught.agg(F.count(F.lit(1)).alias("n_caught")))
        .select(
            "n_exact",
            "n_caught",
            F.expr(
                "CAST(CAST(try_divide(CAST(n_caught AS DOUBLE),"
                " CAST(n_exact AS DOUBLE)) AS DECIMAL(18,9)) AS DOUBLE)"
            ).alias("recall"),
        )
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


RP_OUT_DIMS = 16
RP_IN_DIMS = 64


def _rp_signs() -> list[list[float]]:
    """The ±1 projection matrix, derived from md5 so BOTH engines (and
    any re-run) build the identical matrix from the spec alone — no
    RNG state to ship.  Row j, column i: sign = parity of the first
    hex digit of md5('rp:i:j')."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"rp:{i}:{j}".encode()).hexdigest()[0], 16) % 2
            == 0
            else -1.0
            for i in range(RP_IN_DIMS)
        ]
        for j in range(RP_OUT_DIMS)
    ]


def rp_project(corpus: DataFrame) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64 -> 16 dims with a
    deterministic ±1 (Achlioptas) matrix: the cheap dimension
    reduction in front of ANN/clustering when matryoshka prefixes
    aren't available (dense sign matrices preserve pairwise distances
    within the JL bound, no trained codebook needed).

    Exactness without a rounding contract: the fold is multiply/add
    in pinned left-to-right order (IEEE ops, no libm) and the 1/√16
    scale is a power-of-two divide — bit-identical on both engines.
    The plan is a shuffle-free narrow pass; the 16 output folds are
    assembled as ONE SQL string (driver plan-build stays O(1) py4j
    round trips, the simhash lesson).  Output flattened to
    (vec_id, out_pos, val) — scalar cells for the canonicalizer.
    """
    signs = _rp_signs()
    exprs = []
    for j, row in enumerate(signs):
        arr = "array(" + ", ".join(repr(s) for s in row) + ")"
        exprs.append(
            f"CAST(aggregate(zip_with(embedding, {arr},"
            " (x, s) -> CAST(x AS DOUBLE) * s), CAST(0.0 AS DOUBLE),"
            f" (acc, p) -> acc + p) / 4.0 AS DOUBLE) AS rp_{j}"
        )
    wide = corpus.selectExpr("vec_id", *exprs)
    stack = (
        f"stack({RP_OUT_DIMS}, "
        + ", ".join(f"{j}, rp_{j}" for j in range(RP_OUT_DIMS))
        + ") AS (out_pos, val)"
    )
    return wide.selectExpr("vec_id", stack).selectExpr(
        "vec_id", "CAST(out_pos AS INT) AS out_pos", "val"
    )


def _rp_sql() -> str:
    rows = ", ".join(
        "(" + str(j) + ", [" + ", ".join(repr(s) for s in row) + "])"
        for j, row in enumerate(_rp_signs())
    )
    return f"""
SELECT vec_id, CAST(j AS INTEGER) AS out_pos,
       list_reduce(list_transform(generate_series(1, {RP_IN_DIMS}),
                                  i -> CAST(embedding[i] AS DOUBLE) * sgn[i]),
                   (acc, p) -> acc + p) / 4.0 AS val
FROM embeddings CROSS JOIN (VALUES {rows}) AS s(j, sgn)
"""


QUERIES = {
    "ann_bruteforce_topk": q_ann_bruteforce,
    "embedding_rp_project": lambda spark, sf: rp_project(
        load_table(spark, sf, "embeddings")
    ),
    "ann_lsh_topk": q_ann_lsh,
    "ann_ivf_topk": q_ann_ivf,
    "embedding_neardup_pairs": q_embedding_neardup,
    "label_centroids": lambda spark, sf: label_centroids(
        load_table(spark, sf, "embeddings")
    ),
    "nearest_centroid": lambda spark, sf: nearest_centroid(
        load_table(spark, sf, "embeddings")
    ),
    "embedding_quantize_sq8": lambda spark, sf: quantize_sq8(
        load_table(spark, sf, "embeddings")
    ),
    "ann_lsh_recall": lambda spark, sf: (
        lambda emb: lsh_recall(emb.filter(F.col("vec_id") < N_QUERIES), emb)
    )(load_table(spark, sf, "embeddings")),
    "semantic_dedup": lambda spark, sf: semantic_dedup(
        load_table(spark, sf, "embeddings")
    ),
    "embedding_normalize": lambda spark, sf: normalize_embeddings(
        load_table(spark, sf, "embeddings")
    ),
    "embedding_matryoshka": lambda spark, sf: normalize_embeddings(
        load_table(spark, sf, "embeddings"), prefix_dims=MATRYOSHKA_DIMS
    ),
    "embedding_decontamination": lambda spark, sf: embedding_decontamination(
        load_table(spark, sf, "embeddings")
    ),
    "decontam_recall": lambda spark, sf: decontam_recall(
        load_table(spark, sf, "embeddings")
    ),
}


def _normalize_sql(prefix: int | None = None) -> str:
    e = "embedding" if prefix is None else f"embedding[1:{prefix}]"
    norm = f"""sqrt(list_reduce(
      list_transform(generate_series(1, len({e})),
                     i -> CAST({e}[i] AS DOUBLE) * CAST({e}[i] AS DOUBLE)),
      (acc, p) -> acc + p))"""
    return f"""
SELECT vec_id,
       UNNEST(generate_series(0, len({e}) - 1)) AS pos,
       UNNEST(CASE WHEN {norm} <> 0
              THEN list_transform({e}, x -> CAST(x AS DOUBLE) / {norm})
              ELSE list_transform({e}, x -> CAST(NULL AS DOUBLE)) END)
         AS val,
       {norm} AS norm
FROM embeddings
"""

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


_NEARDUP_PAIRS_SQL = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_COS_SQL.format(a="a.embedding", b="b.embedding")} AS score
FROM embeddings a JOIN embeddings b
  ON a.vec_id < b.vec_id
 AND {_BUCKET_SQL.format(e="a.embedding")} = {_BUCKET_SQL.format(e="b.embedding")}
WHERE {_COS_SQL.format(a="a.embedding", b="b.embedding")} >= {NEARDUP_THRESHOLD}
"""

ORACLES = {
    "embedding_normalize": _normalize_sql(),
    "embedding_matryoshka": _normalize_sql(MATRYOSHKA_DIMS),
    "embedding_rp_project": _rp_sql(),
    "ann_bruteforce_topk": _topk_sql("TRUE"),
    "ann_lsh_topk": _topk_sql(
        _BUCKET_SQL.format(e="q.embedding") + " = " + _BUCKET_SQL.format(e="c.embedding")
    ),
    "ann_ivf_topk": _topk_sql("q.label = c.label"),
    "embedding_neardup_pairs": _NEARDUP_PAIRS_SQL,
    # the bucketed audit itself — the oracle states the SAME LSH
    # semantics (bucket-restricted candidates), like ann_lsh_topk;
    # the exact-vs-bucketed gap is what decontam_recall measures
    "embedding_decontamination": f"""
SELECT t.vec_id AS vec_id,
       CAST(COUNT(*) AS BIGINT) AS n_bench_hits,
       MAX({_COS_SQL.format(a="b.embedding", b="t.embedding")}) AS max_score
FROM embeddings t JOIN embeddings b
  ON t.vec_id % {DECON_BENCH_MOD} <> 0
 AND b.vec_id % {DECON_BENCH_MOD} = 0
 AND {_BUCKET_SQL.format(e="t.embedding")} = {_BUCKET_SQL.format(e="b.embedding")}
WHERE {_COS_SQL.format(a="b.embedding", b="t.embedding")} >= {DECON_THRESHOLD}
GROUP BY 1
""",
    # recall of the bucketed audit vs the EXACT quadratic flag set
    "decontam_recall": f"""
WITH exact AS (
  SELECT DISTINCT t.vec_id
  FROM embeddings t JOIN embeddings b
    ON t.vec_id % {DECON_BENCH_MOD} <> 0
   AND b.vec_id % {DECON_BENCH_MOD} = 0
  WHERE {_COS_SQL.format(a="b.embedding", b="t.embedding")} >= {DECON_THRESHOLD}
),
bucketed AS (
  SELECT DISTINCT t.vec_id
  FROM embeddings t JOIN embeddings b
    ON t.vec_id % {DECON_BENCH_MOD} <> 0
   AND b.vec_id % {DECON_BENCH_MOD} = 0
   AND {_BUCKET_SQL.format(e="t.embedding")} = {_BUCKET_SQL.format(e="b.embedding")}
  WHERE {_COS_SQL.format(a="b.embedding", b="t.embedding")} >= {DECON_THRESHOLD}
)
SELECT CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS n_exact,
       CAST((SELECT COUNT(*) FROM exact e
             WHERE EXISTS (SELECT 1 FROM bucketed k
                           WHERE k.vec_id = e.vec_id)) AS BIGINT)
         AS n_caught,
       CAST(CAST(CAST((SELECT COUNT(*) FROM exact e
             WHERE EXISTS (SELECT 1 FROM bucketed k
                           WHERE k.vec_id = e.vec_id)) AS DOUBLE)
            / NULLIF(CAST((SELECT COUNT(*) FROM exact) AS DOUBLE), 0.0)
            AS DECIMAL(18,9)) AS DOUBLE) AS recall
""",
    "semantic_dedup": f"""
WITH pairs AS ({_NEARDUP_PAIRS_SQL})
SELECT e.vec_id, e.label,
       {_BUCKET_SQL.format(e="e.embedding")} AS bucket
FROM embeddings e
WHERE NOT EXISTS (SELECT 1 FROM pairs p WHERE p.id_b = e.vec_id)
""",
    "label_centroids": """
SELECT label, pos,
       CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS mean_val,
       COUNT(*) AS n_vecs
FROM (SELECT label,
             UNNEST(embedding) AS v,
             UNNEST(generate_series(0, len(embedding) - 1)) AS pos
      FROM embeddings)
GROUP BY label, pos
""",
    "nearest_centroid": """
WITH means AS (
  SELECT label, pos,
         CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS mean_val
  FROM (SELECT label,
               UNNEST(embedding) AS v,
               UNNEST(generate_series(0, len(embedding) - 1)) AS pos
        FROM embeddings)
  GROUP BY label, pos
),
cent AS (
  SELECT label AS c_label, list(mean_val ORDER BY pos) AS centroid
  FROM means GROUP BY label
),
scored AS (
  SELECT e.vec_id, e.label, c.c_label,
         list_reduce(
           list_transform(generate_series(1, len(e.embedding)),
             i -> (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i])
                  * (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i])),
           (acc, d) -> acc + d) AS dist
  FROM embeddings e CROSS JOIN cent c
)
SELECT vec_id, label, c_label AS nearest_label, dist
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY dist ASC, c_label ASC) AS rank
      FROM scored)
WHERE rank = 1
""",
    "embedding_quantize_sq8": """
WITH ex AS (
  SELECT vec_id,
         UNNEST(generate_series(0, len(embedding) - 1)) AS pos,
         UNNEST(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
  FROM embeddings
),
book AS (SELECT pos, MIN(v) AS lo, MAX(v) AS hi FROM ex GROUP BY pos)
SELECT vec_id, ex.pos,
       CAST(CASE WHEN hi = lo THEN 0
                 ELSE LEAST(GREATEST(FLOOR((v - lo) / ((hi - lo) / 255.0)
                                           + 0.5), 0), 255)
            END AS INTEGER) AS code,
       lo, hi
FROM ex JOIN book ON ex.pos = book.pos
""",
    "ann_lsh_recall": f"""
WITH exact AS ({_topk_sql("TRUE")}),
approx AS ({_topk_sql(_BUCKET_SQL.format(e="q.embedding") + " = " + _BUCKET_SQL.format(e="c.embedding"))}),
hits AS (
  SELECT e.q_id, COUNT(*) AS n_hits
  FROM exact e JOIN approx a ON e.q_id = a.q_id AND e.c_id = a.c_id
  GROUP BY e.q_id
)
SELECT q.q_id,
       COALESCE(n_hits, 0) AS n_hits,
       CAST(COALESCE(n_hits, 0) AS DOUBLE) / q.n_exact AS recall_at_k
FROM (SELECT q_id, COUNT(*) AS n_exact FROM exact GROUP BY q_id) q
LEFT JOIN hits ON q.q_id = hits.q_id
""",
}


def brute_force_topk_arrow(
    queries: DataFrame, corpus: DataFrame, k: int = TOP_K
) -> DataFrame:
    """Exact top-k cosine neighbors, Arrow-vectorized: the production
    spelling of :func:`brute_force_topk` for heavy kernels.

    The JVM fold in ``brute_force_topk`` evaluates one interpreted
    expression per PAIR; here each Arrow batch of corpus vectors is
    one numpy matmul against the (small) query matrix — C @ Q.T is
    nb x nq scores in a single BLAS call — followed by a batch-local
    top-(k+1) cut so each batch emits k+1 rows per query, never
    nb x nq.  The final global per-query top-k merges #batches x (k+1)
    rows — tiny.  The corpus side never shuffles and never leaves its
    partition; this is the same data movement as the broadcast cross
    join, with the per-pair arithmetic vectorized.

    The query side is materialized on the driver and shipped via
    ``SparkContext.broadcast`` — exactly the movement pattern
    ``F.broadcast`` performs on the JVM side, and legitimate for the
    same reason: the query set is the definitionally-small side.

    NOT a contract query: numpy sums pairwise/SIMD, so scores differ
    from the left-fold in the last ulp and cannot share the DuckDB
    oracle.  tests/test_similarity_arrow.py asserts the returned
    (q_id, c_id, rank) triples equal the fold variant's and scores
    agree to 1e-9.

    The batch-local cut sorts by (-score, c_id) — the global ranking
    order — so boundary ties resolve identically in the partial and
    final cuts.
    """
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    q_pdf = queries.select("vec_id", "embedding").toPandas()
    q_ids_np = q_pdf["vec_id"].to_numpy()
    q_mat = np.stack(q_pdf["embedding"].to_numpy()).astype(np.float64)
    q_norm = np.sqrt((q_mat * q_mat).sum(axis=1))
    bq = spark.sparkContext.broadcast((q_ids_np, q_mat, q_norm))

    def score_batches(batches):
        q_ids, qm, qn = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cm = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            c_ids = pdf["vec_id"].to_numpy()
            cn = np.sqrt((cm * cm).sum(axis=1))
            scores = (cm @ qm.T) / np.outer(cn, qn)
            kk = min(k + 1, scores.shape[0])
            out = {"q_id": [], "c_id": [], "score": []}
            for j in range(scores.shape[1]):
                order = np.lexsort((c_ids, -scores[:, j]))[:kk]
                out["q_id"].append(np.full(kk, q_ids[j]))
                out["c_id"].append(c_ids[order])
                out["score"].append(scores[order, j])
            yield pd.DataFrame(
                {c: np.concatenate(v) for c, v in out.items()}
            )

    partial = corpus.select("vec_id", "embedding").mapInPandas(
        score_batches, "q_id long, c_id long, score double"
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("c_id").asc()
    )
    return (
        partial.filter(F.col("q_id") != F.col("c_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "score", "rank")
    )


# ---------------------------------------------------------------------------
# Hard-negative mining (round 7b)
# ---------------------------------------------------------------------------

HN_TOP_K = 5


def hard_negative_pairs(
    queries: DataFrame, corpus: DataFrame, k: int = HN_TOP_K
) -> DataFrame:
    """Contrastive-training hard negatives: for each query vector,
    the top-``k`` most-similar corpus vectors with a DIFFERENT label,
    each flagged ``hard`` when it outscores the query's best SAME-
    label neighbor (the FaceNet criterion: a negative inside the
    positive's margin is the one worth training on).

    Scale shape: same broadcast(queries) x streaming-corpus plan as
    brute_force_topk — one corpus scan scores positives and negatives
    together, the positive side collapses to a per-query max (a
    |queries|-row broadcast), and the negative top-k is the usual
    per-query row_number cut.  Scores reuse the fold-ordered cosine,
    so parity with the oracle is bit-exact.
    """
    q = queries.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_norm"),
        F.col("label").alias("q_label"),
    )
    c = corpus.select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_emb"),
        _norm(F.col("embedding")).alias("c_norm"),
        F.col("label").alias("c_label"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "q_label", "c_id", "c_label", _pair_score().alias("score"))
    )
    pos = (
        scored.filter(F.col("q_label") == F.col("c_label"))
        .groupBy("q_id")
        .agg(F.max("score").alias("pos_score"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("c_id").asc()
    )
    neg = (
        scored.filter(F.col("q_label") != F.col("c_label"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    return (
        neg.join(F.broadcast(pos), "q_id", "left")
        .select(
            "q_id",
            "c_id",
            "rank",
            "score",
            # NULL pos_score (not a -1.0 sentinel, which collides with
            # the cosine minimum) when the query has no same-label
            # positive; such a negative is unconditionally hard.
            F.col("pos_score"),
            F.coalesce(
                F.col("score") > F.col("pos_score"), F.lit(True)
            ).alias("hard"),
        )
    )


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return hard_negative_pairs(emb.filter(F.col("vec_id") < N_QUERIES), emb)


QUERIES["hard_negative_pairs"] = q_hard_negatives


def _hard_negative_oracle(k: int = HN_TOP_K) -> str:
    cos = _COS_SQL.format(a="q.embedding", b="c.embedding")
    return f"""
WITH scored AS (
  SELECT q.vec_id AS q_id, q.label AS q_label,
         c.vec_id AS c_id, c.label AS c_label,
         {cos} AS score
  FROM embeddings q JOIN embeddings c
    ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
),
pos AS (
  SELECT q_id, MAX(score) AS pos_score
  FROM scored WHERE q_label = c_label GROUP BY 1
),
neg AS (
  SELECT q_id, c_id, score,
         CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY score DESC, c_id ASC) AS INTEGER) AS rank
  FROM scored WHERE q_label <> c_label
)
SELECT n.q_id, n.c_id, n.rank, n.score,
       p.pos_score AS pos_score,
       COALESCE(n.score > p.pos_score, TRUE) AS hard
FROM neg n LEFT JOIN pos p USING (q_id)
WHERE n.rank <= {k}
"""


ORACLES["hard_negative_pairs"] = _hard_negative_oracle()
