"""Deterministic k-means over the embedding corpus.

The iterative-algorithm pattern on Spark, end to end: every Lloyd
step is (broadcast centroids) → (argmin assign, order-pinned folds) →
(decimal-exact per-dim means), with a ``localCheckpoint`` per
iteration to truncate lineage.  Nothing iterates on the driver except
the loop counter — no collect of data rows, so the same code runs
unchanged on a 1000-executor corpus (swap localCheckpoint for
``persist`` + reliable checkpoint; k centroids always fit in a
broadcast).

Everything is engine-deterministic, so even this ITERATIVE algorithm
has an exact DuckDB oracle (the loop unrolled into CTEs):

* seeding: the k vectors with the smallest ``md5(vec_id)`` — a
  content-determined sample, same on any engine/partitioning (the
  same hash-gate idea as operators/sampling.py);
* distances: left-fold squared L2 (see similarity.py — float32
  widens exactly, both engines fold in array order);
* means: per-dimension DECIMAL(28,6) sums (associative ⇒ partition-
  order-free) divided once — identical doubles on both engines;
* ties: argmin breaks on cluster id, seeds order on (md5, vec_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.materialize import materialize

from ..functions.ranking import bounded_rank
from ..tables import load_table

K_CLUSTERS = 4
KMEANS_ITERS = 2


def _sq_dist_to(centroid_vals: list, emb=None) -> "F.Column":
    """Squared L2 of an embedding column (default ``embedding``) to one
    centroid given as plain Python doubles — the SAME zip_with +
    left-fold aggregate as the joined spelling (identical IEEE
    sequence), with the centroid inlined as an array literal."""
    arr = F.array(*[F.lit(float(v)) for v in centroid_vals])
    sq = F.zip_with(
        F.col("embedding") if emb is None else emb,
        arr,
        lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
    )
    return F.aggregate(sq, F.lit(0.0), lambda acc, d: acc + d)


def _cand_structs(cent_rows: list, emb=None) -> "F.Column":
    """The (dist, cluster) candidate struct array over a COLLECTED
    codebook — ordering of structs is field-lexicographic with NULLS
    FIRST, i.e. exactly ORDER BY dist ASC, cluster ASC.

    An empty codebook is rejected up front (round-10 ADVICE): the old
    crossJoin spelling degraded to an empty frame there, but
    ``F.array()`` of zero typeless elements fails analysis and
    ``array_min`` would yield NULL — fail loudly instead of either."""
    if not cent_rows:
        raise ValueError(
            "_cand_structs: empty collected codebook — the argmin "
            "expression form needs at least one centroid (k-means "
            "seeding always yields >= 1 on non-empty input)"
        )
    return F.array(
        *[
            F.struct(
                _sq_dist_to(r["centroid"], emb).alias("dist"),
                F.lit(r["cluster"]).alias("cluster"),
            )
            for r in sorted(cent_rows, key=lambda r: r["cluster"])
        ]
    )


def _nearest_struct(cent_rows: list, emb=None) -> "F.Column":
    """argmin_(dist, cluster) over a COLLECTED codebook as one column
    expression: array_min over the candidate structs — the old
    window's ORDER BY dist ASC, cluster ASC with rank()=1 (an
    all-NULL-dist row picks the lowest cluster id, as before)."""
    return F.array_min(_cand_structs(cent_rows, emb))


def _assign(corpus: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, embedding) × (cluster, centroid) → nearest cluster.

    Round-10 probe: an argmin-as-expression spelling (array_min over
    k collected-codebook (dist, cluster) structs, no crossJoin, no
    window) measured 4.6x SLOWER on the corpus path (kmeans iso warm
    1.8 → 8.4 s): higher-order functions evaluate interpreted, and
    the struct argmin re-evaluates per consumed field, so the k×d
    fold work multiplies instead of amortizing through the join's
    materialized dist column.  The crossJoin + per-vec_id window is
    the measured-faster shape on corpus-sized input; the expression
    form survives only where its operand is delta-sized
    (ivfpq_assign_delta) or a streaming projection (annindex).
    """
    sq = F.zip_with(
        F.col("embedding"),
        F.col("centroid"),
        lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
    )
    dist = F.aggregate(sq, F.lit(0.0), lambda acc, d: acc + d)
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dist").asc(), F.col("cluster").asc()
    )
    return (
        corpus.crossJoin(F.broadcast(cent))
        .select("vec_id", "embedding", "cluster", dist.alias("dist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == 1)
        .drop("rank")
    )


def _recompute(assigned: DataFrame) -> DataFrame:
    """Per-cluster decimal-exact per-dimension means → centroid arrays."""
    return (
        assigned.select("cluster", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("cluster", "pos")
        .agg(
            (
                F.sum(
                    F.col("v").cast("double").cast("decimal(28,6)")
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_val")
        )
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mean_val"))),
                lambda s: s.mean_val,
            ).alias("centroid")
        )
    )


def seed_centroids(corpus: DataFrame, k: int = K_CLUSTERS) -> DataFrame:
    """Deterministic seeds: the k hash-smallest vectors.

    Seed selection is a distributed top-k (TakeOrderedAndProject heap:
    per-partition top-k + driver merge of k rows — plan-locked in
    tests/test_plans.py), NOT a global row_number window, which would
    funnel the whole corpus through one task's sort.  Cluster ids
    0..k-1 are then assigned by a Window-free bounded rank over the
    k seed rows (functions/ranking.py).
    """
    seeds = (
        corpus.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "centroid"
            ),
            F.md5(F.col("vec_id").cast("string")).alias("h"),
        )
        .orderBy("h", "vec_id")
        .limit(k)
    )
    return bounded_rank(seeds, [("h", "asc"), ("vec_id", "asc")], "rn").select(
        (F.col("rn") - 1).alias("cluster"), "centroid"
    )


def _kmeans_loop(
    corpus: DataFrame, k: int, n_iter: int, assign_final: bool = True
) -> tuple[DataFrame | None, DataFrame]:
    """Run ``n_iter`` Lloyd iterations; return (final assignment,
    the centroid table USED for that final assignment) — the latter
    is the codebook ADC scoring needs.  The recompute after the last
    assign is skipped: nothing consumes it.  ``assign_final=False``
    additionally skips the LAST assignment pass and returns
    ``(None, cent)`` — for the many trainers that only consume the
    codebook (`_, cent = _kmeans_loop(...)`), the r9 spelling paid a
    full corpus assignment + eager checkpoint whose result was thrown
    away (round 10, guide §1.2: don't compute things you discard)."""
    cent = seed_centroids(corpus, k).transform(materialize)
    assigned = None
    for it in range(n_iter):
        if it == n_iter - 1 and not assign_final:
            return None, cent
        assigned = _assign(corpus, cent).transform(materialize)
        if it < n_iter - 1:
            cent = _recompute(assigned).transform(materialize)
    return assigned, cent


def kmeans_assignments(
    corpus: DataFrame, k: int = K_CLUSTERS, n_iter: int = KMEANS_ITERS
) -> DataFrame:
    """Run ``n_iter`` Lloyd iterations; return the final assignment
    (vec_id, cluster, dist)."""
    assigned, _ = _kmeans_loop(corpus, k, n_iter)
    return assigned.select("vec_id", "cluster", "dist")


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ's compression half)
# ---------------------------------------------------------------------------

EMBED_DIM = 64
PQ_SUBSPACES = 4
PQ_CODEBOOK_K = 16
PQ_ITERS = 2


def pq_encode(
    corpus: DataFrame,
    dim: int = EMBED_DIM,
    n_subspaces: int = PQ_SUBSPACES,
    k: int = PQ_CODEBOOK_K,
    n_iter: int = PQ_ITERS,
) -> DataFrame:
    """Product quantization: split each vector into ``n_subspaces``
    contiguous subvectors, train an independent k-means codebook per
    subspace (the same deterministic Lloyd machinery as
    :func:`kmeans_assignments`), and emit each vector's per-subspace
    code — dim×4 bytes collapse to n_subspaces codes, the compression
    half of IVF-PQ, THE standard 100-TB ANN serving layout (IVF cells
    from ``similarity.py`` route the search; PQ codes pay its memory).

    Scale shape: every subspace's training is the broadcast-centroid
    loop (nothing on the driver but the loop counter); the codebooks
    are k×(dim/n_subspaces) doubles — trivially broadcast.  At real
    scale codebooks train on a hash-gated sample (sampling.py) and
    encode the full corpus in one pass; here corpus==sample so the
    oracle can replay training exactly.

    Deterministic end to end (md5-seeded, order-pinned folds,
    decimal-exact means), so even the TRAINED codes have an exact
    DuckDB oracle — the per-subspace Lloyd chains unrolled into one
    WITH clause.
    """
    assert dim % n_subspaces == 0
    d_sub = dim // n_subspaces

    def train(s: int) -> DataFrame:
        sub = corpus.select(
            "vec_id",
            F.slice("embedding", s * d_sub + 1, d_sub).alias("embedding"),
        )
        assigned = kmeans_assignments(sub, k=k, n_iter=n_iter)
        return assigned.select(
            "vec_id",
            F.lit(s).alias("subspace"),
            F.col("cluster").alias("code"),
            "dist",
        )

    # Subspace trainings are independent Lloyd chains whose eager
    # localCheckpoints would otherwise SERIALIZE (each checkpoint
    # blocks the driver); submitting them from threads overlaps the
    # per-iteration jobs on the scheduler.  Results are deterministic
    # per subspace, so concurrency cannot change them.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=n_subspaces) as ex:
        parts = list(ex.map(train, range(n_subspaces)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


PQ_ADC_TOP_K = 10
PQ_N_QUERIES = 5  # mirror similarity.N_QUERIES: vec_id < 5 are queries


def pq_adc_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int = EMBED_DIM,
    n_subspaces: int = PQ_SUBSPACES,
    k: int = PQ_CODEBOOK_K,
    n_iter: int = PQ_ITERS,
    top_k: int = PQ_ADC_TOP_K,
    route_by_label: bool = False,
) -> DataFrame:
    """Asymmetric distance computation over PQ codes — the PQ serving
    path: each query builds one lookup table per subspace (its squared
    L2 to every codebook centroid, |queries|×k×n_subspaces doubles),
    and a vector's approximate distance is the SUM of 4 table lookups
    — the corpus is never touched beyond its codes.

    Scale shape: codes are joined to the BROADCAST per-subspace LUTs
    (bounded by |queries|·k, corpus-independent); the only per-corpus
    work is n_subspaces hash lookups + 3 additions per vector, then a
    per-query top-k window.  The subspace partials add in a FIXED
    textual order (((p0+p1)+p2)+p3) so the non-associative double sum
    is engine-identical and even approximate distances hash-match the
    oracle.

    ``route_by_label=True`` is the full IVF-PQ search: candidates are
    restricted to the query's cell (the label column standing in for
    a trained coarse quantizer, as in similarity.centroid_topk), so
    the scored set shrinks by ~the cell count while ADC still pays
    only lookups — the two halves of the standard 100 TB ANN index
    composed.
    """
    assert dim % n_subspaces == 0
    d_sub = dim // n_subspaces

    wide = (
        corpus.select("vec_id", F.col("label").alias("c_cell"))
        if route_by_label
        else None
    )

    def train(s: int):
        sub = corpus.select(
            "vec_id",
            F.slice("embedding", s * d_sub + 1, d_sub).alias("embedding"),
        )
        return _kmeans_loop(sub, k, n_iter)

    # Train the independent per-subspace codebooks concurrently (see
    # pq_encode): the eager localCheckpoints inside each Lloyd chain
    # would serialize the 4 trainings; thread-submitted jobs overlap
    # on the scheduler with bit-identical results.
    # (Round-10 probe: recomputing the codes as collected-codebook
    # argmin expressions over one corpus pass — instead of joining the
    # loop's checkpointed assignments — measured ~2x slower; see
    # _assign's docstring.  The join assembly stays.)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=n_subspaces) as ex:
        trained = list(ex.map(train, range(n_subspaces)))

    luts = []
    for s in range(n_subspaces):
        assigned, cent = trained[s]
        codes = assigned.select("vec_id", F.col("cluster").alias(f"code_{s}"))
        wide = codes if wide is None else wide.join(codes, "vec_id")
        q_cols = [
            F.col("vec_id").alias("q_id"),
            F.slice("embedding", s * d_sub + 1, d_sub).alias("q_emb"),
        ]
        if route_by_label and s == 0:
            q_cols.append(F.col("label").alias("q_cell"))
        q_sub = queries.select(*q_cols)
        sq = F.zip_with(
            F.col("q_emb"),
            F.col("centroid"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        )
        pd_ = F.aggregate(sq, F.lit(0.0), lambda acc, d: acc + d)
        lut_cols = ["q_id"]
        if route_by_label and s == 0:
            lut_cols.append("q_cell")
        luts.append(
            q_sub.crossJoin(cent).select(
                *lut_cols,
                F.col("cluster").alias(f"code_{s}"),
                pd_.alias(f"pd_{s}"),
            )
        )
    adc = wide
    for s, lut in enumerate(luts):
        on = [f"code_{s}"] + (["q_id"] if s > 0 else [])
        adc = adc.join(F.broadcast(lut), on)
    if route_by_label:
        adc = adc.filter(F.col("c_cell") == F.col("q_cell"))
    dist = F.col("pd_0")
    for s in range(1, n_subspaces):
        dist = dist + F.col(f"pd_{s}")
    w = Window.partitionBy("q_id").orderBy(
        F.col("adc_dist").asc(), F.col("c_id").asc()
    )
    return (
        adc.select(
            "q_id",
            F.col("vec_id").alias("c_id"),
            dist.alias("adc_dist"),
        )
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )


def ivfpq_recall(
    queries: DataFrame, corpus: DataFrame, top_k: int = PQ_ADC_TOP_K
) -> DataFrame:
    """Recall@k of the composed IVF-PQ index against the exact
    brute-force top-k (similarity.brute_force_topk) — closing the ANN
    evaluation loop on the production index shape, mirroring
    similarity.lsh_recall.  The approximation error measured here is
    end-to-end: cell routing misses + PQ quantization + the ADC-L2 vs
    exact-cosine ranking gap.  The metric join is exact integer set
    intersection per query; recall = hits / |exact top-k| — the
    per-query EXACT result count, not the constant k, so recall can
    reach 1.0 even when the corpus holds fewer than k candidates.
    """
    from .similarity import brute_force_topk

    exact = brute_force_topk(queries, corpus, top_k).select(
        "q_id", F.col("c_id").alias("exact_id")
    )
    approx = pq_adc_topk(
        queries, corpus, top_k=top_k, route_by_label=True
    ).select("q_id", F.col("c_id").alias("approx_id"))
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


# ---------------------------------------------------------------------------
# Driver-contract query + unrolled-CTE oracle
# ---------------------------------------------------------------------------


def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmeans_assignments(load_table(spark, sf_dir, "embeddings"))


def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pq_encode(load_table(spark, sf_dir, "embeddings"))


def q_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return pq_adc_topk(emb.filter(F.col("vec_id") < PQ_N_QUERIES), emb)


def q_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return pq_adc_topk(
        emb.filter(F.col("vec_id") < PQ_N_QUERIES), emb, route_by_label=True
    )


def q_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ivfpq_recall(emb.filter(F.col("vec_id") < PQ_N_QUERIES), emb)


QUERIES = {
    "kmeans_assignments": q_kmeans,
    "pq_codes": q_pq_encode,
    "pq_adc_topk": q_pq_adc,
    "ann_ivfpq_topk": q_ivfpq,
    "ann_ivfpq_recall": q_ivfpq_recall,
}

_DIST = """
  list_reduce(
    list_transform(generate_series(1, len(e.embedding)),
      i -> (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i])
           * (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i])),
    (acc, d) -> acc + d)
"""


def kmeans_cte_body(
    k: int = K_CLUSTERS, n_iter: int = KMEANS_ITERS
) -> tuple[str, str]:
    """The unrolled-Lloyd CTE chain as a reusable fragment: returns
    (cte_body, final_assign_name) so composing oracles (e.g. the
    IVF-over-trained-centroids ANN query in operators/similarity.py)
    can prepend it to their own WITH clause."""
    body, final = _kmeans_ctes(k, n_iter)
    return body, final


def _kmeans_ctes(
    k: int, n_iter: int, src: str = "embeddings", prefix: str = ""
) -> tuple[str, str]:
    """Unrolled Lloyd chain over table/CTE ``src``; CTE names carry
    ``prefix`` so several chains can coexist in one WITH clause (the
    per-subspace PQ oracle builds one chain per subspace)."""
    p = prefix
    ctes = [
        f"""{p}seeds AS (
  SELECT (ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id))
           - 1 AS cluster,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid
  FROM {src}
  QUALIFY cluster < {k}
)""",
    ]
    prev_cent = f"{p}seeds"
    for it in range(n_iter):
        ctes.append(
            f"""{p}assign{it} AS (
  SELECT vec_id, embedding, cluster, dist FROM (
    SELECT e.vec_id, e.embedding, c.cluster, {_DIST} AS dist,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {_DIST} ASC, c.cluster ASC) AS rank
    FROM {src} e CROSS JOIN {prev_cent} c
  ) WHERE rank = 1
)"""
        )
        if it < n_iter - 1:
            ctes.append(
                f"""{p}cent{it} AS (
  SELECT cluster, list(mean_val ORDER BY pos) AS centroid FROM (
    SELECT cluster, pos,
           CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE)
             / COUNT(*) AS mean_val
    FROM (SELECT cluster,
                 UNNEST(embedding) AS v,
                 UNNEST(generate_series(0, len(embedding) - 1)) AS pos
          FROM {p}assign{it})
    GROUP BY cluster, pos
  ) GROUP BY cluster
)"""
            )
            prev_cent = f"{p}cent{it}"
    return ",\n".join(ctes), f"{p}assign{n_iter - 1}"


def _kmeans_oracle(k: int = K_CLUSTERS, n_iter: int = KMEANS_ITERS) -> str:
    body, final = _kmeans_ctes(k, n_iter)
    return f"WITH {body}\nSELECT vec_id, cluster, dist FROM {final}"


def _pq_oracle(
    dim: int = EMBED_DIM,
    n_subspaces: int = PQ_SUBSPACES,
    k: int = PQ_CODEBOOK_K,
    n_iter: int = PQ_ITERS,
) -> str:
    d_sub = dim // n_subspaces
    ctes, selects = [], []
    for s in range(n_subspaces):
        lo, hi = s * d_sub + 1, (s + 1) * d_sub
        ctes.append(
            f"sub{s} AS (SELECT vec_id, embedding[{lo}:{hi}] AS embedding "
            f"FROM embeddings)"
        )
        body, final = _kmeans_ctes(k, n_iter, src=f"sub{s}", prefix=f"s{s}_")
        ctes.append(body)
        selects.append(
            f"SELECT vec_id, {s} AS subspace, cluster AS code, dist "
            f"FROM {final}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def _pq_adc_oracle(
    dim: int = EMBED_DIM,
    n_subspaces: int = PQ_SUBSPACES,
    k: int = PQ_CODEBOOK_K,
    n_iter: int = PQ_ITERS,
    top_k: int = PQ_ADC_TOP_K,
    n_queries: int = PQ_N_QUERIES,
    route_by_label: bool = False,
) -> str:
    d_sub = dim // n_subspaces
    assert n_iter >= 2, "cent-used name below assumes >=1 recompute"
    ctes = []
    for s in range(n_subspaces):
        lo, hi = s * d_sub + 1, (s + 1) * d_sub
        ctes.append(
            f"sub{s} AS (SELECT vec_id, embedding[{lo}:{hi}] AS embedding "
            f"FROM embeddings)"
        )
        body, final = _kmeans_ctes(k, n_iter, src=f"sub{s}", prefix=f"s{s}_")
        ctes.append(body)
        ctes.append(
            f"codes{s} AS (SELECT vec_id, cluster AS code_{s} FROM {final})"
        )
        # the codebook is the centroid table USED for the final assign
        cb = f"s{s}_cent{n_iter - 2}"
        q_cell = ", q.label AS q_cell" if route_by_label and s == 0 else ""
        ctes.append(
            f"""lut{s} AS (
  SELECT q.vec_id AS q_id, c.cluster AS code_{s},
         list_reduce(
           list_transform(generate_series(1, {d_sub}),
             i -> (CAST(q.embedding[{lo} - 1 + i] AS DOUBLE) - c.centroid[i])
                  * (CAST(q.embedding[{lo} - 1 + i] AS DOUBLE) - c.centroid[i])),
           (acc, d) -> acc + d) AS pd_{s}{q_cell}
  FROM (SELECT * FROM embeddings WHERE vec_id < {n_queries}) q
  CROSS JOIN {cb} c
)"""
        )
    wide_joins = " JOIN ".join(
        [f"codes0 c0"]
        + [f"codes{s} c{s} USING (vec_id)" for s in range(1, n_subspaces)]
    )
    code_cols = ", ".join(f"c{s}.code_{s}" for s in range(n_subspaces))
    cell_col = (
        ", e.label AS c_cell" if route_by_label else ""
    )
    cell_join = (
        " JOIN embeddings e ON e.vec_id = c0.vec_id" if route_by_label else ""
    )
    ctes.append(
        f"codesw AS (SELECT c0.vec_id, {code_cols}{cell_col} "
        f"FROM {wide_joins}{cell_join})"
    )
    lut_joins = "codesw w JOIN lut0 l0 ON w.code_0 = l0.code_0"
    if route_by_label:
        lut_joins += " AND w.c_cell = l0.q_cell"
    for s in range(1, n_subspaces):
        lut_joins += (
            f" JOIN lut{s} l{s} ON w.code_{s} = l{s}.code_{s}"
            f" AND l{s}.q_id = l0.q_id"
        )
    dist = " + ".join(f"l{s}.pd_{s}" for s in range(n_subspaces))
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT q_id, c_id, adc_dist, CAST(rank AS INTEGER) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY adc_dist ASC, c_id ASC) AS rank
      FROM (SELECT l0.q_id, w.vec_id AS c_id, {dist} AS adc_dist
            FROM {lut_joins}) t
      WHERE q_id <> c_id)
WHERE rank <= {top_k}
"""
    )


def _ivfpq_recall_oracle() -> str:
    """Exact-cosine top-k (similarity's oracle) vs the unrolled IVF-PQ
    chain, intersected per query.  Both sub-oracles are full WITH
    statements nested as CTE bodies (inner CTE names shadow)."""
    from .similarity import _topk_sql

    return f"""
WITH exact AS ({_topk_sql("TRUE")}),
approx AS ({_pq_adc_oracle(route_by_label=True)}),
hits AS (
  SELECT e.q_id, COUNT(*) AS n_hits
  FROM exact e JOIN approx a ON e.q_id = a.q_id AND e.c_id = a.c_id
  GROUP BY e.q_id
)
SELECT q.q_id,
       CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits,
       CAST(COALESCE(n_hits, 0) AS DOUBLE) / q.n_exact AS recall_at_k
FROM (SELECT q_id, COUNT(*) AS n_exact FROM exact GROUP BY q_id) q
LEFT JOIN hits ON q.q_id = hits.q_id
"""


ORACLES = {
    "kmeans_assignments": _kmeans_oracle(),
    "pq_codes": _pq_oracle(),
    "pq_adc_topk": _pq_adc_oracle(),
    "ann_ivfpq_topk": _pq_adc_oracle(route_by_label=True),
    "ann_ivfpq_recall": _ivfpq_recall_oracle(),
}


# ---------------------------------------------------------------------------
# Simplified silhouette (round 7b)
# ---------------------------------------------------------------------------


def kmeans_silhouette(
    corpus: DataFrame, k: int = K_CLUSTERS, n_iter: int = KMEANS_ITERS
) -> DataFrame:
    """Per-cluster simplified silhouette of the trained k-means model:
    ``s(i) = (b_i - a_i) / max(a_i, b_i)`` with ``a_i`` the euclidean
    distance to the OWN (nearest) final centroid and ``b_i`` to the
    second-nearest — the centroid-based silhouette (Hruschka et al.),
    which is the only form that scales: exact silhouette is O(n^2)
    pairwise, this is O(n*k) against a broadcast codebook, one scan.

    Exactness: squared distances fold sequentially per row (the same
    deterministic list_reduce shape the assignment path uses), sqrt
    is IEEE on both engines, each vector's silhouette collapses at
    DECIMAL(18,9) BEFORE the per-cluster mean, so no float sum ever
    depends on row order.
    """
    # assign_final=False (round 10): the loop's final assignment was
    # computed, checkpointed and thrown away — only the codebook is
    # consumed here.  (The round-10 sorted-candidate-array spelling of
    # the top-2 measured slightly slower interpreted; the crossJoin +
    # window stays — see _assign's docstring.)
    _, cent = _kmeans_loop(corpus, k, n_iter, assign_final=False)
    sq = F.zip_with(
        F.col("embedding"),
        F.col("centroid"),
        lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
    )
    dist = F.aggregate(sq, F.lit(0.0), lambda acc, d: acc + d)
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dist").asc(), F.col("cluster").asc()
    )
    two = (
        corpus.crossJoin(F.broadcast(cent))
        .select("vec_id", "cluster", dist.alias("dist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 2)
    )
    per_vec = two.groupBy("vec_id").agg(
        F.min(F.when(F.col("rank") == 1, F.col("cluster"))).alias("own"),
        F.min(F.when(F.col("rank") == 1, F.col("dist"))).alias("da"),
        F.min(F.when(F.col("rank") == 2, F.col("dist"))).alias("db"),
    )
    sil = per_vec.selectExpr(
        "own AS cluster",
        "CAST(COALESCE(try_divide(sqrt(db) - sqrt(da),"
        " greatest(sqrt(da), sqrt(db))), 0.0)"
        " AS DECIMAL(18,9)) AS s",
    )
    return (
        sil.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_vecs"), F.sum("s").alias("ssum"))
        .selectExpr(
            "CAST(cluster AS INT) AS cluster",
            "CAST(n_vecs AS BIGINT) AS n_vecs",
            "CAST(CAST(CAST(ssum AS DOUBLE) / n_vecs AS DECIMAL(18,9))"
            " AS DOUBLE) AS mean_silhouette",
        )
    )


def q_kmeans_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmeans_silhouette(load_table(spark, sf_dir, "embeddings"))


QUERIES["kmeans_silhouette"] = q_kmeans_silhouette


def _silhouette_oracle(
    k: int = K_CLUSTERS, n_iter: int = KMEANS_ITERS
) -> str:
    body, _ = _kmeans_ctes(k, n_iter)
    final_cent = f"cent{n_iter - 2}" if n_iter >= 2 else "seeds"
    return f"""
WITH {body},
two AS (
  SELECT vec_id, cluster, dist, rank FROM (
    SELECT e.vec_id, c.cluster, {_DIST} AS dist,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {_DIST} ASC, c.cluster ASC) AS rank
    FROM embeddings e CROSS JOIN {final_cent} c
  ) WHERE rank <= 2
),
per_vec AS (
  SELECT vec_id,
         MIN(CASE WHEN rank = 1 THEN cluster END) AS own,
         MIN(CASE WHEN rank = 1 THEN dist END) AS da,
         MIN(CASE WHEN rank = 2 THEN dist END) AS db
  FROM two GROUP BY 1
),
sil AS (
  SELECT own AS cluster,
         CAST(COALESCE((sqrt(db) - sqrt(da))
              / NULLIF(greatest(sqrt(da), sqrt(db)), 0), 0.0)
              AS DECIMAL(18,9)) AS s
  FROM per_vec
)
SELECT CAST(cluster AS INT) AS cluster,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(CAST(CAST(SUM(s) AS DOUBLE) / COUNT(*) AS DECIMAL(18,9))
            AS DOUBLE) AS mean_silhouette
FROM sil GROUP BY 1
"""


ORACLES["kmeans_silhouette"] = _silhouette_oracle()


# ---------------------------------------------------------------------------
# Incremental IVF-PQ index maintenance (round 9)
# ---------------------------------------------------------------------------

#: arrivals with vec_id % DELTA_MOD == 0 are the "new ingest batch";
#: the rest is the already-indexed base the codebooks were trained on.
DELTA_MOD = 10


def ivfpq_assign_delta(
    arrivals: DataFrame,
    base: DataFrame,
    dim: int = EMBED_DIM,
    n_subspaces: int = PQ_SUBSPACES,
    k: int = PQ_CODEBOOK_K,
    n_iter: int = PQ_ITERS,
    coarse_k: int = K_CLUSTERS,
    coarse_iters: int = KMEANS_ITERS,
) -> DataFrame:
    """Incremental maintenance of the IVF-PQ serving layout: route
    ONLY the vectors of ``arrivals`` not already in ``base`` (the
    indexed corpus) to the EXISTING coarse cells and PQ codes, with
    the codebooks FROZEN as trained on ``base`` — how a 100 TB ANN
    index ingests a delta batch without retraining (retraining is a
    scheduled rebuild; between rebuilds every batch takes this path).

    Shapes (all delta-proportional except the frozen training):
    * new-vector detection is the ``dedup_incremental_new`` anti-join
      pattern — one hash equi-join against the base ids;
    * the coarse quantizer (K cells over the full dim) and the
      ``n_subspaces`` PQ codebooks are the exact Lloyd chains of
      :func:`kmeans_assignments` / :func:`pq_encode` ON BASE —
      deterministic, so "frozen" is reproducible from data alone and
      the unrolled-CTE oracle can replay it;
    * assignment is per-vector argmin against a BROADCAST centroid
      table (k rows) — a narrow projection + k-row window per
      subspace, never a corpus shuffle.

    By construction (and pinned by tests/test_ivfpq_delta.py) the
    delta assignments equal a FULL re-assignment of all arrivals
    under the same frozen codebooks, restricted to the new ids.

    Uniqueness assumption (round-10 ADVICE): ``vec_id`` is a key of
    ``arrivals`` — the argmin-expression assignment emits one row per
    input row (the old per-vec_id window would have collapsed
    duplicates; no caller feeds duplicates: the anti-join output of a
    keyed table is keyed).
    """
    assert dim % n_subspaces == 0
    d_sub = dim // n_subspaces
    # materialize the delta ONCE: it feeds the coarse assign plus one
    # assign per subspace, and without the checkpoint each reuse
    # re-executes the anti-join — five corpus scans instead of one
    # (delta-sized, so the materialization is the cheap side)
    new = (
        arrivals.join(base.select("vec_id"), "vec_id", "left_anti")
        .select("vec_id", "embedding")
        .transform(materialize)
    )

    def train(s: int) -> DataFrame:
        if s < 0:  # the coarse quantizer over the full vector
            _, cent = _kmeans_loop(
                base.select("vec_id", "embedding"),
                coarse_k,
                coarse_iters,
                assign_final=False,
            )
            return cent
        sub = base.select(
            "vec_id",
            F.slice("embedding", s * d_sub + 1, d_sub).alias("embedding"),
        )
        _, cent = _kmeans_loop(sub, k, n_iter, assign_final=False)
        return cent

    # 5 independent frozen-codebook trainings; thread-submitted so the
    # eager localCheckpoints inside each Lloyd chain overlap (the
    # pq_encode pattern) — results are deterministic per chain.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=n_subspaces + 1) as ex:
        cents = list(ex.map(train, range(-1, n_subspaces)))

    # VARIANT B (A/B probe): the round-9 four-join spelling
    out = _assign(new, cents[0]).select(
        "vec_id", F.col("cluster").alias("cell")
    )
    for s in range(n_subspaces):
        sub_new = new.select(
            "vec_id",
            F.slice("embedding", s * d_sub + 1, d_sub).alias("embedding"),
        )
        codes = _assign(sub_new, cents[s + 1]).select(
            "vec_id", F.col("cluster").alias(f"code_{s}")
        )
        out = out.join(codes, "vec_id")
    return out


def q_ivfpq_assign_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % DELTA_MOD != 0)
    return ivfpq_assign_delta(emb, base)


QUERIES["ivfpq_assign_delta"] = q_ivfpq_assign_delta


def _ivfpq_delta_oracle(
    dim: int = EMBED_DIM,
    n_subspaces: int = PQ_SUBSPACES,
    k: int = PQ_CODEBOOK_K,
    n_iter: int = PQ_ITERS,
    coarse_k: int = K_CLUSTERS,
    coarse_iters: int = KMEANS_ITERS,
    mod: int = DELTA_MOD,
) -> str:
    d_sub = dim // n_subspaces

    def assign_cte(name: str, src: str, cb: str, out_col: str) -> str:
        return f"""{name} AS (
  SELECT vec_id, cluster AS {out_col} FROM (
    SELECT e.vec_id, c.cluster,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {_DIST} ASC, c.cluster ASC) AS rank
    FROM {src} e CROSS JOIN {cb} c
  ) WHERE rank = 1
)"""

    ctes = [
        f"base AS (SELECT vec_id, embedding FROM embeddings"
        f" WHERE vec_id % {mod} <> 0)",
        # the anti-join spelled as NOT EXISTS — the Spark side's
        # left_anti against the base ids
        "newv AS (SELECT e.vec_id, e.embedding FROM embeddings e"
        " WHERE NOT EXISTS (SELECT 1 FROM base b"
        " WHERE b.vec_id = e.vec_id))",
    ]
    body, final = _kmeans_ctes(coarse_k, coarse_iters, src="base", prefix="g_")
    ctes.append(body)
    ctes.append(
        assign_cte("gassign", "newv", f"g_cent{coarse_iters - 2}", "cell")
    )
    for s in range(n_subspaces):
        lo, hi = s * d_sub + 1, (s + 1) * d_sub
        ctes.append(
            f"subb{s} AS (SELECT vec_id, embedding[{lo}:{hi}] AS embedding"
            f" FROM base)"
        )
        body, final = _kmeans_ctes(k, n_iter, src=f"subb{s}", prefix=f"s{s}_")
        ctes.append(body)
        ctes.append(
            f"subn{s} AS (SELECT vec_id, embedding[{lo}:{hi}] AS embedding"
            f" FROM newv)"
        )
        ctes.append(
            assign_cte(
                f"a{s}", f"subn{s}", f"s{s}_cent{n_iter - 2}", f"code_{s}"
            )
        )
    joins = "gassign g " + " ".join(
        f"JOIN a{s} USING (vec_id)" for s in range(n_subspaces)
    )
    cols = ", ".join(f"code_{s}" for s in range(n_subspaces))
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT vec_id, cell, {cols} FROM {joins}"
    )


ORACLES["ivfpq_assign_delta"] = _ivfpq_delta_oracle()
