"""Streaming IVF-PQ delta routing — the online twin of
operators/clustering.ivfpq_assign_delta.

Index maintenance IS a stream in production: vectors arrive, the
already-indexed set and the codebooks are static, and each arrival
needs (cell, code_0..code_{S-1}) before it can serve queries.  The
batch delta operator's three stages map onto streaming primitives:

* new-vector detection — a stream-static LEFT ANTI join against the
  indexed base ids (supported natively; the base side is a bounded
  static frame);
* frozen codebooks — trained ONCE on the base with the deterministic
  Lloyd chains, then COLLECTED to the driver (k x d doubles per
  codebook — the sanctioned bounded collect of a MODEL, the
  bloom-bitmap precedent in streaming/curation.py) and embedded in
  the plan as literal arrays, so routing needs no join at all;
* assignment — per arriving vector, a STATELESS narrow projection:
  the squared-L2 fold to each of the k centroids (the exact
  ``_assign`` arithmetic: per-dimension float->double widening, fold
  in array order, so distances are bit-identical doubles), argmin via
  array_min over (dist, cluster) structs — the same (dist asc,
  cluster asc) tiebreak as the batch window.

Stateless end to end: composes with any source/sink and inherits
exactly-once from the sink checkpoint.  Batch ≡ stream is pinned by
tests/test_streaming_annindex.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.clustering import (
    EMBED_DIM,
    K_CLUSTERS,
    KMEANS_ITERS,
    PQ_CODEBOOK_K,
    PQ_ITERS,
    PQ_SUBSPACES,
    _kmeans_loop,
)


def frozen_codebooks(
    base: DataFrame,
    dim: int = EMBED_DIM,
    n_subspaces: int = PQ_SUBSPACES,
    k: int = PQ_CODEBOOK_K,
    n_iter: int = PQ_ITERS,
    coarse_k: int = K_CLUSTERS,
    coarse_iters: int = KMEANS_ITERS,
) -> list[list[tuple[int, list[float]]]]:
    """Train the coarse quantizer + per-subspace PQ codebooks on the
    indexed base (the batch delta operator's exact chains) and collect
    them: [[(cluster, centroid), ...] per quantizer], coarse first.
    Bounded: (coarse_k + n_subspaces*k) x d doubles — model-sized,
    corpus-independent."""
    d_sub = dim // n_subspaces

    def train(s: int):
        if s < 0:
            _, cent = _kmeans_loop(
                base.select("vec_id", "embedding"),
                coarse_k,
                coarse_iters,
                assign_final=False,
            )
        else:
            _, cent = _kmeans_loop(
                base.select(
                    "vec_id",
                    F.slice("embedding", s * d_sub + 1, d_sub).alias(
                        "embedding"
                    ),
                ),
                k,
                n_iter,
                assign_final=False,
            )
        return [
            (int(r["cluster"]), [float(x) for x in r["centroid"]])
            for r in cent.collect()
        ]

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=n_subspaces + 1) as ex:
        return list(ex.map(train, range(-1, n_subspaces)))


def _argmin_code(emb: Column, codebook: list[tuple[int, list[float]]]) -> Column:
    """Nearest-centroid cluster id over an in-plan literal codebook:
    per-centroid squared-L2 fold (the batch ``_assign`` arithmetic,
    bit-identical), argmin with the (dist asc, cluster asc) tiebreak
    via array_min over (dist, cluster) structs."""
    cands = []
    for cluster, centroid in sorted(codebook):
        sq = F.zip_with(
            emb,
            F.lit(centroid),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        )
        dist = F.aggregate(sq, F.lit(0.0), lambda acc, d: acc + d)
        cands.append(F.struct(dist.alias("d"), F.lit(cluster).alias("c")))
    return F.array_min(F.array(*cands))["c"]


def ivfpq_route_stream(
    stream_vecs: DataFrame,
    base: DataFrame,
    dim: int = EMBED_DIM,
    n_subspaces: int = PQ_SUBSPACES,
) -> DataFrame:
    """(streaming vec_id, embedding) → (vec_id, cell, code_0..) for
    vectors NOT already in the indexed base — stateless routing under
    the frozen base-trained codebooks."""
    d_sub = dim // n_subspaces
    books = frozen_codebooks(base, dim=dim, n_subspaces=n_subspaces)
    new = stream_vecs.join(
        F.broadcast(base.select("vec_id")), "vec_id", "left_anti"
    )
    cols = [
        F.col("vec_id"),
        _argmin_code(F.col("embedding"), books[0]).alias("cell"),
    ]
    for s in range(n_subspaces):
        cols.append(
            _argmin_code(
                F.slice("embedding", s * d_sub + 1, d_sub), books[s + 1]
            ).alias(f"code_{s}")
        )
    return new.select(*cols)
