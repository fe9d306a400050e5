"""Distributed PCA over the embedding corpus.

The missing piece between the embedding transforms (normalize /
matryoshka / SQ8 / JL in :mod:`.similarity`) and the trained indexes
(:mod:`.clustering`): a DATA-DERIVED orthogonal basis.  Whitening /
dimensionality reduction in front of clustering and ANN is a standard
stage of an embedding curation pipeline, and its Spark shape is the
canonical tall-skinny pattern:

* the covariance matrix is ONE map-side-combinable aggregate pass —
  d(d+1)/2 + d + 1 aggregate buffers, no shuffle of data rows, the
  only exchange being the single-row partial merge.  Nothing but the
  d x d summary ever leaves the executors, so the pass scales to any
  row count (the 100 TB story: partial Gram matrices merge
  associatively; for d in the thousands the same pass becomes a
  mapInPandas partial-Gram — tested equivalent in
  tests/test_pca.py — but at d=64 the JVM aggregate is both faster
  and stays on the no-Python contract path);
* the eigenbasis is extracted on the DRIVER from the d x d summary
  (bounded work, like the k-means driver loop in
  :mod:`.clustering`) via POWER ITERATION with deflation — chosen
  over library eigensolvers because every step is +,*,/,sqrt in a
  pinned fold order, so the DuckDB oracle replays the identical
  arithmetic as unrolled CTEs (the ``_kmeans_ctes`` contract shape)
  and the trained basis is bit-identical on both engines;
* the projection is a narrow shuffle-free pass with the basis inlined
  as literals (broadcast-by-constant), assembled as ONE SQL string
  (the simhash plan-build lesson).

All expressions double-precision IEEE with pinned evaluation order;
sums inside the covariance pass go through the DECIMAL(38,6)
associativity contract so the aggregate is order-independent and
cross-engine exact.  (38,6), not finer: the JVM's repr-based
double->decimal cast and DuckDB's disagree with probability
~ulp/quantum per term — ~1e-5 at 12 places on O(0.1) floats
(observed), ~1e-11 at 6 — so the house 6-place quantum is the safe
contract; the ~5e-7/term quantization is noise at covariance scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table, spread_compute

EMBED_DIM = 64
PCA_COMPONENTS = 8
POWER_ITERS = 60

_PAIRS = [(i, j) for i in range(EMBED_DIM) for j in range(i, EMBED_DIM)]


def _summary_long(corpus: DataFrame, dim: int) -> DataFrame:
    """The (pos, s) moment summary in LONG form: pos < dim -> sum of
    e_pos; pos >= dim -> sum of e_i * e_j for the upper-triangle pair
    at index pos - dim.  Plus n_rows (count of contributing rows) per
    pos.

    One ARRAY expression per row builds all dim + dim(dim+1)/2 terms
    inside vectorized HOFs, then posexplode + a map-side-combinable
    SUM per pos: each scan partition collapses to <= 2144 rows before
    the single tiny shuffle.  This replaces a 2145-aggregate-buffer
    wide spelling that fell out of whole-stage codegen at that
    expression count and evaluated interpreted — measured 16-19 s at
    sf0.1 vs ~1 s for this shape, identical results (same per-term
    DECIMAL(38,6) casts, same order-independent decimal sums).
    """
    d1 = dim - 1
    singles = (
        f"transform(sequence(0, {d1}), i -> "
        "CAST(element_at(embedding, i + 1) AS DOUBLE))"
    )
    prods = (
        f"flatten(transform(sequence(0, {d1}), i -> "
        f"transform(sequence(i, {d1}), j -> "
        "CAST(element_at(embedding, i + 1) AS DOUBLE)"
        " * CAST(element_at(embedding, j + 1) AS DOUBLE))))"
    )
    base = spread_compute(corpus.filter("embedding IS NOT NULL"))
    return (
        base.selectExpr(f"posexplode(concat({singles}, {prods})) AS (pos, val)")
        .groupBy("pos")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("CAST(SUM(CAST(val AS DECIMAL(38,6))) AS DOUBLE)").alias(
                "s"
            ),
        )
    )


def _summary_row(corpus: DataFrame, dim: int) -> dict:
    """Collect the long summary back into the named mapping
    ({n, s_i, p_i_j}) the PCA trainer consumes — 2145 bounded values,
    the k-means-style driver collect."""
    pairs = [(i, j) for i in range(dim) for j in range(i, dim)]
    rows = {r["pos"]: r for r in _summary_long(corpus, dim).collect()}
    out = {"n": rows[0]["n_rows"]}
    for i in range(dim):
        out[f"s{i}"] = rows[i]["s"]
    for k, (i, j) in enumerate(pairs):
        out[f"p{i}_{j}"] = rows[dim + k]["s"]
    return out


def embedding_covariance(corpus: DataFrame, dim: int = EMBED_DIM) -> DataFrame:
    """Upper-triangle population covariance of the embedding columns:
    rows (i, j, cov) for i <= j.

    The long-form moment pass (see :func:`_summary_long`) collapses
    the corpus to 2144 (pos, sum) rows; the cov cells then assemble
    from three broadcast self-joins of that TINY frame against the
    static (pos, i, j) pair mapping — data-proportional work is the
    one explode+combine pass, everything after is constant-size.
    Each term is cast DECIMAL(38,6) before summing — order-independent
    partials, exact cross-engine parity — and the closed form
    evaluates in pinned textual order with a DECIMAL(38,12) collapse.
    """
    pairs = [(i, j) for i in range(dim) for j in range(i, dim)]
    long = _summary_long(corpus, dim)
    spark = corpus.sparkSession
    pair_map = spark.createDataFrame(
        [(dim + k, i, j) for k, (i, j) in enumerate(pairs)],
        "pos int, i int, j int",
    )
    singles = long.filter(F.col("pos") < dim).select(
        F.col("pos").alias("_sp"), F.col("s").alias("_sv")
    )
    n_frame = long.filter(F.col("pos") == 0).select(
        F.col("n_rows").alias("n")
    )
    return (
        long.join(F.broadcast(pair_map), "pos")
        .join(
            F.broadcast(singles.selectExpr("_sp AS i", "_sv AS si")), "i"
        )
        .join(
            F.broadcast(singles.selectExpr("_sp AS j", "_sv AS sj")), "j"
        )
        .crossJoin(F.broadcast(n_frame))
        .selectExpr(
            "CAST(i AS INT) AS i",
            "CAST(j AS INT) AS j",
            "CAST(CAST((s - si * sj / n) / n AS DECIMAL(38,12)) AS DOUBLE)"
            " AS cov",
        )
    )


COVARIANCE_SQL = f"""
WITH x AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
nn AS (SELECT COUNT(*) AS n FROM embeddings WHERE embedding IS NOT NULL),
s AS (SELECT i, CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE) AS s
      FROM x GROUP BY i),
p AS (SELECT a.i AS i, b.i AS j,
             CAST(SUM(CAST(a.v * b.v AS DECIMAL(38,6))) AS DOUBLE) AS p
      FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY 1, 2)
SELECT CAST(p.i AS INT) AS i, CAST(p.j AS INT) AS j,
       CAST(CAST((p.p - sa.s * sb.s / nn.n) / nn.n AS DECIMAL(38,12))
            AS DOUBLE) AS cov
FROM p
CROSS JOIN nn
JOIN s sa ON sa.i = p.i
JOIN s sb ON sb.i = p.j
"""


def gram_partials_pandas(corpus: DataFrame, dim: int = EMBED_DIM) -> DataFrame:
    """The LARGE-d covariance path: per-Arrow-batch partial
    (n, s, flattened upper-triangle Gram) via one numpy matmul each,
    merged by a tiny elementwise-sum aggregate over #batches rows.

    At d=64 the JVM explode+combine in :func:`_summary_long` wins (and
    keeps the contract path Python-free), but its d(d+1)/2 aggregate
    buffers scale quadratically — at d in the thousands the buffer
    update per ROW dwarfs a BLAS ``M.T @ M`` per BATCH, so this is
    the shape that survives: executors emit one O(d^2) summary per
    Arrow batch, nothing row-proportional crosses the wire, and the
    final merge is #batches x d^2 values.  Equivalence with the
    aggregate pass (up to the DECIMAL term quantization it skips) is
    pinned by tests/test_pca.py.
    """
    import pandas as pd  # local: keep module import cheap

    n_tri = dim * (dim + 1) // 2
    iu = [(i, j) for i in range(dim) for j in range(i, dim)]

    def fn(batches):
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            g = m.T @ m
            yield pd.DataFrame(
                {
                    "n": [len(pdf)],
                    "s": [m.sum(axis=0).tolist()],
                    "g": [[g[i, j] for i, j in iu]],
                }
            )

    partials = corpus.select("embedding").mapInPandas(
        fn, f"n long, s array<double>, g array<double>"
    )
    # merge: #batches rows of d^2/2 values — explode to (pos, val) and
    # sum per position (a tiny shuffle over n_tri + dim keys)
    s_long = partials.selectExpr(
        "n", "posexplode(s) AS (pos, sval)"
    )
    g_long = partials.selectExpr("posexplode(g) AS (pos, gval)")
    import pyspark.sql.functions as F

    n_total = partials.groupBy().agg(F.sum("n").alias("n"))
    s_tot = s_long.groupBy("pos").agg(F.sum("sval").alias("s"))
    g_tot = g_long.groupBy("pos").agg(F.sum("gval").alias("p"))
    pairs_df = corpus.sparkSession.createDataFrame(
        [(k, i, j) for k, (i, j) in enumerate(iu)], "pos int, i int, j int"
    )
    return (
        g_tot.join(F.broadcast(pairs_df), "pos")
        .join(F.broadcast(s_tot.selectExpr("pos AS i", "s AS si")), "i")
        .join(F.broadcast(s_tot.selectExpr("pos AS j", "s AS sj")), "j")
        .crossJoin(F.broadcast(n_total))
        .selectExpr(
            "i", "j", "CAST((p - si * sj / n) / n AS DOUBLE) AS cov"
        )
    )


# ---------------------------------------------------------------------------
# Power-iteration eigenbasis (driver-side, pinned arithmetic)
# ---------------------------------------------------------------------------


def _seed_vector(comp: int, dim: int) -> list[float]:
    """Deterministic ±1 start vector per component, md5-derived like
    similarity._rp_signs — no RNG state to ship, and BOTH engines use
    the identical literal."""
    import hashlib

    return [
        1.0
        if int(hashlib.md5(f"pca:{comp}:{i}".encode()).hexdigest()[0], 16) % 2
        == 0
        else -1.0
        for i in range(dim)
    ]


def _fold_dot(row: list[float], v: list[float]) -> float:
    """Left fold of elementwise products — EXACTLY DuckDB's
    ``list_reduce(list_transform(...), (a, b) -> a + b)``: the
    accumulator starts at the FIRST element, then adds left-to-right."""
    acc = row[0] * v[0]
    for j in range(1, len(row)):
        acc = acc + row[j] * v[j]
    return acc


def _round12(x: float) -> float:
    """Python mirror of Spark's CAST(DOUBLE AS DECIMAL(38,12)) —
    shortest-repr value, half-up at 12 places (the streaming-twin
    contract in streaming/hyperfunctions.py)."""
    import decimal

    return float(
        decimal.Decimal(repr(float(x))).quantize(
            decimal.Decimal("1e-12"), rounding=decimal.ROUND_HALF_UP
        )
    )


def _train_basis(
    summary_row, dim: int, n_comp: int, iters: int
) -> tuple[list[float], list[list[float]], list[float]]:
    """(means, components, eigenvalues) from the collected 1-row
    summary, by ORTHOGONAL ITERATION: power steps with a Gram-Schmidt
    re-projection against every already-extracted component inside
    each step.

    GS-inside-the-loop rather than matrix deflation because the
    embedding spectrum is nearly flat (adjacent eigenvalue ratios
    ~0.99 on the driver corpus): deflated power iteration converges
    as (lambda_next/lambda)^iters and would leave components visibly
    non-orthogonal, while GS makes the basis orthonormal BY
    CONSTRUCTION (to rounding) whatever the convergence state.  The
    published eigenvalue is the RAYLEIGH QUOTIENT v·Cv of the final
    vector, so projected variance == eigenvalue holds exactly even
    where the flat bulk leaves the direction itself ambiguous.

    Every step is +,*,/,sqrt in a PINNED left-fold order, mirrored
    token-for-token by the unrolled CTEs in :func:`_pca_oracle` — so
    the trained basis is bit-identical on both engines, the same way
    clustering._kmeans_ctes replays Lloyd's iterations.  Bounded
    driver work (d^2 * iters * k flops on a d x d summary), like the
    k-means driver loop; data-proportional work never leaves the
    executors.
    """
    n = summary_row["n"]
    means = [summary_row[f"s{i}"] / n for i in range(dim)]
    # full symmetric covariance from the contract's exact cell formula
    C = [[0.0] * dim for _ in range(dim)]
    for i in range(dim):
        for j in range(i, dim):
            si, sj, p = (
                summary_row[f"s{i}"],
                summary_row[f"s{j}"],
                summary_row[f"p{i}_{j}"],
            )
            c = _round12((p - si * sj / n) / n)
            C[i][j] = c
            C[j][i] = c
    comps: list[list[float]] = []
    eigs: list[float] = []
    for comp in range(n_comp):
        v = _seed_vector(comp, dim)
        for _ in range(iters):
            w = [_fold_dot(C[i], v) for i in range(dim)]
            for prev in comps:  # Gram-Schmidt, in extraction order
                d = _fold_dot(w, prev)
                w = [w[i] - d * prev[i] for i in range(dim)]
            nrm = math.sqrt(_fold_dot(w, w))
            v = [w[i] / nrm for i in range(dim)]
        u = [_fold_dot(C[i], v) for i in range(dim)]
        eigs.append(_fold_dot(v, u))  # Rayleigh quotient
        comps.append(v)
    return means, comps, eigs


def pca_basis(
    spark: SparkSession,
    sf_dir: str,
    n_comp: int = PCA_COMPONENTS,
    iters: int = POWER_ITERS,
    dim: int = EMBED_DIM,
):
    """Collect the summary and train — exposed for tests and reuse."""
    row = _summary_row(load_table(spark, sf_dir, "embeddings"), dim)
    return _train_basis(row, dim, n_comp, iters)


def pca_project(
    spark: SparkSession,
    sf_dir: str,
    n_comp: int = PCA_COMPONENTS,
    iters: int = POWER_ITERS,
    dim: int = EMBED_DIM,
) -> DataFrame:
    """Project every embedding onto the trained eigenbasis:
    (vec_id, component, val) — mean-centered dot products with the
    basis INLINED as string-cast double literals (exact shortest-repr
    round trip), one narrow shuffle-free pass assembled as one SQL
    string.  The oracle re-trains the identical basis in SQL
    (unrolled power-iteration CTEs) and projects — hash parity proves
    the whole iterative trainer, not just the matrix multiply.
    """
    means, comps, _ = pca_basis(spark, sf_dir, n_comp, iters, dim)
    exprs = []
    for c, w in enumerate(comps):
        terms = " + ".join(
            f"(CAST(embedding[{i}] AS DOUBLE) - CAST('{means[i]!r}' AS DOUBLE))"
            f" * CAST('{w[i]!r}' AS DOUBLE)"
            for i in range(dim)
        )
        exprs.append(f"CAST({terms} AS DOUBLE) AS pc{c}")
    wide = load_table(spark, sf_dir, "embeddings").selectExpr("vec_id", *exprs)
    stack = (
        f"stack({n_comp}, "
        + ", ".join(f"{c}, pc{c}" for c in range(n_comp))
        + ") AS (component, val)"
    )
    return wide.selectExpr("vec_id", stack).selectExpr(
        "vec_id", "CAST(component AS INT) AS component", "val"
    )


def _pca_oracle(
    n_comp: int = PCA_COMPONENTS,
    iters: int = POWER_ITERS,
    dim: int = EMBED_DIM,
) -> str:
    """The unrolled SQL twin of :func:`_train_basis` + projection.

    Iteration CTE v{c}_{t}: w = C·v (left-fold per row), nrm = sqrt of
    the left-fold of squares, v = w / nrm — token-for-token the Python
    arithmetic.  Deflation CTE cmat{c+1} subtracts (nrm * v[i]) * v[j].
    """
    fold = "(a, b) -> a + b"
    rng = f"generate_series(1, {dim})"
    ctes = [
        f"cov AS MATERIALIZED ({COVARIANCE_SQL.strip()})",
        # mirror the upper triangle, then pack to an array-of-arrays
        """covfull AS MATERIALIZED (
  SELECT i, j, cov FROM cov
  UNION ALL
  SELECT j AS i, i AS j, cov FROM cov WHERE i <> j
)""",
        f"""cmat0 AS MATERIALIZED (
  SELECT list(row ORDER BY i) AS C FROM (
    SELECT i, list(cov ORDER BY j) AS row FROM covfull GROUP BY i)
)""",
        f"""mvec AS MATERIALIZED (
  SELECT list(m ORDER BY i) AS m FROM (
    SELECT i, CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE)
              / (SELECT COUNT(*) FROM embeddings) AS m
    FROM (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
                 CAST(unnest(embedding) AS DOUBLE) AS v
          FROM embeddings)
    GROUP BY i)
)""",
    ]
    for c in range(n_comp):
        seed = "[" + ", ".join(repr(s) for s in _seed_vector(c, dim)) + "]"
        ctes.append(f"v{c}_0 AS MATERIALIZED (SELECT {seed}::DOUBLE[] AS v)")
        # prev components join in once, aliased to plain columns the
        # Gram-Schmidt layers can re-select upward
        prev_from = "".join(f", fin{p} q{p}" for p in range(c))
        pv_cols = "".join(f", q{p}.v AS pv{p}" for p in range(c))
        pv_carry = "".join(f", pv{p}" for p in range(c))
        for t in range(1, iters + 1):
            # innermost: w = C . v
            inner = (
                f"SELECT list_transform({rng}, i ->\n"
                f"        list_reduce(list_transform({rng}, j -> c.C[i][j] * p.v[j]),\n"
                f"                    {fold})) AS w{pv_cols}\n"
                f"      FROM cmat0 c, v{c}_{t - 1} p{prev_from}"
            )
            # one (dot, subtract) Gram-Schmidt layer per extracted comp
            for p in range(c):
                inner = (
                    f"SELECT list_transform({rng}, i -> w[i] - d * pv{p}[i]) AS w{pv_carry}\n"
                    f"    FROM (SELECT w,\n"
                    f"            list_reduce(list_transform({rng}, i -> w[i] * pv{p}[i]),\n"
                    f"                        {fold}) AS d{pv_carry}\n"
                    f"          FROM ({inner}))"
                )
            ctes.append(
                f"""v{c}_{t} AS MATERIALIZED (
  SELECT list_transform(w, x -> x / nrm) AS v FROM (
    SELECT w, sqrt(list_reduce(list_transform(w, x -> x * x), {fold})) AS nrm
    FROM ({inner}))
)"""
            )
        # final vector + Rayleigh eigenvalue (published via tests only)
        ctes.append(
            f"""fin{c} AS MATERIALIZED (
  SELECT v, list_reduce(list_transform({rng}, i -> v[i] * u[i]), {fold}) AS lam
  FROM (SELECT p.v AS v,
               list_transform({rng}, i ->
                 list_reduce(list_transform({rng}, j -> c.C[i][j] * p.v[j]),
                             {fold})) AS u
        FROM cmat0 c, v{c}_{iters} p)
)"""
        )
    proj = "\nUNION ALL\n".join(
        f"""SELECT e.vec_id, CAST({c} AS INT) AS component,
       list_reduce(list_transform({rng}, i ->
         (CAST(e.embedding[i] AS DOUBLE) - m.m[i]) * w.v[i]), {fold}) AS val
FROM embeddings e, mvec m, v{c}_{iters} w"""
        for c in range(n_comp)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + proj


QUERIES = {
    "embedding_covariance": lambda spark, sf: embedding_covariance(
        load_table(spark, sf, "embeddings")
    ),
    "pca_project": pca_project,
}

ORACLES = {
    "embedding_covariance": COVARIANCE_SQL,
    "pca_project": _pca_oracle(),
}
