"""Connected components — near-dup pairs → dedup clusters.

Pairwise near-dup detection (MinHash/SimHash/embedding, see dedup.py)
leaves a *graph*; the curation decision ("keep one doc per duplicate
cluster") needs its connected components.  This is the canonical
iterative step no single SQL pass expresses: labels propagate along
edges until fixpoint.

Implementation is distributed min-label propagation:

* every node starts labeled with itself;
* each round, every node takes the min label over itself and its
  neighbors (one shuffle: edges ⋈ labels, groupBy node, min);
* converged when a round changes no label (aggregated count — the
  driver never collects data rows, only the 1-row changed-count).

Rounds needed = graph diameter in the worst case, O(log n) in
practice for near-dup graphs (dense clusters have diameter 1-2).
Each round's result is ``localCheckpoint``'ed: it truncates the
exponentially-growing lineage and is exactly the iterate the next
round re-reads (at 1000-executor scale, swap for
``checkpoint``/persist to survive executor loss; the classic
large-star/small-star variant [Kiveris et al., "Connected Components
in MapReduce and Beyond"] halves rounds on high-diameter graphs —
near-dup graphs don't have those).

The DuckDB oracle states the same fixpoint declaratively: a recursive
CTE closes (node, label) over edges; MIN(label) per node is the
component id — set-semantics UNION guarantees termination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_rounds: int = 50
) -> DataFrame:
    """(node) × (src, dst) → (node, component_id = min node reachable).

    ``nodes`` must have one column; ``edges`` two (both node-typed).
    Isolated nodes keep their own id — the output always covers every
    input node exactly once.
    """
    node_col = nodes.columns[0]
    src, dst = edges.columns[:2]
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .localCheckpoint(eager=True)
    )
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("label")
    ).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        neighbor_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u")
            .agg(F.min("label").alias("nb_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                "label",
                F.least(
                    F.col("label"), F.coalesce("nb_label", "label")
                ).alias("new_label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(
            F.col("new_label") < F.col("label")
        ).count()
        labels = new_labels.select(
            "node", F.col("new_label").alias("label")
        ).localCheckpoint(eager=True)
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("component_id")
    )


def cluster_representatives(components: DataFrame) -> DataFrame:
    """The dedup keep-list: one row per cluster (its min-id member)
    plus every singleton — i.e. the docs a curation pass retains."""
    return components.filter(F.col("doc_id") == F.col("component_id"))


# ---------------------------------------------------------------------------
# Driver-contract query + oracle
# ---------------------------------------------------------------------------

#: Tight threshold for clustering edges: ≤3 is the distance the 4×15-bit
#: band scheme guarantees to recall (pigeonhole), so the edge set is
#: exactly "all pairs within hamming 3", not an LSH approximation.
CLUSTER_HAMMING_MAX = 3


def q_dedup_clusters(spark, sf_dir: str) -> DataFrame:
    from ..tables import load_table
    from .dedup import simhash_near_dup_pairs

    docs = load_table(spark, sf_dir, "documents")
    edges = simhash_near_dup_pairs(docs, max_hamming=CLUSTER_HAMMING_MAX)
    return connected_components(
        docs.select("doc_id"), edges.select("doc_a", "doc_b")
    )


PAGERANK_ITERS = 5
PAGERANK_DAMPING = 0.85  # written as literals 0.15/0.85 on both engines


def pagerank(edges: DataFrame, iters: int = PAGERANK_ITERS) -> DataFrame:
    """Fixed-iteration PageRank over an undirected pair list —
    centrality within near-duplicate clusters (the "canonical copy"
    signal: among a cluster of near-dups, the doc most-connected to
    the rest is the one a curation pass should keep).

    ``edges`` holds unique (a, b) pairs; the walk runs on the
    symmetrized graph, so every node has in- and out-degree >= 1 and
    there is no dangling-mass term.  PR_0 = 1/n;
    PR_{t+1} = 0.15/n + 0.85 * sum(PR_t(u)/deg(u)).

    Exactness: the incoming-mass sum is the order-sensitive float
    hazard, so each contribution is cast to DECIMAL(38,18) and summed
    exactly (associative); each iteration's published value is rounded
    to DECIMAL(18,12) and re-cast to DOUBLE so both engines iterate
    from bit-identical states (kmeans/ADC precedent).

    At 100 TB: per iteration one equi-shuffle (contributions grouped
    by dst) over the EDGE set of the near-dup graph — a tiny fraction
    of the corpus; the rank frame is node-sized.  localCheckpoint per
    round cuts the growing lineage exactly as clustering.py does; the
    driver loop holds a fixed iteration counter, never data.
    """
    a, b = edges.columns[:2]
    sym = (
        edges.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .unionAll(edges.select(F.col(b).alias("u"), F.col(a).alias("v")))
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    ncnt = deg.agg(F.count(F.lit(1)).alias("n"))
    n_dbl = F.col("n").cast("double")
    pr = (
        deg.crossJoin(F.broadcast(ncnt))
        .select(
            F.col("u").alias("node"),
            "deg",
            (F.lit(1.0) / n_dbl)
            .cast("decimal(18,12)")
            .cast("double")
            .alias("pr"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        contribs = sym.join(pr, sym.u == pr.node).select(
            F.col("v"),
            (F.col("pr") / F.col("deg").cast("double"))
            .cast("decimal(38,18)")
            .alias("c"),
        )
        sums = contribs.groupBy("v").agg(F.sum("c").alias("s"))
        pr = (
            pr.drop("pr")
            .join(sums, pr.node == sums.v)
            .crossJoin(F.broadcast(ncnt))
            .select(
                "node",
                "deg",
                (
                    F.lit(0.15) / n_dbl
                    + F.lit(0.85) * F.col("s").cast("double")
                )
                .cast("decimal(18,12)")
                .cast("double")
                .alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return pr.select(F.col("node").alias("doc_id"), F.col("pr").alias("pagerank"))


def q_neardup_pagerank(spark, sf_dir: str) -> DataFrame:
    from ..tables import load_table
    from .dedup import simhash_near_dup_pairs

    docs = load_table(spark, sf_dir, "documents")
    edges = simhash_near_dup_pairs(docs, max_hamming=CLUSTER_HAMMING_MAX)
    return pagerank(edges.select("doc_a", "doc_b"))


QUERIES = {
    "dedup_clusters": q_dedup_clusters,
    "neardup_pagerank": q_neardup_pagerank,
}


def _cluster_oracle() -> str:
    from .dedup import ORACLES as DEDUP_ORACLES, SIMHASH_HAMMING_MAX

    pairs_sql = DEDUP_ORACLES["simhash_near_dup_pairs"].replace(
        f"<= {SIMHASH_HAMMING_MAX}", f"<= {CLUSTER_HAMMING_MAX}"
    )
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS doc_id, MIN(label) AS component_id FROM reach GROUP BY node
"""


def _pagerank_oracle() -> str:
    from .dedup import ORACLES as DEDUP_ORACLES, SIMHASH_HAMMING_MAX

    pairs_sql = DEDUP_ORACLES["simhash_near_dup_pairs"].replace(
        f"<= {SIMHASH_HAMMING_MAX}", f"<= {CLUSTER_HAMMING_MAX}"
    )
    # Unrolled fixed iterations (no recursion: each round must apply
    # the DECIMAL(18,12) re-rounding the Spark loop applies).
    ctes = [
        f"pairs AS ({pairs_sql})",
        "edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs"
        " UNION ALL SELECT doc_b, doc_a FROM pairs)",
        "deg AS (SELECT u, COUNT(*) AS deg FROM edges GROUP BY u)",
        "n AS (SELECT COUNT(*) AS n FROM deg)",
        "pr0 AS (SELECT u AS node, deg,"
        " CAST(CAST(1.0 / CAST(n AS DOUBLE) AS DECIMAL(18,12)) AS DOUBLE)"
        " AS pr FROM deg CROSS JOIN n)",
    ]
    for t in range(PAGERANK_ITERS):
        ctes.append(
            f"""pr{t + 1} AS (
  SELECT d.u AS node, d.deg,
         CAST(CAST(0.15 / CAST(n.n AS DOUBLE)
                   + 0.85 * CAST(s.s AS DOUBLE)
              AS DECIMAL(18,12)) AS DOUBLE) AS pr
  FROM deg d
  JOIN (SELECT e.v,
               SUM(CAST(p.pr / CAST(p.deg AS DOUBLE) AS DECIMAL(38,18)))
                 AS s
        FROM edges e JOIN pr{t} p ON e.u = p.node
        GROUP BY e.v) s ON s.v = d.u
  CROSS JOIN n
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node AS doc_id, pr AS pagerank FROM pr{PAGERANK_ITERS}"
    )


ORACLES = {
    "dedup_clusters": _cluster_oracle(),
    "neardup_pagerank": _pagerank_oracle(),
}
