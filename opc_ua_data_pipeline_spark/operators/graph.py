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


QUERIES = {"dedup_clusters": q_dedup_clusters}


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


ORACLES = {"dedup_clusters": _cluster_oracle()}
