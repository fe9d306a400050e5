"""Window-free ranking for bounded (top-k) frames.

Several operators rank a frame that is already bounded to <= k rows by
a ``TakeOrderedAndProject`` cut (bm25 top-k, CMS vocab top-k, RRF
fusion, weighted-sample top-k, k-means seeds).  A partition-less
``row_number`` window is semantically fine there, but it (a) logs
``WindowExec: No Partition Defined`` — noise that buries the one case
where that warning matters (an UNBOUNDED frame regressing to a global
window) — and (b) plans a single-task sort node.

``bounded_rank`` computes ``rank = 1 + |{rows strictly preceding}|``
with a broadcast inequality self-join instead: O(k^2) comparisons on a
frame that is O(k) by construction, no window, no warning, and the
BroadcastNestedLoopJoin over two k-row sides is exactly the "tiny
frames may cross-join" rule the repo's plan locks encode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bounded_rank"]


def bounded_rank(
    df: DataFrame,
    order: list[tuple[str, str]],
    rank_col: str = "rank",
) -> DataFrame:
    """Dense 1-based rank of each row of a SMALL (already top-k-cut)
    frame under the total order given by ``order`` — a list of
    ``(column, "asc"|"desc")`` pairs that must be a deterministic total
    order over non-null columns (callers pass their top-k sort key,
    which already satisfies both).

    Output: ``df`` columns plus ``rank_col`` (int).
    """
    right = df.select(
        *[F.col(c).alias(f"__r_{c}") for c, _ in order]
    )
    precedes = F.lit(False)
    ties = F.lit(True)
    for c, direction in order:
        if direction == "asc":
            lt = F.col(f"__r_{c}") < F.col(c)
        else:
            lt = F.col(f"__r_{c}") > F.col(c)
        precedes = precedes | (ties & lt)
        ties = ties & (F.col(f"__r_{c}") == F.col(c))
    probe = f"__r_{order[0][0]}"
    return (
        df.join(F.broadcast(right), precedes, "left")
        .groupBy(*df.columns)
        .agg((F.count(probe) + 1).cast("int").alias(rank_col))
    )
