"""Warehouse-mart query shapes over the star schema.

The reference's SQL surface stops at dashboard panels (§2.4-§2.7);
this module is where the engine demonstrates the remaining classic
warehouse plan shapes a 100 TB deployment runs daily — each one a
distinct physical pattern the optimizer must get right:

* outer-join fact coverage + re-aggregation   (order_count_distribution)
* anti join against a global scalar threshold (idle_rich_customers)
* agg -> global-max -> self-filter            (top_supplier_revenue)
* multi-dim star join with conditional share  (market_share)
* filtered fact -> dim top-k                  (returned_item_losses)
* COUNT(DISTINCT) over a pruned dim set       (parts_supplier_breadth)
* conditional aggregate ratio                 (promo_revenue_share)

All shapes are TPC-H derived (Q13/Q22/Q15/Q8/Q10/Q16/Q14) but adapted
to the driver's column subset (no partsupp/receiptdate/comment).

Scale principles (same contract as relational.py):
* fixed-size dims (nation 25 / region 5) broadcast explicitly;
  SF-proportional tables (customer/part/supplier/orders) are LEFT TO
  AQE/CBO — no forced broadcast (VERDICT r1 rule);
* every aggregate is map-side combinable; measures sum as DECIMAL for
  engine-independent exactness, then cast to double once;
* threshold comparisons against aggregated scalars stay in DECIMAL
  (never a float boundary that the last ulp could flip per engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

_DEC = "decimal(28,6)"


def _dsum(expr) -> F.Column:
    c = F.col(expr) if isinstance(expr, str) else expr
    return F.sum(c.cast(_DEC)).cast("double")


def order_count_distribution(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed N orders — INCLUDING
    the zero-order customers an inner join would silently drop.

    LEFT OUTER customer->orders, per-customer count (COUNT of the
    nullable right key counts 0 for unmatched), then the tiny
    distribution re-aggregate.  At 100 TB the first aggregate shuffles
    on custkey (AQE handles the skewed bulk-buyer keys); the second
    input is #customers rows and the output is #distinct-counts rows.
    """
    per_cust = (
        customer.select("c_custkey")
        .join(orders.select("o_custkey", "o_orderkey"),
              customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


def idle_rich_customers(
    customer: DataFrame, orders: DataFrame, since: str = "1998-01-01"
) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no orders
    since ``since`` (lapsed accounts), summarized per market segment.
    (Q22's literal "never ordered" matches zero driver rows — every
    customer has at least one order — so the anti-join side carries
    the recency filter instead, same plan shape, non-vacuous result.)

    The "above average" threshold never becomes a float: with
    ``total_pos`` the exact DECIMAL sum of positive balances and
    ``n_pos`` their count, the predicate is
    ``c_acctbal * n_pos > total_pos`` evaluated in DECIMAL — exact
    integer-scaled arithmetic, so no engine can disagree at the
    boundary.  The 1-row aggregate broadcasts (BroadcastNestedLoop
    on a single row); the no-orders test is a LEFT ANTI join, which
    at scale is one shuffle on custkey.
    """
    pos = customer.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast(_DEC)).alias("total_pos"),
        F.count(F.lit(1)).cast("decimal(10,0)").alias("n_pos"),
    )
    # widths pinned so DECIMAL(18,6) x DECIMAL(10,0) stays exact (no
    # precision-loss promotion) on BOTH engines
    rich = (
        customer.crossJoin(F.broadcast(pos))
        .filter(
            F.col("c_acctbal").cast("decimal(18,6)") * F.col("n_pos")
            > F.col("total_pos")
        )
        .select("c_custkey", "c_mktsegment", "c_acctbal")
    )
    idle = rich.join(
        orders.filter(F.col("o_orderdate") >= F.lit(since)).select(
            "o_custkey"
        ),
        rich.c_custkey == orders.o_custkey,
        "left_anti",
    )
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        _dsum("c_acctbal").alias("total_acctbal"),
    )


def top_supplier_revenue(
    lineitem: DataFrame,
    supplier: DataFrame,
    start: str = "1996-01-01",
    end: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15 shape: the quarter's top supplier(s) — aggregate,
    take the global max, filter back to the argmax rows (ties kept,
    per the spec).

    Both the per-supplier revenue and the max come from the SAME
    decimal-sum expression, so the equality filter compares doubles
    produced by the identical conversion — no boundary risk.  The
    1-row max broadcasts; supplier join is left to AQE.
    """
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(start))
            & (F.col("l_shipdate") < F.lit(end))
        )
        .groupBy("l_suppkey")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(supplier, rev.l_suppkey == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    target_nation: str = "NATION_2",
    target_region: str = "ASIA",
) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of its region's supplier
    revenue, per order year — the conditional-share star join.

    lineitem x orders shuffles once on orderkey (the only big-big
    join); supplier joins on suppkey (AQE decides); nation+region are
    fixed-size and broadcast.  Share = two decimal sums in one
    aggregate pass (numerator = CASE-gated), divided once as doubles.
    """
    nr = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == target_region)),
            nation.n_regionkey == region.r_regionkey,
        )
        .select("n_nationkey", "n_name")
    )
    supp = supplier.join(
        F.broadcast(nr), supplier.s_nationkey == nr.n_nationkey
    ).select("s_suppkey", "n_name")
    vol = (
        lineitem.join(
            orders.select("o_orderkey", "o_orderdate"),
            lineitem.l_orderkey == orders.o_orderkey,
        )
        .join(supp, lineitem.l_suppkey == supp.s_suppkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "volume"
            ),
            "n_name",
        )
    )
    return vol.groupBy("o_year").agg(
        (
            F.sum(
                F.when(
                    F.col("n_name") == target_nation, F.col("volume")
                ).otherwise(F.lit(0.0)).cast(_DEC)
            ).cast("double")
            / F.sum(F.col("volume").cast(_DEC)).cast("double")
        ).alias("mkt_share"),
        F.count(F.lit(1)).alias("n_items"),
    )


def returned_item_losses(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: top-k customers by revenue lost to returns.

    Return-flag filter pushes to the lineitem scan; orderkey join
    shuffles once; the customer aggregate shuffles on custkey; nation
    broadcasts.  Top-k is ORDER BY ... LIMIT -> TakeOrderedAndProject
    (per-partition heap, k-row driver merge), never a global sort.
    """
    lost = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            lineitem.l_orderkey == orders.o_orderkey,
        )
        .groupBy("o_custkey")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue_lost")
        )
    )
    return (
        lost.join(customer, lost.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
        )
        .select("c_custkey", "c_name", "n_name", "revenue_lost")
        .orderBy(F.col("revenue_lost").desc(), F.col("c_custkey").asc())
        .limit(k)
    )


def parts_supplier_breadth(
    lineitem: DataFrame,
    part: DataFrame,
    excluded_brand: str = "Brand#1",
    sizes: tuple[int, ...] = (1, 5, 9, 15, 23, 31, 40, 49),
) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers have shipped each
    surviving (brand, type, size) combination — COUNT(DISTINCT) over a
    dim-pruned fact subset (the supplier-diversity report).

    The brand/size predicates prune the part scan; lineitem joins on
    partkey (AQE decides the strategy — part is SF-proportional);
    COUNT(DISTINCT suppkey) expands to the standard two-level
    aggregate (partial distinct per partition, then merge) — no
    global de-dup shuffle beyond the group key's.
    """
    pp = part.filter(
        (F.col("p_brand") != excluded_brand)
        & F.col("p_size").isin(list(sizes))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    joined = lineitem.select("l_partkey", "l_suppkey").join(
        pp, lineitem.l_partkey == pp.p_partkey
    )
    return (
        joined.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def promo_revenue_share(
    lineitem: DataFrame,
    part: DataFrame,
    start: str = "1996-03-01",
    end: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q14 shape: percentage of one month's revenue from PROMO
    parts — the conditional-aggregate ratio.

    The ship-date range prunes the lineitem scan (row-group min/max);
    part joins on partkey (AQE); numerator and denominator come from
    ONE aggregate pass (CASE-gated decimal sums) so the plan scans
    the fact exactly once.
    """
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(start))
        & (F.col("l_shipdate") < F.lit(end))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    joined = li.join(
        part.select("p_partkey", "p_type"),
        li.l_partkey == part.p_partkey,
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(promo.cast(_DEC)).cast("double")
            / F.sum(rev.cast(_DEC)).cast("double")
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Driver-contract queries + DuckDB oracles
# ---------------------------------------------------------------------------


QUERIES = {
    "order_count_distribution": lambda spark, sf: order_count_distribution(
        load_table(spark, sf, "customer"), load_table(spark, sf, "orders")
    ),
    "idle_rich_customers": lambda spark, sf: idle_rich_customers(
        load_table(spark, sf, "customer"), load_table(spark, sf, "orders")
    ),
    "top_supplier_revenue": lambda spark, sf: top_supplier_revenue(
        load_table(spark, sf, "lineitem"), load_table(spark, sf, "supplier")
    ),
    "market_share": lambda spark, sf: market_share(
        load_table(spark, sf, "lineitem"),
        load_table(spark, sf, "orders"),
        load_table(spark, sf, "supplier"),
        load_table(spark, sf, "nation"),
        load_table(spark, sf, "region"),
    ),
    "returned_item_losses": lambda spark, sf: returned_item_losses(
        load_table(spark, sf, "lineitem"),
        load_table(spark, sf, "orders"),
        load_table(spark, sf, "customer"),
        load_table(spark, sf, "nation"),
    ),
    "parts_supplier_breadth": lambda spark, sf: parts_supplier_breadth(
        load_table(spark, sf, "lineitem"), load_table(spark, sf, "part")
    ),
    "promo_revenue_share": lambda spark, sf: promo_revenue_share(
        load_table(spark, sf, "lineitem"), load_table(spark, sf, "part")
    ),
}

_DSUM_SQL = "CAST(SUM(CAST({e} AS DECIMAL(28,6))) AS DOUBLE)"

ORACLES = {
    "order_count_distribution": """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust GROUP BY c_count
""",
    "idle_rich_customers": f"""
WITH pos AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS total_pos,
         CAST(COUNT(*) AS DECIMAL(10,0)) AS n_pos
  FROM customer WHERE c_acctbal > 0
),
rich AS (
  SELECT c_custkey, c_mktsegment, c_acctbal
  FROM customer, pos
  WHERE CAST(c_acctbal AS DECIMAL(18,6)) * n_pos > total_pos
)
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       {_DSUM_SQL.format(e="c_acctbal")} AS total_acctbal
FROM rich
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
GROUP BY c_mktsegment
""",
    "top_supplier_revenue": f"""
WITH rev AS (
  SELECT l_suppkey,
         {_DSUM_SQL.format(e="l_extendedprice * (1 - l_discount)")}
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
""",
    "market_share": """
WITH vol AS (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n_name
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
)
SELECT CAST(o_year AS INTEGER) AS o_year,
       CAST(SUM(CAST(CASE WHEN n_name = 'NATION_2' THEN volume
                          ELSE 0.0 END AS DECIMAL(28,6))) AS DOUBLE)
         / CAST(SUM(CAST(volume AS DECIMAL(28,6))) AS DOUBLE)
         AS mkt_share,
       COUNT(*) AS n_items
FROM vol GROUP BY o_year
""",
    "returned_item_losses": f"""
WITH lost AS (
  SELECT o_custkey,
         {_DSUM_SQL.format(e="l_extendedprice * (1 - l_discount)")}
           AS revenue_lost
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
  GROUP BY o_custkey
)
SELECT c_custkey, c_name, n_name, revenue_lost
FROM lost
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
ORDER BY revenue_lost DESC, c_custkey ASC
LIMIT 20
""",
    "parts_supplier_breadth": """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 5, 9, 15, 23, 31, 40, 49)
GROUP BY p_brand, p_type, p_size
""",
    "promo_revenue_share": """
SELECT 100.0
         * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END AS DECIMAL(28,6))) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(28,6))) AS DOUBLE)
         AS promo_revenue_pct,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
""",
}
