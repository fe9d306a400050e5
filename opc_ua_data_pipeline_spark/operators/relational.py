"""Relational core at scale — joins/aggregations on the star schema.

The reference's relational surface is thin (§2.4: one broadcast-shaped
enrichment join, one scalar-subquery cross join), so these queries are
where the engine demonstrates the join/aggregation machinery a 100 TB
deployment actually exercises: multi-way joins with broadcast dims,
partial aggregation, semi joins, top-k, and sessionization.

Scale notes per query are inline; common principles:
* dimension tables (region/nation/customer/supplier/part) are
  broadcast — the fact side (lineitem/orders/events) never shuffles
  for a dim join;
* fact-fact joins (orders x lineitem) shuffle on the join key once,
  and AQE coalesces/splits post-shuffle partitions at runtime;
* every aggregate uses map-side partials; measures are summed as
  DECIMAL for engine-independent exactness (see rollups.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.ranking import bounded_rank
from ..tables import load_table
from .rollups import _avg_sql, exact_avg

_DEC = "decimal(28,6)"


def _dsum(expr) -> F.Column:
    """Order-independent SUM: exact decimal accumulation -> double."""
    c = F.col(expr) if isinstance(expr, str) else expr
    return F.sum(c.cast(_DEC)).cast("double")


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: the canonical scan->filter->partial-agg rollup.

    One parquet scan (only 7 of 11 columns read), filter pushed to the
    scan, single shuffle on the 4-group key with map-side combine.
    """
    li = lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            _dsum(disc_price).alias("sum_disc_price"),
            _dsum(charge).alias("sum_charge"),
            exact_avg("l_quantity").alias("avg_qty"),
            exact_avg("l_extendedprice").alias("avg_price"),
            exact_avg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def revenue_by_nation(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, nation: DataFrame
) -> DataFrame:
    """TPC-H Q5 shape: fact-fact shuffle join + broadcast fixed dims.

    orders x lineitem shuffles once on orderkey.  Only nation (25 rows,
    fixed regardless of SF) carries an explicit broadcast hint; customer
    scales WITH SF (~150k rows/SF -> ~10^10 rows at the SF where
    lineitem is 100 TB), so its join strategy is left to AQE/CBO, which
    picks broadcast at small SF and shuffle-hash/sort-merge at scale.
    """
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def top_customers(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, k: int = 10
) -> DataFrame:
    """Top-k revenue customers: pre-aggregate the fact side FIRST
    (shrinks the join input from |lineitem| to |custkey| rows), then
    join the dim (strategy left to AQE — customer is SF-proportional,
    so no forced broadcast), then TakeOrderedAndProject for the top-k —
    no global sort, no full-fact join."""
    rev = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )
    return (
        rev.join(customer, rev.o_custkey == customer.c_custkey)
        .select("c_custkey", "c_name", "c_mktsegment", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(k)
    )


def priority_with_late_items(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape: EXISTS as a left-semi join (never materializes
    the probe side's payload columns past the join)."""
    joined = orders.join(
        lineitem.select("l_orderkey", "l_shipdate"),
        (orders.o_orderkey == F.col("l_orderkey"))
        & (F.col("l_shipdate") > orders.o_orderdate),
        "left_semi",
    )
    return joined.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1996-01-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter into a fact-fact join,
    then top-k.  The segment filter prunes customer BEFORE the join
    (~1/5 of rows — still SF-proportional, so no forced broadcast: AQE
    picks broadcast at small SF, shuffle join at scale); both date
    filters push to the scans; the only shuffle AQE can't elide is the
    (orderkey, orderdate) aggregation; top-k is a heap, not a sort."""
    c = customer.filter(F.col("c_mktsegment") == segment)
    o = orders.filter(F.col("o_orderdate") < F.lit(cutoff))
    li = lineitem.filter(F.col("l_shipdate") > F.lit(cutoff))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(k)
    )


def brand_nation_margin(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q9 flavor: the fact table against two dimension chains
    (part; supplier→nation) — revenue and volume by (p_brand, n_name).

    part (~200k rows/SF) and supplier (~10k rows/SF) scale WITH SF, so
    their join strategy is delegated to AQE/CBO rather than hint-forced
    (at 100 TB a forced broadcast of either would OOM executors); only
    nation (25 rows, fixed) keeps the explicit hint.  The final
    exchange is the group-by's partial-agg combine."""
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("p_brand", "n_name")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            _dsum("l_quantity").alias("volume"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: per-user event streams split on inactivity gaps.

    lag + conditional cumsum over a per-user window — one shuffle on
    user_id; at 100 TB the key space is uniform (user ids), and the
    same semantics stream via session_window() (streaming module).
    Output: one row per session with span + activity stats.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Microsecond precision: cast("long") would truncate to seconds and
    # disagree with the oracle's interval comparison at gap boundaries.
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    with_session = (
        events.withColumn(
            "new_session",
            F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0),
        )
        .withColumn(
            "session_seq",
            F.sum("new_session").over(
                Window.partitionBy("user_id")
                .orderBy("ts", "event_id")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return (
        with_session.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            _dsum("value").alias("total_value"),
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    time_col: str,
    value_col: str,
    out_col: str = "asof_value",
) -> DataFrame:
    """As-of join — Spark has no native one (PySpark guide: common OLAP
    patterns); composition used here: union both sides, one window
    pass with last(ignorenulls) carrying the right side's most recent
    value forward, keep left rows.

    One shuffle on the key, no per-group Python (`merge_asof` via
    applyInPandas is the fallback for semantics this can't express).
    Inclusive semantics (right.time <= left.time) via the (time,
    right-first) sort, matching DuckDB's ASOF JOIN oracle.
    """
    from pyspark.sql import Window

    l = left.withColumn("_is_left", F.lit(1)).withColumn("_rv", F.lit(None).cast(right.schema[value_col].dataType))
    r = right.select(
        on,
        time_col,
        F.lit(0).alias("_is_left"),
        F.col(value_col).alias("_rv"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in (on, time_col)],
    ).select(*[c for c in l.columns])
    w = (
        Window.partitionBy(on)
        .orderBy(time_col, "_is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        l.unionByName(r)
        .withColumn(out_col, F.last("_rv", ignorenulls=True).over(w))
        .filter(F.col("_is_left") == 1)
        .drop("_is_left", "_rv")
    )


def distinct_users(events: DataFrame) -> DataFrame:
    """Exact + approximate distinct aggregation per event type: the
    exact COUNT(DISTINCT) is the oracle-checked baseline; the HLL
    sketch (approx_count_distinct) is the 100 TB path (constant
    memory, one pass, mergeable partials) and is sanity-bounded
    against the exact count in tests rather than hash-matched (sketch
    internals are engine-specific)."""
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


APPROX_DISTINCT_RTOL = 0.15  # 3x the default HLL++ rsd of 0.05


def approx_distinct_users(events: DataFrame) -> DataFrame:
    """HLL++ distinct sketch next to its exact twin, plus an in-bound
    flag so the whole row is deterministic and oracle-checkable: the
    DuckDB oracle asserts the exact count and ``approx_ok = TRUE``
    (the sketch estimate itself is engine-specific and is bounded here
    rather than hash-matched; the numeric error is also asserted in
    tests/test_relational_ops.py)."""
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= F.lit(APPROX_DISTINCT_RTOL) * F.col("exact_users")
            ).alias("approx_ok"),
        )
    )


def value_percentiles(events: DataFrame) -> DataFrame:
    """Exact interpolated percentiles per event type (type-7 quantile,
    identical definition in Spark's percentile and DuckDB's
    quantile_cont — verified bit-identical); the approximate variant
    (percentile_approx, a KLL-style sketch) is the one-pass mergeable
    100 TB path, sanity-bounded rather than hash-matched."""
    return events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )


APPROX_P50_RTOL = 0.05


def approx_value_percentiles(events: DataFrame) -> DataFrame:
    """KLL-style percentile sketch next to its exact twin, plus an
    in-bound flag (same contract shape as approx_distinct_users: exact
    column hash-matched, sketch bounded)."""
    return (
        events.groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.5).alias("approx_p50"),
            F.expr("percentile(value, 0.5)").alias("exact_p50"),
        )
        .select(
            "event_type",
            "exact_p50",
            (
                F.abs(F.col("approx_p50") - F.col("exact_p50"))
                <= F.lit(APPROX_P50_RTOL) * F.abs(F.col("exact_p50"))
            ).alias("approx_ok"),
        )
    )


def corpus_cube(documents: DataFrame) -> DataFrame:
    """CUBE(lang, source): all four grouping-set rollups in one pass —
    partial aggregation expands the grouping sets map-side, so the
    shuffle carries one partial row per (set, key) not per input row."""
    return documents.cube("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


def clicked_never_purchased(events: DataFrame) -> DataFrame:
    """Set operation (EXCEPT): (user, week) cells with clicks but no
    purchase that week.  Spark plans EXCEPT DISTINCT as a left-anti
    over distinct keys — no materialized intermediate sets (the
    reference has no set ops at all, SURVEY §2.8; this registers the
    Spark-native form at a granularity that is non-degenerate on the
    test data — whole-user sets all coincide)."""
    week = F.to_date(F.date_trunc("week", "ts"))
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", week.alias("week")
    )
    buys = events.filter(F.col("event_type") == "purchase").select(
        "user_id", week.alias("week")
    )
    return clicks.subtract(buys)  # EXCEPT (distinct) semantics


def value_rank_profile(events: DataFrame) -> DataFrame:
    """Rank-family profile over each type's value distribution:
    percent_rank (exact (rank-1)/(n-1) rational) and ntile(4)
    quartile labels.

    NOT a single ``Window.partitionBy(event_type)`` — event_type has
    ~5 distinct values, so that window funnels ~1/5 of the fact table
    through one task's sort at any scale.  Instead the distributed
    two-pass rank via :func:`distwindow.keyed_running_totals`
    (deterministic sampled-boundary buckets, local row_number, tiny
    broadcast offset table); percent_rank and ntile are then
    closed-form in (rank, n).

    The ordering key includes the unique event_id tiebreak, so ranks
    are total and the result is bit-identical to the single-window
    formulation (and invariant to where the bucket boundaries fall).
    """
    from .distwindow import keyed_running_totals, ntile_expr

    ranked = keyed_running_totals(
        events.select("event_id", "event_type", "value"),
        ["event_type"],
        ["value", "event_id"],
    )
    rank, n = F.col("_rank"), F.col("_n")
    return ranked.select(
        "event_id",
        "event_type",
        "value",
        F.when(n > 1, (rank - 1).cast("double") / (n - 1))
        .otherwise(F.lit(0.0))
        .alias("pct_rank"),
        ntile_expr(rank, n, 4).alias("quartile"),
    )


FUNNEL_WINDOW_MIN = 30

#: Ordered steps + window for the multi-step timed funnel.
WINDOW_FUNNEL_STEPS = ["view", "click", "signup", "purchase"]
WINDOW_FUNNEL_HOURS = 72


def window_funnel_depth(
    events: DataFrame,
    steps: list[str] | None = None,
    window_hours: int = WINDOW_FUNNEL_HOURS,
) -> DataFrame:
    """ClickHouse-``windowFunnel``-style multi-step timed funnel: for
    each user who performed step 1, how deep into the ordered step
    chain they got, where every subsequent step must land strictly
    after its predecessor and within ``window_hours`` of step 1.

    Semantics (documented where engines differ): the GREEDY-EARLIEST
    chain — t1 = first step-1 event, t_k = first step-k event after
    t_{k-1} inside t1's window.  Deterministic and the standard
    product-analytics reading; ClickHouse's scan may find a deeper
    chain seeded at a LATER step-1 event, a divergence we accept and
    state (greedy from the first occurrence).

    Scale shape: one conditional min-aggregate per step, chained by
    equi-joins on user_id only — every stage partial-aggregates
    map-side before its shuffle, no window function ever touches the
    event stream, and all shuffles share the user_id key so AQE can
    reuse the exchange.  Depth of the chain is len(steps)-1 joins —
    constant, not data-dependent.
    """
    steps = steps or WINDOW_FUNNEL_STEPS
    cur = (
        events.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .withColumn(
            "deadline", F.col("t1") + F.expr(f"INTERVAL {window_hours} HOURS")
        )
    )
    prev = "t1"
    for k, step in enumerate(steps[1:], start=2):
        ev = events.filter(F.col("event_type") == step).select(
            "user_id", F.col("ts").alias("_ts")
        )
        keys = [c for c in cur.columns]
        cur = (
            cur.join(ev, "user_id", "left")
            .groupBy(*keys)
            .agg(
                F.min(
                    F.when(
                        (F.col("_ts") > F.col(prev))
                        & (F.col("_ts") <= F.col("deadline")),
                        F.col("_ts"),
                    )
                ).alias(f"t{k}")
            )
        )
        prev = f"t{k}"
    depth = F.lit(1)
    for k in range(2, len(steps) + 1):
        depth = depth + F.col(f"t{k}").isNotNull().cast("int")
    return cur.drop("deadline").withColumn(
        "funnel_depth", depth.cast("int")
    )


def conversion_funnel(
    events: DataFrame, window_minutes: int = FUNNEL_WINDOW_MIN
) -> DataFrame:
    """click → purchase conversion per user: first click, then the
    first purchase strictly after it, converted iff within the
    window.  Two per-user min-aggregates (struct-min gives the
    deterministic (ts, event_id)-earliest row) and one equi-join on
    user — no window function over the raw stream, so each side
    partial-aggregates before the shuffle."""
    first_click = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id")).alias("c"))
        .select("user_id", F.col("c.ts").alias("click_ts"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    first_purchase = (
        first_click.join(purchases, "user_id")
        .filter(F.col("p_ts") > F.col("click_ts"))
        .groupBy("user_id", "click_ts")
        .agg(F.min("p_ts").alias("purchase_ts"))
    )
    lag_us = F.unix_micros("purchase_ts") - F.unix_micros("click_ts")
    return (
        first_click.join(first_purchase, ["user_id", "click_ts"], "left")
        .select(
            "user_id",
            "click_ts",
            "purchase_ts",
            F.when(F.col("purchase_ts").isNotNull(), lag_us).alias("lag_us"),
            F.coalesce(
                lag_us <= window_minutes * 60 * 1_000_000, F.lit(False)
            ).alias("converted"),
        )
    )


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their
    first event; one row per (cohort_week, week_offset) with the
    distinct users still active.  Two shuffles (first-event per user,
    then the cohort matrix), both partial-aggregated."""
    first_week = (
        events.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .select(
            "user_id", F.date_trunc("week", "first_ts").alias("cohort_week")
        )
    )
    activity = events.select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    ).distinct()
    offset = (
        (F.unix_timestamp("week") - F.unix_timestamp("cohort_week"))
        / (7 * 24 * 3600)
    ).cast("int")
    return (
        activity.join(first_week, "user_id")
        .select(
            # date-typed for cross-engine comparison (DuckDB's
            # date_trunc('week') yields DATE)
            F.to_date("cohort_week").alias("cohort_week"),
            offset.alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


HIST_WIDTH = 25.0
HIST_BUCKETS = 20


def value_histogram(
    events: DataFrame,
    width: float = HIST_WIDTH,
    n_buckets: int = HIST_BUCKETS,
) -> DataFrame:
    """Fixed-width value histogram per event type (the distribution
    panel a Grafana heatmap wants).  Bucketing is a pure projection —
    the shuffle carries #types × #buckets partial counts, nothing
    else; works identically as a streaming windowed aggregate."""
    b = F.least(
        F.greatest(F.floor(F.col("value") / width), F.lit(0)),
        F.lit(n_buckets - 1),
    ).cast("int")
    return (
        events.select("event_type", b.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            "bucket",
            (F.col("bucket") * width).alias("bucket_lo"),
            ((F.col("bucket") + 1) * width).alias("bucket_hi"),
            "n",
        )
    )


INCIDENT_WINDOW_MIN = 10


def incident_range_join(
    events: DataFrame, window_minutes: int = INCIDENT_WINDOW_MIN
) -> DataFrame:
    """Range join via bin bucketing: correlate each error event with
    all same-user activity in the [error, error + window) interval.

    Spark has no native range-join optimization — the naive
    ``a JOIN b ON a.t BETWEEN b.lo AND b.hi`` plans as a
    BroadcastNestedLoop (or worse, a cartesian) scan.  The standard
    fix is to bucket time into bins the width of the window: an
    interval then overlaps exactly 2 bins, a point lies in exactly 1,
    so ``(user, bin)`` equi-join + exact range filter finds every pair
    (each at most once — a point has a single bin) while Catalyst
    plans a plain shuffled hash join that scales linearly.  This is
    the same binning Databricks' range-join hint applies internally.
    """
    win_us = window_minutes * 60 * 1_000_000
    ev = events.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("t"),
    )
    incidents = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("user_id").alias("i_user"),
        F.col("t").alias("t0"),
        F.explode(
            F.array(
                F.floor(F.col("t") / win_us),
                F.floor(F.col("t") / win_us) + 1,
            )
        ).alias("bin"),
    )
    binned = ev.withColumn("bin", F.floor(F.col("t") / win_us))
    return (
        binned.join(
            incidents,
            (binned.user_id == incidents.i_user)
            & (binned.bin == incidents.bin),
        )
        .filter(
            (F.col("t") >= F.col("t0"))
            & (F.col("t") < F.col("t0") + win_us)
            & (F.col("event_id") != F.col("incident_id"))
        )
        .select(
            "incident_id",
            "event_id",
            "user_id",
            "event_type",
            (F.col("t") - F.col("t0")).alias("lag_us"),
        )
    )


def event_type_pivot(events: DataFrame) -> DataFrame:
    """Pivot event types to columns (per-user activity matrix) — with
    an explicit pivot-value list so the plan needs no discovery pass."""
    types = ["click", "view", "purchase", "signup", "error"]
    return (
        events.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


# ---------------------------------------------------------------------------
# Driver-contract queries
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pricing_summary(load_table(spark, sf_dir, "lineitem"))


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return revenue_by_nation(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "nation"),
    )


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_customers(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


def q_priority_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    return priority_with_late_items(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(load_table(spark, sf_dir, "events"))


def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return distinct_users(load_table(spark, sf_dir, "events"))


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return approx_distinct_users(load_table(spark, sf_dir, "events"))


def q_corpus_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_cube(load_table(spark, sf_dir, "documents"))


def q_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_type_pivot(load_table(spark, sf_dir, "events"))


def q_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each error event joined as-of to the user's most recent
    purchase value (the 'state at event time' lookup every telemetry
    store needs)."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    return asof_join(
        errors, purchases, "user_id", "ts", "purchase_value", "last_purchase_value"
    )


def small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#1"
) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated into an aggregate self-join — the classic
    "small-quantity orders" revenue probe.

    The correlated predicate ``l_quantity < 0.2 * avg(l_quantity per
    part)`` is evaluated EXACTLY by cross-multiplying integers:
    ``5 * qty * cnt < sum_qty`` (quantities are integer-valued by the
    TPC-H spec, so BIGINT arithmetic replaces the float divide that
    would be engine-sensitive at the boundary).  Revenue sums via
    exact decimal partials.

    At 100 TB: the part filter prunes first (scan-pushed), the
    restricted lineitem aggregates per partkey (one shuffle, map-side
    combine), and the agg joins back on the same key — AQE reuses the
    partitioning; no hint on part (SF-proportional table, VERDICT r1
    rule)."""
    pp = part.filter(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(pp, lineitem.l_partkey == pp.p_partkey).select(
        "l_partkey",
        F.col("l_quantity").cast("bigint").alias("qty"),
        "l_extendedprice",
    )
    agg = li.groupBy("l_partkey").agg(
        F.sum("qty").alias("sum_qty"), F.count(F.lit(1)).alias("cnt")
    )
    small = li.join(agg, "l_partkey").filter(
        F.lit(5) * F.col("qty") * F.col("cnt") < F.col("sum_qty")
    )
    return small.agg(
        F.count(F.lit(1)).alias("n_small_lines"),
        (_dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"),
    )


#: Q19-shape disjunctive brackets: (brand, size_lo, size_hi, qty_lo,
#: qty_hi).  Brands drawn from the generator's Brand#1..25 domain.
REVENUE_BRACKETS = [
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#3", 1, 15, 20, 30),
]


def bracket_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs bracket predicate
    spanning both join sides — the classic disjunctive-pushdown
    stress.

    Catalyst does not infer per-table implications from a cross-table
    disjunction, so the UNION BOUNDS of each side's brackets are
    derived manually and applied as scan filters (part: brand IN +
    size envelope; lineitem: quantity envelope) — semantically implied
    by the disjunction, and what turns a join-then-filter over the
    full fact table into a pruned scan at 100 TB.  The exact
    disjunction then runs on the joined (already-bracket-enveloped)
    remainder.  Revenue sums via exact decimal partials.
    """
    brands = [b for b, *_ in REVENUE_BRACKETS]
    size_hi = max(hi for _, _, hi, _, _ in REVENUE_BRACKETS)
    qty_lo = min(lo for *_, lo, _ in REVENUE_BRACKETS)
    qty_hi = max(hi for *_, hi in REVENUE_BRACKETS)
    pp = part.filter(
        F.col("p_brand").isin(brands)
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= size_hi)
    ).select("p_partkey", "p_brand", "p_size")
    li = lineitem.filter(
        (F.col("l_quantity") >= qty_lo) & (F.col("l_quantity") <= qty_hi)
    ).select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    cond = None
    for b, slo, shi, qlo, qhi in REVENUE_BRACKETS:
        c = (
            (F.col("p_brand") == b)
            & (F.col("p_size") >= slo)
            & (F.col("p_size") <= shi)
            & (F.col("l_quantity") >= qlo)
            & (F.col("l_quantity") <= qhi)
        )
        cond = c if cond is None else (cond | c)
    return (
        li.join(pp, li.l_partkey == pp.p_partkey)
        .filter(cond)
        .agg(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def lone_fault_suppliers(
    lineitem: DataFrame, supplier: DataFrame, nation: DataFrame, k: int = 10
) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS against the same fact
    table, decorrelated into one semi-join and one anti-join — here
    "suppliers who were the SOLE returner on multi-supplier orders"
    (the generator's lineitem has no commit/receipt dates, so
    ``l_returnflag = 'R'`` plays the late-delivery role; structure,
    not constants, is what Q21 tests).

    l1 (returned lines) semi-joins other-supplier lines on the order
    (the order is multi-supplier) and anti-joins other-supplier
    RETURNED lines (nobody else returned) — both on the l_orderkey
    equi-key with a suppkey inequality rider, so neither decorrelated
    branch is a nested loop.  Top-k by fault count via heap + the
    Window-free bounded rank.
    """
    l = lineitem.select("l_orderkey", "l_suppkey", "l_returnflag")
    faults = l.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    others = l.select(
        F.col("l_orderkey").alias("o_key"), F.col("l_suppkey").alias("o_supp")
    )
    other_faults = (
        l.filter(F.col("l_returnflag") == "R")
        .select(
            F.col("l_orderkey").alias("f_key"),
            F.col("l_suppkey").alias("f_supp"),
        )
    )
    lone = (
        faults.join(
            others,
            (F.col("l_orderkey") == F.col("o_key"))
            & (F.col("l_suppkey") != F.col("o_supp")),
            "leftsemi",
        )
        .join(
            other_faults,
            (F.col("l_orderkey") == F.col("f_key"))
            & (F.col("l_suppkey") != F.col("f_supp")),
            "leftanti",
        )
    )
    counts = lone.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("numwait")
    )
    named = counts.join(
        supplier, counts.l_suppkey == supplier.s_suppkey
    ).join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_name", "n_name", "numwait")
    topk = named.orderBy(
        F.col("numwait").desc(), F.col("s_name").asc()
    ).limit(k)
    return bounded_rank(topk, [("numwait", "desc"), ("s_name", "asc")], "rank")


def event_transition_matrix(events: DataFrame) -> DataFrame:
    """Per-user Markov transition matrix over the event stream:
    P(next event type | current) — the behavioral-sequence summary
    (session modeling, anomaly baselines, next-event prediction
    features).

    One lag window per user (ordered by ts with event_id as the
    deterministic tie-break), then a #types² aggregate.  Probabilities
    are one double divide of two exact counts.

    At 100 TB: the window partitions by user_id (millions of keys —
    full parallelism, one-row lag state); the transition aggregate
    output is #types² rows regardless of input size."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.select(
        "user_id",
        F.lag("event_type").over(w).alias("prev_event"),
        F.col("event_type").alias("next_event"),
    ).filter(F.col("prev_event").isNotNull())
    counts = pairs.groupBy("prev_event", "next_event").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    # Row totals as a window over the #types² counts frame, NOT a
    # groupBy+self-join: the join spelling re-executes the counts
    # subtree (two full scans of events in the physical plan).
    w_row = Window.partitionBy("prev_event")
    return counts.select(
        "prev_event",
        "next_event",
        "n_transitions",
        F.sum("n_transitions").over(w_row).cast("bigint").alias("row_total"),
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(w_row).cast("double")
        ).alias("p_transition"),
    )


def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return small_quantity_revenue(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_transition_matrix(load_table(spark, sf_dir, "events"))


def revenue_gini(orders: DataFrame) -> DataFrame:
    """Gini coefficient of customer revenue concentration — the
    "do 20% of customers drive 80% of revenue" number, computed from
    the Lorenz-ordered rank identity
    ``G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n`` over customers sorted by
    revenue ascending.

    The naive spelling is ``ROW_NUMBER() OVER (ORDER BY revenue)`` —
    an unpartitioned global sort — so the rank comes from the
    distwindow two-pass global rank (rfm/decile precedent).
    Exactness: per-customer revenue and the two Σ terms are exact
    DECIMAL sums (rank·revenue stays decimal), so G is a handful of
    IEEE ops on exact operands — plain hash contract.
    """
    from .distwindow import keyed_running_totals

    # 2-decimal units (o_totalprice's native scale): the rank-weighted
    # sum stays below 2^53 integer units, so BOTH engines' decimal->
    # double casts are exact (the int128 double-rounding trap); the
    # published gini is still DECIMAL(18,12)-collapsed for margin.
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(28,2)")).alias("_rev")
    )
    ranked = keyed_running_totals(
        per_cust,
        [],
        ["_rev", "o_custkey"],
        rank_col="_i",
        n_col="_n",
    )
    return (
        ranked.select(
            (F.col("_i").cast("decimal(28,2)") * F.col("_rev")).alias(
                "_ix"
            ),
            "_rev",
            "_n",
        )
        .groupBy()
        .agg(
            F.max("_n").alias("n_customers"),
            F.sum("_rev").cast("double").alias("total_revenue"),
            F.expr(
                "CAST(CAST(2.0 * CAST(SUM(_ix) AS DOUBLE)"
                " / (CAST(MAX(_n) AS DOUBLE) * CAST(SUM(_rev) AS DOUBLE))"
                " - (CAST(MAX(_n) AS DOUBLE) + 1.0) / MAX(_n)"
                " AS DECIMAL(18,12)) AS DOUBLE)"
            ).alias("gini"),
        )
    )


def q_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    return revenue_gini(load_table(spark, sf_dir, "orders"))


QUERIES = {
    "revenue_gini": q_revenue_gini,
    "pricing_summary": q_pricing_summary,
    "small_quantity_revenue": q_small_quantity_revenue,
    "bracket_revenue": lambda spark, sf: bracket_revenue(
        load_table(spark, sf, "lineitem"), load_table(spark, sf, "part")
    ),
    "lone_fault_suppliers": lambda spark, sf: lone_fault_suppliers(
        load_table(spark, sf, "lineitem"),
        load_table(spark, sf, "supplier"),
        load_table(spark, sf, "nation"),
    ),
    "event_transition_matrix": q_event_transitions,
    "revenue_by_nation": q_revenue_by_nation,
    "top_customers": q_top_customers,
    "priority_late_items": q_priority_late,
    "sessionize": q_sessionize,
    "distinct_users": q_distinct_users,
    "approx_distinct_users": q_approx_distinct,
    "corpus_cube": q_corpus_cube,
    "event_type_pivot": q_event_pivot,
    "asof_last_purchase": q_asof_last_purchase,
    "value_percentiles": lambda spark, sf: value_percentiles(
        load_table(spark, sf, "events")
    ),
    "approx_value_percentiles": lambda spark, sf: approx_value_percentiles(
        load_table(spark, sf, "events")
    ),
    "incident_range_join": lambda spark, sf: incident_range_join(
        load_table(spark, sf, "events")
    ),
    "value_histogram": lambda spark, sf: value_histogram(
        load_table(spark, sf, "events")
    ),
    "conversion_funnel": lambda spark, sf: conversion_funnel(
        load_table(spark, sf, "events")
    ),
    "window_funnel_depth": lambda spark, sf: window_funnel_depth(
        load_table(spark, sf, "events")
    ),
    "cohort_retention": lambda spark, sf: cohort_retention(
        load_table(spark, sf, "events")
    ),
    "shipping_priority": lambda spark, sf: shipping_priority(
        load_table(spark, sf, "customer"),
        load_table(spark, sf, "orders"),
        load_table(spark, sf, "lineitem"),
    ),
    "brand_nation_margin": lambda spark, sf: brand_nation_margin(
        load_table(spark, sf, "lineitem"),
        load_table(spark, sf, "part"),
        load_table(spark, sf, "supplier"),
        load_table(spark, sf, "nation"),
    ),
    "clicked_never_purchased": lambda spark, sf: clicked_never_purchased(
        load_table(spark, sf, "events")
    ),
    "value_rank_profile": lambda spark, sf: value_rank_profile(
        load_table(spark, sf, "events")
    ),
}

_DSUM_SQL = "CAST(SUM(CAST({e} AS DECIMAL(28,6))) AS DOUBLE)"

ORACLES = {
    "pricing_summary": f"""
SELECT l_returnflag, l_linestatus,
       {_DSUM_SQL.format(e="l_quantity")} AS sum_qty,
       {_DSUM_SQL.format(e="l_extendedprice")} AS sum_base_price,
       {_DSUM_SQL.format(e="l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
       {_DSUM_SQL.format(e="l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
       {_avg_sql("l_quantity")} AS avg_qty,
       {_avg_sql("l_extendedprice")} AS avg_price,
       {_avg_sql("l_discount")} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    "small_quantity_revenue": f"""
WITH li AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#1'
),
agg AS (
  SELECT l_partkey, SUM(qty) AS sum_qty, COUNT(*) AS cnt
  FROM li GROUP BY l_partkey
)
SELECT COUNT(*) AS n_small_lines,
       {_DSUM_SQL.format(e="l_extendedprice")} / 7.0 AS avg_yearly
FROM li JOIN agg USING (l_partkey)
WHERE 5 * qty * cnt < sum_qty
""",
    "event_transition_matrix": """
WITH pairs AS (
  SELECT user_id,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_event,
         event_type AS next_event
  FROM events
),
counts AS (
  SELECT prev_event, next_event, COUNT(*) AS n_transitions
  FROM pairs WHERE prev_event IS NOT NULL
  GROUP BY prev_event, next_event
),
totals AS (
  SELECT prev_event, CAST(SUM(n_transitions) AS BIGINT) AS row_total
  FROM counts GROUP BY prev_event
)
SELECT c.prev_event, c.next_event, c.n_transitions, t.row_total,
       CAST(c.n_transitions AS DOUBLE) / CAST(t.row_total AS DOUBLE)
         AS p_transition
FROM counts c JOIN totals t ON c.prev_event = t.prev_event
""",
    "revenue_by_nation": f"""
SELECT n_name,
       {_DSUM_SQL.format(e="l_extendedprice * (1 - l_discount)")} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
    "top_customers": f"""
WITH rev AS (
  SELECT o_custkey,
         {_DSUM_SQL.format(e="l_extendedprice * (1 - l_discount)")} AS revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_custkey
)
SELECT c_custkey, c_name, c_mktsegment, revenue
FROM rev JOIN customer ON o_custkey = c_custkey
ORDER BY revenue DESC, c_custkey ASC
LIMIT 10
""",
    "priority_late_items": """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
)
GROUP BY o_orderpriority
""",
    "sessionize": f"""
WITH gaps AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN ts - LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTES
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT *,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_seq
  FROM gaps
)
SELECT user_id, session_seq,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       {_DSUM_SQL.format(e="value")} AS total_value
FROM numbered
GROUP BY user_id, session_seq
""",
    "distinct_users": """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
""",
    "approx_distinct_users": """
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS approx_ok
FROM events
GROUP BY event_type
""",
    "approx_value_percentiles": """
SELECT event_type,
       quantile_cont(value, 0.5) AS exact_p50,
       TRUE AS approx_ok
FROM events
GROUP BY event_type
""",
    "corpus_cube": """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY CUBE (lang, source)
""",
    "event_type_pivot": """
SELECT user_id,
       COUNT(*) FILTER (event_type = 'click') AS click,
       COUNT(*) FILTER (event_type = 'view') AS view,
       COUNT(*) FILTER (event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (event_type = 'signup') AS signup,
       COUNT(*) FILTER (event_type = 'error') AS error
FROM events
GROUP BY user_id
""",
    "value_percentiles": """
SELECT event_type,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.95) AS p95
FROM events
GROUP BY event_type
""",
    "asof_last_purchase": """
SELECT e.user_id, e.ts, e.event_id, e.value,
       p.purchase_value AS last_purchase_value
FROM (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN (SELECT user_id, ts, value AS purchase_value
                FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND e.ts >= p.ts
""",
    "incident_range_join": f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS t FROM events
),
inc AS (
  SELECT event_id AS incident_id, user_id, t AS t0 FROM ev
  WHERE event_type = 'error'
)
SELECT i.incident_id, e.event_id, e.user_id, e.event_type,
       e.t - i.t0 AS lag_us
FROM inc i JOIN ev e
  ON e.user_id = i.user_id
 AND e.t >= i.t0
 AND e.t < i.t0 + {INCIDENT_WINDOW_MIN * 60 * 1_000_000}
 AND e.event_id <> i.incident_id
""",
    "clicked_never_purchased": """
SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
FROM events WHERE event_type = 'click'
EXCEPT
SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
FROM events WHERE event_type = 'purchase'
""",
    "value_rank_profile": """
SELECT event_id, event_type, value,
       percent_rank() OVER w AS pct_rank,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
""",
    "shipping_priority": f"""
SELECT l_orderkey, o_orderdate,
       {_DSUM_SQL.format(e="l_extendedprice * (1 - l_discount)")} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
    "brand_nation_margin": f"""
SELECT p_brand, n_name,
       {_DSUM_SQL.format(e="l_extendedprice * (1 - l_discount)")} AS revenue,
       {_DSUM_SQL.format(e="l_quantity")} AS volume,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY p_brand, n_name
""",
    "window_funnel_depth": f"""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1,
         MIN(ts) + INTERVAL {WINDOW_FUNNEL_HOURS} HOUR AS deadline
  FROM events WHERE event_type = '{WINDOW_FUNNEL_STEPS[0]}'
  GROUP BY user_id
),
s2 AS (
  SELECT s1.user_id, s1.t1, s1.deadline,
         MIN(CASE WHEN e.ts > s1.t1 AND e.ts <= s1.deadline
                  THEN e.ts END) AS t2
  FROM s1 LEFT JOIN events e
    ON e.user_id = s1.user_id AND e.event_type = '{WINDOW_FUNNEL_STEPS[1]}'
  GROUP BY 1, 2, 3
),
s3 AS (
  SELECT s2.user_id, s2.t1, s2.deadline, s2.t2,
         MIN(CASE WHEN e.ts > s2.t2 AND e.ts <= s2.deadline
                  THEN e.ts END) AS t3
  FROM s2 LEFT JOIN events e
    ON e.user_id = s2.user_id AND e.event_type = '{WINDOW_FUNNEL_STEPS[2]}'
  GROUP BY 1, 2, 3, 4
),
s4 AS (
  SELECT s3.user_id, s3.t1, s3.deadline, s3.t2, s3.t3,
         MIN(CASE WHEN e.ts > s3.t3 AND e.ts <= s3.deadline
                  THEN e.ts END) AS t4
  FROM s3 LEFT JOIN events e
    ON e.user_id = s3.user_id AND e.event_type = '{WINDOW_FUNNEL_STEPS[3]}'
  GROUP BY 1, 2, 3, 4, 5
)
SELECT user_id, t1, t2, t3, t4,
       CAST(1 + CAST(t2 IS NOT NULL AS INT) + CAST(t3 IS NOT NULL AS INT)
              + CAST(t4 IS NOT NULL AS INT) AS INT) AS funnel_depth
FROM s4
""",
    "conversion_funnel": f"""
WITH fc AS (
  SELECT user_id, MIN(ts) AS click_ts
  FROM events WHERE event_type = 'click' GROUP BY user_id
),
fp AS (
  SELECT fc.user_id, fc.click_ts, MIN(e.ts) AS purchase_ts
  FROM fc JOIN events e
    ON e.user_id = fc.user_id AND e.event_type = 'purchase'
   AND e.ts > fc.click_ts
  GROUP BY fc.user_id, fc.click_ts
)
SELECT fc.user_id, fc.click_ts, fp.purchase_ts,
       CASE WHEN fp.purchase_ts IS NOT NULL
            THEN epoch_us(fp.purchase_ts) - epoch_us(fc.click_ts) END AS lag_us,
       COALESCE(epoch_us(fp.purchase_ts) - epoch_us(fc.click_ts)
                <= {FUNNEL_WINDOW_MIN * 60 * 1_000_000}, FALSE) AS converted
FROM fc LEFT JOIN fp ON fc.user_id = fp.user_id AND fc.click_ts = fp.click_ts
""",
    "cohort_retention": """
WITH fw AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
act AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
)
SELECT cohort_week,
       CAST((epoch(week) - epoch(cohort_week)) / (7 * 24 * 3600) AS INTEGER)
         AS week_offset,
       COUNT(DISTINCT act.user_id) AS n_users
FROM act JOIN fw ON act.user_id = fw.user_id
GROUP BY 1, 2
""",
    "value_histogram": f"""
WITH b AS (
  SELECT event_type,
         CAST(LEAST(GREATEST(FLOOR(value / {HIST_WIDTH}), 0),
                    {HIST_BUCKETS - 1}) AS INTEGER) AS bucket
  FROM events
)
SELECT event_type, bucket,
       bucket * {HIST_WIDTH} AS bucket_lo,
       (bucket + 1) * {HIST_WIDTH} AS bucket_hi,
       COUNT(*) AS n
FROM b GROUP BY event_type, bucket
""",
}

_BRACKET_DISJ = " OR ".join(
    f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi} "
    f"AND l_quantity BETWEEN {qlo} AND {qhi})"
    for b, slo, shi, qlo, qhi in REVENUE_BRACKETS
)

ORACLES["bracket_revenue"] = f"""
SELECT {_DSUM_SQL.format(e="l_extendedprice * (1 - l_discount)")} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {_BRACKET_DISJ}
"""

ORACLES["lone_fault_suppliers"] = """
WITH faults AS (
  SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
),
lone AS (
  SELECT f.l_orderkey, f.l_suppkey
  FROM faults f
  WHERE EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = f.l_orderkey
                  AND l2.l_suppkey <> f.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM lineitem l3
                    WHERE l3.l_orderkey = f.l_orderkey
                      AND l3.l_suppkey <> f.l_suppkey
                      AND l3.l_returnflag = 'R')
),
counts AS (
  SELECT l_suppkey, COUNT(*) AS numwait FROM lone GROUP BY l_suppkey
)
SELECT s_name, n_name, numwait,
       CAST(ROW_NUMBER() OVER (ORDER BY numwait DESC, s_name) AS INTEGER)
         AS rank
FROM counts
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
QUALIFY rank <= 10
"""

# the oracle keeps the naive unpartitioned ROW_NUMBER spelling
# revenue_gini exists to avoid
ORACLES["revenue_gini"] = """
WITH per_cust AS (
  SELECT o_custkey,
         SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS rev
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT rev,
         ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS i,
         COUNT(*) OVER () AS n
  FROM per_cust
)
SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
       CAST(SUM(rev) AS DOUBLE) AS total_revenue,
       CAST(CAST(2.0 * CAST(SUM(CAST(i AS DECIMAL(28,2)) * rev) AS DOUBLE)
            / (CAST(MAX(n) AS DOUBLE) * CAST(SUM(rev) AS DOUBLE))
            - (CAST(MAX(n) AS DOUBLE) + 1.0) / MAX(n)
            AS DECIMAL(18,12)) AS DOUBLE) AS gini
FROM ranked
"""
