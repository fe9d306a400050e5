"""Data-quality expectations over the lake: the validation report a
pipeline publishes per ingest batch (null keys, domain ranges,
referential integrity, primary-key duplicates) — the Deequ/
Great-Expectations surface re-expressed as plain aggregates.

One row per check: (table_name, check_name, n_violations, n_rows,
violation_rate).  All counts are integers; the rate is one double
divide — trivially engine-exact.

Scale shape: the per-table predicate checks share ONE scan each (a
single aggregate computes every conditional count, then unpivots via
``stack`` — no per-check scans); the two referential checks are
anti-joins on the join key (one shuffle each, AQE-planned); the
duplicate-key check is a groupBy on the primary key.  The final
result is a union of 1-row frames — driver-sized regardless of input.

Reference parity: the reference pipeline trusts its own writer and
has no validation stage; this belongs to the large-scale-platform
extension surface (a 100 TB ingest without expectations is an
outage generator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

QTY_MIN, QTY_MAX = 1, 50


def _unpivot(one_row: DataFrame, table: str, checks: list[str]) -> DataFrame:
    stack = (
        f"stack({len(checks)}, "
        + ", ".join(f"'{c}', {c}" for c in checks)
        + ") AS (check_name, n_violations)"
    )
    return one_row.selectExpr(
        f"'{table}' AS table_name", stack, "n_rows"
    )


def dq_report(
    lineitem: DataFrame, orders: DataFrame, events: DataFrame
) -> DataFrame:
    """The expectations suite over lineitem / orders / events."""
    li = _unpivot(
        lineitem.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_orderkey").isNull().cast("long")).alias(
                "null_orderkey"
            ),
            F.sum(
                (
                    (F.col("l_quantity") < QTY_MIN)
                    | (F.col("l_quantity") > QTY_MAX)
                ).cast("long")
            ).alias("quantity_out_of_range"),
            F.sum((F.col("l_extendedprice") < 0).cast("long")).alias(
                "negative_price"
            ),
            F.sum(
                (F.col("l_shipdate").isNull()).cast("long")
            ).alias("null_shipdate"),
        ),
        "lineitem",
        [
            "null_orderkey",
            "quantity_out_of_range",
            "negative_price",
            "null_shipdate",
        ],
    )
    ev = _unpivot(
        events.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("value").isNull().cast("long")).alias("null_value"),
            F.sum(F.col("user_id").isNull().cast("long")).alias(
                "null_user_id"
            ),
            F.sum(F.isnan("value").cast("long")).alias("nan_value"),
        ),
        "events",
        ["null_value", "null_user_id", "nan_value"],
    )
    li_total = lineitem.agg(F.count(F.lit(1)).alias("n_rows"))
    orders_total = orders.agg(F.count(F.lit(1)).alias("n_rows"))
    orphans = (
        lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey, "left_anti"
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .crossJoin(F.broadcast(li_total))
        .selectExpr(
            "'lineitem' AS table_name",
            "'orphan_orderkey' AS check_name",
            "n_violations",
            "n_rows",
        )
    )
    dup_pk = (
        lineitem.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("n_violations"))
        .crossJoin(F.broadcast(li_total))
        .selectExpr(
            "'lineitem' AS table_name",
            "'duplicate_pk' AS check_name",
            "n_violations",
            "n_rows",
        )
    )
    childless = (
        orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey, "left_anti"
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .crossJoin(F.broadcast(orders_total))
        .selectExpr(
            "'orders' AS table_name",
            "'childless_order' AS check_name",
            "n_violations",
            "n_rows",
        )
    )
    out = li.unionByName(ev).unionByName(orphans).unionByName(dup_pk).unionByName(
        childless
    )
    return out.select(
        "table_name",
        "check_name",
        F.col("n_violations").cast("long").alias("n_violations"),
        F.col("n_rows").cast("long").alias("n_rows"),
        (
            F.col("n_violations").cast("double")
            / F.col("n_rows").cast("double")
        ).alias("violation_rate"),
    )


#: PSI drift grid: coarse fixed bins (the industry-standard 10-20 bin
#: PSI setup) over the events.value domain; Laplace smoothing keeps
#: empty bins defined without epsilon hacks.
PSI_LO, PSI_W, PSI_BINS = 0.0, 32.0, 16
PSI_SPLIT = "2024-01-16"


def feature_drift_psi(
    events: DataFrame,
    split_ts: str = PSI_SPLIT,
    lo: float = PSI_LO,
    w: float = PSI_W,
    nbins: int = PSI_BINS,
) -> DataFrame:
    """Population Stability Index per event_type between a reference
    window (before ``split_ts``) and the current window — THE standard
    train/serve drift monitor a feature pipeline publishes next to its
    DQ report (PSI < 0.1 stable, 0.1-0.25 shifting, > 0.25 drifted).

    ``psi = sum_bins (q_i - p_i) * ln(q_i / p_i)`` with
    Laplace-smoothed shares ``(cnt + 1) / (n + nbins)``, so empty bins
    on either side are well-defined with no epsilon constants.  The
    dense bin spine is #types x nbins rows (broadcast-scale); each
    side's counts come from ONE map-side-combinable aggregate over the
    fact scan — two passes of work total, output driver-sized.

    Float contract (tfidf/bm25 precedent): the only libm call is
    ``ln``; each per-bin term is rounded to DECIMAL(18,9) where that
    call happens, the <= nbins decimal terms sum exactly (order-free),
    and the total re-casts to DOUBLE — bit-identical cross-engine.
    """
    b = F.least(
        F.greatest(F.floor((F.col("value") - F.lit(lo)) / F.lit(w)), F.lit(0)),
        F.lit(nbins - 1),
    ).cast("int")
    is_ref = F.col("ts") < F.lit(split_ts).cast("timestamp")
    counts = (
        events.filter(F.col("value").isNotNull())
        .groupBy("event_type", b.alias("bin"))
        .agg(
            F.sum(is_ref.cast("long")).alias("ref_cnt"),
            F.sum((~is_ref).cast("long")).alias("cur_cnt"),
        )
    )
    grid = (
        events.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(nbins - 1))).alias("bin"),
        )
    )
    full = (
        grid.join(counts, ["event_type", "bin"], "left")
        .fillna(0, ["ref_cnt", "cur_cnt"])
    )
    totals = full.groupBy("event_type").agg(
        F.sum("ref_cnt").alias("n_ref"), F.sum("cur_cnt").alias("n_cur")
    )
    joined = full.join(F.broadcast(totals), "event_type")
    p = (F.col("ref_cnt") + 1).cast("double") / (
        F.col("n_ref") + F.lit(nbins)
    ).cast("double")
    q = (F.col("cur_cnt") + 1).cast("double") / (
        F.col("n_cur") + F.lit(nbins)
    ).cast("double")
    term = ((q - p) * F.log(q / p)).cast("decimal(18,9)")
    return joined.groupBy("event_type").agg(
        F.max("n_ref").alias("n_ref"),
        F.max("n_cur").alias("n_cur"),
        F.sum(term).cast("double").alias("psi"),
    )


#: Benford expected first-digit shares log10(1 + 1/d), d = 1..9, as
#: pinned double literals (repr round-trips: both engines parse the
#: identical value).
BENFORD_P = [0.30102999566398120, 0.17609125905568124, 0.12493873660829993,
             0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
             0.05799194697768673, 0.05115252244738129, 0.04575749056067514]
BENFORD_FLAG_DEV = 0.05


def benford_digit_check(events: DataFrame) -> DataFrame:
    """Benford's-law first-digit conformance per event_type — the
    classic DQ/fraud screen for 'organically grown' numeric columns
    (Nigrini's audit test): natural multi-scale magnitudes follow
    P(d) = log10(1+1/d); fabricated or clipped data does not.

    The first significant digit is read WITHOUT float logs: the value
    is micro-scaled to an exact BIGINT (the metric_pair_correlation
    DECIMAL(28,6)·1e6 spelling — multiplying by 10^6 cannot change
    the leading digit of a positive number) and the digit is the
    first character of the integer's decimal string — integer-to-
    string is engine-identical, where double-to-string is not.

    Output per event_type: value count, max |observed - expected|
    share over the 9 digits (each share ONE double divide, each
    deviation one subtract against a pinned literal), and the
    conformance flag.  Scale: one (type, digit) groupBy — 9 rows per
    key — plus a broadcast totals join.
    """
    digit = F.substring(
        F.expr("CAST(CAST(CAST(value AS DECIMAL(28,6)) * 1000000 AS BIGINT) AS STRING)"),
        1,
        1,
    ).cast("int")
    counts = (
        events.filter(F.col("value").isNotNull() & (F.col("value") > 0))
        .groupBy("event_type", digit.alias("d"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # 9-digit spine per type: a digit that never occurs still deviates
    # by its full expected share (the PSI grid precedent)
    grid = (
        counts.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.array(*[F.lit(i) for i in range(1, 10)])).alias("d"),
        )
    )
    filled = grid.join(counts, ["event_type", "d"], "left").select(
        "event_type", "d", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    totals = filled.groupBy("event_type").agg(
        F.sum("cnt").alias("n_values")
    )
    p_arr = F.array(*[F.lit(p) for p in BENFORD_P])
    dev = F.abs(
        F.col("cnt").cast("double") / F.col("n_values").cast("double")
        - F.element_at(p_arr, F.col("d"))
    )
    return (
        filled.join(F.broadcast(totals), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n_values").alias("n_values"),
            F.max(dev).alias("max_abs_dev"),
        )
        .select(
            "event_type",
            "n_values",
            "max_abs_dev",
            (F.col("max_abs_dev") <= BENFORD_FLAG_DEV).alias("benford_ok"),
        )
    )


# Order-independent table fingerprints: the replication/compaction
# verifier.  After a cross-region copy, a lake compaction
# (maintenance.compact_partitions), or an engine migration, "did the
# rows survive byte-for-byte?" must be answerable WITHOUT sorting
# 100 TB — so the per-partition digest is built from commutative
# aggregates over a per-row hash: COUNT, an exact mod-2^60 SUM
# (accumulated as three BIGINT 20-bit chunk sums so the plan stays a
# map-side-combinable HashAggregate — see table_fingerprint's
# docstring — and recombined modulo 2^60 once per output row) and a
# BIT_XOR of a 60-bit hash prefix, plus MIN/MAX of the full
# hex digest.  Any dropped, duplicated, or mutated row flips the
# (sum, xor) pair with overwhelming probability; equal fingerprints
# on both sides of a copy certify it partition-by-partition.
#
# Scale shape: ONE map-side-combinable shuffle to #partitions rows
# (the same shape as a rollup); no sort, no join, no Python.  The
# canonical form feeds every column through engine-deterministic
# casts (BIGINT/VARCHAR as-is, TIMESTAMP via unix micros, DOUBLE via
# the proven DECIMAL(28,6) spelling) with an \\x00 NULL sentinel and
# an \\x1f field separator, so Spark and DuckDB hash identical bytes.

_FP_NUL = "\x00"
_FP_SEP = "\x1f"


def _fp_canon_spark() -> F.Column:
    def s(c: F.Column) -> F.Column:
        return F.coalesce(c.cast("string"), F.lit(_FP_NUL))

    return F.concat_ws(
        _FP_SEP,
        s(F.col("event_id")),
        s(F.unix_micros("ts")),
        s(F.col("user_id")),
        s(F.col("event_type")),
        s(F.col("value").cast("decimal(28,6)")),
        s(F.col("props")),
    )


def table_fingerprint(events: DataFrame) -> DataFrame:
    """Per-day replication fingerprint of the events table.

    Every aggregate buffer is a fixed-width BIGINT so the whole
    operator runs as a map-side-combinable HashAggregate (a
    DECIMAL(38) sum or a string MIN would demote it to SortAggregate
    — an O(n log n) per-partition sort of the fact table).  The mod-
    2^60 hash sum therefore accumulates as THREE 20-bit chunk sums
    (each bounded by n_rows * 2^20, overflow-safe past 10^12 rows/
    partition) recombined modulo 2^60 once per output row.

    ``to_date(ts)`` follows the session timezone; the streaming twin
    (streaming/rollup.streaming_table_fingerprint) uses epoch-aligned
    1-day windows, so the batch≡stream contract requires the UTC
    session session.py pins (the twin asserts it).
    """
    h = F.md5(_fp_canon_spark())
    h60 = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    out = (
        events.select(F.to_date("ts").alias("day"), h60.alias("h60"))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("SUM(h60 % 1048576)").alias("_s0"),
            F.expr("SUM((h60 DIV 1048576) % 1048576)").alias("_s1"),
            F.expr("SUM(h60 DIV 1099511627776)").alias("_s2"),
            F.expr("bit_xor(h60)").alias("hash_xor"),
            F.min("h60").alias("hash_min"),
            F.max("h60").alias("hash_max"),
        )
    )
    total = (
        F.col("_s0") % F.lit(2**60)
        + (F.col("_s1") % F.lit(2**40)) * F.lit(2**20)
        + (F.col("_s2") % F.lit(2**20)) * F.lit(2**40)
    ) % F.lit(2**60)
    return out.select(
        "day",
        "n_rows",
        total.alias("hash_sum"),
        "hash_xor",
        "hash_min",
        "hash_max",
    )


def _hex_int_sql(md5_expr: str, n: int) -> str:
    """BIGINT of the first ``n`` hex chars (DuckDB has no conv())."""
    e = "CAST(0 AS BIGINT)"
    for i in range(n):
        e = (
            f"({e} * 16 + (strpos('0123456789abcdef', "
            f"substr({md5_expr}, {i + 1}, 1)) - 1))"
        )
    return e


def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    return benford_digit_check(load_table(spark, sf_dir, "events"))


def q_feature_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return feature_drift_psi(load_table(spark, sf_dir, "events"))


# Two-proportion z-test per operator: "does operator op-K's equipment
# error significantly more than everyone else's?" — the statistical
# upgrade of eyeballing per-operator error-rate bars (the reference
# dashboard's alarm panels slice by the operator tag; this screen says
# which differences are NOISE).  One-vs-rest design: for operator k
# with (n_k errors e_k) against the rest (N - n_k, E - e_k),
#
#   z = (p_k - p_rest) / sqrt(p_pool (1 - p_pool) (1/n_k + 1/n_rest))
#
# with the pooled rate E/N.  All counts come from ONE map-side-
# combinable aggregate over the telemetry scan (#operators rows);
# the rest-side counts are derived by broadcasting the 1-row total —
# no second scan, no window.  z is pure IEEE arithmetic on exact
# integer counts in pinned order, ulp-collapsed at DECIMAL(18,9).
#
# Degenerate one-vs-rest splits ABSTAIN (NULL z / NULL significant)
# instead of emitting Inf/NaN: a single-operator dataset makes
# n_tot - n = 0, and e_tot = 0 or e_tot = n_tot zeroes the pooled
# variance — both denominators are guarded with try_divide (Spark) /
# NULLIF (DuckDB), the same contract lead_lag_correlation uses.

ZTEST_CRIT = 1.96  # two-sided 5%


def operator_error_ztest(telemetry_df: DataFrame) -> DataFrame:
    per_op = (
        telemetry_df.filter(F.col("operator").isNotNull())
        .groupBy("operator")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("metric") == "error").cast("long")).alias("e"),
        )
    )
    totals = per_op.agg(
        F.sum("n").alias("n_tot"), F.sum("e").alias("e_tot")
    )
    z_expr = (
        "try_divide(e / n - try_divide(e_tot - e, n_tot - n),"
        " sqrt((e_tot / n_tot) * (1.0 - e_tot / n_tot)"
        " * (1.0 / n + try_divide(1.0, n_tot - n))))"
    )
    return (
        per_op.crossJoin(F.broadcast(totals))
        .selectExpr(
            "operator",
            "n AS n_events",
            "e AS n_errors",
            f"CAST(CAST({z_expr} AS DECIMAL(18,9)) AS DOUBLE) AS z_vs_rest",
            f"abs(CAST(CAST({z_expr} AS DECIMAL(18,9)) AS DOUBLE))"
            f" > {ZTEST_CRIT} AS significant",
        )
    )


def q_operator_error_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ingest import telemetry

    return operator_error_ztest(telemetry(spark, sf_dir))


def metric_operator_mi(tel: DataFrame) -> DataFrame:
    """Mutual information (nats) between the metric and operator tags
    — the categorical-dependence screen behind feature selection and
    leakage audits ("does knowing the operator tell you anything
    about what the machine reports?"): MI = Σ p(x,y)·ln(p(x,y)/
    (p(x)·p(y))), 0 iff independent.

    One fact-sized map-side-combinable shuffle to the #metrics ×
    #operators contingency table; margins and the grand total are
    re-aggregates OF THE TABLE (never the facts), broadcast back; the
    per-cell term rounds to DECIMAL(18,9) at its libm call (the PSI/
    entropy precedent) and the ≤ |X|·|Y| decimal terms sum exactly —
    a bit-identical scalar on both engines.
    """
    cells = (
        tel.filter(F.col("operator").isNotNull())
        .groupBy("metric", "operator")
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    cx = cells.groupBy("metric").agg(F.sum("c_xy").alias("c_x"))
    cy = cells.groupBy("operator").agg(F.sum("c_xy").alias("c_y"))
    tot = cells.agg(F.sum("c_xy").alias("n"))
    joined = (
        cells.join(F.broadcast(cx), "metric")
        .join(F.broadcast(cy), "operator")
        .crossJoin(F.broadcast(tot))
    )
    term = (
        "CAST((CAST(c_xy AS DOUBLE) / n)"
        " * ln((CAST(c_xy AS DOUBLE) * n)"
        " / (CAST(c_x AS DOUBLE) * c_y)) AS DECIMAL(18,9))"
    )
    return joined.selectExpr(
        "c_xy", "c_x", "c_y", "n", f"{term} AS _t"
    ).agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.max("n").alias("n_events"),
        F.sum("_t").cast("double").alias("mi_nats"),
    )


def metric_operator_chi2(tel: DataFrame) -> DataFrame:
    """Pearson chi-square test of independence over the same
    metric x operator contingency table as :func:`metric_operator_mi`
    — the significance-test companion of the MI effect size (chi2,
    dof, and Cramér's V; the p-value needs the incomplete gamma,
    which belongs in the caller's stats layer, so the operator
    publishes the statistic and dof a table lookup consumes).

    Unlike MI (whose zero cells contribute 0), chi-square sums over
    the FULL grid — empty cells contribute their expectation — so the
    table is the margins' cross join (spine-sized: #metrics x
    #operators) LEFT-joined to the observed cells.  Expectation and
    each (o-e)^2/e term are pinned-order IEEE doubles over exact
    integer margins, DECIMAL(18,9)-collapsed per cell (the MI/PSI
    precedent) and summed exactly; Cramér's V takes the one sqrt
    under the same collapse.
    """
    cells = (
        tel.filter(F.col("operator").isNotNull())
        .groupBy("metric", "operator")
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    cx = cells.groupBy("metric").agg(F.sum("c_xy").alias("c_x"))
    cy = cells.groupBy("operator").agg(F.sum("c_xy").alias("c_y"))
    tot = cells.agg(
        F.sum("c_xy").alias("n"),
        F.count_distinct("metric").alias("nx"),
        F.count_distinct("operator").alias("ny"),
    )
    grid = (
        cx.crossJoin(F.broadcast(cy))
        .join(cells, ["metric", "operator"], "left")
        .select(
            "metric",
            "operator",
            "c_x",
            "c_y",
            F.coalesce(F.col("c_xy"), F.lit(0)).alias("o"),
        )
        .crossJoin(F.broadcast(tot))
    )
    staged = grid.selectExpr(
        "o", "n", "nx", "ny",
        "CAST(c_x AS DOUBLE) * c_y / n AS e",
    ).selectExpr(
        "n", "nx", "ny",
        "CAST((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e"
        " AS DECIMAL(18,9)) AS _t",
    )
    return staged.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.max("n").alias("n_events"),
        ((F.max("nx") - 1) * (F.max("ny") - 1)).cast("long").alias("dof"),
        F.sum("_t").cast("double").alias("chi2"),
        F.expr(
            "CAST(CAST(sqrt(CAST(SUM(_t) AS DOUBLE)"
            " / (MAX(n) * least(MAX(nx) - 1, MAX(ny) - 1)))"
            " AS DECIMAL(18,9)) AS DOUBLE)"
        ).alias("cramers_v"),
    )


def q_metric_operator_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ingest import telemetry

    return metric_operator_chi2(telemetry(spark, sf_dir))


# ---------------------------------------------------------------------------
# Column profiler (the Deequ/GE "profile" sibling of dq_report)
# ---------------------------------------------------------------------------

#: (column, kind) spec for the lineitem profile — the single source
#: both the Spark aggregate and the DuckDB oracle are generated from,
#: so the two can never drift.  kind: num (min/max as DOUBLE),
#: str (lexicographic min/max), ts (min/max as epoch micros).
PROFILE_COLS: list[tuple[str, str]] = [
    ("l_orderkey", "num"),
    ("l_partkey", "num"),
    ("l_suppkey", "num"),
    ("l_linenumber", "num"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_tax", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "ts"),
]


def table_profile(
    df: DataFrame, cols: list[tuple[str, str]] = PROFILE_COLS
) -> DataFrame:
    """One-pass column profile: (column_name, n_rows, n_nulls,
    n_distinct, min_num, max_num, min_str, max_str) per column — the
    catalog statistics a lake publishes per ingest (and the inputs to
    CBO-style size estimates / zone-map sanity checks).

    ONE scan computes every column's null count, exact distinct, and
    min/max inside a single aggregate (no per-column passes); the
    unpivot to rows is a ``stack`` over the 1-row aggregate.  The
    exact COUNT(DISTINCT) per column makes this one aggregate with
    #cols distinct-expansions — at 100 TB you swap those for the HLL
    sketches this repo already serves (hll_rollup_merge) and keep the
    plan; exact is what makes the hash-match oracle possible here.
    Timestamps profile as epoch micros; numerics as DOUBLE (exact for
    the BIGINT key ranges in play); strings lexicographically.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in cols:
        e = F.unix_micros(F.col(c)) if kind == "ts" else F.col(c)
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nn_{c}"),
            F.countDistinct(e).alias(f"_nd_{c}"),
        ]
        if kind == "str":
            aggs += [
                F.min(e).alias(f"_mns_{c}"),
                F.max(e).alias(f"_mxs_{c}"),
            ]
        else:
            aggs += [
                F.min(e).cast("double").alias(f"_mn_{c}"),
                F.max(e).cast("double").alias(f"_mx_{c}"),
            ]
    one = df.agg(*aggs)
    parts = []
    for c, kind in cols:
        if kind == "str":
            mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
            mns, mxs = f"_mns_{c}", f"_mxs_{c}"
        else:
            mn, mx = f"_mn_{c}", f"_mx_{c}"
            mns, mxs = "CAST(NULL AS STRING)", "CAST(NULL AS STRING)"
        parts.append(
            f"'{c}', _nn_{c}, _nd_{c}, {mn}, {mx}, {mns}, {mxs}"
        )
    stack = (
        f"stack({len(cols)}, " + ", ".join(parts) + ") AS (column_name,"
        " n_nulls, n_distinct, min_num, max_num, min_str, max_str)"
    )
    return one.selectExpr("n_rows", stack).select(
        "column_name",
        "n_rows",
        "n_nulls",
        "n_distinct",
        "min_num",
        "max_num",
        "min_str",
        "max_str",
    )


def _profile_oracle() -> str:
    selects = []
    for c, kind in PROFILE_COLS:
        e = f"epoch_us({c})" if kind == "ts" else c
        if kind == "str":
            mn = "CAST(NULL AS DOUBLE)"
            mx = "CAST(NULL AS DOUBLE)"
            mns, mxs = f"MIN({c})", f"MAX({c})"
        else:
            mn, mx = f"CAST(MIN({e}) AS DOUBLE)", f"CAST(MAX({e}) AS DOUBLE)"
            mns = "CAST(NULL AS VARCHAR)"
            mxs = "CAST(NULL AS VARCHAR)"
        selects.append(
            f"SELECT '{c}' AS column_name, COUNT(*) AS n_rows,"
            f" COUNT(*) - COUNT({c}) AS n_nulls,"
            f" COUNT(DISTINCT {e}) AS n_distinct,"
            f" {mn} AS min_num, {mx} AS max_num,"
            f" {mns} AS min_str, {mxs} AS max_str FROM lineitem"
        )
    return "\nUNION ALL\n".join(selects)


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table_profile(load_table(spark, sf_dir, "lineitem"))


#: KS uses the same reference/current split as the PSI monitor.
KS_ALPHA_COEF = 1.358  # c(alpha) for alpha = 0.05


def ks_drift(events: DataFrame, split_ts: str = PSI_SPLIT) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift per event_type between the
    reference window (before ``split_ts``) and the current window —
    the distribution-free companion of feature_drift_psi: PSI needs a
    binning choice; KS is the exact sup-norm ECDF distance, caught at
    whatever value the distributions actually diverge.

    Exact-textbook semantics: counts aggregate per (type, value)
    FIRST (evaluating the ECDF gap mid-tie would overestimate the
    sup), then both cumulative counts run over the distinct-value
    spine via distwindow.keyed_running_totals — event_type is the
    canonical low-cardinality key, so a bare per-type window would
    funnel each type's distinct values through one task; the two-pass
    rank never does.  KS and the α=0.05 critical value are single
    IEEE expressions over exact integers (sqrt is libm → the
    DECIMAL(18,9) collapse before the drift flag, PSI precedent).
    """
    is_ref = F.col("ts") < F.lit(split_ts).cast("timestamp")
    per_value = (
        events.filter(F.col("value").isNotNull())
        .groupBy("event_type", "value")
        .agg(
            F.sum(is_ref.cast("long")).alias("_r"),
            F.sum((~is_ref).cast("long")).alias("_c"),
        )
    )
    from .distwindow import keyed_running_totals

    cum = keyed_running_totals(
        per_value,
        ["event_type"],
        ["value"],
        weights={"cum_ref": "_r", "cum_cur": "_c"},
    )
    # KS is undefined against an empty sample: a type present in only
    # one window would divide by n=0 (Spark NULL vs DuckDB IEEE inf —
    # engine parity breaks either way), so ABSTAIN on those types; the
    # inner join below drops their rows entirely.
    totals = per_value.groupBy("event_type").agg(
        F.sum("_r").alias("n_ref"), F.sum("_c").alias("n_cur")
    ).filter((F.col("n_ref") > 0) & (F.col("n_cur") > 0))
    gap = cum.join(F.broadcast(totals), "event_type").select(
        "event_type",
        "n_ref",
        "n_cur",
        F.expr(
            "abs(CAST(cum_ref AS DOUBLE) / n_ref"
            " - CAST(cum_cur AS DOUBLE) / n_cur)"
        ).alias("_gap"),
    )
    crit = (
        f"CAST(CAST({KS_ALPHA_COEF} * sqrt((CAST(n_ref AS DOUBLE)"
        f" + n_cur) / (CAST(n_ref AS DOUBLE) * n_cur))"
        f" AS DECIMAL(18,9)) AS DOUBLE)"
    )
    return (
        gap.groupBy("event_type")
        .agg(
            F.max("n_ref").alias("n_ref"),
            F.max("n_cur").alias("n_cur"),
            F.max("_gap").alias("ks_stat"),
        )
        .selectExpr(
            "event_type",
            "n_ref",
            "n_cur",
            "ks_stat",
            f"{crit} AS ks_critical",
            f"ks_stat > {crit} AS drifted",
        )
    )


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ks_drift(load_table(spark, sf_dir, "events"))


def q_metric_operator_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ingest import telemetry

    return metric_operator_mi(telemetry(spark, sf_dir))


def q_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dq_report(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "events"),
    )


QUERIES = {
    "dq_report": q_dq_report,
    "feature_drift_psi": q_feature_drift,
    "benford_digit_check": q_benford,
    "table_fingerprint": lambda spark, sf: table_fingerprint(
        load_table(spark, sf, "events")
    ),
    "operator_error_ztest": q_operator_error_ztest,
    "metric_operator_mi": q_metric_operator_mi,
    "metric_operator_chi2": q_metric_operator_chi2,
    "table_profile": q_table_profile,
    "ks_drift": q_ks_drift,
}

_FP_CANON_SQL = (
    "concat_ws(chr(31), "
    "COALESCE(CAST(event_id AS VARCHAR), chr(0)), "
    "COALESCE(CAST(epoch_us(ts) AS VARCHAR), chr(0)), "
    "COALESCE(CAST(user_id AS VARCHAR), chr(0)), "
    "COALESCE(event_type, chr(0)), "
    "COALESCE(CAST(CAST(value AS DECIMAL(28,6)) AS VARCHAR), chr(0)), "
    "COALESCE(props, chr(0)))"
)

_BENFORD_LIST = "[" + ", ".join(repr(p) for p in BENFORD_P) + "]"

ORACLES = {
    # same textual arithmetic shape as the operator: shares as double
    # divisions, one ln per bin, per-term DECIMAL(18,9) collapse
    "feature_drift_psi": f"""
WITH base AS (
  SELECT event_type,
         CAST(LEAST(GREATEST(FLOOR((value - {PSI_LO}) / {PSI_W}), 0),
                    {PSI_BINS - 1}) AS INTEGER) AS bin,
         (ts < TIMESTAMP '{PSI_SPLIT}') AS is_ref
  FROM events WHERE value IS NOT NULL
),
counts AS (
  SELECT event_type, bin,
         SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS ref_cnt,
         SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS cur_cnt
  FROM base GROUP BY 1, 2
),
grid AS (
  SELECT t.event_type, g.bin
  FROM (SELECT DISTINCT event_type FROM events) t,
       (SELECT UNNEST(generate_series(0, {PSI_BINS - 1})) AS bin) g
),
filled AS (
  SELECT grid.event_type, grid.bin,
         COALESCE(ref_cnt, 0) AS ref_cnt,
         COALESCE(cur_cnt, 0) AS cur_cnt
  FROM grid LEFT JOIN counts USING (event_type, bin)
),
tot AS (
  SELECT event_type, SUM(ref_cnt) AS n_ref, SUM(cur_cnt) AS n_cur
  FROM filled GROUP BY 1
),
terms AS (
  SELECT f.event_type, t.n_ref, t.n_cur,
         CAST(((CAST(cur_cnt + 1 AS DOUBLE) / CAST(n_cur + {PSI_BINS} AS DOUBLE))
               - (CAST(ref_cnt + 1 AS DOUBLE) / CAST(n_ref + {PSI_BINS} AS DOUBLE)))
              * ln((CAST(cur_cnt + 1 AS DOUBLE) / CAST(n_cur + {PSI_BINS} AS DOUBLE))
                   / (CAST(ref_cnt + 1 AS DOUBLE) / CAST(n_ref + {PSI_BINS} AS DOUBLE)))
              AS DECIMAL(18,9)) AS term
  FROM filled f JOIN tot t USING (event_type)
)
SELECT event_type,
       CAST(MAX(n_ref) AS BIGINT) AS n_ref,
       CAST(MAX(n_cur) AS BIGINT) AS n_cur,
       CAST(SUM(term) AS DOUBLE) AS psi
FROM terms GROUP BY 1
""",
    "dq_report": f"""
WITH li AS (
  SELECT COUNT(*) AS n_rows,
         SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
           AS null_orderkey,
         SUM(CASE WHEN l_quantity < {QTY_MIN} OR l_quantity > {QTY_MAX}
                  THEN 1 ELSE 0 END) AS quantity_out_of_range,
         SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END)
           AS negative_price,
         SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
           AS null_shipdate
  FROM lineitem
),
ev AS (
  SELECT COUNT(*) AS n_rows,
         SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS null_value,
         SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS null_user_id,
         SUM(CASE WHEN isnan(value) THEN 1 ELSE 0 END) AS nan_value
  FROM events
),
raw AS (
  SELECT 'lineitem' AS table_name, 'null_orderkey' AS check_name,
         null_orderkey AS n_violations, n_rows FROM li
  UNION ALL
  SELECT 'lineitem', 'quantity_out_of_range', quantity_out_of_range, n_rows
  FROM li
  UNION ALL
  SELECT 'lineitem', 'negative_price', negative_price, n_rows FROM li
  UNION ALL
  SELECT 'lineitem', 'null_shipdate', null_shipdate, n_rows FROM li
  UNION ALL
  SELECT 'events', 'null_value', null_value, n_rows FROM ev
  UNION ALL
  SELECT 'events', 'null_user_id', null_user_id, n_rows FROM ev
  UNION ALL
  SELECT 'events', 'nan_value', nan_value, n_rows FROM ev
  UNION ALL
  SELECT 'lineitem', 'orphan_orderkey',
         (SELECT COUNT(*) FROM lineitem
          WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
         (SELECT COUNT(*) FROM lineitem)
  UNION ALL
  SELECT 'lineitem', 'duplicate_pk',
         (SELECT COALESCE(SUM(c), 0) FROM (
            SELECT COUNT(*) AS c FROM lineitem
            GROUP BY l_orderkey, l_linenumber) WHERE c > 1),
         (SELECT COUNT(*) FROM lineitem)
  UNION ALL
  SELECT 'orders', 'childless_order',
         (SELECT COUNT(*) FROM orders
          WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)),
         (SELECT COUNT(*) FROM orders)
)
SELECT table_name, check_name,
       CAST(n_violations AS BIGINT) AS n_violations,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_violations AS DOUBLE) / CAST(n_rows AS DOUBLE)
         AS violation_rate
FROM raw
""",
}

ORACLES["benford_digit_check"] = f"""
WITH counts AS (
  SELECT event_type,
         CAST(substr(CAST(CAST(CAST(value AS DECIMAL(28,6)) * 1000000
                          AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS d,
         COUNT(*) AS cnt
  FROM events WHERE value IS NOT NULL AND value > 0
  GROUP BY 1, 2
),
grid AS (
  SELECT t.event_type, g.d
  FROM (SELECT DISTINCT event_type FROM counts) t,
       (SELECT UNNEST(generate_series(1, 9)) AS d) g
),
filled AS (
  SELECT grid.event_type, grid.d, COALESCE(cnt, 0) AS cnt
  FROM grid LEFT JOIN counts USING (event_type, d)
),
tot AS (
  SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n_values
  FROM filled GROUP BY event_type
),
devs AS (
  SELECT f.event_type, tot.n_values,
         abs(CAST(f.cnt AS DOUBLE) / CAST(tot.n_values AS DOUBLE)
             - ({_BENFORD_LIST})[f.d]) AS dev
  FROM filled f JOIN tot USING (event_type)
)
SELECT event_type, MAX(n_values) AS n_values,
       MAX(dev) AS max_abs_dev,
       MAX(dev) <= {BENFORD_FLAG_DEV} AS benford_ok
FROM devs
GROUP BY event_type
"""


ORACLES["table_fingerprint"] = f"""
WITH h AS (
  SELECT CAST(ts AS DATE) AS day,
         {_hex_int_sql(f'md5({_FP_CANON_SQL})', 15)} AS h60
  FROM events
),
agg AS (
  SELECT day,
         COUNT(*) AS n_rows,
         SUM(h60 % {2**20}) AS s0,
         SUM((h60 // {2**20}) % {2**20}) AS s1,
         SUM(h60 // {2**40}) AS s2,
         bit_xor(h60) AS hash_xor,
         MIN(h60) AS hash_min,
         MAX(h60) AS hash_max
  FROM h
  GROUP BY day
)
SELECT day, n_rows,
       CAST(((s0 % {2**60}) + (s1 % {2**40}) * {2**20}
             + (s2 % {2**20}) * {2**40}) % {2**60} AS BIGINT) AS hash_sum,
       hash_xor, hash_min, hash_max
FROM agg
"""


def _ztest_oracle() -> str:
    from .ingest import TELEMETRY_SQL

    # NULLIF guards mirror the Spark path's try_divide: degenerate
    # splits (one operator, all-error / no-error corpus) yield NULL.
    z = (
        "(e / n - (e_tot - e) / NULLIF(n_tot - n, 0))"
        " / NULLIF(sqrt((e_tot / n_tot) * (1.0 - e_tot / n_tot)"
        " * (1.0 / n + 1.0 / NULLIF(n_tot - n, 0))), 0)"
    )
    return f"""
WITH telemetry AS ({TELEMETRY_SQL}),
per_op AS (
  SELECT operator,
         COUNT(*) AS n,
         SUM(CASE WHEN metric = 'error' THEN 1 ELSE 0 END) AS e
  FROM telemetry WHERE operator IS NOT NULL
  GROUP BY operator
),
tot AS (SELECT SUM(n) AS n_tot, SUM(e) AS e_tot FROM per_op)
SELECT operator,
       CAST(n AS BIGINT) AS n_events,
       CAST(e AS BIGINT) AS n_errors,
       CAST(CAST({z} AS DECIMAL(18,9)) AS DOUBLE) AS z_vs_rest,
       abs(CAST(CAST({z} AS DECIMAL(18,9)) AS DOUBLE)) > {ZTEST_CRIT}
         AS significant
FROM per_op CROSS JOIN tot
"""


ORACLES["operator_error_ztest"] = _ztest_oracle()


def _mi_oracle() -> str:
    from .ingest import TELEMETRY_SQL

    return f"""
WITH telemetry AS ({TELEMETRY_SQL}),
cells AS (
  SELECT metric, operator, COUNT(*) AS c_xy
  FROM telemetry WHERE operator IS NOT NULL
  GROUP BY 1, 2
),
cx AS (SELECT metric, CAST(SUM(c_xy) AS BIGINT) AS c_x
       FROM cells GROUP BY 1),
cy AS (SELECT operator, CAST(SUM(c_xy) AS BIGINT) AS c_y
       FROM cells GROUP BY 1),
tot AS (SELECT CAST(SUM(c_xy) AS BIGINT) AS n FROM cells),
j AS (
  SELECT c_xy, c_x, c_y, n
  FROM cells JOIN cx USING (metric) JOIN cy USING (operator)
  CROSS JOIN tot
)
SELECT COUNT(*) AS n_cells,
       MAX(n) AS n_events,
       CAST(SUM(CAST(
         (CAST(c_xy AS DOUBLE) / n)
         * ln((CAST(c_xy AS DOUBLE) * n) / (CAST(c_x AS DOUBLE) * c_y))
       AS DECIMAL(18,9))) AS DOUBLE) AS mi_nats
FROM j
"""


ORACLES["metric_operator_mi"] = _mi_oracle()

def _chi2_oracle() -> str:
    from .ingest import TELEMETRY_SQL

    return f"""
WITH telemetry AS ({TELEMETRY_SQL}),
cells AS (
  SELECT metric, operator, COUNT(*) AS c_xy
  FROM telemetry WHERE operator IS NOT NULL
  GROUP BY 1, 2
),
cx AS (SELECT metric, CAST(SUM(c_xy) AS BIGINT) AS c_x
       FROM cells GROUP BY 1),
cy AS (SELECT operator, CAST(SUM(c_xy) AS BIGINT) AS c_y
       FROM cells GROUP BY 1),
tot AS (SELECT CAST(SUM(c_xy) AS BIGINT) AS n,
               COUNT(DISTINCT metric) AS nx,
               COUNT(DISTINCT operator) AS ny
        FROM cells),
grid AS (
  SELECT cx.metric, cy.operator, c_x, c_y,
         COALESCE(c_xy, 0) AS o, n, nx, ny
  FROM cx CROSS JOIN cy
  LEFT JOIN cells ON cells.metric = cx.metric
                 AND cells.operator = cy.operator
  CROSS JOIN tot
),
staged AS (
  SELECT o, n, nx, ny, CAST(c_x AS DOUBLE) * c_y / n AS e
  FROM grid
),
terms AS (
  SELECT n, nx, ny,
         CAST((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e
              AS DECIMAL(18,9)) AS t
  FROM staged
)
SELECT COUNT(*) AS n_cells,
       MAX(n) AS n_events,
       CAST((MAX(nx) - 1) * (MAX(ny) - 1) AS BIGINT) AS dof,
       CAST(SUM(t) AS DOUBLE) AS chi2,
       CAST(CAST(sqrt(CAST(SUM(t) AS DOUBLE)
            / (MAX(n) * least(MAX(nx) - 1, MAX(ny) - 1)))
            AS DECIMAL(18,9)) AS DOUBLE) AS cramers_v
FROM terms
"""


ORACLES["metric_operator_chi2"] = _chi2_oracle()


ORACLES["table_profile"] = _profile_oracle()

# the oracle keeps the naive per-type single-window spelling ks_drift
# exists to avoid
ORACLES["ks_drift"] = f"""
WITH per_value AS (
  SELECT event_type, value,
         SUM(CASE WHEN ts < TIMESTAMP '{PSI_SPLIT}' THEN 1 ELSE 0 END)
           AS r,
         SUM(CASE WHEN ts < TIMESTAMP '{PSI_SPLIT}' THEN 0 ELSE 1 END)
           AS c
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
),
cum AS (
  SELECT event_type,
         SUM(r) OVER w AS cum_ref,
         SUM(c) OVER w AS cum_cur
  FROM per_value
  WINDOW w AS (PARTITION BY event_type ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
totals AS (
  SELECT event_type, CAST(SUM(r) AS BIGINT) AS n_ref,
         CAST(SUM(c) AS BIGINT) AS n_cur
  FROM per_value GROUP BY 1
  HAVING SUM(r) > 0 AND SUM(c) > 0
),
gap AS (
  SELECT cum.event_type, n_ref, n_cur,
         abs(CAST(cum_ref AS DOUBLE) / n_ref
             - CAST(cum_cur AS DOUBLE) / n_cur) AS g
  FROM cum JOIN totals ON cum.event_type = totals.event_type
),
agg AS (
  SELECT event_type, MAX(n_ref) AS n_ref, MAX(n_cur) AS n_cur,
         MAX(g) AS ks_stat
  FROM gap GROUP BY 1
)
SELECT event_type, n_ref, n_cur, ks_stat,
       CAST(CAST({KS_ALPHA_COEF} * sqrt((CAST(n_ref AS DOUBLE) + n_cur)
            / (CAST(n_ref AS DOUBLE) * n_cur)) AS DECIMAL(18,9))
            AS DOUBLE) AS ks_critical,
       ks_stat > CAST(CAST({KS_ALPHA_COEF}
            * sqrt((CAST(n_ref AS DOUBLE) + n_cur)
            / (CAST(n_ref AS DOUBLE) * n_cur)) AS DECIMAL(18,9))
            AS DOUBLE) AS drifted
FROM agg
"""


# ---------------------------------------------------------------------------
# Traffic burstiness: Fano factor per event type (round 7b)
# ---------------------------------------------------------------------------


def event_burstiness(events: DataFrame) -> DataFrame:
    """Index of dispersion (Fano factor) of per-minute event counts,
    per event type: ``var_pop(c) / mean(c)`` over the type's OBSERVED
    minute buckets (silent minutes are absent, not zero — the metric
    profiles arrival clumping GIVEN activity; gap analysis is
    time_bucket_gapfill's job).  Fano ~ 1 is Poisson traffic; >> 1
    is bursty (retry storms, batch replays) — the one-number screen
    that decides whether error_burst_windows is worth running.

    Scale shape: one map-side-combinable (type, minute) count, then
    a <= types x minutes rollup — both keyed aggregates, no windows,
    no skew (the bucket key spreads any hot type).  Counts and their
    squares accumulate as exact integers; the variance numerator is
    computed in DECIMAL(38,0) (n*s2 - s1^2 overflows int64 past ~1e9
    events/bucket-sum), and the only float ops are the two final
    divides of exact operands, ulp-collapsed at DECIMAL(18,9).
    """
    per = (
        events.groupBy(
            "event_type", F.date_trunc("minute", F.col("ts")).alias("bkt")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = per.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    return agg.selectExpr(
        "event_type",
        "CAST(n_buckets AS BIGINT) AS n_buckets",
        "CAST(s1 AS BIGINT) AS n_events",
        "CAST(CAST(CAST(s1 AS DOUBLE) / n_buckets AS DECIMAL(18,9))"
        " AS DOUBLE) AS mean_per_minute",
        "CAST(CAST(try_divide("
        "CAST(CAST(n_buckets AS DECIMAL(38,0)) * s2"
        " - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE),"
        "CAST(CAST(n_buckets AS DECIMAL(38,0)) * s1 AS DOUBLE))"
        " AS DECIMAL(18,9)) AS DOUBLE) AS fano_factor",
    )


def q_event_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_burstiness(load_table(spark, sf_dir, "events"))


QUERIES["event_burstiness"] = q_event_burstiness

ORACLES["event_burstiness"] = """
WITH per AS (
  SELECT event_type, date_trunc('minute', ts) AS bkt, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
agg AS (
  SELECT event_type, COUNT(*) AS n_buckets,
         SUM(c) AS s1, SUM(c * c) AS s2
  FROM per GROUP BY 1
)
SELECT event_type,
       CAST(n_buckets AS BIGINT) AS n_buckets,
       CAST(s1 AS BIGINT) AS n_events,
       CAST(CAST(CAST(s1 AS DOUBLE) / n_buckets AS DECIMAL(18,9))
            AS DOUBLE) AS mean_per_minute,
       CAST(CAST(
         CAST(CAST(n_buckets AS DECIMAL(38,0)) * s2
              - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE)
         / NULLIF(CAST(CAST(n_buckets AS DECIMAL(38,0)) * s1
                  AS DOUBLE), 0)
         AS DECIMAL(18,9)) AS DOUBLE) AS fano_factor
FROM agg
"""


# ---------------------------------------------------------------------------
# k-anonymity audit (round 7b)
# ---------------------------------------------------------------------------

#: privacy threshold: equivalence classes smaller than K_ANON are
#: re-identification risks.
K_ANON = 5
#: account-balance generalization band width (the generalization step
#: of the quasi-identifier, as a k-anonymization pipeline would apply).
K_ANON_BAL_BAND = 1000.0


def k_anonymity_audit(customer: DataFrame) -> DataFrame:
    """Equivalence-class size histogram under the quasi-identifier
    (nation, market segment, acctbal banded to K_ANON_BAL_BAND):
    for each class SIZE, how many classes and rows share it, and
    whether that size violates k = K_ANON (Sweeney 2002) — the audit
    that decides if a training extract can leave the trust boundary,
    run BEFORE the pii_scrub pass ships it.

    Scale shape: two map-side-combinable groupBys (QI -> class size,
    size -> histogram); the banding floor runs in DECIMAL so bucket
    edges cannot flip on float representation.  Output is bounded by
    the number of DISTINCT class sizes — tiny at any corpus scale.
    """
    cls = (
        customer.selectExpr(
            "c_nationkey",
            "c_mktsegment",
            "CAST(FLOOR(CAST(c_acctbal AS DECIMAL(18,2))"
            f" / {K_ANON_BAL_BAND}) AS BIGINT) AS bal_band",
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.count(F.lit(1)).alias("class_size"))
    )
    return (
        cls.groupBy("class_size")
        .agg(F.count(F.lit(1)).alias("n_classes"))
        .selectExpr(
            "CAST(class_size AS BIGINT) AS class_size",
            "CAST(n_classes AS BIGINT) AS n_classes",
            "CAST(class_size * n_classes AS BIGINT) AS n_rows",
            f"COALESCE(class_size < {K_ANON}, FALSE) AS at_risk",
        )
    )


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return k_anonymity_audit(load_table(spark, sf_dir, "customer"))


QUERIES["k_anonymity_audit"] = q_k_anonymity

ORACLES["k_anonymity_audit"] = f"""
WITH cls AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(CAST(c_acctbal AS DECIMAL(18,2))
              / {K_ANON_BAL_BAND}) AS BIGINT) AS bal_band,
         COUNT(*) AS class_size
  FROM customer GROUP BY 1, 2, 3
)
SELECT CAST(class_size AS BIGINT) AS class_size,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(class_size * COUNT(*) AS BIGINT) AS n_rows,
       COALESCE(class_size < {K_ANON}, FALSE) AS at_risk
FROM cls GROUP BY class_size
"""
