"""Distributed bounded-frame windows over low-cardinality keys.

A bare ``Window.partitionBy(key)`` with ~5 distinct keys funnels ~1/5
of the fact table through ONE task's sort at any scale — the defect
class the round-4/5 de-skews eliminated from the hyperfunctions, CUSUM
and dominance modules.  Those fixes used (key, day) partitions with
boundary carries, which works for PREFIX aggregates (running sum/min:
the carry is a constant-size per-day offset) but not for bounded ROW
frames: a trailing-50 frame crossing a sparse day boundary needs the
actual 50 previous ROWS, and a carry of "the last 50 rows of the
previous day" silently breaks when a day holds fewer than 50 rows.

This module implements the fully general decomposition:

1. a global per-key row number via the distributed two-pass rank:
   assign each row a DETERMINISTIC bucket id (see below), compute a
   local row_number within (key, bucket), then broadcast the
   per-(key, bucket) counts back as prefix offsets;
2. fixed-size buckets of ``bucket_rows`` consecutive rows per key.
   Every bucket except a key's LAST is full by construction — the
   invariant that makes adjacent-bucket carries sufficient, which
   day-based bucketing cannot guarantee;
3. row replication only at bucket edges: the last ``before`` rows of
   each bucket are copied into the next bucket, the first ``after``
   rows into the previous one (``before``/``after`` = the frame's
   preceding/following extent), so edge overhead is
   (before+after)/bucket_rows — ~1% at the defaults;
4. ONE window pass partitioned by (key, bucket) — partition size is
   bounded by bucket_rows + before + after REGARDLESS of key
   cardinality or time density — computing the caller's frame
   expressions; carried copies are dropped afterwards.

**The deterministic bucket id (round 7).**  The round-6 form stamped
``spark_partition_id()`` after a ``repartitionByRange`` and had to
``localCheckpoint`` the stamped frame: the big side (local windows)
and the tiny side (per-bucket counts) are separate plan branches, and
without materialization AQE / range re-sampling could hand them
DIFFERENT partition ids — 5,335/100,000 silently shifted rows at
sf0.1 in the round-6 post-mortem.  Materializing was correct but
wrote the full fact table to local disk once per operator call
(+0.7..+1.6 s warm on every caller).  The two-pass rank's actual
requirement is much weaker than range partitioning: the bucket id
only has to be (a) a deterministic function of the row and (b)
MONOTONE in the order columns within each key.  So round 7 samples
quantile cutpoints of the FIRST order column ONCE, driver-side
(``percentile_approx``, one bounded aggregate over a single pruned
column), embeds them as literals, and computes the bucket id as a
pure column expression — branch-consistent by construction, no
materialization, no range shuffle (the (key, bucket) window's hash
exchange is the only shuffle the big side pays).  Ties and NULLs
share a bucket with their order-equal peers (monotone non-strict is
sufficient: the within-bucket window orders by the FULL order-column
list); heavy ties degrade parallelism, never correctness.

The result is bit-identical to the single-window form whenever the
frame aggregates are insensitive to intra-frame order (counts, decimal
sums, min/max, collect_list normalized by array_sort): every surviving
row sees exactly the frame rows it would in the global per-key sort.
The oracles of the operators built on this module (rolling_zscore,
hampel_despike, deviation/edge alarms) deliberately stay in the naive
single-window SQL spelling, so the driver's hash compare re-proves the
equivalence on every run.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import reduce

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from ..functions.materialize import materialize

#: Rows per (key, bucket) window partition.  Big enough that edge
#: replication is noise, small enough that a partition (bucket_rows +
#: carries rows) always fits one task comfortably.
BUCKET_ROWS = 4096

#: Number of quantile cutpoints sampled for the deterministic bucket
#: id (so up to RANGE_PARTS buckets).  On a real cluster this scales
#: with input volume; the per-(key, bucket) window only needs enough
#: buckets that no single task funnels a whole key.
RANGE_PARTS = 64

#: percentile_approx accuracy for the cutpoint sample — boundaries
#: only balance the buckets, they never affect correctness, so a
#: coarse (cheap) sketch is plenty.
_PCT_ACCURACY = 1000
#: fraction of rows feeding the cutpoint sketch (the balance sample)
_CUT_SAMPLE_FRAC = 0.02

_PID = "_dw_pid"
_LRN = "_dw_lrn"
_CNT = "_dw_cnt"
_OFF = "_dw_off"
_BKT = "_dw_bkt"
_NATIVE = "_dw_native"

#: (name, ascending) order spec — ``str`` alone means ascending.
OrderSpec = "str | tuple[str, bool]"


def _specs(order_by) -> list[tuple[str, bool]]:
    return [(s, True) if isinstance(s, str) else (s[0], bool(s[1])) for s in order_by]


def _order_cols(specs: list[tuple[str, bool]]) -> list[Column]:
    return [F.col(n) if asc else F.col(n).desc() for n, asc in specs]


def _probe(dtype: str):
    """Order-preserving numeric probe for quantile sampling + bucket
    comparison, or None when the dtype has no cheap quantile path
    (the caller then falls back to the materialized-pid form).

    Strings map to their first 7 UTF-8 bytes read big-endian as a
    bigint (hex + right-pad-to-14 + base-16 conv): Spark's default
    UTF8_BINARY collation compares byte-wise, so the projection is
    monotone NON-STRICT in the string order — exactly the bucket-id
    requirement (ties merge into one bucket; the within-bucket window
    still orders by the full column list)."""
    if dtype in ("timestamp", "timestamp_ntz"):
        return F.unix_micros
    if dtype == "date":
        return F.unix_date
    if dtype in ("tinyint", "smallint", "int", "bigint", "float", "double") or dtype.startswith("decimal"):
        return lambda c: c.cast("double")
    if dtype == "string":
        return lambda c: F.conv(
            F.rpad(F.substring(F.hex(F.encode(c, "UTF-8")), 1, 14), 14, "0"),
            16,
            10,
        ).cast("bigint")
    return None


#: Minimum SAMPLED row count for the thin cutpoint sketch to be
#: trusted.  Below it (input smaller than ~_MIN_SAMPLE_ROWS /
#: _CUT_SAMPLE_FRAC rows) the full scan is both cheap and exact, so
#: fall back.  Above it, the sampled cuts are accepted AS-IS even when
#: heavy ties yield few distinct cuts: the full data could not produce
#: more cuts either (the tie values dominate every quantile), so the
#: round-7 distinct-cut-count gate paid a permanent sketch + full-scan
#: DOUBLE pass for exactly that input shape, with no size bound.
_MIN_SAMPLE_ROWS = 512


def sample_cutpoints(
    df: DataFrame, order_by: list, parts: int = RANGE_PARTS
) -> dict:
    """Bucket-id cutpoints for SEVERAL order columns in ONE Spark job.

    ``order_by`` entries are column names or ``(name, ascending)``
    tuples (direction is ignored here — cutpoints are
    direction-independent; only the bucket-id comparison flips).
    Returns ``{column_name: sorted cutpoint list}``; columns whose
    dtype has no numeric probe are omitted (callers fall back to the
    materialized-pid form for those).

    Operators that run multiple rank passes over the SAME frame
    (quantile_normalize_scores: two; rfm_segments: three axes) pay
    the cutpoint-sketch job once per pass if each
    :func:`keyed_running_totals` call samples on its own; computing
    every axis's cutpoints in one aggregate and passing them through
    ``cuts=`` collapses those driver-triggered jobs into one.
    """
    names = []
    probes = {}
    for name, _asc in _specs(order_by):
        dtype = dict(df.dtypes).get(name)
        probe = _probe(dtype) if dtype else None
        if probe is not None and name not in probes:
            names.append(name)
            probes[name] = probe
    if not names:
        return {}
    qs = [i / parts for i in range(1, parts)]

    def _cuts_of(frame: DataFrame) -> tuple[dict, int]:
        row = frame.select(
            F.count(F.lit(1)).alias("_n"),
            *[
                F.percentile_approx(
                    probes[n](F.col(n)), F.lit(qs), F.lit(_PCT_ACCURACY)
                ).alias(f"_q_{i}")
                for i, n in enumerate(names)
            ],
        ).first()
        out = {
            n: sorted({v for v in (row[f"_q_{i}"] or []) if v is not None})
            for i, n in enumerate(names)
        }
        return out, row["_n"]

    # Sketch over a sample, Spark-RangePartitioner-style: cutpoint
    # QUALITY only affects bucket balance, never correctness (any
    # monotone bucket function is valid), and the per-row sketch
    # update — not the scan — dominated the full pass (measured ~5x
    # a min/max agg at sf0.1).  Tiny inputs (too few sampled rows for
    # the sketch to be representative) fall back to the full scan,
    # which is cheap exactly there.
    cuts, n_sampled = _cuts_of(df.sample(fraction=_CUT_SAMPLE_FRAC, seed=7))
    if n_sampled < _MIN_SAMPLE_ROWS:
        cuts, _ = _cuts_of(df)
    return cuts


def bucket_id_from_cuts(
    name: str, asc: bool, probe, cuts: list
) -> Column:
    """Pure-column bucket id = ``#cutpoints passed`` along the order
    direction.  NULL order values coalesce to the first bucket of the
    order direction (Spark's ASC NULLS FIRST / DESC NULLS LAST window
    default), keeping monotonicity."""
    if not cuts:
        # empty / all-NULL / single-value input: one bucket
        return F.lit(0)
    c = probe(F.col(name))
    if asc:
        terms = [(c > F.lit(v)).cast("int") for v in cuts]
        null_bucket = 0  # ASC NULLS FIRST
    else:
        terms = [(c < F.lit(v)).cast("int") for v in cuts]
        null_bucket = len(cuts)  # DESC NULLS LAST
    return F.coalesce(reduce(lambda a, b: a + b, terms), F.lit(null_bucket))


def deterministic_bucket_id(
    df: DataFrame,
    first_order: tuple[str, bool],
    parts: int,
    cuts: list | None = None,
) -> Column | None:
    """Bucket-id column for the two-pass rank, from cutpoints sampled
    ONCE driver-side (or supplied precomputed via ``cuts`` — see
    :func:`sample_cutpoints`).

    Returns None when the first order column's type has no numeric
    probe; callers fall back to the materialized
    ``spark_partition_id`` form.
    """
    name, asc = first_order
    dtype = dict(df.dtypes).get(name)
    probe = _probe(dtype) if dtype else None
    if probe is None:
        return None
    if cuts is None:
        cuts = sample_cutpoints(df, [(name, asc)], parts).get(name, [])
    return bucket_id_from_cuts(name, asc, probe, cuts)


def _attach_pid(
    df: DataFrame,
    first_order: tuple[str, bool],
    parts: int,
    cuts: list | None = None,
) -> DataFrame:
    """``df`` + the deterministic ``_dw_pid`` bucket column; falls
    back to the round-6 materialized spark_partition_id form (range
    shuffle + localCheckpoint — correct, just more expensive) for
    order types without a quantile probe."""
    bucket = deterministic_bucket_id(df, first_order, parts, cuts)
    if bucket is not None:
        return df.withColumn(_PID, bucket)
    name, asc = first_order
    ranged = df.repartitionByRange(
        parts, F.col(name) if asc else F.col(name).desc()
    )
    # spark_partition_id is only meaningful for ONE physical
    # execution; materialize so the window branch and the counts
    # branch see the SAME ids (round-6 post-mortem in PERF.md).  At
    # cluster scale swap for persist() to survive executor loss.
    return ranged.withColumn(_PID, F.spark_partition_id()).transform(materialize)


def _join_back(
    big: DataFrame, tiny: DataFrame, key_cols: list[str], keep: list[str]
) -> DataFrame:
    """Broadcast-join ``tiny``'s ``keep`` columns onto ``big`` on
    (key_cols, _dw_pid) — NULL-SAFE on the keys: a nullable partition
    key (e.g. operator) forms a real per-NULL group in window
    semantics, and a plain equi-join would silently drop those rows.
    """
    b, t = big.alias("_dw_b"), tiny.alias("_dw_t")
    cond = F.col(f"_dw_b.{_PID}") == F.col(f"_dw_t.{_PID}")
    for c in key_cols:
        cond = cond & F.col(f"_dw_b.{c}").eqNullSafe(F.col(f"_dw_t.{c}"))
    return b.join(F.broadcast(t), cond).select(
        "_dw_b.*", *[F.col(f"_dw_t.{c}") for c in keep]
    )


def _key_part(key_cols: list[str]) -> list[Column]:
    """Partition expressions for the tiny offsets-table windows.
    ``key_cols=[]`` means a GLOBAL rank; a constant-VALUED partition
    keeps the (range_parts-row) window plan out of the 'No Partition
    Defined' warning channel, which this repo treats as a true
    single-task-funnel regression signal.  It must be constant in
    value but NOT foldable — Catalyst constant-folds a bare
    ``lit(0)`` out of the partition spec, resurrecting the warning —
    so the spelling is ``pmod(_dw_pid, 1)``: depends on a column
    (survives the optimizer), evaluates to 0 on every row (single
    group, identical semantics).  Every caller applies it to the
    counts table, which always carries ``_dw_pid``."""
    return [F.col(c) for c in key_cols] or [F.pmod(F.col(_PID), F.lit(1))]


def attach_keyed_row_number(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    range_parts: int = RANGE_PARTS,
    rn_col: str = "_rn",
    cuts: list | None = None,
) -> DataFrame:
    """``df`` + a global per-key row number, with NO per-key sort task.

    ``order_cols`` must totalize the order within a key (include a
    unique id) so the numbering — and everything built on it — is
    deterministic.  ``key_cols=[]`` gives a GLOBAL row number (still
    no single-task sort anywhere).  ``cuts``: precomputed bucket
    cutpoints for ``order_cols[0]`` (see :func:`sample_cutpoints`) —
    skips the per-call sketch job.
    """
    base = _attach_pid(df, (order_cols[0], True), range_parts, cuts)
    w_local = Window.partitionBy(*key_cols, _PID).orderBy(*order_cols)
    local = base.withColumn(_LRN, F.row_number().over(w_local))
    # tiny table: #keys x range_parts rows
    counts = base.groupBy(*key_cols, _PID).agg(
        F.count(F.lit(1)).alias(_CNT)
    )
    w_off = (
        Window.partitionBy(*_key_part(key_cols))
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        *key_cols,
        _PID,
        F.coalesce(F.sum(_CNT).over(w_off), F.lit(0)).alias(_OFF),
    )
    return (
        _join_back(local, offsets, key_cols, [_OFF])
        .withColumn(rn_col, F.col(_OFF) + F.col(_LRN))
        .drop(_PID, _LRN, _OFF)
    )


def _explode_bucket_assignments(
    base: DataFrame, bucket_rows: int, before: int, after: int
) -> DataFrame:
    """``base`` (carrying ``_rn``) -> one row per (row, bucket)
    assignment with ``_dw_bkt``/``_dw_native`` set: its own bucket
    (native), plus carry copies into the next bucket (last ``before``
    rows) and the previous one (first ``after`` rows).

    ONE pass: each row emits its 1-3 assignments through an
    array-explode.  The round-6 spelling unioned three FILTERED COPIES
    of ``base``, which re-executed the whole rank pipeline (scan +
    window + broadcast join) once per branch — the union was 3x the
    work of the plan it assembled (measured on deviation_alarms after
    the checkpoint that used to hide it was removed).
    """
    li = F.expr(f"(_rn - 1) % {bucket_rows}")
    bkt = F.expr(f"(_rn - 1) DIV {bucket_rows}")
    assigns = [F.struct(bkt.alias("b"), F.lit(True).alias("n"))]
    if before > 0:
        assigns.append(
            F.when(
                li >= bucket_rows - before,
                F.struct((bkt + 1).alias("b"), F.lit(False).alias("n")),
            )
        )
    if after > 0:
        assigns.append(
            F.when(
                (li < after) & (bkt > 0),
                F.struct((bkt - 1).alias("b"), F.lit(False).alias("n")),
            )
        )
    arr = F.filter(F.array(*assigns), lambda x: x.isNotNull())
    return (
        base.withColumn("_dw_a", F.explode(arr))
        .withColumn(_BKT, F.col("_dw_a.b"))
        .withColumn(_NATIVE, F.col("_dw_a.n"))
        .drop("_dw_a")
    )


def bounded_frame_apply(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    lo: int,
    hi: int,
    exprs: dict[str, Callable[[WindowSpec], Column]],
    bucket_rows: int = BUCKET_ROWS,
    range_parts: int = RANGE_PARTS,
    cuts: list | None = None,
) -> DataFrame:
    """Evaluate bounded-frame window expressions per key, de-skewed.

    ``exprs`` maps output column name -> fn(window_spec) -> Column,
    where the window spec is ordered by the global row number with
    ``rowsBetween(lo, hi)``; each callable should close over the row
    columns it aggregates (e.g. ``lambda w: F.count(F.lit(1)).over(w)``).

    Returns ``df``'s columns plus the expression columns (and keeps
    ``_rn`` out of the result).
    """
    before, after = max(0, -lo), max(0, hi)
    if bucket_rows < max(before, after, 1):
        raise ValueError(
            f"bucket_rows={bucket_rows} must cover the frame extent "
            f"(before={before}, after={after})"
        )
    base = attach_keyed_row_number(
        df, key_cols, order_cols, range_parts, cuts=cuts
    )
    unioned = _explode_bucket_assignments(base, bucket_rows, before, after)
    w = (
        Window.partitionBy(*key_cols, _BKT)
        .orderBy("_rn")
        .rowsBetween(lo, hi)
    )
    out = unioned.select(
        "*", *[fn(w).alias(name) for name, fn in exprs.items()]
    )
    return out.filter(F.col(_NATIVE)).drop("_rn", _BKT, _NATIVE)


def trailing_frame_sums(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    n_prev: int,
    sums: dict[str, Column],
    count_col: str = "n_prev",
    bucket_rows: int = BUCKET_ROWS,
    range_parts: int = RANGE_PARTS,
    cuts: list | None = None,
) -> DataFrame:
    """Trailing rows-frame (-n_prev .. -1) COUNT(*) and SUMs in
    O(1)/row — the prefix-difference form of
    :func:`bounded_frame_apply` for sum-like aggregates.

    A bounded ROWS frame makes Spark RE-AGGREGATE the frame for every
    row (O(frame)/row: a 50-row trailing sum over 10⁹ rows costs
    5·10¹⁰ adds per expression).  Sums are invertible, so this
    evaluates each as a difference of two UNBOUNDED-PRECEDING running
    sums — which Spark maintains incrementally — read back with
    ``lag(1)`` and ``lag(n_prev+1)``: same bucket + carry
    construction, O(1)/row regardless of frame width.

    Semantics match the window spelling exactly: ``count_col`` counts
    ROWS in the frame (NULLs hold their slot); each sum skips NULL
    inputs and is NULL when the frame holds no non-NULL input (the
    SQL SUM-over-frame contract), reconstructed from a parallel
    non-NULL-count prefix.  Exactness requires sum inputs on a
    decimal grid (exact subtraction) — cast before passing.
    """
    before = n_prev
    if bucket_rows < max(before, 1):
        raise ValueError(
            f"bucket_rows={bucket_rows} must cover n_prev={n_prev}"
        )
    base = attach_keyed_row_number(
        df, key_cols, order_cols, range_parts, cuts=cuts
    )
    unioned = _explode_bucket_assignments(base, bucket_rows, before, 0)
    wp = Window.partitionBy(*key_cols, _BKT).orderBy("_rn")
    wcum = wp.rowsBetween(Window.unboundedPreceding, 0)
    prefix_exprs = {"_tp_cnt": F.count(F.lit(1)).over(wcum)}
    for name, col in sums.items():
        prefix_exprs[f"_tp_s_{name}"] = F.sum(col).over(wcum)
        prefix_exprs[f"_tp_n_{name}"] = F.count(col).over(wcum)
    staged = unioned.select(
        "*", *[e.alias(k) for k, e in prefix_exprs.items()]
    )

    def _diff(c: str) -> Column:
        return F.coalesce(F.lag(c, 1).over(wp), F.lit(0)) - F.coalesce(
            F.lag(c, before + 1).over(wp), F.lit(0)
        )

    out_cols = [_diff("_tp_cnt").alias(count_col)]
    for name in sums:
        out_cols.append(
            F.when(_diff(f"_tp_n_{name}") > 0, _diff(f"_tp_s_{name}"))
            .alias(name)
        )
    out = staged.select("*", *out_cols)
    drop = ["_rn", _BKT, _NATIVE] + [
        c for c in staged.columns if c.startswith("_tp_")
    ]
    return out.filter(F.col(_NATIVE)).drop(*drop)


def keyed_running_totals(
    df: DataFrame,
    key_cols: list[str],
    order_by: list,
    weights: dict[str, str] | None = None,
    range_parts: int = RANGE_PARTS,
    rank_col: str = "_rank",
    n_col: str = "_n",
    cuts: list | None = None,
) -> DataFrame:
    """Per-key rank + inclusive running totals with NO per-key sort.

    The prefix-aggregate sibling of :func:`bounded_frame_apply` for
    low-cardinality keys: running sums decompose into (local running
    sum within a bucket) + (a broadcast offset of the preceding
    buckets' totals), so no carries are needed at all.

    ``order_by`` entries are either a column name (ascending) or a
    ``(name, ascending)`` tuple and must totalize the order within a
    key — the structured spec (rather than Column exprs) is what lets
    the deterministic bucket id know the first column's direction.
    ``weights`` maps output column -> integer input column; each gets
    an INCLUSIVE running total.  Also emits ``rank_col`` (1-based
    per-key rank) and ``n_col`` (the key's total row count).  All
    sums are plain integer arithmetic — associative, so the totals
    are bit-identical to the single-window spelling the oracles keep.
    """
    weights = weights or {}
    specs = _specs(order_by)
    order_exprs = _order_cols(specs)
    base = _attach_pid(df, specs[0], range_parts, cuts)
    w_local = (
        Window.partitionBy(*key_cols, _PID)
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_rn = Window.partitionBy(*key_cols, _PID).orderBy(*order_exprs)
    local = base.select(
        "*",
        F.row_number().over(w_rn).alias(_LRN),
        *[
            F.sum(src).over(w_local).alias(f"_dw_lw_{out}")
            for out, src in weights.items()
        ],
    )
    counts = base.groupBy(*key_cols, _PID).agg(
        F.count(F.lit(1)).alias(_CNT),
        *[
            F.sum(src).alias(f"_dw_tw_{out}")
            for out, src in weights.items()
        ],
    )
    w_off = (
        Window.partitionBy(*_key_part(key_cols))
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy(*_key_part(key_cols))
    offsets = counts.select(
        *key_cols,
        _PID,
        F.coalesce(F.sum(_CNT).over(w_off), F.lit(0)).alias(_OFF),
        F.sum(_CNT).over(w_tot).alias(n_col),
        *[
            F.coalesce(F.sum(f"_dw_tw_{out}").over(w_off), F.lit(0)).alias(
                f"_dw_ow_{out}"
            )
            for out in weights
        ],
    )
    out_df = _join_back(
        local,
        offsets,
        key_cols,
        [_OFF, n_col, *[f"_dw_ow_{out}" for out in weights]],
    ).select(
        "*",
        (F.col(_OFF) + F.col(_LRN)).alias(rank_col),
        *[
            (F.col(f"_dw_ow_{out}") + F.col(f"_dw_lw_{out}")).alias(out)
            for out in weights
        ],
    )
    drop = [_PID, _LRN, _OFF] + [
        c for out in weights for c in (f"_dw_lw_{out}", f"_dw_tw_{out}", f"_dw_ow_{out}")
        if c in out_df.columns
    ]
    return out_df.drop(*drop)


def keyed_prefix_last(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    out_col: str,
    range_parts: int = RANGE_PARTS,
    cuts: list | None = None,
) -> DataFrame:
    """Per-key running LAST(value IGNORE NULLS) — LOCF/latch semantics
    — with no per-key sort.

    A "last non-null so far" prefix is associative: the global value
    at any row is COALESCE(last non-null within this bucket so far,
    last non-null of all PRECEDING buckets).  So the decomposition is
    the keyed_running_totals two-pass with the sum replaced by (a) a
    local running last(ignorenulls) and (b) a tiny per-(key, bucket)
    table holding each bucket's final non-null value — max_by over an
    order struct that is NULL on null-valued rows, which max_by
    ignores — prefixed per key with a last(ignorenulls) over bucket
    ids and broadcast back.
    """
    base = _attach_pid(df, (order_cols[0], True), range_parts, cuts)
    w_local = (
        Window.partitionBy(*key_cols, _PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = base.withColumn(
        "_dw_loc", F.last(value_col, ignorenulls=True).over(w_local)
    )
    ord_struct = F.when(
        F.col(value_col).isNotNull(), F.struct(*[F.col(c) for c in order_cols])
    )
    finals = base.groupBy(*key_cols, _PID).agg(
        F.max_by(value_col, ord_struct).alias("_dw_fin")
    )
    w_prev = (
        Window.partitionBy(*_key_part(key_cols))
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = finals.select(
        *key_cols,
        _PID,
        F.last("_dw_fin", ignorenulls=True).over(w_prev).alias("_dw_carry"),
    )
    return (
        _join_back(local, offsets, key_cols, ["_dw_carry"])
        .withColumn(
            out_col, F.coalesce(F.col("_dw_loc"), F.col("_dw_carry"))
        )
        .drop(_PID, "_dw_loc", "_dw_carry")
    )


def ntile_expr(rank: Column, n: Column, k: int) -> Column:
    """Closed-form NTILE(k) from (per-key rank, per-key count): the
    first n%k buckets take ceil(n/k) rows, the rest floor(n/k) —
    exactly Spark's/DuckDB's NTILE — so staging needs NO window at
    all once the de-skewed rank exists.  Double divisions of counts
    < 2^52 truncate exactly (value_rank_profile's quartile bound);
    the q=0 guard covers keys with fewer rows than buckets (each row
    its own bucket, per NTILE semantics)."""
    q = (n / k).cast("long")
    rem = n % k
    big = rem * (q + 1)
    return (
        F.when(rank <= big, ((rank - 1) / (q + 1)).cast("long") + 1)
        .otherwise(
            rem
            + ((rank - big - 1) / F.greatest(q, F.lit(1))).cast("long")
            + 1
        )
        .cast("int")
    )
