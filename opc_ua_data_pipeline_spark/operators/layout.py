"""Z-order (Morton) layout keys — multi-dimensional data clustering.

The bronze layout (ingest.write_bronze) clusters one dimension per
level: date partitions, then (metric, time) sort — the TimescaleDB
analogue.  Queries that slice on a SECOND dimension (a user, a
device) still scan every file of the date range.  Bit-interleaving
two key columns into one Morton key and range-partition-sorting by it
gives every file a narrow min/max box in BOTH dimensions, so parquet
row-group stats prune either predicate — the standard lakehouse
Z-ORDER, built here from plain integer expressions (no engine
extension needed).

tests/test_layout.py writes the same rows time-sorted vs z-ordered
and measures per-file user_id spans via parquet footers: the z-order
layout's boxes must be materially narrower (that narrowing IS the
pruning win — a predicate on user_id skips files whose box misses it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16


def zorder_key(c1: Column, c2: Column, bits: int = Z_BITS) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    c1 → even bit positions, c2 → odd.  Pure JVM integer arithmetic
    inside codegen; wrap-around of values above 2^bits only loosens
    clustering, never correctness (it is just a sort key)."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        b1 = F.shiftright(c1, i).bitwiseAND(F.lit(1)).cast("bigint")
        b2 = F.shiftright(c2, i).bitwiseAND(F.lit(1)).cast("bigint")
        z = z + b1 * F.lit(1 << (2 * i)) + b2 * F.lit(1 << (2 * i + 1))
    return z


def _norm(c: Column, lo: Column, hi: Column, bits: int = Z_BITS) -> Column:
    """Min-max scale a dimension onto [0, 2^bits): interleaving only
    clusters if both dimensions occupy the SAME bit range — raw
    (user_id ∈ 2^8, epoch_minute ∈ 2^25) would let the wider
    dimension's high bits own the sort entirely.  One multiply and
    one divide, written in the same order as the SQL oracle so the
    doubles (and their floor) are engine-identical."""
    span = F.when(hi == lo, F.lit(1)).otherwise(hi - lo)
    return F.floor(
        ((c - lo).cast("double") * ((1 << bits) - 1)) / span.cast("double")
    ).cast("bigint")


def _events_with_zkey(events: DataFrame) -> DataFrame:
    minute = (F.unix_micros("ts") / F.lit(60_000_000)).cast("bigint")
    ev = events.withColumn("epoch_minute", minute)
    bounds = ev.agg(
        F.min("user_id").alias("u_lo"),
        F.max("user_id").alias("u_hi"),
        F.min("epoch_minute").alias("m_lo"),
        F.max("epoch_minute").alias("m_hi"),
    )
    ev = ev.crossJoin(F.broadcast(bounds))
    return ev.withColumn(
        "zkey",
        zorder_key(
            _norm(F.col("user_id"), F.col("u_lo"), F.col("u_hi")),
            _norm(F.col("epoch_minute"), F.col("m_lo"), F.col("m_hi")),
        ),
    )


def events_zorder(events: DataFrame) -> DataFrame:
    """Morton key over (user_id, epoch-minute) for the event stream —
    the two dimensions its queries actually slice on."""
    return _events_with_zkey(events).select(
        "event_id", "user_id", "epoch_minute", "zkey"
    )


def write_zordered(
    events: DataFrame, path: str, n_files: int = 8
) -> None:
    """Range-partition by the Morton key and sort within partitions —
    each output file covers one contiguous Z-range, i.e. a small
    rectangle in (user, time) space."""
    (
        _events_with_zkey(events)
        .repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey", "u_lo", "u_hi", "m_lo", "m_hi", "epoch_minute")
        .write.mode("overwrite")
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# Driver-contract query + oracle (the key computation itself)
# ---------------------------------------------------------------------------


def q_zorder_keys(spark, sf_dir: str):
    from ..tables import load_table

    return events_zorder(load_table(spark, sf_dir, "events"))


QUERIES = {"zorder_keys": q_zorder_keys}

_Z_SQL = " + ".join(
    f"(((un >> {i}) & 1) * {1 << (2 * i)})"
    f" + (((mn >> {i}) & 1) * {1 << (2 * i + 1)})"
    for i in range(Z_BITS)
)

_MAXV = (1 << Z_BITS) - 1

ORACLES = {
    "zorder_keys": f"""
WITH ev AS (
  SELECT event_id, user_id,
         CAST(FLOOR(epoch_us(ts) / 60000000.0) AS BIGINT) AS epoch_minute
  FROM events
),
b AS (
  SELECT MIN(user_id) AS u_lo, MAX(user_id) AS u_hi,
         MIN(epoch_minute) AS m_lo, MAX(epoch_minute) AS m_hi
  FROM ev
),
n AS (
  SELECT event_id, user_id, epoch_minute,
         CAST(FLOOR((CAST(user_id - u_lo AS DOUBLE) * {_MAXV})
                    / CAST(CASE WHEN u_hi = u_lo THEN 1
                                ELSE u_hi - u_lo END AS DOUBLE))
              AS BIGINT) AS un,
         CAST(FLOOR((CAST(epoch_minute - m_lo AS DOUBLE) * {_MAXV})
                    / CAST(CASE WHEN m_hi = m_lo THEN 1
                                ELSE m_hi - m_lo END AS DOUBLE))
              AS BIGINT) AS mn
  FROM ev CROSS JOIN b
)
SELECT event_id, user_id, epoch_minute, CAST({_Z_SQL} AS BIGINT) AS zkey
FROM n
""",
}
