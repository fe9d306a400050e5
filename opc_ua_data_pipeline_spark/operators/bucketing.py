"""Bucketed (co-located) joins — pre-shuffled table layout.

The reference's TimescaleDB keeps `opcua_data` clustered by
(metric, time) inside chunks (database/init.sql hypertable +
index DDL), so its repeated per-metric queries never re-sort.  The
lake-side analogue for *joins* is bucketing: both tables are written
pre-hash-partitioned (and pre-sorted) on the join key, so every
subsequent join/aggregation on that key is exchange-free — the
SortMergeJoin reads co-located buckets directly.

At 100 TB this is the difference between shuffling the fact table
once per query and shuffling it once per *ingest*: a fact table
joined daily against N dimensions on the same key amortizes its one
bucketed write across every downstream join.  Rules of thumb baked
in below:

* bucket count should be sized so one bucket ≈ one task's worth of
  data (``n_buckets ~ table_bytes / 128 MiB``), and both sides of a
  join must use the SAME count (or an integer multiple, with AQE
  bucket coalescing) for the exchange to be elided;
* ``sortBy(key)`` inside buckets removes the Sort nodes too, leaving
  a pure merge-join — and doubles as row-group min/max clustering
  for key-predicate scans;
* bucketed tables must be written via ``saveAsTable`` (metastore
  records the bucket spec; plain parquet paths lose it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by ``key``.

    ``path`` makes the table external (useful in tests / non-default
    warehouses); bucket metadata lives in the session catalog either
    way.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.

    With matching bucket specs Catalyst plans a SortMergeJoin whose
    children are bare scans — no ShuffleExchange, no Sort (when the
    tables are also sortBy'd).  The ``merge`` hint pins that shape:
    bucketing targets big⋈big joins, where SMJ is what the planner
    picks anyway — on small test data it would prefer a broadcast
    (which ignores bucket layout entirely).  tests/test_bucketing.py
    locks the exchange-free plan and value-equality with the plain
    join.
    """
    return spark.table(left_table).hint("merge").join(
        spark.table(right_table), key
    )
