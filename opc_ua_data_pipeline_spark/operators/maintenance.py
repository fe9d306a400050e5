"""Table maintenance — compaction and retention for the bronze layout.

Streaming appends (30 s triggers, K3) produce one small file per
micro-batch per partition; at 100 TB that is millions of files whose
footer/open overhead dominates scan time long before data volume does.
The reference's TimescaleDB handles this internally (chunk files);
a parquet lake needs an explicit compactor.

Both jobs are idempotent and partition-at-a-time (bounded memory, safe
to parallelize across partitions / schedule alongside the stream,
which only ever appends new files)."""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 128 * 1024 * 1024


def _dir_size(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def compact_partition(
    spark: SparkSession,
    table_path: str,
    partition: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> int:
    """Rewrite one `date=...` partition into ceil(size/target) files,
    keeping the (metric, time) sort that stands in for the secondary
    index.  Writes to a sibling temp dir then swaps — readers see
    either the old or the new file set, never a mix."""
    src = os.path.join(table_path, partition)
    n_files = math.ceil(max(_dir_size(src), 1) / target_file_bytes)
    tmp = src + "._compacting"
    (
        spark.read.parquet(src)
        .repartition(n_files)
        .sortWithinPartitions("metric", "time")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    old = src + "._old"
    os.rename(src, old)
    os.rename(tmp, src)
    shutil.rmtree(old)
    return n_files


def compact(spark: SparkSession, table_path: str, **kw) -> dict[str, int]:
    """Compact every date partition; returns {partition: n_files}."""
    return {
        p: compact_partition(spark, table_path, p, **kw)
        for p in sorted(os.listdir(table_path))
        if p.startswith("date=")
    }


def expire_partitions(table_path: str, keep_days: int, today: str) -> list[str]:
    """Retention: drop date partitions older than `keep_days` before
    `today` (YYYY-MM-DD) — partition-level deletes are O(1) metadata
    ops, the reason the layout partitions on the retention key."""
    import datetime

    cutoff = datetime.date.fromisoformat(today) - datetime.timedelta(days=keep_days)
    dropped = []
    for p in sorted(os.listdir(table_path)):
        if not p.startswith("date="):
            continue
        if datetime.date.fromisoformat(p.split("=", 1)[1]) < cutoff:
            shutil.rmtree(os.path.join(table_path, p))
            dropped.append(p)
    return dropped


def backfill_partitions(
    spark: SparkSession, df, table_path: str
) -> list[str]:
    """Idempotent backfill: rewrite ONLY the date partitions present in
    ``df`` (dynamic partition overwrite), leaving every other
    partition's files byte-untouched — the reprocessing primitive a
    lake needs when late or corrected data arrives for specific days
    (the reference's INSERT-only agent has no answer to corrections;
    a TimescaleDB operator would UPDATE the chunk).

    Replays are safe: running the same backfill twice converges to the
    same partition contents (mode is overwrite per touched partition,
    not append).  At 100 TB the overwrite unit is one day's partition
    — bounded work regardless of table size, parallel across days.

    ``df`` must carry the telemetry columns; the `date` partition key
    is derived exactly as write_bronze derives it.
    """
    out = (
        df.withColumn("date", F.to_date("time"))
        .repartition("date")
        .sortWithinPartitions("metric", "time")
    )
    days = sorted(
        str(r[0]) for r in out.select("date").distinct().collect()
    )  # driver sees #touched-days rows, bounded by the backfill window
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("date")
        .parquet(table_path)
    )
    return days


def upsert_partitions(
    spark: SparkSession,
    updates,
    table_path: str,
    key_cols: tuple[str, ...] = ("event_id",),
) -> list[str]:
    """CDC upsert — MERGE INTO as copy-on-write at day granularity,
    the correction primitive between append (write_bronze) and full
    backfill (backfill_partitions): update rows WIN over existing rows
    that share their key; new keys insert; every untouched partition's
    files stay byte-identical.

    Mechanics: the touched days are read back (partition-pruned scan),
    existing rows whose key appears in the update set are dropped via
    a left-anti join against the (broadcastable, update-sized) key
    set, the survivors union the updates, and ONLY those day
    partitions are dynamically overwritten.  Work is bounded by the
    touched days regardless of table size, and replaying the same
    upsert converges (idempotent, like backfill).

    Scope contract: a key's corrected row must stay in its original
    day partition (``time`` corrections within the day are fine).  A
    cross-day move would need a delete in the old partition — at lake
    scale that is a deletion-vector/Delta-Merge feature, deliberately
    out of scope for a partition-granular copy-on-write.
    """
    up = updates.withColumn("date", F.to_date("time"))
    days = sorted(
        str(r[0]) for r in up.select("date").distinct().collect()
    )  # driver sees #touched-days rows, bounded by the update window
    existing = spark.read.parquet(table_path).filter(
        F.col("date").cast("string").isin(days)
    )
    keys = up.select(*key_cols).distinct()
    kept = existing.join(F.broadcast(keys), list(key_cols), "left_anti")
    merged = (
        kept.unionByName(up)
        .repartition("date")
        .sortWithinPartitions("metric", "time")
    )
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("date")
        .parquet(table_path)
    )
    return days
