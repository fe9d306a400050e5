"""Compaction preserves data exactly and shrinks file counts;
retention drops exactly the expired partitions."""

from __future__ import annotations

import glob
import os

from opc_ua_data_pipeline_spark.operators.ingest import telemetry, write_bronze
from opc_ua_data_pipeline_spark.operators.maintenance import (
    compact,
    expire_partitions,
)


def _files(path):
    return glob.glob(os.path.join(path, "date=*", "*.parquet"))


def test_compact_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "bronze")
    t = telemetry(spark, "/root/testdata/sf0.001")
    # three small appends -> many small files
    for _ in range(3):
        write_bronze(t, path)
    before_files = len(_files(path))
    before = sorted(map(str, spark.read.parquet(path).collect()))

    res = compact(spark, path)

    after_files = len(_files(path))
    after = sorted(map(str, spark.read.parquet(path).collect()))
    assert after == before
    assert after_files < before_files
    assert all(n == 1 for n in res.values())  # tiny partitions -> 1 file


def test_expire_partitions(spark, tmp_path):
    path = str(tmp_path / "bronze")
    write_bronze(telemetry(spark, "/root/testdata/sf0.001"), path)
    parts = sorted(p for p in os.listdir(path) if p.startswith("date="))
    assert len(parts) > 5
    today = parts[-1].split("=", 1)[1]
    dropped = expire_partitions(path, keep_days=3, today=today)
    left = sorted(p for p in os.listdir(path) if p.startswith("date="))
    assert dropped and set(dropped) | set(left) == set(parts)
    assert len(left) <= 4  # cutoff..today inclusive span
    # table still readable
    assert spark.read.parquet(path).count() > 0
