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


def test_backfill_overwrites_only_touched_partitions(spark, tmp_path):
    """Dynamic-partition backfill must (a) replace the touched day's
    contents, (b) leave every other partition's files byte-untouched,
    and (c) be idempotent under replay."""
    import glob

    from pyspark.sql import functions as F

    from opc_ua_data_pipeline_spark.operators.ingest import telemetry, write_bronze
    from opc_ua_data_pipeline_spark.operators.maintenance import (
        backfill_partitions,
    )

    path = str(tmp_path / "bronze")
    tel = telemetry(spark, "/root/testdata/sf0.001")
    write_bronze(tel, path)
    days = sorted(
        p for p in os.listdir(path) if p.startswith("date=")
    )
    assert len(days) >= 3
    target_day = days[1].split("=", 1)[1]

    before = {
        f: os.path.getmtime(f)
        for f in glob.glob(path + "/date=*/*.parquet")
    }
    n_before = spark.read.parquet(path).count()

    # "corrected" replay of ONE day: values doubled
    corrected = tel.filter(F.to_date("time") == target_day).withColumn(
        "value_num", F.col("value_num") * 2
    )
    touched = backfill_partitions(spark, corrected, path)
    assert touched == [target_day]

    # (a) the day's rows were replaced, not appended
    assert spark.read.parquet(path).count() == n_before
    doubled = (
        spark.read.parquet(path)
        .filter(F.col("date") == target_day)
        .agg(F.sum("value_num"))
        .collect()[0][0]
    )
    original = (
        tel.filter(F.to_date("time") == target_day)
        .agg(F.sum(F.col("value_num") * 2))
        .collect()[0][0]
    )
    assert abs(doubled - original) < 1e-6
    # (b) untouched partitions kept their exact files
    for f, mt in before.items():
        if f"date={target_day}" not in f:
            assert os.path.getmtime(f) == mt, f
    # (c) idempotent replay
    again = backfill_partitions(spark, corrected, path)
    assert again == [target_day]
    assert spark.read.parquet(path).count() == n_before


def test_lake_lifecycle_end_to_end(spark, tmp_path):
    """The full bronze-lake lifecycle in one drive: streaming-style
    appends -> compaction -> a corrected-day backfill -> retention —
    after every step the table answers the rollup query correctly and
    stays partition-prunable.  This is the operational loop a
    production deployment runs daily; each primitive is tested alone
    above, this pins their composition."""
    from pyspark.sql import functions as F

    from opc_ua_data_pipeline_spark.operators.maintenance import (
        backfill_partitions,
    )
    from opc_ua_data_pipeline_spark.operators.rollups import machine_stats

    path = str(tmp_path / "bronze")
    tel = telemetry(spark, "/root/testdata/sf0.001")

    # 1. two appends (simulating micro-batches) -> duplicate rows
    write_bronze(tel, path)
    write_bronze(tel, path)
    assert spark.read.parquet(path).count() == 2 * tel.count()

    # 2. compact: same rows, fewer files
    compact(spark, path)

    # 3. backfill repairs the duplication day-by-day (replay of the
    #    TRUE data for every day overwrites the doubled partitions)
    days = backfill_partitions(spark, tel, path)
    assert len(days) >= 3
    lake = spark.read.parquet(path).drop("date")
    assert lake.count() == tel.count()

    # rollup over the repaired lake == rollup over the source
    got = sorted(
        map(str, machine_stats(lake, "minute").collect())
    )
    want = sorted(map(str, machine_stats(tel, "minute").collect()))
    assert got == want

    # 4. retention drops the oldest day; the rest still answers
    import datetime

    all_days = sorted(d.split("=", 1)[1] for d in os.listdir(path) if d.startswith("date="))
    # pick keep_days so the cutoff lands exactly on the second day:
    # everything strictly older (= the first day only) expires
    keep = (
        datetime.date.fromisoformat(all_days[-1])
        - datetime.date.fromisoformat(all_days[1])
    ).days
    dropped = expire_partitions(path, keep_days=keep, today=all_days[-1])
    assert dropped == [f"date={all_days[0]}"]
    remaining = spark.read.parquet(path)
    assert remaining.filter(F.col("date") == all_days[0]).count() == 0
    assert remaining.count() == tel.filter(F.to_date("time") != all_days[0]).count()


def test_upsert_updates_win_inserts_new_and_leaves_rest_untouched(
    spark, tmp_path
):
    """CDC upsert: update rows replace same-key rows, new keys insert,
    untouched day partitions stay byte-identical, replay converges."""
    import glob

    from pyspark.sql import functions as F

    from opc_ua_data_pipeline_spark.operators.ingest import (
        telemetry,
        write_bronze,
    )
    from opc_ua_data_pipeline_spark.operators.maintenance import (
        upsert_partitions,
    )

    path = str(tmp_path / "bronze")
    tel = telemetry(spark, "/root/testdata/sf0.001")
    write_bronze(tel, path)
    n_before = spark.read.parquet(path).count()
    days = sorted(p for p in os.listdir(path) if p.startswith("date="))
    target_day = days[1].split("=", 1)[1]
    before = {
        f: os.path.getmtime(f)
        for f in glob.glob(path + "/date=*/*.parquet")
    }

    day_rows = tel.filter(F.to_date("time") == target_day)
    # one corrected existing row + one brand-new key, same day
    corrected = day_rows.orderBy("event_id").limit(1).withColumn(
        "value_num", F.lit(12345.0)
    )
    max_id = tel.agg(F.max("event_id")).collect()[0][0]
    inserted = day_rows.orderBy("event_id").limit(1).withColumn(
        "event_id", F.lit(max_id + 1)
    ).withColumn("value_num", F.lit(777.0))
    updates = corrected.unionByName(inserted)

    touched = upsert_partitions(spark, updates, path)
    assert touched == [target_day]

    after = spark.read.parquet(path)
    assert after.count() == n_before + 1  # 1 update in place + 1 insert
    fixed_id = corrected.collect()[0]["event_id"]
    got = {
        r["event_id"]: r["value_num"]
        for r in after.filter(
            F.col("event_id").isin(fixed_id, max_id + 1)
        ).collect()
    }
    assert got[fixed_id] == 12345.0 and got[max_id + 1] == 777.0
    # untouched partitions byte-identical
    for f, mt in before.items():
        if f"date={target_day}" not in f:
            assert os.path.getmtime(f) == mt, f
    # idempotent replay
    upsert_partitions(spark, updates, path)
    assert spark.read.parquet(path).count() == n_before + 1
