"""Partition pruning on the date-partitioned bronze lake — the
hypertable chunk-exclusion equivalent (SURVEY §2.1 S4 / K4), both
spellings:

* STATIC: a literal date predicate must land in the scan's
  ``PartitionFilters`` (directory-level pruning, no data read);
* DYNAMIC (DPP): joining the fact against a filtered dimension must
  inject a ``dynamicpruning`` subquery into the scan, so partitions
  are pruned by the dim's RUNTIME row set — the Catalyst feature that
  replaces "WHERE time IN (SELECT ...)" chunk exclusion at 100 TB,
  where the date list isn't known until the dim is filtered.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.operators.ingest import telemetry, write_bronze
from opc_ua_data_pipeline_spark.plans import formatted_plan

SF_DIR = "/root/testdata/sf0.001"


def test_static_and_dynamic_partition_pruning(spark, tmp_path):
    path = str(tmp_path / "bronze")
    write_bronze(telemetry(spark, SF_DIR), path)
    bronze = spark.read.parquet(path)
    dates = sorted(r.date for r in bronze.select("date").distinct().collect())
    assert len(dates) >= 2, "need multiple partitions to prove pruning"

    # static pruning: literal predicate -> PartitionFilters, and the
    # scan reads strictly fewer partitions than exist
    d0 = dates[0]
    plan = formatted_plan(bronze.filter(F.col("date") == F.lit(d0)))
    assert "PartitionFilters" in plan
    # attribute names carry expr ids (date#NN) in the formatted plan
    assert f"= {d0})" in plan

    # dynamic pruning: the date set comes from a FILTERED dim at
    # runtime; the fact scan must carry a dynamicpruning expression
    dim = spark.createDataFrame(
        [(d, i) for i, d in enumerate(dates)], "d date, tag int"
    )
    joined = bronze.join(
        F.broadcast(dim.filter(F.col("tag") == 0)),
        bronze.date == F.col("d"),
    )
    plan2 = formatted_plan(joined)
    assert "dynamicpruning" in plan2.lower(), plan2[:2000]

    # and the join result is the single partition's rows
    n_joined = joined.count()
    n_d0 = bronze.filter(F.col("date") == F.lit(dates[0])).count()
    assert n_joined == n_d0 > 0
