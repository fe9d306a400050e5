"""The `opcua_sim` Python DataSource: stream it, ingest it, check
exact replay; the live `opcua` source must fail with a clear message
when asyncua is absent."""

from __future__ import annotations

import pytest

from opc_ua_data_pipeline_spark.functions.simulator import generate_rows
from opc_ua_data_pipeline_spark.operators.ingest import wire_to_bronze
from opc_ua_data_pipeline_spark.sources import opcua as opcua_src


def test_sim_source_streams_exact_rows(spark, tmp_path):
    opcua_src.register(spark)
    stream = (
        spark.readStream.format("opcua_sim")
        .option("max_ticks", "120")
        .option("ticks_per_batch", "50")
        .load()
    )
    bronze = wire_to_bronze(stream)
    q = (
        bronze.writeStream.format("memory")
        .queryName("opcua_sim_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (str(r["time"]), r["metric"], r["value_num"], r["value_str"])
        for r in spark.sql("SELECT * FROM opcua_sim_out").collect()
    )
    want = sorted(
        (str(t), m, n, s) for (t, m, n, s, _) in generate_rows(n_ticks=120)
    )
    assert got == want


def test_live_source_needs_asyncua(spark):
    opcua_src.register(spark)
    has_asyncua = True
    try:
        import asyncua  # noqa: F401
    except ImportError:
        has_asyncua = False
    if has_asyncua:
        pytest.skip("asyncua installed; live path needs a server")
    reader = opcua_src.OpcUaLiveReader({"endpoint": "opc.tcp://nowhere:4840"})
    with pytest.raises(ImportError, match="opcua_sim"):
        reader.read(reader.initialOffset())
