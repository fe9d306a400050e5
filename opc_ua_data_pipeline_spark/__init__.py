"""opc_ua_data_pipeline_spark — a PySpark-native analytics engine.

Re-implements (Spark-first, not a port) the query and data-processing
surface of the reference repo ``PascalPozzera/OPC-UA-Data-Pipeline``:
an industrial-IoT streaming ETL pipeline (OPC-UA -> MQTT -> enrich ->
Kafka -> TimescaleDB -> Grafana SQL).  The reference's surface is:

* a streaming normalize/enrich/type-dispatch ingest pipeline,
* TimescaleDB continuous aggregates (1-min / 1-h rollups),
* 16 dashboard SQL queries (latest-per-metric, alarm feeds, rollup scans),
* stateful alarm/deviation detection (trailing-3 buffers, edge
  detection, latched errors).

Everything here is declarative DataFrame/Spark-SQL so Catalyst handles
predicate pushdown, column pruning, partial aggregation and join
strategy; custom code exists only at the edges (streaming sources,
keyed-state processors).

Beyond reference parity, :mod:`.operators` adds the large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) designed for 100 TB scale.
"""

__version__ = "0.1.0"
