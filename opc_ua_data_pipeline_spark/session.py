"""SparkSession factory with scale-appropriate defaults.

Local-mode knobs (shuffle partitions ~= cores, AQE on) are set at build
time; settings that must hold even on a session we did not create
(e.g. the driver harness's) are runtime confs applied by
:func:`apply_runtime_confs` — every public query entry point calls it
so oracle comparisons are stable regardless of who built the session.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime-settable confs required for deterministic, oracle-comparable
#: results and sane ad-hoc performance. Session timezone MUST be UTC:
#: DuckDB timestamps are UTC-naive (see pitfalls in the PySpark docs),
#: and the reference stores TIMESTAMPTZ with UTC semantics
#: (database/init.sql:4).
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    # The driver-generated parquet carries TIMESTAMP(NANOS) (pandas/arrow
    # default), which Spark's vectorized reader rejects; read them as
    # int64 and convert in the loaders (tables.load_table) by integer-
    # dividing to micros — the same truncation DuckDB applies.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Core-count-derived (round 11; was a hard-coded 32): the driver
    # harness also benches at SPARK_GRAFT_CPUS=8, where re-applying 32
    # partitions on every query entry overrode the session's own
    # cores-based sizing.  On a real cluster this is cores×2-3 and AQE
    # coalesces post-shuffle partitions either way.
    "spark.sql.shuffle.partitions": os.environ.get(
        "SPARK_GRAFT_CPUS", "32"
    ),
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply :data:`RUNTIME_CONFS` to an existing session (idempotent)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Some confs may be fixed on exotic sessions; never fail a query
            # over a tuning knob.
            pass
    return spark


def get_spark(app_name: str = "opc_ua_data_pipeline_spark") -> SparkSession:
    """Build (or fetch) a local session sized for this container.

    ``local[N]`` means one JVM with N executor threads; shuffle
    partitions default to the core count so small-SF runs don't pay
    200-partition scheduling overhead, while AQE coalesces/splits at
    runtime when data size disagrees.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # Keep stage-progress \r spam out of stdout: the bench driver
        # parses a JSON line from the tail of stdout, and progress
        # redraws can push it out of the parse window.
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return apply_runtime_confs(spark)
