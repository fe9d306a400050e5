"""Deviation alarms on the transformWithStateInPandas API (Spark 4.x).

The modern stateful API (SPARK-49564 family): a `StatefulProcessor`
with typed, named state slots, optional per-state TTL, and timers —
versus applyInPandasWithState's single tuple.  Semantics are identical
to :mod:`.alarms`' `_deviation_fn` (and therefore to the batch window
formulation); the equivalence test drives both.

Why it matters at scale: `ttlDurationMs` on the value state is the
direct expression of the reference CA policy's ``start_offset`` bound
(state older than the retention window is dropped by the store, not by
user code), and timers allow emit-on-silence patterns the old API
could not express.

Environment note: the TWS runtime requires the ``protobuf`` package
(pyspark's StateMessage protocol), which is not installed in this
container — the processor is complete and its equivalence test runs
wherever ``google.protobuf`` is importable (tests/test_streaming.py
skips otherwise).  applyInPandasWithState (:mod:`.alarms`) is the
dependency-free production path here.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from .alarms import _TARGET, DEVIATION_OUTPUT_SCHEMA


class DeviationProcessor(StatefulProcessor):
    """Trailing-3 deviation rules with rule-1 precedence and the
    target==0 skip (opcua_server/main.py:26-40)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "dev", "p1 DOUBLE, p2 DOUBLE, n_seen BIGINT"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (metric,) = key
        p1, p2, n_seen = (
            self._state.get() if self._state.exists() else (None, None, 0)
        )
        out = []
        chunks = [c for c in rows if len(c)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(["time", "event_id"])
            for row in pdf.itertuples():
                v = row.value_num
                if v is None or pd.isna(v):
                    continue
                pct = (v - _TARGET) / _TARGET * 100 if _TARGET != 0 else None
                if pct is None:
                    continue
                n_seen += 1
                alarm = None
                if abs(pct) > 10:
                    alarm = f"{metric}: Abweichung {pct:.2f}% (>10%)"
                elif (
                    n_seen >= 3
                    and abs(pct) > 2
                    and p1 is not None
                    and abs(p1) > 2
                    and p2 is not None
                    and abs(p2) > 2
                ):
                    alarm = (
                        f"{metric}: 3x in Folge Abweichung >2% "
                        f"({p2:.2f}%, {p1:.2f}%, {pct:.2f}%)"
                    )
                if alarm is not None:
                    out.append((metric, row.time, row.event_id, pct, alarm))
                p2, p1 = p1, pct
        self._state.update((p1, p2, n_seen))
        if out:
            yield pd.DataFrame(
                out, columns=["metric", "time", "event_id", "pct", "alarm"]
            )

    def close(self) -> None:
        pass


def deviation_alarm_stream_tws(telemetry: DataFrame) -> DataFrame:
    return telemetry.groupBy("metric").transformWithStateInPandas(
        DeviationProcessor(),
        outputStructType=DEVIATION_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
