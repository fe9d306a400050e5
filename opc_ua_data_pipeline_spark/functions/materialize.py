"""Conf-gated intermediate materializer (round-11, r10 verdict item 8).

Every iterative/multi-read query path cuts lineage by eagerly
materializing a bounded intermediate.  In one-JVM local mode
``localCheckpoint`` is the right mechanism (fast: no DFS write, no
reliable storage needed).  On a real cluster a localCheckpoint'ed
partition DIES WITH ITS EXECUTOR — the round-10 sites all carried a
"persist() at cluster scale" comment, but nothing enforced it.  This
helper makes the promise real: one session conf flips every site at
once, no per-site edits.

``spark.opcua.materialize``:

* ``local`` (default) — ``localCheckpoint(eager=True)``: single-JVM /
  dev / bench mode, where executor loss means the app died anyway.
* ``persist`` — ``persist(DISK_ONLY)`` + a count() action to populate
  it eagerly: survives individual executor loss via recompute from the
  (truncated-by-persist at execution, full for recovery) lineage.
* ``checkpoint`` — reliable ``checkpoint(eager=True)`` to
  ``spark.checkpoint.dir``: survives executor loss with NO recompute —
  the right choice when the upstream lineage is itself expensive
  (the CC fixpoint's per-round sets at 1000-executor scale).

Values are identical under all three — only fault-tolerance and cost
move — so the bench/oracle contract is untouched by the conf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly materialize + cut lineage, mechanism per session conf
    ``spark.opcua.materialize`` (local | persist | checkpoint)."""
    mode = "local"
    try:
        mode = df.sparkSession.conf.get("spark.opcua.materialize", "local")
    except Exception:
        pass
    if mode == "persist":
        from pyspark import StorageLevel

        out = df.persist(StorageLevel.DISK_ONLY)
        out.count()
        return out
    if mode == "checkpoint":
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
