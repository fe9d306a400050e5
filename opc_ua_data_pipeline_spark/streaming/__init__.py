"""Structured Streaming layer (SURVEY.md §2.10, §3.1, §3.3).

The reference's streaming plane is three row-at-a-time agents plus
TimescaleDB continuous-aggregate refresh jobs; here it is Structured
Streaming jobs that *reuse the batch transformations verbatim*:

* :mod:`.ingest`  — the write path (entry point A): stream source ->
  normalize/enrich/type-dispatch -> partitioned bronze append, with
  checkpointed exactly-once (strictly stronger than the reference's
  uncoordinated auto-commit, kafka_db_agent/main.py:55,99).
* :mod:`.rollup`  — continuous aggregates (entry point C): watermarked
  tumbling-window aggregation; watermark ≡ the CA policy end_offset,
  trigger ≡ refresh interval (database/init.sql:31-34,51-54).
* :mod:`.alarms`  — keyed-state alarm processors (W3-W5) via
  applyInPandasWithState, mirroring the batch window-function
  formulations in operators/alarms.py.

Tests drive these with file sources + ``processAllAvailable`` and
assert batch ≡ stream on the same input.
"""
