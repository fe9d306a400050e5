from __future__ import annotations

import pytest

from opc_ua_data_pipeline_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("opc-ua-pipeline-tests")
    yield s


@pytest.fixture(autouse=True)
def _small_stream_shuffle(request):
    """Micro-batch stateful operators pay per-partition state-store
    setup EVERY batch, and streaming plans do not go through AQE
    coalescing — at the session default of 32 shuffle partitions each
    sf0.001 micro-batch scheduled 32 near-empty stateful tasks per
    operator, which dominated the streaming suites' wall time (round
    11; the full-suite duration map showed ~18 min across the
    test_streaming_* files).  Pin streaming tests to 4 partitions:
    results are partitioning-independent by design (every stateful
    operator here is deterministic per key), which the batch≡stream
    equality tests re-prove on every run.  Batch tests are untouched —
    query entry points re-apply RUNTIME_CONFS themselves."""
    if "streaming" not in request.module.__name__:
        yield
        return
    s = get_spark("opc-ua-pipeline-tests")
    prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        yield
    finally:
        s.conf.set("spark.sql.shuffle.partitions", prev)
