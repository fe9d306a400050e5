"""Z-order layout: per-file min/max boxes must be materially narrower
than a time-sorted layout in the second dimension (that narrowing IS
the row-group pruning win)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.operators.layout import write_zordered
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.01"
N_FILES = 16  # 4 Z-bits -> each dimension is split twice across files


def _user_spans(path: str) -> list[int]:
    spans = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.row_group(rg).num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == "user_id" and col.statistics:
                    s = col.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            spans.append(hi - lo)
    return spans


def test_zorder_narrows_per_file_user_spans(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")

    naive = str(tmp_path / "naive")
    (
        events.repartitionByRange(N_FILES, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(naive)
    )
    zpath = str(tmp_path / "zordered")
    write_zordered(events, zpath, n_files=N_FILES)

    naive_spans = _user_spans(naive)
    z_spans = _user_spans(zpath)
    assert len(z_spans) >= N_FILES - 1
    # time-sorted files see the whole user range; z-ordered files see
    # a fraction of it.
    naive_avg = sum(naive_spans) / len(naive_spans)
    z_avg = sum(z_spans) / len(z_spans)
    assert z_avg < naive_avg / 2, (naive_spans, z_spans)


def test_zorder_roundtrip_preserves_rows(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    zpath = str(tmp_path / "z2")
    write_zordered(events, zpath)
    back = spark.read.parquet(zpath)
    assert back.count() == events.count()
    assert sorted(r.event_id for r in back.select("event_id").collect()) == \
        sorted(r.event_id for r in events.select("event_id").collect())