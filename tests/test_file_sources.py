"""JSONL/CSV corpus connectors (sources/files.py): declared-schema
reads, corrupt-record quarantine, round-trips."""

from __future__ import annotations

import gzip
import json

from opc_ua_data_pipeline_spark.sources.files import (
    read_csv_corpus,
    read_jsonl_corpus,
    write_jsonl,
)
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_jsonl_roundtrip_and_quarantine(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    want = sorted(tuple(r) for r in docs.collect())

    out = str(tmp_path / "dump")
    write_jsonl(docs, out)
    good, bad = read_jsonl_corpus(spark, out)
    assert sorted(tuple(r) for r in good.collect()) == want
    assert bad.count() == 0

    # inject malformed lines: broken JSON and a type mismatch
    p = tmp_path / "mixed.jsonl"
    rows = [r.asDict() for r in docs.limit(3).collect()]
    lines = [json.dumps(r) for r in rows]
    lines.insert(1, '{"doc_id": "not-a-number", "text": 5}')
    lines.insert(3, "{broken json")
    p.write_text("\n".join(lines) + "\n")
    good2, bad2 = read_jsonl_corpus(spark, str(p))
    assert good2.count() == 3
    assert bad2.count() == 2
    raws = {r.raw_line for r in bad2.collect()}
    assert any("broken json" in r for r in raws)


def test_jsonl_gzip(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").limit(5)
    p = tmp_path / "c.jsonl.gz"
    payload = "\n".join(json.dumps(r.asDict()) for r in docs.collect())
    with gzip.open(p, "wt") as f:
        f.write(payload + "\n")
    good, bad = read_jsonl_corpus(spark, str(p))
    assert good.count() == 5 and bad.count() == 0


def test_csv_quarantine(spark, tmp_path):
    p = tmp_path / "c.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        '1,"hello, world",en,src0,12\n'
        '2,"quoted ""q"" text",de,src1,15\n'
        "not-a-number,oops,xx,src2,zz\n"
    )
    good, bad = read_csv_corpus(spark, str(p))
    rows = {r.doc_id: r for r in good.collect()}
    assert set(rows) == {1, 2}
    assert rows[1].text == "hello, world"  # RFC-4180 comma survives
    assert rows[2].text == 'quoted "q" text'  # escaped quotes survive
    assert bad.count() == 1
