"""Degenerate-input totality: text/curation operators must stay
engine-parity-exact on documents the driver corpus happens not to
contain — empty text, whitespace-only text, single-character docs.
Found in round 4: token-ratio divisions raised ANSI divide-by-zero on
token-less docs (fixed with try_divide, matching DuckDB's NULL), and
DuckDB's array_to_string([]) returns NULL where Spark's array_join
returns '' (oracle now COALESCEs).  This test replays the driver-style
pandas-bridge comparison on exactly those inputs so the class cannot
regress."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod
import local_correctness as lc
from opc_ua_data_pipeline_spark.operators import curation as C
from opc_ua_data_pipeline_spark.operators import text as T
from opc_ua_data_pipeline_spark.operators import training as TR

ROWS = [
    (0, "", "en", "src1", 0),
    (1, " ", "en", "src1", 1),
    (2, "a", "de", "src2", 1),
    (3, "normal text doc here", "en", "src2", 20),
]


@pytest.fixture(scope="module")
def degenerate(spark, tmp_path_factory):
    docs = spark.createDataFrame(
        ROWS,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = tmp_path_factory.mktemp("degenerate_docs")
    docs.coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    return docs, con


CASES = [
    ("text_token_stats", lambda docs: T.token_stats(docs)),
    ("text_quality_scores", lambda docs: T.quality_scores(docs)),
    ("text_fingerprints", lambda docs: T.fingerprints(docs)),
    ("text_language_id", lambda docs: T.language_id(docs)),
    ("quality_classifier", lambda docs: C.quality_classifier(docs)),
    ("vocab_coverage", lambda docs: C.vocab_coverage(docs)),
    ("dup_span_scrub", lambda docs: TR.dup_span_scrub(docs)),
    ("repetition_stats", lambda docs: TR.repetition_stats(docs)),
    ("dsir_importance", lambda docs: C.dsir_importance(docs)),
]


@pytest.mark.parametrize("name", [c[0] for c in CASES])
def test_degenerate_docs_match_oracle(name, degenerate):
    docs, con = degenerate
    fn = dict(CASES)[name]
    spdf = fn(docs).toPandas()
    dpdf = con.execute(entry_mod.all_oracle_sql()[name]).df()
    cols = sorted(spdf.columns)
    assert cols == sorted(dpdf.columns)
    a = sorted(
        "|".join(lc._norm(v) for v in row)
        for row in spdf[cols].itertuples(index=False, name=None)
    )
    b = sorted(
        "|".join(lc._norm(v) for v in row)
        for row in dpdf[sorted(dpdf.columns)].itertuples(
            index=False, name=None
        )
    )
    assert a == b, f"{name}: first diff " + str(
        next(((x, y) for x, y in zip(a, b) if x != y), None)
    )
