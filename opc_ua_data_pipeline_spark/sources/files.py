"""File-format corpus connectors: JSONL and CSV with declared
schemas and corrupt-record quarantine.

The engine's canonical storage is parquet (tables.py), but corpora
arrive as JSONL dumps and CSV exports; these readers make that
ingestion path explicit and safe:

* **declared schema, never inference** — schema inference reads the
  data twice and silently changes types between runs; a 100 TB read
  must be one pass with a contract;
* **PERMISSIVE + quarantine** — a malformed line must neither kill
  the job (FAILFAST) nor vanish (DROPMALFORMED); it lands in a
  ``_corrupt_record`` column and is split into a quarantine frame the
  pipeline can count, store, and alert on;
* **compression is free** — Spark's text sources decode
  gzip/zstd/bzip2 by extension; note gzip files are NOT splittable
  (one task per file), so shard corpora before compressing — the
  reader can't fix a single 1 TB .gz.

Returns (good, quarantined) pairs so callers can't forget the reject
leg — the pattern every curation ingest should start with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: The documents corpus contract (tables.py documents.parquet).
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

_CORRUPT = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    return T.StructType(
        [*schema.fields, T.StructField(_CORRUPT, T.StringType(), True)]
    )


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """One JSON object per line -> (good rows, quarantined lines).

    A row is quarantined iff Spark could not parse it against the
    declared schema (bad JSON or type mismatch); the quarantine frame
    carries the raw line for replay after a fix.  Spark requires the
    corrupt column's frame to be cached (or re-read) before the
    filter — the parser only populates ``_corrupt_record`` during the
    same scan that fails, so a second scan would drop it.
    """
    raw = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    ).cache()
    good = raw.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    bad = raw.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw_line")
    )
    return good, bad


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """CSV with the same contract: declared schema, PERMISSIVE parse,
    quarantined malformed lines (wrong arity / uncastable cells),
    RFC-4180 quoting so embedded newlines in quoted text fields
    survive (``multiLine`` stays off — it serializes the whole file
    into one task; shard instead if text fields need raw newlines)."""
    raw = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    ).cache()
    good = raw.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    bad = raw.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw_line")
    )
    return good, bad


def write_jsonl(df: DataFrame, path: str, compression: str | None = None):
    """Corpus export as JSONL (optionally gzip/zstd per part-file)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
