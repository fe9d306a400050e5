"""Retrieval-side corpus operators: RAG chunking, BM25 keyword
search, count-min heavy hitters, and hybrid (dense+sparse) fusion.

A training-data platform is also the serving substrate for retrieval
over the corpus (RAG indexing, contamination triage, corpus search).
These operators complete that surface next to similarity.py's dense
ANN family:

* ``chunk_documents`` — fixed-size overlapping character windows
  (the standard RAG chunker).  Pure string arithmetic: exact.
* ``bm25_topk`` — Okapi BM25 (k1=1.2, b=0.75, Lucene's +1 idf) for a
  constant query-term list; returns the top-k documents.
* ``heavy_hitters_cms`` — count-min sketch (d=4, w=64) estimates for
  the top-20 corpus terms next to their exact counts; the sketch is
  md5-positioned so both engines build the identical bitmap and the
  whole result is integer-exact (and the CMS >= exact invariant is
  property-tested).
* ``hybrid_search_rrf`` — reciprocal-rank fusion of the dense
  (cosine ANN, similarity.py) and sparse (BM25) rankings for one
  query.  Fusion uses only the integer ranks, so the two inputs'
  float contracts stay where they were verified.

Scale notes (100 TB):
* ``chunk_documents`` is a narrow generator projection — no shuffle,
  no state; output partitioning inherits the scan.
* BM25's corpus statistics (N, avgdl, per-term df) are two 1-row /
  #terms-row aggregates broadcast back into a narrow scoring scan;
  the only wide node is the final top-k (TakeOrderedAndProject, a
  per-partition heap + k-row driver merge — no global sort).
* The count-min sketch is the POINT at scale: the term-count
  aggregate is vocab-sized, the sketch itself is a constant 4x64
  table, and estimates join against it broadcast.  At 100 TB the
  sketch would be built by the same groupBy with map-side combine.
* RRF joins two k-row rankings — driver-scale inputs, broadcast
  outer join, exact integer rank arithmetic.

Float contract: BM25 and RRF scores follow the repo-wide
ulp-collapse rule (tfidf precedent, training.py): the double formula
is written in the SAME textual shape on both engines, rounded to
DECIMAL(18,9) to collapse libm last-ulp noise, and re-cast to DOUBLE
so the pandas bridges agree on dtype.  Ranking orders by the ROUNDED
score with doc_id as tie-break.

Reference parity: the reference pipeline (PascalPozzera/
OPC-UA-Data-Pipeline) has no retrieval surface; this module is part
of the large-scale-training-data extension mandate (SURVEY.md §2
extension families), alongside dedup.py / similarity.py / text.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ranking import bounded_rank
from ..tables import load_table
from .similarity import ORACLES as _SIM_ORACLES
from .similarity import brute_force_topk
from .text import _TOKS, _toks

# ---------------------------------------------------------------------------
# RAG chunking
# ---------------------------------------------------------------------------

CHUNK_SIZE = 200
CHUNK_OVERLAP = 50
CHUNK_STRIDE = CHUNK_SIZE - CHUNK_OVERLAP  # 150


def chunk_documents(
    docs: DataFrame,
    size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """Overlapping character-window chunks for RAG indexing.

    Chunk starts are ``1, 1+stride, ...`` while
    ``start <= max(1, n_chars - overlap)`` — every document yields at
    least one chunk, no chunk is a strict suffix-subset of its
    predecessor, and consecutive chunks share ``overlap`` characters.
    Characters (not bytes) on both engines, so the contract is
    encoding-agnostic.
    """
    stride = size - overlap
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.length("text") - F.lit(overlap), F.lit(1)),
        F.lit(stride),
    )
    return (
        docs.select(
            "doc_id",
            "source",
            "text",
            F.posexplode(starts).alias("chunk_id", "start"),
        )
        .select(
            "doc_id",
            "source",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.col("start").cast("int").alias("chunk_start"),
            F.expr(f"substring(text, start, {size})").alias("chunk_text"),
        )
        .withColumn("chunk_len", F.length("chunk_text"))
    )


# ---------------------------------------------------------------------------
# BM25 keyword search
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
#: Constant demo query over the synthetic corpus vocabulary.
BM25_QUERY_TERMS = ["spark", "hash", "merge"]
BM25_TOP_K = 20


def bm25_topk(
    docs: DataFrame,
    terms: list[str] | None = None,
    k: int = BM25_TOP_K,
) -> DataFrame:
    """Okapi BM25 top-k for a constant term list.

    idf uses Lucene's non-negative variant
    ``ln((N - df + 0.5) / (df + 0.5) + 1)``.  Per-term components are
    summed in query-term order (pinned association), rounded to
    DECIMAL(18,9), and re-cast to DOUBLE (ulp-collapse contract).
    Only documents matching at least one term are ranked.
    """
    terms = BM25_QUERY_TERMS if terms is None else terms
    toks = _toks()

    def tf_col(trm: str) -> Column:
        # NB: a one-arg lambda on purpose — pyspark's higher-order
        # functions dispatch on lambda arity (2 args = element, index).
        return F.size(F.filter(toks, lambda t: t == F.lit(trm))).cast("long")

    base = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("dl"),
        *[tf_col(trm).alias(f"tf_{i}") for i, trm in enumerate(terms)],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avgdl"
        ),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )

    def comp(i: int) -> Column:
        tf = F.col(f"tf_{i}").cast("double")
        dfv = F.col(f"df_{i}").cast("double")
        idf = F.log(
            (F.col("n_docs").cast("double") - dfv + F.lit(0.5))
            / (dfv + F.lit(0.5))
            + F.lit(1.0)
        )
        denom = tf + F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("avgdl")
        )
        return idf * ((tf * F.lit(BM25_K1 + 1.0)) / denom)

    score = comp(0)
    for i in range(1, len(terms)):
        score = score + comp(i)
    scored = (
        base.crossJoin(F.broadcast(stats))
        .filter(
            sum((F.col(f"tf_{i}") for i in range(1, len(terms))), F.col("tf_0"))
            > 0
        )
        .select(
            "doc_id",
            score.cast("decimal(18,9)").cast("double").alias("score"),
        )
    )
    # Top-k as orderBy+limit (TakeOrderedAndProject: per-partition heap
    # + k-row driver merge — no global sort, no single-task window over
    # the full match set); the rank window then runs over k rows only.
    topk = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
    # Window-free rank over the k-row frame (functions/ranking.py)
    return bounded_rank(
        topk, [("score", "desc"), ("doc_id", "asc")]
    ).select("doc_id", "score", "rank")


def _bm25_sql(terms: list[str], k: int) -> str:
    tf_cols = ",\n         ".join(
        f"len(list_filter(ts, t -> t = '{t}')) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n         ".join(
        f"COUNT(*) FILTER (WHERE tf_{i} > 0) AS df_{i}"
        for i in range(len(terms))
    )
    comps = " + ".join(
        f"ln((CAST(n_docs AS DOUBLE) - CAST(df_{i} AS DOUBLE) + 0.5)"
        f" / (CAST(df_{i} AS DOUBLE) + 0.5) + 1.0)"
        f" * ((CAST(tf_{i} AS DOUBLE) * {BM25_K1 + 1.0!r})"
        f" / (CAST(tf_{i} AS DOUBLE) + {BM25_K1!r} * ({1.0 - BM25_B!r}"
        f" + {BM25_B!r} * CAST(dl AS DOUBLE) / avgdl)))"
        for i in range(len(terms))
    )
    any_match = " + ".join(f"tf_{i}" for i in range(len(terms)))
    return f"""
WITH base AS (
  SELECT doc_id,
         len(ts) AS dl,
         {tf_cols}
  FROM (SELECT doc_id, {_TOKS} AS ts FROM documents)
),
stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
         {df_cols}
  FROM base
),
scored AS (
  SELECT doc_id,
         CAST(CAST({comps} AS DECIMAL(18,9)) AS DOUBLE) AS score
  FROM base CROSS JOIN stats
  WHERE {any_match} > 0
)
SELECT doc_id, score,
       CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INTEGER)
         AS rank
FROM scored
QUALIFY rank <= {k}
"""


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 64
CMS_TOP_K = 20


def _cms_bucket(term: Column, j: Column) -> Column:
    """md5-positioned bucket: both engines derive the identical
    sketch coordinates from the term string."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(term, F.lit(":cms"), j.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return (h % F.lit(CMS_WIDTH)).cast("long")


def heavy_hitters_cms(docs: DataFrame, k: int = CMS_TOP_K) -> DataFrame:
    """Top-k corpus terms with exact counts AND their count-min
    sketch estimates (d=4 rows x w=64 buckets).

    The term-count aggregate is vocab-sized (map-side combine); the
    sketch is a constant 4x64 table built FROM those counts (not from
    raw token occurrences — same totals, one shuffle less); estimates
    come from a broadcast join back onto the top-k terms.  All
    integers — bit-exact on any engine.  CMS >= exact always
    (property-tested in tests/test_retrieval.py).
    """
    tc = (
        docs.select(F.explode(_toks()).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    buckets = tc.select(
        "term",
        "cnt",
        F.explode(
            F.array(*[F.lit(j) for j in range(CMS_DEPTH)])
        ).alias("j"),
    ).withColumn("bucket", _cms_bucket(F.col("term"), F.col("j")))
    sketch = buckets.groupBy("j", "bucket").agg(F.sum("cnt").alias("bcnt"))
    # Vocab top-k via TakeOrderedAndProject, then a Window-free rank
    # over the k-row frame (functions/ranking.py)
    top = bounded_rank(
        tc.orderBy(F.col("cnt").desc(), F.col("term").asc()).limit(k),
        [("cnt", "desc"), ("term", "asc")],
    )
    est = (
        top.select("term", "rank", F.col("cnt").alias("exact_cnt"))
        .join(buckets.select("term", "j", "bucket"), "term")
        .join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("term", "rank", "exact_cnt")
        .agg(F.min("bcnt").alias("cms_estimate"))
    )
    return est.select("term", "exact_cnt", "cms_estimate", "rank")


_CMS_SQL = f"""
WITH tc AS (
  SELECT term, COUNT(*) AS cnt
  FROM (SELECT UNNEST({_TOKS}) AS term FROM documents)
  GROUP BY term
),
buckets AS (
  SELECT term, cnt, j,
         CAST(('0x' || substr(md5(term || ':cms' || CAST(j AS VARCHAR)),
                              1, 8)) AS BIGINT) % {CMS_WIDTH} AS bucket
  FROM tc CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS j)
),
sketch AS (
  SELECT j, bucket, SUM(cnt) AS bcnt FROM buckets GROUP BY j, bucket
),
top AS (
  SELECT term, cnt,
         CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS INTEGER)
           AS rank
  FROM tc
  QUALIFY rank <= {CMS_TOP_K}
)
SELECT t.term,
       t.cnt AS exact_cnt,
       CAST(MIN(s.bcnt) AS BIGINT) AS cms_estimate,
       t.rank
FROM top t
JOIN buckets b ON b.term = t.term
JOIN sketch s ON s.j = b.j AND s.bucket = b.bucket
GROUP BY t.term, t.cnt, t.rank
"""


# ---------------------------------------------------------------------------
# Hybrid search: reciprocal-rank fusion
# ---------------------------------------------------------------------------

RRF_K = 60
HYBRID_QUERY_ID = 0


def hybrid_search_rrf(
    dense: DataFrame, sparse: DataFrame, rrf_k: int = RRF_K
) -> DataFrame:
    """Fuse a dense ANN ranking (q_id/c_id/rank) with a sparse BM25
    ranking (doc_id/rank) by reciprocal-rank fusion:
    ``rrf = 1/(k + dense_rank) + 1/(k + sparse_rank)`` (absent
    ranking contributes 0).  Only INTEGER ranks cross the fusion
    boundary, so each input keeps its own verified float contract;
    the fused score follows the ulp-collapse rounding rule.
    """
    d = dense.select(
        F.col("c_id").alias("doc_id"), F.col("rank").alias("dense_rank")
    )
    s = sparse.select("doc_id", F.col("rank").alias("sparse_rank"))
    fused = d.join(s, "doc_id", "full_outer").select(
        "doc_id",
        F.col("dense_rank").cast("int").alias("dense_rank"),
        F.col("sparse_rank").cast("int").alias("sparse_rank"),
        (
            F.coalesce(
                F.lit(1.0)
                / (F.lit(rrf_k).cast("double") + F.col("dense_rank").cast("double")),
                F.lit(0.0),
            )
            + F.coalesce(
                F.lit(1.0)
                / (F.lit(rrf_k).cast("double") + F.col("sparse_rank").cast("double")),
                F.lit(0.0),
            )
        )
        .cast("decimal(18,9)")
        .cast("double")
        .alias("rrf_score"),
    )
    # fused frame is bounded by the two k-row input rankings;
    # Window-free rank (functions/ranking.py)
    return bounded_rank(
        fused, [("rrf_score", "desc"), ("doc_id", "asc")], "fused_rank"
    )


# ---------------------------------------------------------------------------
# Contract queries + oracles
# ---------------------------------------------------------------------------


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(load_table(spark, sf_dir, "documents"))


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_topk(load_table(spark, sf_dir, "documents"))


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return heavy_hitters_cms(load_table(spark, sf_dir, "documents"))


def q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    dense = brute_force_topk(
        emb.filter(F.col("vec_id") == HYBRID_QUERY_ID), emb
    )
    return hybrid_search_rrf(dense, bm25_topk(docs))


QUERIES = {
    "chunk_documents": q_chunk_documents,
    "bm25_topk": q_bm25_topk,
    "heavy_hitters_cms": q_heavy_hitters,
    "hybrid_search_rrf": q_hybrid_search,
}

_RRF = (
    "COALESCE(1.0 / ({k} + CAST(dense_rank AS DOUBLE)), 0.0)"
    " + COALESCE(1.0 / ({k} + CAST(sparse_rank AS DOUBLE)), 0.0)"
).format(k=float(RRF_K))

ORACLES = {
    "chunk_documents": f"""
SELECT doc_id, source,
       CAST(chunk_id - 1 AS INTEGER) AS chunk_id,
       CAST(start AS INTEGER) AS chunk_start,
       substr(text, CAST(start AS BIGINT), {CHUNK_SIZE}) AS chunk_text,
       CAST(length(substr(text, CAST(start AS BIGINT), {CHUNK_SIZE}))
            AS INTEGER) AS chunk_len
FROM (
  SELECT doc_id, source, text,
         UNNEST(generate_series(1,
                 greatest(length(text) - {CHUNK_OVERLAP}, 1),
                 {CHUNK_STRIDE})) AS start,
         UNNEST(range(1, len(generate_series(1,
                 greatest(length(text) - {CHUNK_OVERLAP}, 1),
                 {CHUNK_STRIDE})) + 1)) AS chunk_id
  FROM documents
)
""",
    "bm25_topk": _bm25_sql(BM25_QUERY_TERMS, BM25_TOP_K),
    "heavy_hitters_cms": _CMS_SQL,
    "hybrid_search_rrf": f"""
WITH dense AS (
  SELECT c_id AS doc_id, rank AS dense_rank
  FROM ({_SIM_ORACLES["ann_bruteforce_topk"]})
  WHERE q_id = {HYBRID_QUERY_ID}
),
sparse AS (
  SELECT doc_id, rank AS sparse_rank
  FROM ({_bm25_sql(BM25_QUERY_TERMS, BM25_TOP_K)})
),
fused AS (
  SELECT COALESCE(d.doc_id, s.doc_id) AS doc_id,
         CAST(d.dense_rank AS INTEGER) AS dense_rank,
         CAST(s.sparse_rank AS INTEGER) AS sparse_rank,
         CAST(CAST({_RRF} AS DECIMAL(18,9)) AS DOUBLE) AS rrf_score
  FROM dense d FULL OUTER JOIN sparse s ON d.doc_id = s.doc_id
)
SELECT doc_id, dense_rank, sparse_rank, rrf_score,
       CAST(ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id)
            AS INTEGER) AS fused_rank
FROM fused
""",
}


# ---------------------------------------------------------------------------
# Dirichlet-smoothed query likelihood (round 7b)
# ---------------------------------------------------------------------------

#: Dirichlet prior mass; 500 suits the fixture's ~50-token docs (the
#: standard 2000 assumes web-page-length documents).
QL_MU = 500.0
QL_TOP_K = 20


def query_likelihood_topk(
    docs: DataFrame,
    terms: list[str] | None = None,
    k: int = QL_TOP_K,
) -> DataFrame:
    """Dirichlet-smoothed query-likelihood ranking (Zhai & Lafferty
    2001): ``score(d|Q) = sum_t ln((tf + mu*P(t|C)) / (dl + mu))``
    with the collection model ``P(t|C) = cf_t / |C|`` — the language-
    model alternative to BM25 (whose idf has no account of collection
    term frequency), and the second scorer hybrid_search_rrf can
    fuse.

    Same scale shape as bm25_topk: per-term tf columns in one narrow
    scan pass, one broadcast 1-row stats frame (here with collection
    frequencies), a TakeOrderedAndProject top-k, and the window-free
    bounded rank.  Per-term components sum in query-term order
    (pinned association) and ulp-collapse at DECIMAL(18,9).
    """
    terms = BM25_QUERY_TERMS if terms is None else terms
    toks = _toks()

    def tf_col(trm: str) -> Column:
        return F.size(F.filter(toks, lambda t: t == F.lit(trm))).cast("long")

    base = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("dl"),
        *[tf_col(trm).alias(f"tf_{i}") for i, trm in enumerate(terms)],
    )
    stats = base.agg(
        F.sum("dl").alias("c_len"),
        *[F.sum(f"tf_{i}").alias(f"cf_{i}") for i in range(len(terms))],
    )

    def comp(i: int) -> Column:
        tf = F.col(f"tf_{i}").cast("double")
        pc = F.col(f"cf_{i}").cast("double") / F.col("c_len").cast("double")
        # an out-of-collection term has P(t|C) = 0 and would drive
        # EVERY document's likelihood to ln(0) (NULL in Spark, -inf
        # in DuckDB): the standard treatment drops OOV query terms
        return F.when(
            F.col(f"cf_{i}") > 0,
            F.log(
                (tf + F.lit(QL_MU) * pc)
                / (F.col("dl").cast("double") + F.lit(QL_MU))
            ),
        ).otherwise(F.lit(0.0))

    score = comp(0)
    for i in range(1, len(terms)):
        score = score + comp(i)
    scored = (
        base.crossJoin(F.broadcast(stats))
        .filter(
            sum((F.col(f"tf_{i}") for i in range(1, len(terms))), F.col("tf_0"))
            > 0
        )
        .select(
            "doc_id",
            score.cast("decimal(18,9)").cast("double").alias("score"),
        )
    )
    topk = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
    return bounded_rank(
        topk, [("score", "desc"), ("doc_id", "asc")]
    ).select("doc_id", "score", "rank")


def q_query_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    return query_likelihood_topk(load_table(spark, sf_dir, "documents"))


QUERIES["query_likelihood_topk"] = q_query_likelihood


def _ql_sql(terms: list[str], k: int) -> str:
    tf_cols = ",\n         ".join(
        f"len(list_filter(ts, t -> t = '{t}')) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    cf_cols = ",\n         ".join(
        f"SUM(tf_{i}) AS cf_{i}" for i in range(len(terms))
    )
    comps = " + ".join(
        f"(CASE WHEN cf_{i} > 0 THEN"
        f" ln((CAST(tf_{i} AS DOUBLE) + {QL_MU!r}"
        f" * (CAST(cf_{i} AS DOUBLE) / CAST(c_len AS DOUBLE)))"
        f" / (CAST(dl AS DOUBLE) + {QL_MU!r})) ELSE 0.0 END)"
        for i in range(len(terms))
    )
    any_match = " + ".join(f"tf_{i}" for i in range(len(terms)))
    return f"""
WITH base AS (
  SELECT doc_id,
         len(ts) AS dl,
         {tf_cols}
  FROM (SELECT doc_id, {_TOKS} AS ts FROM documents)
),
stats AS (
  SELECT SUM(dl) AS c_len,
         {cf_cols}
  FROM base
),
scored AS (
  SELECT doc_id,
         CAST(CAST({comps} AS DECIMAL(18,9)) AS DOUBLE) AS score
  FROM base, stats
  WHERE {any_match} > 0
)
SELECT doc_id, score,
       CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC)
            AS INTEGER) AS rank
FROM scored
QUALIFY rank <= {k}
"""


ORACLES["query_likelihood_topk"] = _ql_sql(BM25_QUERY_TERMS, QL_TOP_K)
