"""Round-2 curation operators: PII scrub, passage dedup, SemDeDup,
temperature mixing.

The driver fixtures contain no PII and no repeated passages, so these
tests exercise the operators on injected fixtures where the expected
behavior is hand-computable; oracle parity at sf0.01 is covered by
tests/test_oracle_parity.py via the registry.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from opc_ua_data_pipeline_spark.operators.dedup import passage_dedup
from opc_ua_data_pipeline_spark.operators.sampling import temperature_mix
from opc_ua_data_pipeline_spark.operators.similarity import semantic_dedup
from opc_ua_data_pipeline_spark.operators.text import pii_scrub


def test_pii_scrub_masks_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob@example.com and alice.smith@sub.domain.org end"),
            (2, "call 555-123-4567 or 555.987.6543 now"),
            (3, "host 192.168.0.1 and 10.0.255.254 up"),
            (4, "plain text with no pii at all"),
            (5, "mixed a@b.io 111-222-3333 8.8.8.8"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert out[1]["clean_text"] == "mail <EMAIL> and <EMAIL> end"
    assert out[1]["n_email"] == 2 and out[1]["n_phone"] == 0
    assert out[2]["clean_text"] == "call <PHONE> or <PHONE> now"
    assert out[2]["n_phone"] == 2
    assert out[3]["clean_text"] == "host <IP> and <IP> up"
    assert out[3]["n_ip"] == 2
    assert out[4]["clean_text"] == "plain text with no pii at all"
    assert (out[4]["n_email"], out[4]["n_phone"], out[4]["n_ip"]) == (0, 0, 0)
    assert out[5]["clean_text"] == "mixed <EMAIL> <PHONE> <IP>"


def test_pii_scrub_phone_not_eaten_by_ip_rule(spark):
    # 555.123.4567 is dotted-phone shaped; the IPv4 rule must not
    # partially consume it (the trailing \b forbids a 4-digit octet).
    df = spark.createDataFrame([(1, "x 555.123.4567 y")], ["doc_id", "text"])
    row = pii_scrub(df).collect()[0]
    assert row["clean_text"] == "x <PHONE> y"
    assert row["n_ip"] == 0


def _words(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_passage_dedup_keeps_first_occurrence(spark):
    first = _words("a", 16)  # doc 1 chunk 0
    second = _words("b", 16)  # doc 1 chunk 1
    df = spark.createDataFrame(
        [
            (1, f"{first} {second}"),
            (2, f"{first} {_words('c', 16)}"),  # chunk 0 dups doc 1
            (3, second),  # whole doc dups doc 1 chunk 1
            (4, _words("d", 5)),  # short tail chunk, unique
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in passage_dedup(df).collect()}
    assert out[1]["n_passages"] == 2 and out[1]["n_kept"] == 2
    assert out[2]["clean_text"] == _words("c", 16)
    assert out[2]["n_kept"] == 1
    assert out[3]["clean_text"] == "" and out[3]["n_kept"] == 0
    assert out[4]["clean_text"] == _words("d", 5)


def test_passage_dedup_within_doc_repeat(spark):
    p = _words("x", 16)
    df = spark.createDataFrame([(7, f"{p} {p}")], ["doc_id", "text"])
    row = passage_dedup(df).collect()[0]
    # second occurrence inside the same doc is removed too
    assert row["n_passages"] == 2 and row["n_kept"] == 1
    assert row["clean_text"] == p


def test_semantic_dedup_drops_dominated_ids(spark):
    v = [1.0, 0.5, 0.25, 0.125]
    w = [-1.0, 0.5, 0.25, 0.125]  # different sign bucket than v
    df = spark.createDataFrame(
        [(1, v, 0), (2, v, 0), (3, [2.0, 1.0, 0.5, 0.25], 0), (4, w, 1)],
        ["vec_id", "embedding", "label"],
    )
    df = df.withColumn("embedding", F.col("embedding").cast("array<float>"))
    kept = {r["vec_id"] for r in semantic_dedup(df, threshold=0.99).collect()}
    # 2 is an exact dup of 1 (cos=1), 3 is colinear with 1 (cos=1):
    # both dominated by vec_id 1.  4 is in another bucket -> kept.
    assert kept == {1, 4}


def test_temperature_mix_rates_and_determinism(spark):
    rows = [(i, "big") for i in range(400)] + [(10_000 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "src"])
    out = temperature_mix(df, "src", key="doc_id")
    rates = dict(
        out.select("src", "keep_rate").distinct().collect()
    )
    assert rates["small"] == 1.0
    assert abs(rates["big"] - math.sqrt(100 / 400)) < 1e-12
    counts = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert counts["small"] == 100  # rate 1.0 keeps everything
    # the hash gate keeps ~rate fraction of the big source
    assert 0.35 * 400 < counts["big"] < 0.65 * 400
    # content-determinism: same rows under a different partitioning
    again = temperature_mix(df.repartition(13), "src", key="doc_id")
    assert sorted(r["doc_id"] for r in again.collect()) == sorted(
        r["doc_id"] for r in out.collect()
    )


def test_psi_nonnegative_and_detects_shift(spark):
    """Each PSI term (q-p)*ln(q/p) is sign-coherent, so PSI >= 0; a
    genuinely shifted current window must score far above the
    no-shift case."""
    import datetime

    from pyspark.sql import functions as F

    from opc_ua_data_pipeline_spark.operators.dq import feature_drift_psi

    rows = []
    t0 = datetime.datetime(2024, 1, 1)
    for i in range(400):
        ref_t = t0 + datetime.timedelta(minutes=i)
        cur_t = datetime.datetime(2024, 1, 20) + datetime.timedelta(minutes=i)
        # stable: same distribution both windows
        rows.append(("stable", ref_t, float(i % 100)))
        rows.append(("stable", cur_t, float(i % 100)))
        # drifted: current window shifted by +200
        rows.append(("drifted", ref_t, float(i % 100)))
        rows.append(("drifted", cur_t, 200.0 + float(i % 100)))
    ev = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    out = {r["event_type"]: r for r in feature_drift_psi(ev).collect()}
    assert out["stable"]["psi"] >= 0.0
    assert out["drifted"]["psi"] >= 0.0
    assert out["stable"]["psi"] < 0.01
    assert out["drifted"]["psi"] > 0.25  # the standard "drifted" bar
    assert out["drifted"]["psi"] > 10 * out["stable"]["psi"]


def test_dsir_importance_separates_target(spark):
    """The whole point of DSIR: documents distributed like the target
    slice must score higher than off-target ones.  On the driver
    corpus (target = lang 'en') the mean log-importance of en docs
    must exceed every other language's mean."""
    from opc_ua_data_pipeline_spark.operators.curation import dsir_importance
    from opc_ua_data_pipeline_spark.tables import load_table

    rows = dsir_importance(
        load_table(spark, "/root/testdata/sf0.01", "documents")
    ).collect()
    by_lang: dict[str, list[float]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["log_importance"])
    means = {k: sum(v) / len(v) for k, v in by_lang.items()}
    for lang, mean in means.items():
        if lang != "en":
            assert means["en"] > mean, (lang, means)
