"""Trained quality classifier (round-8 verdict item 3): deterministic
full-batch logistic GD with a pinned trajectory — convergence
(strictly decreasing mse), engine-exact reproducibility of the loop,
and the trained-weights consumer (trained_budget_trim) semantics."""

from __future__ import annotations

from opc_ua_data_pipeline_spark.operators.curation import (
    CLF_TRAIN_ITERS,
    SOURCE_TOKEN_BUDGET,
    _clf_train_loop,
    train_quality_classifier,
    trained_budget_trim,
    trained_score_col,
)
from opc_ua_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_training_converges_and_is_deterministic(spark):
    docs = load_table(spark, SF_DIR, "documents")
    rows = train_quality_classifier(docs).orderBy("iter").collect()
    assert [r.iter for r in rows] == list(range(CLF_TRAIN_ITERS + 1))
    # zero init: step 0 predicts p=0.5 everywhere -> mse exactly 0.25
    assert rows[0].mse == 0.25
    assert all(
        getattr(rows[0], c) == 0.0
        for c in ("bias", "w_log_tokens", "w_stopword", "w_ttr", "w_mean_len")
    )
    # convergence certificate: the loss strictly decreases every step
    mses = [r.mse for r in rows]
    assert all(b < a for a, b in zip(mses, mses[1:])), mses
    # the model moved off the init
    assert any(
        getattr(rows[-1], c) != 0.0
        for c in ("bias", "w_log_tokens", "w_stopword", "w_ttr", "w_mean_len")
    )
    # deterministic: a second run reproduces the trajectory bit-for-bit
    rows2 = train_quality_classifier(docs).orderBy("iter").collect()
    assert rows == rows2


def test_trained_budget_trim_greedy_semantics(spark):
    docs = load_table(spark, SF_DIR, "documents")
    _, w = _clf_train_loop(docs)
    kept = trained_budget_trim(docs).collect()
    assert kept and all(r.cum_tokens <= SOURCE_TOKEN_BUDGET for r in kept)
    # kept scores match serving the trained weights directly
    scored = {
        r.doc_id: r.s
        for r in docs.select(
            "doc_id", trained_score_col(w).alias("s")
        ).collect()
    }
    assert all(r.quality_score == scored[r.doc_id] for r in kept)
    # greedy prefix property: within a source, every kept doc outranks
    # (score desc, doc_id asc) every dropped doc whose tokens would
    # still have fit the remaining budget at its position
    by_src: dict = {}
    for r in kept:
        by_src.setdefault(r.source, []).append(r)
    all_rows = (
        docs.select(
            "doc_id",
            "source",
            trained_score_col(w).alias("score"),
        ).collect()
    )
    for src, krows in by_src.items():
        kept_ids = {r.doc_id for r in krows}
        order = sorted(
            (r for r in all_rows if r.source == src),
            key=lambda r: (-(r.score if r.score is not None else -1), r.doc_id),
        )
        # the kept set is exactly the maximal prefix of the greedy
        # order whose running token total stays within budget
        run = 0
        want = set()
        ntok = {r.doc_id: r.n_tokens for r in krows}
        for r in order:
            t = ntok.get(r.doc_id)
            if t is None:
                break  # first dropped doc ends the prefix
            run += t
            if run > SOURCE_TOKEN_BUDGET:
                break
            want.add(r.doc_id)
        assert want == kept_ids, src
