"""Multinomial NB classifier: hand-computed log-likelihoods, Laplace
smoothing for unseen tokens, deterministic argmax tie-break, and the
plan shapes (token-keyed model join with no forced broadcast)."""

from __future__ import annotations

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from search_engine_spark.operators import classify as CL  # noqa: E402


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_hand_computed_scores_and_prediction(spark):
    train = _docs(spark, [
        (0, "a a a b b", "en"),   # en counts: a=3, b=2 (tot 5)
        (2, "c c", "de"),         # de counts: c=2 (tot 2)
    ])
    test = _docs(spark, [(1, "a c", "en")])
    model, classes = CL.train_nb(train)
    (row,) = CL.predict_nb(test, model, classes).collect()
    # V=3; en: prior 1/2, denom log2(5+3)=3; de: prior 1/2, denom log2(5)
    # score(en) = log2(.5) + [a: log2(3+1)=2, c unseen: 0] - 2*3  = -5
    # score(de) = log2(.5) + [c: log2(2+1)]            - 2*log2(5)
    want_en = -1 + 2 - 6
    want_de = -1 + math.log2(3) - 2 * math.log2(5)
    # de wins: its token total is smaller, so the per-token denominator
    # penalty is lighter — and the true label was en, so is_correct=False
    assert want_de > want_en
    assert row.pred == "de"
    assert row.score == pytest.approx(want_de, abs=1e-6)
    assert bool(row.is_correct) is False


def test_unseen_token_smoothing_only_shifts_by_denom(spark):
    """A token unseen in EVERY class contributes exactly
    -log2_denom_c per occurrence (log2(0+1)=0 on the matched side)."""
    train = _docs(spark, [(0, "a", "en")])
    model, classes = CL.train_nb(train)
    s1 = {r.label: r.score_micro
          for r in CL.score_nb(_docs(spark, [(1, "z", "en")]),
                               model, classes).collect()}
    s2 = {r.label: r.score_micro
          for r in CL.score_nb(_docs(spark, [(1, "z z", "en")]),
                               model, classes).collect()}
    # doubling the unseen token doubles only the len * denom term
    denom_micro = math.log2(1 + 1) * CL.MICRO  # tot_en=1, V=1
    assert s1["en"] - s2["en"] == pytest.approx(denom_micro, abs=1)


def test_argmax_tie_breaks_on_greater_label(spark):
    """Symmetric classes + an unseen-token test doc -> equal scores;
    the winner must be the lexicographically greater label."""
    train = _docs(spark, [(0, "a", "en"), (2, "b", "de")])
    test = _docs(spark, [(1, "zz", "de")])
    model, classes = CL.train_nb(train)
    scored = {r.label: r.score_micro
              for r in CL.score_nb(test, model, classes).collect()}
    assert scored["en"] == scored["de"]
    (row,) = CL.predict_nb(test, model, classes).collect()
    assert row.pred == "en"


def test_empty_doc_still_predicted(spark):
    """A token-less test doc must not vanish: it scores exactly the
    class prior (len 0) and the prior-argmax wins."""
    train = _docs(spark, [(0, "a a a", "en"), (2, "b", "de"), (4, "a", "en")])
    test = _docs(spark, [(1, "", "en"), (3, "   ", "de")])
    model, classes = CL.train_nb(train)
    rows = {r.doc_id: r for r in CL.predict_nb(test, model, classes).collect()}
    assert set(rows) == {1, 3}
    # priors: en 2/3, de 1/3 -> en wins for both
    assert rows[1].pred == "en" and rows[3].pred == "en"
    assert rows[1].score == pytest.approx(math.log2(2 / 3), abs=1e-6)


def test_model_join_not_force_broadcast(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model, classes = CL.train_nb(docs)
    out = CL.score_nb(docs, model, classes)
    assert "ResolvedHint" not in out._jdf.queryExecution().analyzed().toString()


def test_accuracy_beats_prior_on_separable_corpus(spark):
    """Sanity: when classes have disjoint vocabularies the classifier
    must get every test doc right (it is NB, after all)."""
    rows = []
    for i in range(40):
        lang = "en" if i % 2 == 0 else "de"
        word = "hello" if lang == "en" else "hallo"
        rows.append((i, " ".join([word] * (3 + i % 3)), lang))
    all_docs = _docs(spark, rows)
    train = all_docs.filter("doc_id < 30")
    test = all_docs.filter("doc_id >= 30")
    model, classes = CL.train_nb(train)
    got = CL.predict_nb(test, model, classes).collect()
    assert len(got) == 10
    assert all(r.is_correct for r in got)
