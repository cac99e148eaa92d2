"""LTR plumbing (operators/ltr.py): feature extraction over the
packed index, prior joins, and the micro-grid linear rescorer."""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_spark.operators import ltr as LTR
from search_engine_spark.searcher import SearchEngine


def test_ltr_features_and_rescore(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    q = "trade market"

    feats = LTR.ltr_features(eng, q, 30)
    rows = {r["url"]: r for r in feats.collect()}
    assert 0 < len(rows) <= 30

    # f_bm25 ordering matches the engine's own top-k restricted to
    # the window, and f_match/f_dl carry sane values
    top = [r["url"] for r in eng.search(q, 30).orderBy("rank").collect()]
    assert set(rows) == set(top[:len(rows)])
    assert all(1 <= r["f_match"] <= 2 for r in rows.values())
    assert all(r["f_dl"] > 0 for r in rows.values())

    # bm25-only weights reproduce the engine ranking exactly
    only_bm25 = LTR.ltr_rescore(feats, {"f_bm25": 1.0}, 10)
    got = [r["url"] for r in only_bm25.orderBy("rank").collect()]
    assert got == top[:10]

    # a strong dl penalty must reorder (prefer short docs)
    penal = LTR.ltr_rescore(feats, {"f_bm25": 1.0, "f_dl": -0.01}, 10)
    assert [r["url"] for r in penal.orderBy("rank").collect()] != got

    # prior columns join by url, absent urls coalesce to 0, and a
    # heavy prior dominates the ranking
    best = got[5]
    prior = spark.createDataFrame([(best, 1000.0)], "url string, boost double")
    f2 = LTR.ltr_features(eng, q, 30, priors=prior, prior_cols=["boost"])
    r2 = LTR.ltr_rescore(f2, {"f_bm25": 1.0, "boost": 1.0}, 3)
    assert r2.orderBy("rank").first()["url"] == best

    # empty query -> empty features
    assert LTR.ltr_features(eng, "the of", 10).count() == 0
