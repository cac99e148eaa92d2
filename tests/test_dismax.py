"""DisjunctionMax scoring (SearchEngine.dismax_search): tie edges,
single-clause degeneracy, and the best-fields reordering property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark import twin as TW
from search_engine_spark.searcher import SearchEngine

QUERY = "world trade market"


def _engine(spark, built_index):
    out, cfg, _ = built_index
    return SearchEngine(spark, out, cfg)


def test_tie_one_equals_or_sum_and_tie_zero_is_best_clause(spark,
                                                           built_index):
    eng = _engine(spark, built_index)
    plain = {r["url"]: r["score"] for r in eng.search(QUERY, 50).collect()}
    t1 = {r["url"]: r["score"] for r in
          eng.dismax_search(QUERY, 50, tie=1.0).collect()}
    # tie=1 degenerates to the OR-sum: same docs, same scores up to
    # float association (sum of parts vs part-wise blended sums)
    assert set(t1) == set(plain)
    for u in t1:
        assert abs(t1[u] - plain[u]) < 1e-9
    # tie=0 is pure best-clause: every score is <= the OR-sum and
    # equals the max single-term part, so multi-term docs drop
    t0 = {r["url"]: r["score"] for r in
          eng.dismax_search(QUERY, 50, tie=0.0).collect()}
    # best-clause scoring reorders, so the two top-50 cuts differ;
    # on the shared docs the best-clause score is <= the OR-sum
    shared = set(t0) & set(plain)
    assert shared
    for u in shared:
        assert t0[u] <= plain[u] + 1e-12


def test_single_term_query_matches_plain_search(spark, built_index):
    eng = _engine(spark, built_index)
    one = [r for r in eng.search("world", 20).collect()]
    dm = [r for r in eng.dismax_search("world", 20, tie=0.37).collect()]
    assert [(r["url"], r["rank"]) for r in dm] == \
        [(r["url"], r["rank"]) for r in one]
    for a, b in zip(dm, one):
        assert abs(a["score"] - b["score"]) < 1e-12


def test_engine_matches_twin_per_rank(spark, built_index):
    eng = _engine(spark, built_index)
    e = eng.dismax_search(QUERY, 20, tie=0.3).collect()
    t = TW.twin_dismax_topk(spark, eng, QUERY, 0.3, 20).collect()
    assert [r["url"] for r in e] == [r["url"] for r in t] and len(e) == 20
    for a, b in zip(e, t):
        assert abs(a["score"] - b["score"]) < 1e-9


def test_validation(spark, built_index):
    eng = _engine(spark, built_index)
    with pytest.raises(ValueError):
        eng.dismax_search(QUERY, 10, tie=1.5)
    with pytest.raises(ValueError):
        eng.dismax_search(QUERY, 10, tie=-0.1)
    assert eng.dismax_search("zzzznotaword", 10).count() == 0
