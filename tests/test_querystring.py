"""Query-string dispatch (searcher.split_query_string +
SearchEngine.query_string_search): each syntax routes to the already-
oracled engine path, and the composed form equals the explicitly
composed call — the invariants the search_querystring driver row
pins against the twin."""

from __future__ import annotations

import math

import pytest

from search_engine_spark import twin as TW
from search_engine_spark.searcher import SearchEngine, split_query_string


def _rows(df):
    return [(r["rank"], r["url"], r["score"]) for r in
            df.orderBy("rank").collect()]


def _assert_rank_identical(a, b):
    ra, rb = _rows(a), _rows(b)
    assert [x[:2] for x in ra] == [x[:2] for x in rb]
    for x, y in zip(ra, rb):
        assert math.isclose(x[2], y[2], rel_tol=1e-9, abs_tol=1e-12)


def test_split_query_string_clauses():
    assert split_query_string('+a b -c d* "x y"') == (
        ["x y"], ["a"], ["b"], ["c"], ["d"])
    # stray operators and empty quotes are dropped, not crashed on
    assert split_query_string('+ - * ""') == ([], [], [], [], [])
    with pytest.raises(ValueError, match="wildcard"):
        split_query_string("+tab*")


def test_bare_terms_equal_plain_search(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    _assert_rank_identical(
        eng.query_string_search("trade market", 10),
        eng.search("trade market", 10))


def test_boolean_clauses_equal_explicit_call(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    _assert_rank_identical(
        eng.query_string_search("+trade market -growth", 10),
        eng.boolean_search("trade", "market", "growth", 10))


def test_wildcard_only_equals_wildcard_search(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    _assert_rank_identical(
        eng.query_string_search("trade ma*", 10),
        eng.wildcard_search("trade ma*", 10))


def test_phrase_routes_to_phrase_search(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    if not eng.cfg.keep_positions:
        # the fixture index has no positions: routing is still proven
        # because the phrase path's own refusal propagates verbatim
        with pytest.raises(ValueError, match="keep_positions"):
            eng.query_string_search('"world trade"', 10)
        return
    _assert_rank_identical(
        eng.query_string_search('"world trade"', 10),
        eng.phrase_search("world trade", 10))


def test_mixed_must_plus_wildcard_matches_twin(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    qs = "+trade ma* -growth"
    _assert_rank_identical(
        eng.query_string_search(qs, 10),
        TW.twin_querystring_topk(spark, eng, qs, 10))


def test_phrase_mixed_with_clauses_rejected(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    with pytest.raises(ValueError, match="whole query"):
        eng.query_string_search('+trade "world trade"', 10)
