"""Result-page pagination (SearchEngine.search_page): pages are pure
rank slices of the single deterministic total order — the invariant
the search_page2 driver row pins against the twin."""

from __future__ import annotations

import math

import pytest

from search_engine_spark.searcher import SearchEngine

QUERY = "world trade market"


def _rows(df):
    return [(r["rank"], r["url"], r["score"]) for r in
            df.orderBy("rank").collect()]


def test_pages_tile_the_full_ranking(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    full = _rows(eng.search(QUERY, 30))
    p1 = _rows(eng.search_page(QUERY, 10, page=1))
    p2 = _rows(eng.search_page(QUERY, 10, page=2))
    p3 = _rows(eng.search_page(QUERY, 10, page=3))
    got = p1 + p2 + p3
    assert [x[:2] for x in got] == [x[:2] for x in full]
    for x, y in zip(got, full):
        assert math.isclose(x[2], y[2], rel_tol=1e-9, abs_tol=1e-12)
    # ranks are GLOBAL: page 2 starts at 11
    assert p2[0][0] == 11 and p3[0][0] == 21


def test_page_past_the_end_is_empty(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    n = eng.search(QUERY, 100_000).count()
    beyond = n // 10 + 2
    assert eng.search_page(QUERY, 10, page=beyond).count() == 0


def test_page_validation(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    with pytest.raises(ValueError):
        eng.search_page(QUERY, 10, page=0)


def test_count_hits_equals_exhaustive_result_size(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    n = eng.count_hits(QUERY)
    assert n == eng.search(QUERY, 100_000).count() and n > 0
    assert eng.count_hits("zzzzqqqxxx") == 0
