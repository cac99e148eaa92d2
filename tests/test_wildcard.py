"""Trailing-wildcard search (SearchEngine.wildcard_search,
twin_wildcard_topk).

Pins the semantics the search_wildcard / ft_prefix_topk driver rows
rely on: a star-free query passes through unchanged (wildcard ≡ plain
search, per rank), the expansion equals the manual df-desc/term-asc
cap over the dictionary, max_expansions binds, unknown prefixes (and
a bare '*') produce the empty frame, and the engine ≡ raw-postings
twin equivalence holds per rank.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from search_engine_spark import twin as TW
from search_engine_spark.searcher import SearchEngine


def _rows(df):
    return [(r["rank"], r["url"], r["score"]) for r in
            df.orderBy("rank").collect()]


def _assert_rank_identical(a, b):
    ra, rb = _rows(a), _rows(b)
    assert [x[:2] for x in ra] == [x[:2] for x in rb]
    for x, y in zip(ra, rb):
        assert math.isclose(x[2], y[2], rel_tol=1e-9, abs_tol=1e-12)


def _manual_expansion(eng, prefix, max_expansions):
    rows = (
        eng.dictionary
        .filter(F.col("term_key").startswith(prefix))
        .select("term_key", "df")
        .collect()
    )
    rows.sort(key=lambda r: (-r["df"], r["term_key"]))
    return [r["term_key"] for r in rows[:max_expansions]]


def test_wildcard_noop_without_star(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    _assert_rank_identical(
        eng.wildcard_search("trade market", 10), eng.search("trade market", 10))


def test_wildcard_expansion_matches_manual_rule(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    exp = _manual_expansion(eng, "ma", 16)
    assert exp, "fixture vocabulary lost every 'ma' term"
    keys = sorted(set(exp) | set(eng.parse_query("trade")))
    _assert_rank_identical(
        eng.wildcard_search("trade ma*", 10), eng._search_keys(keys, 10))


def test_wildcard_cap_binds(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    full = _manual_expansion(eng, "ma", 16)
    if len(full) < 2:
        import pytest
        pytest.skip("fixture vocabulary has <2 'ma' terms; cap unexercisable")
    top1 = _manual_expansion(eng, "ma", 1)
    assert len(top1) == 1
    _assert_rank_identical(
        eng.wildcard_search("ma*", 10, max_expansions=1),
        eng._search_keys(top1, 10))


def test_wildcard_unknown_prefix_and_bare_star(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    assert eng.wildcard_search("zzzzqqq*", 10).count() == 0
    # a bare '*' is not a prefix; alone it yields the empty frame
    assert eng.wildcard_search("*", 10).count() == 0
    # alongside a live term it is ignored
    _assert_rank_identical(
        eng.wildcard_search("trade *", 10), eng.search("trade", 10))


def test_wildcard_engine_matches_twin(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    _assert_rank_identical(
        eng.wildcard_search("trade ma*", 10),
        TW.twin_wildcard_topk(spark, eng, "trade ma*", 10))
