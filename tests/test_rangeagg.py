"""ES `range` / `rare_terms` aggregations under a query context
(SearchEngine.search_range_agg / search_rare_terms): half-open
caller-defined bands with overlap + zero-fill, and the exact
long-tail facet selection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.searcher import SearchEngine
from search_engine_spark import twin as TW

QUERY = "world trade market"


def _engine(spark, built_index):
    out, cfg, _ = built_index
    return SearchEngine(spark, out, cfg)


def test_bands_overlap_zero_fill_and_half_open_bounds(spark, built_index):
    eng = _engine(spark, built_index)
    urls = [r["url"] for r in eng.matching_urls(QUERY).orderBy("url")
            .limit(4).collect()]
    assert len(urls) == 4
    # values 5, 10, 10, 25: [None,10) -> 1; [5,20) overlaps it -> 3
    # (10 is IN [5,20) but NOT in [None,10) — half-open); [20,None)
    # -> 1; [100,200) -> 0 but still a row
    vals = spark.createDataFrame(
        list(zip(urls, [5, 10, 10, 25])), "url string, v long")
    bands = [(None, 10), (5, 20), (20, None), (100, 200)]
    rows = {r["band"]: r for r in
            eng.search_range_agg(QUERY, vals, "v", bands).collect()}
    assert {b: rows[b]["n_docs"] for b in range(4)} == {0: 1, 1: 3, 2: 1, 3: 0}
    assert rows[1]["frm"] == 5 and rows[1]["to"] == 20
    assert rows[0]["frm"] is None and rows[2]["to"] is None


def test_doc_counts_once_per_band_with_multiple_values(spark, built_index):
    eng = _engine(spark, built_index)
    url = eng.matching_urls(QUERY).orderBy("url").first()["url"]
    # one doc, two values in the same band: counts once
    vals = spark.createDataFrame(
        [(url, 3), (url, 7)], "url string, v long")
    got = eng.search_range_agg(QUERY, vals, "v", [(0, 10)]).collect()
    assert [(r["band"], r["n_docs"]) for r in got] == [(0, 1)]


def test_engine_matches_band_join_twin(spark, built_index):
    eng = _engine(spark, built_index)
    vals = eng.matching_urls(QUERY).select(
        "url", F.length("url").cast("long").alias("v"))
    bands = [(None, 12), (10, 14), (12, None)]
    e = {r["band"]: r["n_docs"] for r in
         eng.search_range_agg(QUERY, vals, "v", bands).collect()}
    t = {r["band"]: r["n_docs"] for r in
         TW.twin_range_agg(spark, eng, QUERY, vals, "v", bands).collect()}
    assert e == t and sum(e.values()) > 0


def test_range_validation(spark, built_index):
    eng = _engine(spark, built_index)
    vals = spark.createDataFrame([("u", 1)], "url string, v long")
    with pytest.raises(ValueError):
        eng.search_range_agg(QUERY, vals, "v", [])
    with pytest.raises(ValueError):
        eng.search_range_agg(QUERY, vals, "v", [(None, None)])
    with pytest.raises(ValueError):
        eng.search_range_agg(QUERY, vals, "v", [(5, 5)])


def test_rare_terms_is_facets_tail(spark, built_index):
    eng = _engine(spark, built_index)
    # high-cardinality dimension: the url itself -> every facet has
    # n_docs == 1, so max_doc_count=1 keeps all and the selection
    # equals the full facet frame
    dims = eng.matching_urls(QUERY).select("url", F.col("url").alias("d"))
    full = {r["facet"]: r["n_docs"] for r in
            eng.search_facets(QUERY, dims, "d").collect()}
    rare = {r["facet"]: r["n_docs"] for r in
            eng.search_rare_terms(QUERY, dims, "d", 1).collect()}
    assert rare == full and rare
    # a constant dimension is carried by every matching doc -> above
    # any small ceiling, selection is empty
    const = dims.select("url", F.lit("x").alias("d"))
    assert eng.search_rare_terms(QUERY, const, "d", 1).count() == 0


def test_rare_terms_validation(spark, built_index):
    eng = _engine(spark, built_index)
    dims = spark.createDataFrame([("u", "a")], "url string, d string")
    with pytest.raises(ValueError):
        eng.search_rare_terms(QUERY, dims, "d", 0)


def test_missing_counts_docs_without_attribute(spark, built_index):
    eng = _engine(spark, built_index)
    match = eng.matching_urls(QUERY)
    n_match = match.count()
    # every other matching doc gets an attribute row
    half = match.orderBy("url").limit(n_match // 2)
    got = eng.search_missing(QUERY, half).first()["n_docs"]
    assert got == n_match - n_match // 2
    # empty dims: every matching doc is missing; full dims: none
    empty = spark.createDataFrame([], "url string")
    assert eng.search_missing(QUERY, empty).first()["n_docs"] == n_match
    assert eng.search_missing(QUERY, match).first()["n_docs"] == 0
    t = TW.twin_missing(spark, eng, QUERY, half).first()["n_docs"]
    assert t == got


def test_sampler_full_rate_and_determinism(spark, built_index):
    eng = _engine(spark, built_index)
    dims = eng.matching_urls(QUERY).select(
        "url", F.substring("url", 1, 12).alias("d"))
    full = sorted(map(tuple,
                      eng.search_facets(QUERY, dims, "d").collect()))
    # rate 1e6 keeps everything: identical to the plain facets
    s_all = sorted(map(tuple, eng.search_facets_sampled(
        QUERY, dims, "d", 1_000_000, "x").collect()))
    assert s_all == full
    # a partial rate is a strict subset with identical counts per
    # kept facet... counts can shrink; assert subset of facet keys
    # and determinism across calls and vs the twin
    a = sorted(map(tuple, eng.search_facets_sampled(
        QUERY, dims, "d", 300_000, "x").collect()))
    b = sorted(map(tuple, eng.search_facets_sampled(
        QUERY, dims, "d", 300_000, "x").collect()))
    assert a == b and 0 < len(a) <= len(full)
    t = sorted(map(tuple, TW.twin_facets_sampled(
        spark, eng, QUERY, dims, "d", 300_000, "x").collect()))
    assert a == t
    # a different salt picks a different sample (overwhelmingly)
    c = sorted(map(tuple, eng.search_facets_sampled(
        QUERY, dims, "d", 300_000, "y").collect()))
    assert c != a or len(full) <= 1
    with pytest.raises(ValueError):
        eng.search_facets_sampled(QUERY, dims, "d", 0)
    with pytest.raises(ValueError):
        eng.search_facets_sampled(QUERY, dims, "d", 2_000_000)
