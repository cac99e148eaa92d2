"""ES numeric histogram (SearchEngine.search_histogram): exact BIGINT
floor bucketing — including toward -inf for negatives, where a
truncating integer division would round the wrong way."""

from __future__ import annotations

import pytest

from search_engine_spark.searcher import SearchEngine

QUERY = "world trade market"


def test_floor_bucketing_including_negatives(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    urls = [r["url"] for r in eng.matching_urls(QUERY).orderBy("url")
            .limit(4).collect()]
    assert len(urls) == 4
    vals = spark.createDataFrame(
        list(zip(urls, [-5, -4, 3, 9])), "url string, v long")
    got = {r["bucket"]: r["n_docs"]
           for r in eng.search_histogram(QUERY, vals, "v", 4).collect()}
    # floor multiples of 4: -5 -> -8, -4 -> -4, 3 -> 0, 9 -> 8
    assert got == {-8: 1, -4: 1, 0: 1, 8: 1}


def test_counts_match_facets_on_the_derived_dim(spark, built_index):
    from pyspark.sql import functions as F

    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    vals = eng.matching_urls(QUERY).select(
        "url", F.length("url").cast("long").alias("v"))
    hist = {r["bucket"]: r["n_docs"]
            for r in eng.search_histogram(QUERY, vals, "v", 7).collect()}
    dims = vals.select(
        "url", (F.col("v") - F.pmod(F.col("v"), F.lit(7))).alias("b"))
    facets = {r["facet"]: r["n_docs"]
              for r in eng.search_facets(QUERY, dims, "b").collect()}
    assert hist == facets and hist


def test_validation(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    vals = spark.createDataFrame([("u", 1)], "url string, v long")
    with pytest.raises(ValueError):
        eng.search_histogram(QUERY, vals, "v", 0)
