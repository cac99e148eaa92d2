"""Per-hit match evidence (SearchEngine.search_matched): the ranking
is exactly search()'s, and each hit's ``matched`` array is exactly the
set of parsed query term keys on the doc's posting lists."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from search_engine_spark.searcher import SearchEngine

QUERY = "world trade market"


def test_ranking_identical_to_search(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    plain = [(r["rank"], r["url"], r["score"])
             for r in eng.search(QUERY, 15).orderBy("rank").collect()]
    withm = [(r["rank"], r["url"], r["score"])
             for r in eng.search_matched(QUERY, 15).orderBy("rank").collect()]
    assert [x[:2] for x in plain] == [x[:2] for x in withm]
    for a, b in zip(plain, withm):
        assert math.isclose(a[2], b[2], rel_tol=1e-9, abs_tol=1e-12)


def test_matched_sets_agree_with_raw_postings(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    keys = eng.parse_query(QUERY)
    hits = eng.search_matched(QUERY, 15).collect()
    assert hits
    raw = (
        spark.read.parquet(eng.paths.postings_raw)
        .filter(F.col("term_key").isin(list(keys)))
        .groupBy("url")
        .agg(F.sort_array(F.collect_set("term_key")).alias("want"))
    )
    want = {r["url"]: r["want"] for r in raw.collect()}
    for h in hits:
        assert h["matched"] == want[h["url"]]
        assert set(h["matched"]) <= set(keys)
        assert h["matched"] == sorted(h["matched"])


def test_single_term_query(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    keys = eng.parse_query("world")
    assert len(keys) == 1
    for h in eng.search_matched("world", 5).collect():
        assert h["matched"] == keys


def test_unknown_query_empty_with_schema(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    empty = eng.search_matched("zzzzqqqq", 5)
    assert empty.count() == 0
    assert empty.columns == ["url", "score", "rank", "matched"]
