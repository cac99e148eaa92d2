"""Stored query-result cache (operators/qcache.py): hit ≡ live
engine per rank, normalization folds word order into one entry,
k-mismatch and unknown queries miss (and the fallback serves),
index mutation makes every serve refuse."""

from __future__ import annotations

import math

import pytest

from search_engine_spark.operators import qcache as QC
from search_engine_spark.searcher import SearchEngine


def _rows(df):
    return [(r["rank"], r["url"], round(r["score"], 9)) for r in
            df.orderBy("rank").collect()]


def test_query_cache_lifecycle(spark, built_index, tmp_path):
    # the mutation phase below appends a segment, so work on a
    # snapshot — built_index is session-scoped and later suites pin
    # its exact stats (a contaminated fixture broke test_spark_index)
    src, cfg, _ = built_index
    from search_engine_spark.indexer import snapshot_index

    out = str(tmp_path / "qcache_ix")
    snapshot_index(src, out)
    eng = SearchEngine(spark, out, cfg)
    cache = str(tmp_path / "qcache")
    meta = QC.write_query_cache(eng, ["trade market", "nation policy"],
                                cache, 10)
    assert meta["n_queries"] == 2

    # hit == live, including under word-order permutation
    live = _rows(eng.search("trade market", 10))
    assert _rows(QC.cached_search(eng, cache, "trade market", 10)) == live
    assert _rows(QC.cached_search(eng, cache, "market  trade", 10)) == live

    # unknown query and mismatched k are misses; the fallback serves
    assert QC.cached_search(eng, cache, "water river", 10) is None
    assert QC.cached_search(eng, cache, "trade market", 5) is None
    fb = _rows(QC.cached_or_search(eng, cache, "water river"))
    assert fb == _rows(eng.search("water river", 10))

    # index mutation -> every cached serve refuses (stale top-k pages
    # are the one failure mode a result cache must never have)
    from search_engine_spark.incremental import add_documents

    extra = spark.createDataFrame(
        [("zz://new", None, b"", "trade market trade market", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string")
    add_documents(spark, extra, out, cfg)
    with pytest.raises(RuntimeError, match="STALE"):
        QC.cached_search(eng, cache, "trade market", 10)
    # rebuild against the moved index -> serves again
    eng2 = SearchEngine(spark, out, cfg)
    QC.write_query_cache(eng2, ["trade market"], cache, 10)
    got = _rows(QC.cached_search(eng2, cache, "trade market", 10))
    want = _rows(eng2.search("trade market", 10))
    assert got == want


def test_query_cache_all_misses(spark, built_index, tmp_path):
    """A cache built only from zero-hit queries leaves no
    schema-bearing parquet files: every lookup is a clean miss and
    the fallback serves."""
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    cache = str(tmp_path / "qcache_empty")
    QC.write_query_cache(eng, ["zzqqnonexistent"], cache, 10)
    assert QC.cached_search(eng, cache, "zzqqnonexistent", 10) is None
    got = QC.cached_or_search(eng, cache, "trade market")
    assert got.count() == eng.search("trade market", 10).count()
