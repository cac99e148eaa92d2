"""Resharding (incremental.reshard_index) — ES _shrink/_split.

Contract under test: the doc shard is a pure function of the raw
store, so resharding is a full derived rebuild that (a) preserves
every ranking bit-for-bit at the search surface, (b) lands the index
on the new physical layout, (c) equals a fresh build over the same
corpus at the new layout, and (d) refuses non-quiescent indexes."""

from __future__ import annotations

import dataclasses
import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark.incremental import (
    add_documents,
    delete_documents,
    reshard_index,
)
from search_engine_spark.indexer import IndexPaths, build_index, snapshot_index
from search_engine_spark.searcher import SearchEngine

QUERY = "world trade market"
NEW_SHARDS = 3


def _rows(df):
    return [(r["rank"], r["url"], r["score"]) for r in
            df.orderBy("rank").collect()]


@pytest.fixture(scope="module")
def resharded(spark, built_index, tmp_path_factory):
    """Snapshot the session index (8 shards), reshard the copy to 3."""
    out, cfg, _ = built_index
    dst = str(tmp_path_factory.mktemp("resh")) + "/ix"
    snapshot_index(out, dst)
    before = _rows(SearchEngine(spark, dst, cfg).search(QUERY, 20))
    meta = reshard_index(spark, dst, NEW_SHARDS, cfg)
    new_cfg = dataclasses.replace(cfg, n_doc_shards=NEW_SHARDS)
    return dst, cfg, new_cfg, before, meta


def test_ranking_survives_reshard(spark, resharded):
    dst, _, new_cfg, before, meta = resharded
    assert meta["n_doc_shards"] == NEW_SHARDS
    after = _rows(SearchEngine(spark, dst, new_cfg).search(QUERY, 20))
    assert [x[:2] for x in after] == [x[:2] for x in before]
    for a, b in zip(after, before):
        assert math.isclose(a[2], b[2], rel_tol=1e-9, abs_tol=1e-12)


def test_layout_actually_moved(spark, resharded):
    dst = resharded[0]
    paths = IndexPaths(dst)
    shards = {r["shard"] for r in
              spark.read.parquet(paths.doc_stats).select("shard")
              .distinct().collect()}
    assert shards == set(range(NEW_SHARDS))
    ix_shards = {r["shard"] for r in
                 spark.read.parquet(paths.index).select("shard")
                 .distinct().collect()}
    assert ix_shards <= set(range(NEW_SHARDS))


def test_matches_fresh_build_at_new_layout(spark, resharded,
                                           fixture_pages_parquet,
                                           tmp_path_factory):
    dst, _, new_cfg, _, _ = resharded
    fresh_dir = str(tmp_path_factory.mktemp("fresh3"))
    pages = spark.read.parquet(fixture_pages_parquet)
    build_index(spark, pages, fresh_dir, new_cfg)
    # doc-level layout identical: same (url, shard, local_id, length)
    cols = ["url", "shard", "local_id", "length"]
    a = spark.read.parquet(IndexPaths(dst).doc_stats).select(cols)
    b = spark.read.parquet(IndexPaths(fresh_dir).doc_stats).select(cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # and the search surface agrees
    ra = _rows(SearchEngine(spark, dst, new_cfg).search(QUERY, 20))
    rb = _rows(SearchEngine(spark, fresh_dir, new_cfg).search(QUERY, 20))
    assert [x[:2] for x in ra] == [x[:2] for x in rb]
    for x, y in zip(ra, rb):
        assert math.isclose(x[2], y[2], rel_tol=1e-9, abs_tol=1e-12)


def test_append_after_reshard(spark, resharded):
    dst, _, new_cfg, _, _ = resharded
    eng = SearchEngine(spark, dst, new_cfg)
    n0 = eng.count_hits(QUERY)
    delta = spark.createDataFrame(
        [("http://resh.example/new", None, None,
          "world trade market reshard smoke page", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string")
    add_documents(spark, delta, dst, new_cfg)
    eng = SearchEngine(spark, dst, new_cfg)
    assert eng.count_hits(QUERY) == n0 + 1
    got = {r["url"] for r in eng.search("reshard smoke", 5).collect()}
    assert got == {"http://resh.example/new"}


def test_refusals(spark, built_index, tmp_path_factory):
    out, cfg, _ = built_index
    dst = str(tmp_path_factory.mktemp("resh_refuse")) + "/ix"
    snapshot_index(out, dst)
    with pytest.raises(ValueError):
        reshard_index(spark, dst, 0, cfg)
    # wrong current-layout cfg refuses before touching anything
    bad = dataclasses.replace(cfg, n_term_buckets=cfg.n_term_buckets * 2)
    with pytest.raises(ValueError):
        reshard_index(spark, dst, NEW_SHARDS, bad)
    # non-quiescent: tombstones present
    victim = spark.read.parquet(IndexPaths(dst).doc_stats) \
        .select("url").orderBy("url").limit(1).collect()[0]["url"]
    delete_documents(spark, [victim], dst)
    with pytest.raises(RuntimeError):
        reshard_index(spark, dst, NEW_SHARDS, cfg)


def test_same_count_is_a_noop(spark, built_index, tmp_path_factory):
    out, cfg, _ = built_index
    dst = str(tmp_path_factory.mktemp("resh_noop")) + "/ix"
    snapshot_index(out, dst)
    import os

    lineage_before = sorted(os.listdir(IndexPaths(dst).lineage))
    meta = reshard_index(spark, dst, cfg.n_doc_shards, cfg)
    assert meta["n_doc_shards"] == cfg.n_doc_shards
    assert sorted(os.listdir(IndexPaths(dst).lineage)) == lineage_before
