"""Recrawl supersede (incremental.update_documents).

Contract under test — Lucene's updateDocument, at O(delta):

* the new version is visible immediately and the old one gone from
  every query path (exhaustive + WAND), with NO compaction;
* pre-compaction answers are exactly the stats-as-packed semantics —
  the gen-aware raw-postings twin (twin.py) recomputes them
  independently and must agree per rank and score;
* a url never surfaces twice, even for terms both versions share
  (the masking is per (shard, local_id) version, not per url);
* compaction then collapses the index to bit-identical with a fresh
  build over the updated corpus;
* guard rails: deleted urls refuse updates (their url-level tombstone
  would mask the replacement), intra-delta duplicates refuse, and a
  mixed batch of brand-new + re-crawled urls lands in one call.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from search_engine_spark import twin as TW
from search_engine_spark.config import EngineConfig
from search_engine_spark.fixtures import REFERENCE_QUERIES
from search_engine_spark.incremental import (
    compact_index,
    delete_documents,
    update_documents,
)
from search_engine_spark.indexer import IndexPaths, build_index
from search_engine_spark.searcher import SearchEngine
from search_engine_spark.wand import wand_search

CFG = EngineConfig(n_doc_shards=8, n_term_buckets=8, n_bucket_groups=4)
QUERIES = [t + ("@" + d if d else "") for _, t, d in REFERENCE_QUERIES[:5]]
NEW_URL = "http://news.example/brand-new-page"


@pytest.fixture(scope="module")
def upd_case(spark, fixture_pages_parquet, tmp_path_factory):
    """Full-corpus index, then ONE update_documents call superseding 7
    urls (new text keeps a 40-char prefix of the old — both versions
    share terms, so unmasked old rows would duplicate urls) and adding
    one brand-new url in the same mixed batch."""
    out = str(tmp_path_factory.mktemp("upd_index"))
    pages = spark.read.parquet(fixture_pages_parquet)
    build_index(spark, pages, out, CFG)
    victims = [r["url"] for r in
               pages.select("url").orderBy("url").limit(7).collect()]
    new_versions = pages.filter(F.col("url").isin(victims)).withColumn(
        "text",
        F.concat(F.lit("qqrecrawled fresh edition "),
                 F.substring(F.col("text"), 1, 40)),
    )
    brand_new = (
        pages.orderBy("url").limit(1)
        .withColumn("url", F.lit(NEW_URL))
        .withColumn("text", F.lit("qqrecrawled brand new page body"))
    )
    update_documents(spark, new_versions.unionByName(brand_new), out, CFG)
    return out, pages, victims, new_versions.unionByName(brand_new)


def _top(df):
    return [(r["rank"], r["url"], r["score"]) for r in df.orderBy("rank").collect()]


def test_new_text_visible_and_urls_unique(spark, upd_case):
    out, _, victims, _ = upd_case
    eng = SearchEngine(spark, out, CFG)
    hits = eng.search("qqrecrawled", 50).collect()
    assert {r["url"] for r in hits} == set(victims) | {NEW_URL}
    # shared-term query: both versions contain the 40-char prefix's
    # terms — the superseded generation must not surface the url twice
    for q in QUERIES:
        urls = [r["url"] for r in eng.search(q, 30).collect()]
        assert len(urls) == len(set(urls)), q


def test_precompact_matches_gen_aware_twin(spark, upd_case):
    out, _, _, _ = upd_case
    eng = SearchEngine(spark, out, CFG)
    for q in QUERIES + ["qqrecrawled fresh"]:
        e = _top(eng.search(q, 20))
        t = _top(TW.twin_bm25_topk(spark, eng, q, 20))
        assert [(r, u) for r, u, _ in e] == [(r, u) for r, u, _ in t], q
        for (_, _, es), (_, _, ts) in zip(e, t):
            assert abs(es - ts) < 1e-9, q


def test_precompact_wand_rank_identical(spark, upd_case):
    out, _, _, _ = upd_case
    eng = SearchEngine(spark, out, CFG)
    for q in QUERIES + ["qqrecrawled fresh"]:
        e = _top(eng.search(q, 20))
        w = _top(wand_search(eng, q, 20))
        assert [(r, u) for r, u, _ in e] == [(r, u) for r, u, _ in w], q


def test_stats_as_packed_until_compact(spark, upd_case):
    out, pages, victims, _ = upd_case
    paths = IndexPaths(out)
    # doc_stats keeps the superseded generation's rows (N counts them,
    # Lucene collection-stats contract) — one extra row per victim
    # plus the brand-new url
    n_rows = spark.read.parquet(paths.doc_stats).count()
    assert n_rows == pages.count() + len(victims) + 1
    dead = spark.read.parquet(paths.tombstones)
    assert dead.filter(F.col("gen").isNotNull()).count() == len(victims)
    assert dead.filter(F.col("gen").isNull()).count() == 0


def test_compact_equals_fresh_build_over_updated_corpus(
        spark, upd_case, tmp_path_factory):
    out, pages, victims, delta = upd_case
    # compact a COPY: the module fixture's pre-compact state feeds the
    # other tests
    cp = str(tmp_path_factory.mktemp("upd_compacted")) + "/ix"
    shutil.copytree(out, cp)
    compact_index(spark, cp, CFG)
    paths = IndexPaths(cp)
    assert spark.read.parquet(paths.doc_stats).count() == pages.count() + 1
    ref = str(tmp_path_factory.mktemp("upd_ref"))
    merged = pages.filter(~F.col("url").isin(victims)).unionByName(delta)
    build_index(spark, merged, ref, CFG)
    eng_c = SearchEngine(spark, cp, CFG)
    eng_r = SearchEngine(spark, ref, CFG)
    for q in QUERIES + ["qqrecrawled fresh"]:
        c = _top(eng_c.search(q, 20))
        r = _top(eng_r.search(q, 20))
        assert [(rk, u) for rk, u, _ in c] == [(rk, u) for rk, u, _ in r], q
        for (_, _, cs), (_, _, rs) in zip(c, r):
            assert abs(cs - rs) < 1e-9, q


def test_update_guards(spark, upd_case):
    out, pages, _, _ = upd_case
    one = pages.orderBy(F.desc("url")).limit(1)
    # intra-delta duplicate urls refuse before any mutation
    with pytest.raises(ValueError, match="duplicate url"):
        update_documents(spark, one.unionByName(one), out, CFG)
    # a DELETED url refuses an update (probe on a copy: the delete
    # must not leak into the shared fixture index)
    import tempfile

    cp = tempfile.mkdtemp(prefix="upd_guard_") + "/ix"
    shutil.copytree(out, cp)
    try:
        victim = one.select("url").first()["url"]
        delete_documents(spark, [victim], cp)
        with pytest.raises(ValueError, match="DELETED"):
            update_documents(spark, one, cp, CFG)
        # delete of an UPDATED url kills the replacement too
        upd2 = pages.orderBy("url").limit(1)
        u2 = upd2.select("url").first()["url"]
        update_documents(
            spark, upd2.withColumn("text", F.lit("xxonceagain revised")), cp, CFG)
        eng = SearchEngine(spark, cp, CFG)
        assert {r["url"] for r in eng.search("xxonceagain", 5).collect()} == {u2}
        delete_documents(spark, [u2], cp)
        eng = SearchEngine(spark, cp, CFG)
        assert eng.search("xxonceagain", 5).count() == 0
    finally:
        shutil.rmtree(cp, ignore_errors=True)
