"""Tombstone deletes (incremental.delete_documents) — Lucene
visibility semantics, then exact purge at compaction.

Invariants:

1. Visibility: immediately after delete, no query path (exhaustive,
   WAND, batch, phrase, entities) returns a deleted url.
2. Stale-stats scoring: surviving docs keep their EXACT pre-delete
   scores (N/df/avgdl untouched until compaction), so the tombstoned
   top-k equals the pre-delete ranking with deleted urls filtered out.
3. WAND soundness: deleted docs are masked before the θ bootstrap — a
   dead high scorer must not prune a live doc.  WAND on the
   tombstoned index stays rank-identical to the tombstoned exhaustive
   scorer.
4. Purge: compact_index rewrites raw without the deleted urls and
   rebuilds derived stages — the result answers bit-identically to a
   fresh build over (corpus − deleted).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.fixtures import REFERENCE_QUERIES
from search_engine_spark.incremental import compact_index, delete_documents
from search_engine_spark.indexer import IndexPaths, build_index
from search_engine_spark.searcher import SearchEngine
from search_engine_spark.wand import wand_search

QUERIES = [t + ("@" + d if d else "") for _, t, d in REFERENCE_QUERIES[:6]]
CFG = EngineConfig(n_doc_shards=8, n_term_buckets=8, n_bucket_groups=2)


def _top(df):
    return [(r["url"], r["score"]) for r in df.collect()]


@pytest.fixture(scope="module")
def del_index(spark, fixture_pages_parquet, tmp_path_factory):
    """Full-corpus index with 1/4 of the docs tombstoned: the victims
    are hash-picked so every query loses some results."""
    out = str(tmp_path_factory.mktemp("del_index"))
    pages = spark.read.parquet(fixture_pages_parquet)
    build_index(spark, pages, out, CFG)
    victims = [
        r["url"] for r in
        pages.filter(F.pmod(F.xxhash64("url"), F.lit(4)) == 0).select("url").collect()
    ]
    n = delete_documents(spark, victims, out)
    assert n == len(victims) > 0
    return out, victims


def test_deleted_urls_never_returned(spark, del_index):
    out, victims = del_index
    dead = set(victims)
    eng = SearchEngine(spark, out, CFG)
    for q in QUERIES:
        for u, _ in _top(eng.search(q, 50)):
            assert u not in dead, q
        for u, _ in _top(wand_search(eng, q, 50)):
            assert u not in dead, q
    batch = eng.search_batch([(f"q{i}", q) for i, q in enumerate(QUERIES)], 50)
    assert batch.filter(F.col("url").isin(victims)).count() == 0
    ents = eng.entities_top5(victims[:10])
    assert ents.count() == 0


def test_survivors_keep_pre_delete_scores(spark, built_index, del_index):
    """Stale-stats contract: tombstoned top-k == pre-delete ranking
    minus the deleted urls, scores bit-identical."""
    full_out, full_cfg, _ = built_index
    out, victims = del_index
    dead = set(victims)
    pre = SearchEngine(spark, full_out, full_cfg)
    post = SearchEngine(spark, out, CFG)
    for q in QUERIES:
        expect = [(u, s) for u, s in _top(pre.search(q, 100)) if u not in dead][:20]
        got = _top(post.search(q, 20))
        assert [u for u, _ in got] == [u for u, _ in expect], q
        for (_, gs), (_, es) in zip(got, expect):
            assert abs(gs - es) < 1e-12, q


def test_wand_rank_identical_with_tombstones(spark, del_index):
    out, _ = del_index
    eng = SearchEngine(spark, out, CFG)
    for q in QUERIES:
        exact = _top(eng.search(q, 20))
        wand = _top(wand_search(eng, q, 20))
        assert [u for u, _ in exact] == [u for u, _ in wand], q
        for (_, es), (_, ws) in zip(exact, wand):
            assert abs(es - ws) < 1e-9, q


def test_overlay_deletes_without_disk_mutation(spark, built_index):
    """The deleted_urls constructor overlay previews deletes on a
    shared index dir without writing tombstones."""
    full_out, full_cfg, _ = built_index
    base = SearchEngine(spark, full_out, full_cfg)
    top = _top(base.search(QUERIES[0], 10))
    victim = top[0][0]
    eng = SearchEngine(spark, full_out, full_cfg, deleted_urls=[victim])
    got = _top(eng.search(QUERIES[0], 9))
    assert victim not in [u for u, _ in got]
    assert [u for u, _ in got] == [u for u, _ in top[1:10]]
    assert not os.path.isdir(IndexPaths(full_out).tombstones)


def test_compact_repairs_interrupted_raw_swap(spark, fixture_pages_parquet,
                                              tmp_path_factory):
    """A compact killed between the two raw-store renames leaves raw
    at __old; the next compact must restore it and complete — the raw
    store (source of truth) is never lost to a mid-swap crash."""
    out = str(tmp_path_factory.mktemp("crash_index"))
    pages = spark.read.parquet(fixture_pages_parquet).limit(60)
    build_index(spark, pages, out, CFG)
    victims = [r["url"] for r in pages.select("url").limit(5).collect()]
    delete_documents(spark, victims[:4], out)
    # a bare string must delete THE url, not its characters
    assert delete_documents(spark, victims[4], out) == 1
    stones = {r["url"] for r in
              spark.read.parquet(IndexPaths(out).tombstones).collect()}
    assert stones == set(victims)
    paths = IndexPaths(out)
    # simulate the crash window: raw renamed away, half-written __new
    os.rename(paths.postings_raw, paths.postings_raw + "__old")
    os.makedirs(paths.postings_raw + "__new")
    meta = compact_index(spark, out, CFG)
    assert meta["n_docs"] == 55
    assert os.path.isdir(paths.postings_raw)
    assert not os.path.isdir(paths.postings_raw + "__old")
    assert not os.path.isdir(paths.postings_raw + "__new")
    assert (spark.read.parquet(paths.postings_raw)
            .filter(F.col("url").isin(victims)).count() == 0)


# -- compaction (mutates del_index: keep LAST in the module) -----------------

def test_compact_purges_and_matches_fresh_build(
        spark, fixture_pages_parquet, del_index, tmp_path_factory):
    out, victims = del_index
    compact_index(spark, out, CFG)
    paths = IndexPaths(out)
    assert not os.path.isdir(paths.tombstones)
    # raw + doc_stats hold only survivors
    assert (spark.read.parquet(paths.postings_raw)
            .filter(F.col("url").isin(victims)).count() == 0)
    assert (spark.read.parquet(paths.doc_stats)
            .filter(F.col("url").isin(victims)).count() == 0)
    # bit-identical to a fresh build over (corpus - deleted):
    # fresh N/df/avgdl, same urls, same scores
    ref_out = str(tmp_path_factory.mktemp("del_ref_index"))
    pages = spark.read.parquet(fixture_pages_parquet)
    build_index(spark, pages.filter(~F.col("url").isin(victims)), ref_out, CFG)
    got_eng = SearchEngine(spark, out, CFG)
    ref_eng = SearchEngine(spark, ref_out, CFG)
    for q in QUERIES:
        got = _top(got_eng.search(q, 20))
        ref = _top(ref_eng.search(q, 20))
        assert [u for u, _ in got] == [u for u, _ in ref], q
        for (_, gs), (_, rs) in zip(got, ref):
            assert abs(gs - rs) < 1e-12, q
        wand = _top(wand_search(got_eng, q, 20))
        assert [u for u, _ in got] == [u for u, _ in wand], q


def test_delete_by_query_lifecycle(spark, fixture_pages_parquet, tmp_path):
    """ES _delete_by_query: tombstone exactly the live match set of a
    query in one call (incremental.delete_by_query).

    Pins: (a) the tombstoned count equals the engine's own match set
    (count_hits / matching_urls agreement); (b) the deleting query
    afterwards matches nothing on any path; (c) an unrelated query's
    survivors keep bit-identical stale-stats scores (the ordinary
    url-delete contract, inherited unchanged); (d) a second identical
    call is a no-op (snapshot-at-call + idempotence); (e) stop-word
    and out-of-vocabulary queries delete nothing and write nothing."""
    from search_engine_spark.incremental import delete_by_query

    out = str(tmp_path / "dbq_ix")
    pages = spark.read.parquet(fixture_pages_parquet)
    build_index(spark, pages, out, CFG)
    eng = SearchEngine(spark, out, CFG)
    q_del, q_other = QUERIES[0], QUERIES[3]

    expected = sorted(r["url"] for r in eng.matching_urls(q_del).collect())
    assert len(expected) == eng.count_hits(q_del) > 0
    pre_other = _top(eng.search(q_other, 300))

    n = delete_by_query(spark, q_del, out, CFG)
    assert n == len(expected)

    post = SearchEngine(spark, out, CFG)
    assert post.count_hits(q_del) == 0
    assert post.search(q_del, 50).count() == 0
    assert wand_search(post, q_del, 50).count() == 0

    dead = set(expected)
    want = [(u, s) for u, s in pre_other if u not in dead][:20]
    got = _top(post.search(q_other, 20))[:len(want)]
    assert [u for u, _ in got] == [u for u, _ in want]
    for (_, gs), (_, es) in zip(got, want):
        assert abs(gs - es) < 1e-12

    # idempotent: the match set is empty now (matching_urls is
    # tombstone-masked), so nothing new is tombstoned
    assert delete_by_query(spark, q_del, out, CFG) == 0
    # no-match queries write nothing
    assert delete_by_query(spark, "the of and", out, CFG) == 0
    assert delete_by_query(spark, "zzqqxximpossibleterm", out, CFG) == 0
