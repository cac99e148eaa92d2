"""Federated multi-index search (federated.py).

Golden edge cases the driver row can't guarantee hitting: the FULL
deep ranking (every matching doc, not just the top-20) against a
merged single index, a tombstone on one member only, the
local-vs-global-stats failure mode (naive federation must actually
diverge here, or the row proves nothing), stop-word-only queries, and
the mismatched-config refusal.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.federated import (
    federated_search, global_stats, open_members)
from search_engine_spark.indexer import build_index
from search_engine_spark.searcher import SearchEngine

CFG = EngineConfig(n_doc_shards=4, n_term_buckets=4, n_bucket_groups=2)
N = 120


@pytest.fixture(scope="module")
def corpus(spark, fixture_pages_parquet):
    return spark.read.parquet(fixture_pages_parquet).limit(N)


@pytest.fixture(scope="module")
def split_indexes(spark, corpus, tmp_path_factory):
    root = tmp_path_factory.mktemp("fed")
    # UNEVEN split (1/3 vs 2/3): member stats genuinely differ, so
    # local-stat scoring cannot accidentally match the global ranking
    h = F.pmod(F.xxhash64("url"), F.lit(3))
    a, b, full = str(root / "a"), str(root / "b"), str(root / "full")
    build_index(spark, corpus.filter(h == 0), a, CFG)
    build_index(spark, corpus.filter(h != 0), b, CFG)
    build_index(spark, corpus, full, CFG)
    return a, b, full


QUERY = "nation policy report trade"


def test_federated_equals_merged_deep(spark, split_indexes):
    a, b, full = split_indexes
    fed = [(r["url"], round(r["score"], 9))
           for r in federated_search(spark, [a, b], QUERY, N, CFG)
           .orderBy("rank").collect()]
    one = SearchEngine(spark, full, CFG)
    merged = [(r["url"], round(r["score"], 9))
              for r in one.search(QUERY, N).orderBy("rank").collect()]
    assert [u for u, _ in fed] == [u for u, _ in merged]
    for (_, s1), (_, s2) in zip(fed, merged):
        assert abs(s1 - s2) <= 1e-9


def test_naive_local_stats_actually_diverge(spark, split_indexes):
    """The failure mode the operator exists to prevent: scoring each
    member with its own (N, df, avgdl) and merging must NOT equal the
    merged-index ranking — otherwise the equivalence above is
    vacuous."""
    a, b, full = split_indexes
    ea, eb = SearchEngine(spark, a, CFG), SearchEngine(spark, b, CFG)
    naive = sorted(
        [(r["url"], r["score"]) for e in (ea, eb)
         for r in e.search(QUERY, N).collect()],
        key=lambda t: (-t[1], t[0]))
    one = SearchEngine(spark, full, CFG)
    merged = [(r["url"], r["score"])
              for r in one.search(QUERY, N).orderBy("rank").collect()]
    assert [u for u, _ in naive] != [u for u, _ in merged]


def test_federated_respects_member_tombstones(spark, split_indexes):
    from search_engine_spark.incremental import delete_documents

    a, b, full = split_indexes
    base = federated_search(spark, [a, b], QUERY, N, CFG).collect()
    victim = sorted(r["url"] for r in base)[0]
    # tombstone on whichever member holds the victim
    a_urls = {r["url"]
              for r in SearchEngine(spark, a, CFG)._doc_map().collect()}
    holder = a if victim in a_urls else b
    delete_documents(spark, [victim], holder)
    try:
        after = federated_search(spark, [a, b], QUERY, N, CFG).collect()
        urls = {r["url"] for r in after}
        assert victim not in urls
        assert urls == {r["url"] for r in base} - {victim}
    finally:
        from search_engine_spark.incremental import compact_index

        compact_index(spark, holder, CFG)


def test_federated_empty_and_config_guard(spark, split_indexes):
    import json
    import os

    a, b, _ = split_indexes
    assert federated_search(spark, [a, b], "the of and", 10, CFG).count() == 0
    engines = open_members(spark, [a, b], CFG)
    n_g, avgdl_g = global_stats(engines)
    # the tombstone test above may have compacted one doc away —
    # assert against the members' own metas, not the fixture constant
    expected = sum(json.load(open(os.path.join(d, "meta.json")))["n_docs"]
                   for d in (a, b))
    assert n_g == expected and n_g >= N - 1 and avgdl_g > 0
    # a member with different scoring constants is refused
    meta_path = os.path.join(b, "meta.json")
    orig = open(meta_path).read()
    meta = json.loads(orig)
    meta["k1"] = 9.9
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)
    try:
        with pytest.raises(ValueError, match="k1"):
            open_members(spark, [a, b], CFG)
    finally:
        with open(meta_path, "w") as fh:
            fh.write(orig)
