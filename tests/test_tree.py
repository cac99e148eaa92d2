"""Nested boolean query trees (SearchEngine.tree_search,
twin_tree_topk): set semantics checked against the engine's own raw
postings, flat-equivalence to boolean_search, degenerate trees, and
the engine ≡ twin per-rank equivalence."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from search_engine_spark.searcher import SearchEngine  # noqa: E402


def _docs_with(spark, eng, word):
    from search_engine_spark import twin as TW

    keys = eng.parse_query(word)
    raw = TW.raw_postings(spark, eng)
    return {
        r["url"]
        for r in raw.filter(F.col("term_key").isin(keys))
        .select("url").distinct().collect()
    }


def test_tree_set_semantics(spark, built_index):
    """(water OR river) AND (nation OR policy) ANDNOT growth: the
    result's membership equals hand-computed set algebra over the raw
    postings, scores equal the plain search over the positive terms
    restricted to the match set, and engine ≡ twin per rank."""
    from search_engine_spark import twin as TW

    out, cfg, _meta = built_index
    eng = SearchEngine(spark, out, cfg)
    tree = {
        "op": "andnot",
        "kids": [
            {"op": "and", "kids": [
                {"op": "or", "kids": [{"term": "water"}, {"term": "river"}]},
                {"op": "or", "kids": [{"term": "nation"}, {"term": "policy"}]},
            ]},
            {"term": "growth"},
        ],
    }
    res = [(r["url"], round(r["score"], 9))
           for r in eng.tree_search(tree, 100).collect()]
    assert res

    w = {t: _docs_with(spark, eng, t)
         for t in ("water", "river", "nation", "policy", "growth")}
    match = ((w["water"] | w["river"]) & (w["nation"] | w["policy"])) - w["growth"]
    assert {u for u, _ in res} <= match

    # scores ≡ plain search over the positive terms, gated to match
    comb = eng.search("water river nation policy", 1000).collect()
    expect = [(r["url"], round(r["score"], 9)) for r in comb
              if r["url"] in match][:100]
    assert res == expect
    assert len(res) == min(100, len(match))

    tw = [(r["url"], round(r["score"], 9))
          for r in TW.twin_tree_topk(spark, eng, tree, 100)
          .orderBy("rank").collect()]
    assert res == tw


def test_tree_flat_equivalence(spark, built_index):
    """A flat AND+ANDNOT tree reproduces boolean_search exactly."""
    out, cfg, _meta = built_index
    eng = SearchEngine(spark, out, cfg)
    tree = {"op": "andnot", "kids": [
        {"op": "and", "kids": [{"term": "nation"}]},
        {"term": "growth"},
    ]}
    got = [(r["url"], round(r["score"], 9))
           for r in eng.tree_search(tree, 50).collect()]
    want = [(r["url"], round(r["score"], 9))
            for r in eng.boolean_search(must="nation", must_not="growth",
                                        k=50).collect()]
    assert got == want and got


def test_tree_degenerates(spark, built_index):
    out, cfg, _meta = built_index
    eng = SearchEngine(spark, out, cfg)
    # missing-term leaf under AND -> empty; under OR -> other branch
    empty_and = eng.tree_search(
        {"op": "and", "kids": [{"term": "nation"}, {"term": "zzqzzq"}]}, 10)
    assert empty_and.count() == 0
    or_fallback = [r["url"] for r in eng.tree_search(
        {"op": "or", "kids": [{"term": "nation"}, {"term": "zzqzzq"}]},
        20).collect()]
    plain = [r["url"] for r in eng.search("nation", 20).collect()]
    assert or_fallback == plain
    # stop-word-only leaf matches nothing
    assert eng.tree_search({"term": "the"}, 5).count() == 0
    # malformed nodes refuse
    with pytest.raises(ValueError, match="bad tree node"):
        eng.tree_search({"op": "xor", "kids": [{"term": "a"}]}, 5)
    with pytest.raises(ValueError, match="andnot"):
        eng.tree_search({"op": "andnot", "kids": [{"term": "nation"}]}, 5)
    # a leaf that parses to several index terms refuses
    with pytest.raises(ValueError, match="several index terms"):
        eng.tree_search({"term": "nation policy"}, 5)
