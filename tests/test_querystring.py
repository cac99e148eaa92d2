"""Query-string dispatch (searcher.split_query_string +
SearchEngine.query_string_search): each syntax routes to the already-
oracled engine path, and the composed form equals the explicitly
composed call — the invariants the search_querystring driver row
pins against the twin."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import pytest

from search_engine_spark import twin as TW
from search_engine_spark.searcher import SearchEngine, split_query_string


def _rows(df):
    return [(r["rank"], r["url"], r["score"]) for r in
            df.orderBy("rank").collect()]


def _assert_rank_identical(a, b):
    ra, rb = _rows(a), _rows(b)
    assert [x[:2] for x in ra] == [x[:2] for x in rb]
    for x, y in zip(ra, rb):
        assert math.isclose(x[2], y[2], rel_tol=1e-9, abs_tol=1e-12)


def test_split_query_string_clauses():
    assert split_query_string('+a b -c d* "x y"') == (
        ["x y"], ["a"], ["b"], ["c"], ["d"])
    # stray operators and empty quotes are dropped, not crashed on
    assert split_query_string('+ - * ""') == ([], [], [], [], [])
    with pytest.raises(ValueError, match="wildcard"):
        split_query_string("+tab*")


def test_bare_terms_equal_plain_search(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    _assert_rank_identical(
        eng.query_string_search("trade market", 10),
        eng.search("trade market", 10))


def test_boolean_clauses_equal_explicit_call(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    _assert_rank_identical(
        eng.query_string_search("+trade market -growth", 10),
        eng.boolean_search("trade", "market", "growth", 10))


def test_wildcard_only_equals_wildcard_search(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    _assert_rank_identical(
        eng.query_string_search("trade ma*", 10),
        eng.wildcard_search("trade ma*", 10))


def test_phrase_routes_to_phrase_search(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    if not eng.cfg.keep_positions:
        # the fixture index has no positions: routing is still proven
        # because the phrase path's own refusal propagates verbatim
        with pytest.raises(ValueError, match="keep_positions"):
            eng.query_string_search('"world trade"', 10)
        return
    _assert_rank_identical(
        eng.query_string_search('"world trade"', 10),
        eng.phrase_search("world trade", 10))


def test_mixed_must_plus_wildcard_matches_twin(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    qs = "+trade ma* -growth"
    _assert_rank_identical(
        eng.query_string_search(qs, 10),
        TW.twin_querystring_topk(spark, eng, qs, 10))


def test_phrase_mixed_with_clauses_rejected(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    with pytest.raises(ValueError, match="whole query"):
        eng.query_string_search('+trade "world trade"', 10)


def test_parse_boolean_tree_goldens():
    """Grammar table for the parenthesized boolean syntax: precedence
    (NOT > AND > OR), juxtaposition-as-OR, implicit and-not, nesting,
    and the refusals (pure negative, flat markers, unbalanced)."""
    from search_engine_spark.searcher import is_tree_syntax, parse_boolean_tree

    t = parse_boolean_tree
    assert t("a") == {"term": "a"}
    assert t("a OR b") == {"op": "or", "kids": [{"term": "a"}, {"term": "b"}]}
    assert t("a b") == t("a OR b")  # Lucene default operator
    assert t("a AND b") == {"op": "and", "kids": [{"term": "a"}, {"term": "b"}]}
    # AND binds tighter than OR
    assert t("a OR b AND c") == {
        "op": "or",
        "kids": [{"term": "a"},
                 {"op": "and", "kids": [{"term": "b"}, {"term": "c"}]}],
    }
    # a NOT b == a AND NOT b; explicit form identical
    want = {"op": "andnot", "kids": [{"term": "a"}, {"term": "b"}]}
    assert t("a NOT b") == want
    assert t("a AND NOT b") == want
    assert t("NOT NOT a") == {"term": "a"}  # double negation
    # parens override precedence
    assert t("(a OR b) AND c") == {
        "op": "and",
        "kids": [{"op": "or", "kids": [{"term": "a"}, {"term": "b"}]},
                 {"term": "c"}],
    }
    assert t("((a))") == {"term": "a"}
    import pytest as _pytest
    for bad in ("NOT a", "a OR NOT b", "(a OR b", "a)", "", "a AND", "+a AND b",
                "a* OR b"):
        with _pytest.raises(ValueError):
            t(bad)
    assert is_tree_syntax("(a b)") and is_tree_syntax("a OR b")
    assert not is_tree_syntax("+a -b c*") and not is_tree_syntax("and or not")


def test_tree_syntax_routes_to_tree_search(spark, built_index):
    """query_string_search on tree syntax ≡ tree_search on the
    hand-built tree, and the no-paren flat path is untouched."""
    out, cfg, _ = built_index
    from search_engine_spark.searcher import SearchEngine

    eng = SearchEngine(spark, out, cfg)
    qs = "(water OR river) AND (nation OR policy) NOT growth"
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
    got = [(r["url"], round(r["score"], 9))
           for r in eng.query_string_search(qs, 30).collect()]
    want = [(r["url"], round(r["score"], 9))
            for r in eng.tree_search(tree, 30).collect()]
    assert got == want and got
    # flat syntax still routes through the flat dispatch
    flat = [(r["url"], round(r["score"], 9))
            for r in eng.query_string_search("+nation -growth policy", 20)
            .collect()]
    explicit = [(r["url"], round(r["score"], 9))
                for r in eng.boolean_search("nation", "policy", "growth", 20)
                .collect()]
    assert flat == explicit


def test_boost_syntax(spark, built_index):
    """term^2.5 routing + semantics: all-1.0 boosts ≡ plain search
    (identity), skewed boosts ≡ the twin's joined-weights recompute
    (rank AND score), duplicate terms accumulate (a a ≡ a^2), and
    malformed / composed boosts raise."""
    import pytest as _pytest

    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)

    # identity: explicit ^1 boosts change nothing
    _assert_rank_identical(
        eng.query_string_search("trade^1 market^1.0", 10),
        eng.search("trade market", 10))

    # skewed boosts vs the independent twin (joined-weights plan)
    qs = "trade^2 market nation^0.5"
    _assert_rank_identical(
        eng.query_string_search(qs, 10),
        TW.twin_boosted_topk(spark, eng, qs, 10))

    # boosts must actually reshuffle vs plain for this corpus
    plain = [r["url"] for r in eng.search("trade market nation", 10).collect()]
    boosted = [r["url"] for r in eng.query_string_search(qs, 10).collect()]
    assert plain != boosted

    # duplicate clauses accumulate: "a a b" == "a^2 b"
    _assert_rank_identical(
        eng.boosted_search("trade trade market", 10),
        eng.boosted_search("trade^2 market", 10))

    # stop words / unknown terms drop out, boost and all
    assert eng.boosted_search("the^9 zzzzunknown^3", 10).count() == 0

    for bad in ("trade^x", "trade^-1", "^2", "+trade^2 market",
                'tr*^2', '"trade market"^2'):
        with _pytest.raises(ValueError):
            eng.query_string_search(bad, 10)


def test_top_hits_per_bucket(spark, built_index):
    """search_top_hits: per-bucket ranks are the engine's own search
    order restricted to the bucket, n_docs equals search_facets'
    count for every facet, and the twin (separate count groupBy plan)
    agrees row for row."""
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    # dims: url -> parity bucket, derived from the engine's own doc map
    dims = (eng._doc_map().select("url")
            .withColumn("b", ((F.xxhash64("url") % 3 + 3) % 3).cast("string")))
    q = "trade market"
    hits = eng.search_top_hits(q, dims, "b", 3).collect()
    assert hits and all(r["bucket_rank"] <= 3 for r in hits)

    # counts agree with the facets kernel
    fac = {r["facet"]: r["n_docs"]
           for r in eng.search_facets(q, dims, "b").collect()}
    for r in hits:
        assert fac[r["facet"]] == r["n_docs"]

    # per-bucket order is the global order restricted to the bucket
    deep = eng.search(q, 10_000)
    dimmed = {r["url"]: str(r["b"]) for r in dims.collect()}
    by_bucket: dict[str, list[str]] = {}
    for r in deep.orderBy("rank").collect():
        by_bucket.setdefault(dimmed[r["url"]], []).append(r["url"])
    got = {}
    for r in hits:
        got.setdefault(r["facet"], []).append((r["bucket_rank"], r["url"]))
    for facet, pairs in got.items():
        want = by_bucket[facet][:3]
        assert [u for _, u in sorted(pairs)] == want

    # twin agreement (different count plan)
    tw = TW.twin_top_hits(spark, eng, q, dims, "b", 3)
    a = sorted((r["facet"], r["bucket_rank"], r["url"], r["n_docs"],
                round(r["score"], 9)) for r in hits)
    b = sorted((r["facet"], r["bucket_rank"], r["url"], r["n_docs"],
                round(r["score"], 9)) for r in tw.collect())
    assert a == b


def test_synonym_search(spark, built_index):
    """Lucene SynonymQuery semantics: no-rows table ≡ plain search
    bit for bit; a real synonym group blends tf BEFORE saturation and
    takes max member df (so group-scoring differs from scoring the
    members independently); unknown / stop-word synonyms are inert;
    twin agrees per rank."""
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    empty_syn = spark.createDataFrame([], "term string, syn string")

    # 1-member groups reproduce the plain path exactly
    _assert_rank_identical(
        eng.synonym_search("trade market", empty_syn, 10),
        eng.search("trade market", 10))

    # expansion changes the result set vs plain, and the blended
    # group score differs from independently scoring the members
    # (the OR-query shape) — tf blending saturates once, not twice
    syn = spark.createDataFrame(
        [("trade", "market"), ("nation", "policy")], "term string, syn string")
    blended = eng.synonym_search("trade nation", syn, 10)
    plain = eng.search("trade nation", 10)
    or_query = eng.search("trade market nation policy", 10)
    b_rows = [(r["url"], round(r["score"], 9)) for r in blended.collect()]
    assert b_rows != [(r["url"], round(r["score"], 9)) for r in plain.collect()]
    assert b_rows != [(r["url"], round(r["score"], 9)) for r in or_query.collect()]

    # twin equivalence (rank + score)
    _assert_rank_identical(
        blended, TW.twin_synonym_topk(spark, eng, "trade nation", syn, 10))

    # inert rows: stop-word and out-of-vocabulary synonyms drop out
    # of their groups, leaving plain scoring
    inert = spark.createDataFrame(
        [("trade", "the"), ("market", "zzzznosuchterm")],
        "term string, syn string")
    _assert_rank_identical(
        eng.synonym_search("trade market", inert, 10),
        eng.search("trade market", 10))

    # all-stop-word query stays empty
    assert eng.synonym_search("the of", syn, 10).count() == 0


def test_extended_stats(spark, built_index):
    """search_extended_stats: per-facet n_docs equals the facets
    kernel, and every stat equals a driver-side numpy recompute over
    the engine's own matching set."""
    import numpy as np

    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    q = "trade market"
    vals = (eng._doc_map().select("url")
            .withColumn("b", ((F.xxhash64("url") % 2 + 2) % 2).cast("string"))
            .withColumn("v", (F.length("url") + F.xxhash64("url") % 50 + 50)
                        .cast("long")))
    got = {r["facet"]: r for r in
           eng.search_extended_stats(q, vals, "b", "v").collect()}
    fac = {r["facet"]: r["n_docs"]
           for r in eng.search_facets(q, vals, "b").collect()}
    assert {k: r["n_docs"] for k, r in got.items()} == fac

    matched = {r["url"] for r in eng.matching_urls(q).collect()}
    rows = [(r["b"], r["v"]) for r in vals.collect() if r["url"] in matched]
    for facet, r in got.items():
        xs = np.array(sorted(v for b, v in rows if b == facet), dtype=np.int64)
        assert r["v_min"] == xs.min() and r["v_max"] == xs.max()
        assert r["v_sum"] == xs.sum()
        assert abs(r["v_avg"] - round(xs.sum() / len(xs), 6)) < 1e-12
        sd = float(np.sqrt((len(xs) * (xs.astype(object) ** 2).sum()
                            - int(xs.sum()) ** 2) / (len(xs) ** 2)))
        assert abs(r["v_sd"] - round(sd, 6)) < 1e-9
        for q_, col in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75")):
            assert abs(r[col] - float(np.percentile(xs, q_ * 100,
                                                    method="linear"))) < 1e-9
