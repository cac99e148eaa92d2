"""Typo-tolerant search (SearchEngine.fuzzy_search, twin_fuzzy_topk).

Pins the semantics the search_fuzzy / ft_fuzzy_topk driver rows rely
on: an all-in-vocabulary query passes through unchanged (fuzzy ≡
plain search, per rank), a misspelled query scores exactly like the
hand-corrected query, hopeless terms drop out (all-hopeless → empty
frame), the stored-SymSpell correction path serves identical output
to the fresh vocab scan, and the engine ≡ raw-postings twin
equivalence holds per rank.
"""

from __future__ import annotations

import math

from search_engine_spark import twin as TW
from search_engine_spark.operators.snippets import write_suggest_index
from search_engine_spark.searcher import SearchEngine


def _rows(df):
    return [(r["rank"], r["url"], r["score"]) for r in
            df.orderBy("rank").collect()]


def _assert_rank_identical(a, b):
    ra, rb = _rows(a), _rows(b)
    assert [x[:2] for x in ra] == [x[:2] for x in rb]
    for x, y in zip(ra, rb):
        assert math.isclose(x[2], y[2], rel_tol=1e-9, abs_tol=1e-12)


def test_fuzzy_noop_on_exact_query(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    _assert_rank_identical(
        eng.fuzzy_search("trade market", 10), eng.search("trade market", 10))


def test_fuzzy_corrects_misspelling(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    # the fixture vocabulary contains 'trade' and 'market'; the
    # misspellings are 1-2 edits away in stem space and must land
    # there (checked against the engine's own suggester first, so the
    # test fails loudly if the fixture vocabulary ever shifts)
    fuzzy = eng.fuzzy_search("tade markct", 10)
    corrected = eng.search("trade market", 10)
    _assert_rank_identical(fuzzy, corrected)


def test_fuzzy_drops_hopeless_terms(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    # one live term + one unfixable term ≡ the live term alone
    _assert_rank_identical(
        eng.fuzzy_search("trade zzzzqqqxxx", 10), eng.search("trade", 10))
    # every term unfixable → empty, not an error
    assert eng.fuzzy_search("zzzzqqqxxx wwwwqqqyyy", 10).count() == 0


def test_fuzzy_indexed_suggest_path_identical(spark, built_index, tmp_path):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    path = str(tmp_path / "suggest_ix")
    write_suggest_index(eng._dictionary, path, max_dist=2)
    _assert_rank_identical(
        eng.fuzzy_search("tade markct", 10, suggest_path=path),
        eng.fuzzy_search("tade markct", 10))


def test_fuzzy_engine_matches_twin(spark, built_index):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    q = "trade tade markct zzzzqqqxxx"
    _assert_rank_identical(
        eng.fuzzy_search(q, 15), TW.twin_fuzzy_topk(spark, eng, q, 15))


def test_explain_parts_sum_to_score(spark, built_index):
    """Lucene Explanation invariant: the per-term blended parts sum to
    exactly the document's search score, for several ranks; an
    out-of-vocabulary query explains to an empty frame."""
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    top = eng.search("trade market", 5).collect()
    assert top
    for r in top[:3]:
        parts = eng.explain_score("trade market", r["url"]).collect()
        assert parts
        assert abs(sum(p["part"] for p in parts) - r["score"]) < 1e-9
    assert eng.explain_score("zzzzqqqxxx", top[0]["url"]).count() == 0
