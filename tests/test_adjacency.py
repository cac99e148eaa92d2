"""ES filters / adjacency_matrix aggregations
(SearchEngine.count_hits_batch / adjacency_matrix): one-scan
multi-query counts and pairwise co-match cells, pinned against the
single-query surfaces and brute-force set intersections."""

from __future__ import annotations

import pytest

from search_engine_spark.searcher import SearchEngine

QUERIES = [("qa", "world"), ("qb", "trade"), ("qc", "market"),
           ("qz", "zzzzqqqq")]


def _eng(spark, built_index):
    out, cfg, _ = built_index
    return SearchEngine(spark, out, cfg)


def test_batch_counts_match_single_query_counts(spark, built_index):
    eng = _eng(spark, built_index)
    got = {r["qid"]: r["n_docs"]
           for r in eng.count_hits_batch(QUERIES).collect()}
    want = {qid: eng.count_hits(q) for qid, q in QUERIES}
    assert got == want
    assert got["qz"] == 0          # ES keeps the empty bucket
    assert got["qa"] > 0


def test_adjacency_diagonal_is_the_per_query_count(spark, built_index):
    eng = _eng(spark, built_index)
    qs = QUERIES[:3]
    cells = {(r["qid_a"], r["qid_b"]): r["n_docs"]
             for r in eng.adjacency_matrix(qs).collect()}
    for qid, q in qs:
        assert cells[(qid, qid)] == eng.count_hits(q)


def test_adjacency_off_diagonal_is_the_set_intersection(spark, built_index):
    eng = _eng(spark, built_index)
    qs = QUERIES[:3]
    cells = {(r["qid_a"], r["qid_b"]): r["n_docs"]
             for r in eng.adjacency_matrix(qs).collect()}
    sets = {qid: {r["url"] for r in eng.matching_urls(q).collect()}
            for qid, q in qs}
    for i, (qa, _) in enumerate(qs):
        for qb, _ in qs[i + 1:]:
            lo, hi = sorted((qa, qb))
            want = len(sets[qa] & sets[qb])
            assert cells.get((lo, hi), 0) == want
    # pair keys are sorted — no reversed duplicates
    assert all(a <= b for a, b in cells)


def test_unresolvable_batch(spark, built_index):
    eng = _eng(spark, built_index)
    qs = [("q1", "zzzzqqqq"), ("q2", "xxxxyyyy")]
    counts = {r["qid"]: r["n_docs"]
              for r in eng.count_hits_batch(qs).collect()}
    assert counts == {"q1": 0, "q2": 0}
    assert eng.adjacency_matrix(qs).count() == 0


def test_validation(spark, built_index):
    eng = _eng(spark, built_index)
    with pytest.raises(ValueError):
        eng.count_hits_batch([])
    with pytest.raises(ValueError):
        eng.count_hits_batch([("q1", "world"), ("q1", "trade")])
    with pytest.raises(ValueError):
        eng.adjacency_matrix([])
    with pytest.raises(ValueError):
        eng.adjacency_matrix([("q1", "world"), ("q1", "trade")])
