"""Oracle sanity: build + search on the synthetic fixture corpus."""

import math

from search_engine_spark.fixtures import REFERENCE_QUERIES, STOP_WORDS, make_pages
from search_engine_spark.oracle import OracleIndex


def _index(n=200, stem=True):
    ix = OracleIndex(frozenset(STOP_WORDS), stem=stem)
    ix.build(make_pages(n, seed=42))
    return ix


def test_build_invariants():
    ix = _index(200)
    assert ix.n_docs == 200
    assert ix.avgdl > 0
    for key, e in ix.dictionary.items():
        assert key == key.lower()
        assert e.df >= 1 and e.cf >= e.df
        assert math.isclose(e.idf, math.log2(200 / e.df))
        assert len(ix.postings[key]) == e.df
    for url, s in ix.doc_stats.items():
        assert s.length >= s.max_tf >= 1
        assert s.unique_terms >= 1


def test_search_determinism_and_shape():
    ix = _index(200)
    for qid, title, desc in REFERENCE_QUERIES:
        q = title + ("@" + desc if desc else "")
        r1, r2 = ix.search(q, 10), ix.search(q, 10)
        assert r1 == r2
        scores = [s for _, s in r1]
        assert scores == sorted(scores, reverse=True)
    assert ix.search("the of and", 10) == []
    assert ix.search("zzzunknownterm", 10) == []


def test_stop_word_only_query_empty():
    ix = _index(100)
    assert ix.search("the a and of", 10) == []


def test_permutation_invariant_build():
    pages = make_pages(100, seed=7)
    a = OracleIndex(frozenset(STOP_WORDS))
    a.build(pages)
    b = OracleIndex(frozenset(STOP_WORDS))
    b.build(list(reversed(pages)))
    assert {k: (e.df, e.cf, e.display, e.capital) for k, e in a.dictionary.items()} == {
        k: (e.df, e.cf, e.display, e.capital) for k, e in b.dictionary.items()
    }
    assert a.search("world trade", 20) == b.search("world trade", 20)
