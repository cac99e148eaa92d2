"""Proximity-ranked search (SearchEngine.proximity_search,
twin_proximity_topk).

Pins the semantics behind the search_proximity / ft_proximity_topk
driver rows: the per-document min pairwise token distance matches a
single-node recomputation from ``parse_doc`` positions (golden), the
engine ≡ raw-postings twin per rank (independent position decodings),
``max_window`` is exactly a min_dist filter, degenerate queries
return empty, and a positions-free index refuses loudly.
"""

from __future__ import annotations

import itertools
import math
import os

import pytest


@pytest.fixture(scope="module")
def prox_index(spark, tmp_path_factory):
    """150-page positional index + the raw page dicts (for the
    single-node golden)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.fixtures import make_pages, pages_schema_arrow
    from search_engine_spark.indexer import build_index
    from search_engine_spark.searcher import SearchEngine

    tmp = str(tmp_path_factory.mktemp("proxix"))
    pages = make_pages(150, seed=13)
    src = os.path.join(tmp, "pages.parquet")
    pq.write_table(pa.Table.from_pylist(pages, schema=pages_schema_arrow()), src)
    cfg = EngineConfig(n_doc_shards=4, n_term_buckets=4, n_bucket_groups=2,
                       keep_positions=True)
    ix = os.path.join(tmp, "ix")
    build_index(spark, spark.read.parquet(src), ix, cfg, resume=False)
    return SearchEngine(spark, ix, cfg), pages, cfg


QUERY = "world trade market"


def _golden_min_dist(eng, pages, cfg) -> dict[str, int]:
    """url -> min pairwise token distance over distinct query terms,
    recomputed single-node from the build parse kernel."""
    from search_engine_spark.textproc import parse_doc

    keys = sorted(set(eng.parse_query(QUERY)))
    stop = cfg.stop_set()
    out: dict[str, int] = {}
    for p in pages:
        posmap = {k.lower(): list(v.positions)
                  for k, v in parse_doc(p["text"], stop, cfg.stem).items()}
        best = None
        for ta, tb in itertools.combinations(keys, 2):
            for pa_, pb in itertools.product(posmap.get(ta, ()), posmap.get(tb, ())):
                d = abs(pa_ - pb)
                if best is None or d < best:
                    best = d
        if best is not None:
            out[p["url"]] = best
    return out


def test_min_dist_matches_single_node_golden(spark, prox_index):
    eng, pages, cfg = prox_index
    golden = _golden_min_dist(eng, pages, cfg)
    got = {r["url"]: r["min_dist"]
           for r in eng.proximity_search(QUERY, 200).collect()}
    assert got == golden  # every candidate doc, exact distances


def test_engine_matches_twin_per_rank(spark, prox_index):
    from search_engine_spark import twin as TW

    eng, _, _ = prox_index
    e = eng.proximity_search(QUERY, 20).orderBy("rank").collect()
    t = TW.twin_proximity_topk(spark, eng, QUERY, 20).orderBy("rank").collect()
    assert [(r["rank"], r["url"], r["min_dist"]) for r in e] == \
           [(r["rank"], r["url"], r["min_dist"]) for r in t]
    for a, b in zip(e, t):
        assert math.isclose(a["score"], b["score"], rel_tol=1e-9, abs_tol=1e-12)


def test_max_window_is_exact_filter(spark, prox_index):
    eng, _, _ = prox_index
    full = eng.proximity_search(QUERY, 500).collect()
    want = sorted(
        ((r["min_dist"], -r["score"], r["url"]) for r in full if r["min_dist"] <= 3),
    )
    got = eng.proximity_search(QUERY, 500, max_window=3).orderBy("rank").collect()
    assert [(r["min_dist"], -r["score"], r["url"]) for r in got] == want


def test_degenerate_queries_empty(spark, prox_index):
    eng, _, _ = prox_index
    assert eng.proximity_search("trade", 10).count() == 0      # one term
    assert eng.proximity_search("zzzqqqxxx wwwheiioo", 10).count() == 0


def test_requires_positions(spark, built_index):
    out, cfg, _ = built_index  # conftest index: keep_positions=False
    from search_engine_spark.searcher import SearchEngine

    eng = SearchEngine(spark, out, cfg)
    with pytest.raises(ValueError, match="keep_positions"):
        eng.proximity_search("world trade", 10)


def test_span_near_ordered_window(spark, prox_index):
    """Ordered span-near (SearchEngine.span_near_search) contract:
    slop=0 on a 2-term phrase is exact-phrase adjacency (span_tf ≡
    phrase_tf per url); a wider slop matches a superset with per-url
    counts >= the tighter ones; counts equal a brute-force
    enumeration of ordered in-window tuples over the engine's own
    raw positions; engine ≡ raw-postings twin per rank."""
    from pyspark.sql import functions as F

    from search_engine_spark import twin as TW

    eng, pages, cfg = prox_index
    phrase = "world trade"

    base = {r["url"]: r["span_tf"]
            for r in eng.span_near_search(phrase, slop=0, k=500).collect()}
    exact = {r["url"]: r["phrase_tf"]
             for r in eng.phrase_search(phrase, 500).collect()}
    assert base == exact and base

    wide = {r["url"]: r["span_tf"]
            for r in eng.span_near_search(phrase, slop=3, k=500).collect()}
    assert set(wide) >= set(base)
    assert all(wide[u] >= n for u, n in base.items())

    # brute-force oracle at slop=3 from the raw position arrays
    keys = [t for t, _ in eng.parse_phrase(phrase)]
    max_span = 1 + 3
    rows = (TW.raw_postings(spark, eng)
            .filter(F.col("term_key").isin(keys))
            .select("url", "term_key", "positions").collect())
    per_url: dict = {}
    for r in rows:
        per_url.setdefault(r["url"], {})[r["term_key"]] = list(r["positions"])
    want = {}
    for u, m in per_url.items():
        if any(kk not in m for kk in keys):
            continue
        n = sum(
            1
            for tup in itertools.product(*(m[kk] for kk in keys))
            if all(b > a for a, b in zip(tup, tup[1:]))
            and tup[-1] - tup[0] <= max_span
        )
        if n:
            want[u] = n
    assert wide == want

    # engine ≡ twin, per rank with exact counts
    got = [(r["url"], r["span_tf"])
           for r in eng.span_near_search(phrase, slop=2, k=20).collect()]
    tw = [(r["url"], r["span_tf"])
          for r in TW.twin_span_near_topk(spark, eng, phrase, 2, 20)
          .orderBy("rank").collect()]
    assert got == tw and got

    assert eng.span_near_search("zzznope trade", slop=2, k=10).count() == 0
    with pytest.raises(ValueError, match="slop"):
        eng.span_near_search(phrase, slop=-1, k=5)


def test_span_near_unordered(spark, prox_index):
    """Unordered span-near: per-url counts are a superset-with->=
    of ordered at the same slop; equal a brute-force enumeration of
    ANY-order in-window tuples; reversed-phrase invariance (order of
    terms in the query cannot matter); engine ≡ twin per rank; a
    repeated term refuses loudly."""
    from pyspark.sql import functions as F

    from search_engine_spark import twin as TW

    eng, pages, cfg = prox_index
    phrase = "world trade"

    o = {r["url"]: r["span_tf"]
         for r in eng.span_near_search(phrase, slop=3, k=500).collect()}
    u = {r["url"]: r["span_tf"]
         for r in eng.span_near_search(phrase, slop=3, k=500,
                                       ordered=False).collect()}
    assert set(u) >= set(o) and u
    assert all(u[k] >= n for k, n in o.items())

    # reversed phrase: same unordered counts
    rev = {r["url"]: r["span_tf"]
           for r in eng.span_near_search("trade world", slop=3, k=500,
                                         ordered=False).collect()}
    assert rev == u

    # brute-force oracle from the raw position arrays
    keys = [t for t, _ in eng.parse_phrase(phrase)]
    max_span = 1 + 3
    rows = (TW.raw_postings(spark, eng)
            .filter(F.col("term_key").isin(keys))
            .select("url", "term_key", "positions").collect())
    per_url: dict = {}
    for r in rows:
        per_url.setdefault(r["url"], {})[r["term_key"]] = list(r["positions"])
    want = {}
    for url, m in per_url.items():
        if any(kk not in m for kk in keys):
            continue
        n = sum(
            1
            for tup in itertools.product(*(m[kk] for kk in keys))
            if max(tup) - min(tup) <= max_span
        )
        if n:
            want[url] = n
    assert u == want

    got = [(r["url"], r["span_tf"])
           for r in eng.span_near_search(phrase, slop=2, k=20,
                                         ordered=False).collect()]
    tw = [(r["url"], r["span_tf"])
          for r in TW.twin_span_near_topk(spark, eng, phrase, 2, 20,
                                          ordered=False)
          .orderBy("rank").collect()]
    assert got == tw and got

    with pytest.raises(ValueError, match="distinct"):
        eng.span_near_search("world trade world", slop=2, k=5, ordered=False)


def test_rescore_two_phase(spark, prox_index):
    """Two-phase rescore (SearchEngine.rescore_search) contract: the
    result set is always a subset of the first-pass window; weight=0
    reproduces first-pass BM25 order; min_dist agrees with
    proximity_search per url; the fold formula is checked by hand;
    engine ≡ twin per rank; window < k refuses."""
    from pyspark.sql import functions as F  # noqa: F401

    from search_engine_spark import twin as TW

    eng, pages, cfg = prox_index
    q = "world trade"

    first = eng.search(q, 30).collect()
    win_urls = {r["url"] for r in first}
    base_score = {r["url"]: r["score"] for r in first}

    out = eng.rescore_search(q, k=10, window=30, weight=2.0).collect()
    assert out and {r["url"] for r in out} <= win_urls

    # weight=0: same docs, first-pass order
    zero = eng.rescore_search(q, k=10, window=30, weight=0.0).collect()
    assert [r["url"] for r in zero] == [r["url"] for r in first[:10]]

    # min_dist matches the proximity scorer where a pair exists
    prox = {r["url"]: r["min_dist"]
            for r in eng.proximity_search(q, 500).collect()}
    for r in out:
        if r["min_dist"] >= 0:
            assert prox[r["url"]] == r["min_dist"]
        else:
            assert r["url"] not in prox
        want = base_score[r["url"]] + (
            2.0 / (1 + r["min_dist"]) if r["min_dist"] >= 0 else 0.0)
        assert abs(r["rescore"] - want) < 1e-9

    # engine ≡ twin per rank
    tw = [(r["url"], r["min_dist"])
          for r in TW.twin_rescore_topk(spark, eng, q, 10, 30, 2.0)
          .orderBy("rank").collect()]
    assert [(r["url"], r["min_dist"]) for r in out] == tw

    with pytest.raises(ValueError, match="window"):
        eng.rescore_search(q, k=20, window=10)


def test_phrase_prefix_engine_equals_twin_and_golden(spark, prox_index):
    """match_phrase_prefix: engine (packed chain + df-capped expansion
    leg) ≡ raw-positions twin per rank, and both equal a single-node
    golden recomputation over parse_doc positions with the SAME
    df-desc/term-asc expansion cap."""
    from search_engine_spark.textproc import parse_doc
    from search_engine_spark.twin import twin_phrase_prefix_topk

    eng, pages, cfg = prox_index
    q = "world tra*"
    got = [(r["url"], r["phrase_tf"])
           for r in eng.phrase_prefix_search(q, 30).orderBy("rank").collect()]
    want = [(r["url"], r["phrase_tf"])
            for r in twin_phrase_prefix_topk(spark, eng, q, 30)
            .orderBy("rank").collect()]
    assert got == want and got
    # single-node golden: expansion = engine's own cap rule result
    exps = set(eng._expand_prefixes(["tra"], 16))
    stop = cfg.stop_set()
    counts: dict[str, int] = {}
    for p in pages:
        pos_by_term: dict[str, set] = {}
        for key, ts in parse_doc(p["text"], stop, cfg.stem).items():
            pos_by_term.setdefault(key.lower(), set()).update(ts.positions)
        heads = pos_by_term.get("world", set())
        follow = set()
        for t in exps:
            follow |= {x - 1 for x in pos_by_term.get(t, set())}
        n = len(heads & follow)
        if n:
            counts[p["url"]] = n
    golden = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[:30]
    assert got == golden


def test_phrase_prefix_guards(spark, prox_index, built_index):
    eng, _, _ = prox_index
    with pytest.raises(ValueError, match="last token"):
        eng.phrase_prefix_search("world trade", 10)
    with pytest.raises(ValueError, match="last token"):
        eng.phrase_prefix_search("world *", 10)
    # unknown prefix -> empty; prefix-only query counts occurrences
    assert eng.phrase_prefix_search("world zzz*", 10).count() == 0
    solo = eng.phrase_prefix_search("tra*", 10)
    assert solo.count() > 0
    # a positions-free index refuses loudly
    from search_engine_spark.searcher import SearchEngine

    out, cfg0, _ = built_index
    flat = SearchEngine(spark, out, cfg0)
    with pytest.raises(ValueError, match="keep_positions"):
        flat.phrase_prefix_search("world tra*", 10)
