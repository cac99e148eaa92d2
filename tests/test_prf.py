"""Pseudo-relevance feedback (SearchEngine.prf_search) and the
doc-major term-vector side-car (operators/termvectors.py).

Pins the semantics the search_prf / ft_prf_topk driver rows rely on:
the stored vectors round-trip the raw postings through a pruned
fetch, the expansion equals the manual Σtf×idf_micro top-m rule, the
engine ≡ raw-postings twin per rank, a no-hit query yields the empty
frame, and the layout refuses to serve once the index moves.
"""

from __future__ import annotations

import math
import os
import shutil

import pytest

from pyspark.sql import functions as F

from search_engine_spark import twin as TW
from search_engine_spark.operators.termvectors import (
    fetch_term_vectors, write_term_vectors)


@pytest.fixture(scope="module")
def prf_index(spark, tmp_path_factory):
    """Index + term-vector layout over 200 fixture pages."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.fixtures import make_pages, pages_schema_arrow
    from search_engine_spark.indexer import build_index
    from search_engine_spark.searcher import SearchEngine

    tmp = str(tmp_path_factory.mktemp("prfix"))
    pages = make_pages(200, seed=23)
    src = os.path.join(tmp, "pages.parquet")
    pq.write_table(pa.Table.from_pylist(pages, schema=pages_schema_arrow()), src)
    cfg = EngineConfig(n_doc_shards=4, n_term_buckets=4, n_bucket_groups=2)
    ix = os.path.join(tmp, "ix")
    build_index(spark, spark.read.parquet(src), ix, cfg, resume=False)
    eng = SearchEngine(spark, ix, cfg)
    tv = os.path.join(tmp, "tv")
    write_term_vectors(TW.raw_postings(spark, eng), tv, index_dir=ix)
    return eng, pages, cfg, tv, src


QUERY = "world trade market"


def _rows(df):
    return [(r["rank"], r["url"], r["score"]) for r in
            df.orderBy("rank").collect()]


def _assert_rank_identical(a, b):
    ra, rb = _rows(a), _rows(b)
    assert [x[:2] for x in ra] == [x[:2] for x in rb]
    for x, y in zip(ra, rb):
        assert math.isclose(x[2], y[2], rel_tol=1e-9, abs_tol=1e-12)


def test_tv_roundtrip_and_pruned_plan(spark, prf_index):
    eng, pages, _, tv, _ = prf_index
    want_urls = [p["url"] for p in pages[7:10]]
    got = {(r["url"], r["term_key"]): r["tf"]
           for r in fetch_term_vectors(spark, tv, want_urls).collect()}
    raw = {(r["url"], r["term_key"]): int(r["tf"])
           for r in TW.raw_postings(spark, eng)
           .filter(F.col("url").isin(want_urls)).collect()}
    assert got == raw
    out = fetch_term_vectors(spark, tv, want_urls)
    txt = out._jdf.queryExecution().toString()
    assert "PartitionFilters: [" in txt and "bucket" in txt
    assert "PushedFilters:" in txt and "url" in txt
    assert fetch_term_vectors(spark, tv, []).count() == 0


def test_prf_expansion_matches_manual_rule(spark, prf_index):
    eng, _, _, tv, _ = prf_index
    fb_docs, fb_terms = 10, 5
    keys = eng.parse_query(QUERY)
    fb_urls = [r["url"] for r in eng.search(QUERY, fb_docs).select("url").collect()]
    tfs: dict[str, int] = {}
    for r in fetch_term_vectors(spark, tv, fb_urls).collect():
        tfs[r["term_key"]] = tfs.get(r["term_key"], 0) + int(r["tf"])
    idf = {r["term_key"]: r["idf"]
           for r in eng.dictionary.select("term_key", "idf")
           .filter(F.col("term_key").isin(list(tfs))).collect()}
    weights = {
        t: tfs[t] * int(math.floor(idf[t] * 1_000_000 + 0.5))
        for t in tfs if t not in keys and t in idf
    }
    manual = sorted(weights, key=lambda t: (-weights[t], t))[:fb_terms]
    _assert_rank_identical(
        eng.prf_search(QUERY, tv, 10, fb_docs=fb_docs, fb_terms=fb_terms),
        eng._search_keys(sorted(set(keys) | set(manual)), 10))


def test_prf_engine_matches_twin(spark, prf_index):
    eng, _, _, tv, _ = prf_index
    _assert_rank_identical(
        eng.prf_search(QUERY, tv, 10),
        TW.twin_prf_topk(spark, eng, QUERY, 10))


def test_prf_no_hits_is_empty(spark, prf_index):
    eng, _, _, tv, _ = prf_index
    assert eng.prf_search("zzzzqqqxxx", tv, 10).count() == 0


def test_tv_refuses_stale_index(spark, prf_index, tmp_path):
    from search_engine_spark.incremental import add_documents

    eng, pages, cfg, _, src = prf_index
    # private copy of the index: this test mutates it
    ix2 = str(tmp_path / "ix2")
    shutil.copytree(eng.paths.root, ix2)
    tv2 = str(tmp_path / "tv2")
    from search_engine_spark.searcher import SearchEngine

    eng2 = SearchEngine(spark, ix2, cfg)
    write_term_vectors(TW.raw_postings(spark, eng2), tv2, index_dir=ix2)
    fetch_term_vectors(spark, tv2, [pages[0]["url"]]).collect()  # fresh: serves
    delta = spark.read.parquet(src).limit(3).withColumn(
        "url", F.concat(F.lit("delta://"), F.col("url")))
    add_documents(spark, delta, ix2, cfg)
    with pytest.raises(RuntimeError, match="STALE"):
        fetch_term_vectors(spark, tv2, [pages[0]["url"]])
    # rebuild re-ties the layout to the moved index
    eng3 = SearchEngine(spark, ix2, cfg)
    write_term_vectors(TW.raw_postings(spark, eng3), tv2, index_dir=ix2)
    assert fetch_term_vectors(spark, tv2, [pages[0]["url"]]).count() > 0
