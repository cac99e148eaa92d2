"""Stored fields + index-driven highlighting
(operators/docstore.py, SearchEngine.search_with_snippets).

Pins: write/fetch roundtrip is exact and pruned (bucket
PartitionFilters + url pushdown reach the scan), the assembled result
page matches a single-node golden recomputed from ``parse_doc``
positions and ``tokenize`` windows, the engine ≡ raw-postings twin
per rank including the snippet STRING, and a store tied to an index
refuses to serve after the index moves (recrawled urls would serve
their OLD text).
"""

from __future__ import annotations

import math
import os

import pytest

from search_engine_spark.operators.docstore import fetch_docs, write_docstore


@pytest.fixture(scope="module")
def snip_index(spark, tmp_path_factory):
    """Positional index + docstore over 150 fixture pages."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.fixtures import make_pages, pages_schema_arrow
    from search_engine_spark.indexer import build_index
    from search_engine_spark.searcher import SearchEngine

    tmp = str(tmp_path_factory.mktemp("snipix"))
    pages = make_pages(150, seed=17)
    src = os.path.join(tmp, "pages.parquet")
    pq.write_table(pa.Table.from_pylist(pages, schema=pages_schema_arrow()), src)
    cfg = EngineConfig(n_doc_shards=4, n_term_buckets=4, n_bucket_groups=2,
                       keep_positions=True)
    ix = os.path.join(tmp, "ix")
    build_index(spark, spark.read.parquet(src), ix, cfg, resume=False)
    store = os.path.join(tmp, "store")
    write_docstore(spark.read.parquet(src).select("url", "text"), store,
                   index_dir=ix)
    return SearchEngine(spark, ix, cfg), pages, cfg, store, src


QUERY = "world trade market"


def test_fetch_roundtrip_and_pruned_plan(spark, snip_index):
    _, pages, _, store, _ = snip_index
    want = {p["url"]: p["text"] for p in pages[5:9]}
    out = fetch_docs(spark, store, list(want))
    got = {r["url"]: r["text"] for r in out.collect()}
    assert got == want
    txt = out._jdf.queryExecution().toString()
    assert "PartitionFilters: [" in txt and "bucket" in txt
    assert "PushedFilters:" in txt and "url" in txt
    assert fetch_docs(spark, store, []).count() == 0


def test_result_page_matches_single_node_golden(spark, snip_index):
    from search_engine_spark.textproc import parse_doc, tokenize

    eng, pages, cfg, store, _ = snip_index
    out = eng.search_with_snippets(QUERY, store, k=10).collect()
    assert len(out) == 10
    keys = set(eng.parse_query(QUERY))
    stop = cfg.stop_set()
    by_url = {p["url"]: p["text"] for p in pages}
    for r in out:
        text = by_url[r["url"]]
        posmap = parse_doc(text, stop, cfg.stem)
        first = min(min(ts.positions)
                    for key, ts in posmap.items() if key.lower() in keys)
        assert r["match_pos"] == first
        toks = tokenize(text)
        lo = max(first - 5, 0)
        assert r["snippet"] == " ".join(toks[lo: first + 6])


def test_engine_matches_twin_including_snippet(spark, snip_index):
    from search_engine_spark import twin as TW

    eng, _, _, store, src = snip_index
    pages_df = spark.read.parquet(src)
    e = eng.search_with_snippets(QUERY, store, k=10).collect()
    t = TW.twin_search_snippets(spark, eng, pages_df, QUERY, 10).collect()
    assert [(r["rank"], r["url"], r["match_pos"], r["snippet"]) for r in e] == \
           [(r["rank"], r["url"], r["match_pos"], r["snippet"]) for r in t]
    for a, b in zip(e, t):
        assert math.isclose(a["score"], b["score"], rel_tol=1e-9, abs_tol=1e-12)


def test_docstore_refuses_stale_index(spark, snip_index, tmp_path):
    from pyspark.sql import functions as F

    from search_engine_spark.incremental import add_documents

    eng, pages, cfg, _, src = snip_index
    # private copy of the index: this test mutates it
    import shutil

    ix2 = str(tmp_path / "ix2")
    shutil.copytree(eng.paths.root, ix2)
    store2 = str(tmp_path / "store2")
    pages_df = spark.read.parquet(src)
    write_docstore(pages_df.select("url", "text"), store2, index_dir=ix2)
    fetch_docs(spark, store2, [pages[0]["url"]]).collect()  # fresh: serves
    delta = pages_df.limit(3).withColumn(
        "url", F.concat(F.lit("delta://"), F.col("url")))
    add_documents(spark, delta, ix2, cfg)
    with pytest.raises(RuntimeError, match="STALE"):
        fetch_docs(spark, store2, [pages[0]["url"]])
    # rebuild re-ties the store to the moved index
    write_docstore(pages_df.select("url", "text"), store2, index_dir=ix2)
    assert fetch_docs(spark, store2, [pages[0]["url"]]).count() == 1
