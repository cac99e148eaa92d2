"""Index snapshot (indexer.snapshot_index): a point-in-time copy
serves the pre-mutation results after the source moves on, torn-state
and non-empty-target refusals."""

from __future__ import annotations

import math
import os
import shutil

import pytest

from pyspark.sql import functions as F

from search_engine_spark.incremental import pending_segment_marker
from search_engine_spark.indexer import index_fingerprint, snapshot_index
from search_engine_spark.searcher import SearchEngine

QUERY = "world trade market"


def _rows(df):
    return [(r["rank"], r["url"], round(r["score"], 9)) for r in
            df.orderBy("rank").collect()]


def test_snapshot_serves_premutation_state(spark, built_index,
                                           fixture_pages_parquet, tmp_path):
    out, cfg, _ = built_index
    # private copy: this test mutates its source
    src = str(tmp_path / "src")
    shutil.copytree(out, src)
    snap = str(tmp_path / "snap")
    fp = snapshot_index(src, snap)
    assert fp == index_fingerprint(src)
    before = _rows(SearchEngine(spark, src, cfg).search(QUERY, 10))

    from search_engine_spark.incremental import add_documents

    delta = (spark.read.parquet(fixture_pages_parquet).limit(5)
             .withColumn("url", F.concat(F.lit("snapdelta://"), F.col("url"))))
    add_documents(spark, delta, src, cfg)
    assert index_fingerprint(src) != fp          # source moved on
    assert index_fingerprint(snap) == fp         # snapshot did not
    after_snap = _rows(SearchEngine(spark, snap, cfg).search(QUERY, 10))
    assert after_snap == before
    for a, b in zip(after_snap, before):
        assert math.isclose(a[2], b[2], rel_tol=1e-12)


def test_snapshot_refusals(spark, built_index, tmp_path):
    out, cfg, _ = built_index
    src = str(tmp_path / "src2")
    shutil.copytree(out, src)
    from search_engine_spark.indexer import IndexPaths

    marker = pending_segment_marker(IndexPaths(src))
    open(marker, "w").close()
    try:
        with pytest.raises(RuntimeError, match="pending_segment"):
            snapshot_index(src, str(tmp_path / "never"))
    finally:
        os.remove(marker)
    # non-empty target refused
    busy = tmp_path / "busy"
    busy.mkdir()
    (busy / "x").write_text("occupied")
    with pytest.raises(RuntimeError, match="not empty"):
        snapshot_index(src, str(busy))
