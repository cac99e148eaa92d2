"""Resume semantics: a build interrupted after some pack groups
restarts without recomputing completed shards (lineage anti-join,
SURVEY.md §5.5)."""

import os

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.indexer import (
    IndexPaths,
    build_index,
    lineage_df,
    read_lineage,
    write_lineage,
)


def _mtimes(path):
    out = {}
    for dirpath, _, files in os.walk(path):
        for f in files:
            p = os.path.join(dirpath, f)
            out[p] = os.path.getmtime(p)
    return out


def test_resume_skips_completed_stages(spark, fixture_pages_parquet, tmp_dir):
    cfg = EngineConfig(n_doc_shards=4, n_term_buckets=8, n_bucket_groups=4)
    pages = spark.read.parquet(fixture_pages_parquet)

    # full build
    build_index(spark, pages, tmp_dir, cfg)
    paths = IndexPaths(tmp_dir)
    lineage = read_lineage(paths)
    packs = [r for r in lineage if r["stage"] == "pack"]
    assert len(packs) == 4
    # the Iceberg-table view of the same rows is queryable
    assert lineage_df(spark, paths).filter(F.col("stage") == "pack").count() == 4

    before = _mtimes(paths.postings_raw) | _mtimes(paths.index)

    # simulate a kill after 2 of 4 pack groups: drop their lineage rows
    done_rows = [
        r for r in lineage
        if r["stage"] != "pack" or r["key"] in ("0", "1")
    ]
    write_lineage(paths, done_rows)
    # remove the "incomplete" groups' output (buckets 2,3,6,7 belong to groups 2,3)
    ix = spark.read.parquet(paths.index)
    n_before = ix.count()

    # restart: only groups 2 and 3 should run; tokenize/doc_stats/dictionary
    # and pack groups 0/1 must not be rewritten
    build_index(spark, pages, tmp_dir, cfg, resume=True)
    after = _mtimes(paths.postings_raw)
    for p, m in _mtimes(paths.postings_raw).items():
        assert before.get(p) == m, f"postings_raw recomputed: {p}"
    # groups 0/1's index files untouched
    for p, m in before.items():
        if p.startswith(paths.index) and os.path.exists(p):
            assert _mtimes(paths.index).get(p) is not None

    lineage2 = read_lineage(paths)
    assert len([r for r in lineage2 if r["stage"] == "pack"]) >= 4


def test_killed_pack_repair_serves_correct_results(spark, fixture_pages_parquet, tmp_dir):
    """The ADVICE-flagged scenario end-to-end: a build killed during
    pack must NOT leave a servable-looking index.  meta.json (the
    servable marker) only appears after pack completes, and re-entering
    the resume path repairs the index to rank-identical results."""
    import shutil

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.searcher import SearchEngine

    cfg = EngineConfig(n_doc_shards=4, n_term_buckets=8, n_bucket_groups=4)
    pages = spark.read.parquet(fixture_pages_parquet)
    clean = os.path.join(tmp_dir, "clean")
    build_index(spark, pages, clean, cfg)
    want = [(r["url"], round(r["score"], 9))
            for r in SearchEngine(spark, clean, cfg).search("world trade", 10).collect()]

    # simulate the kill: copy the clean build, then erase half the pack
    # groups' outputs + lineage rows + the meta marker (what a SIGKILL
    # mid-stage-D leaves behind)
    broken = os.path.join(tmp_dir, "broken")
    shutil.copytree(clean, broken)
    paths = IndexPaths(broken)
    os.remove(paths.meta)
    for bkt in (2, 3, 6, 7):
        shutil.rmtree(os.path.join(paths.index, f"bucket={bkt}"), ignore_errors=True)
    rows = [r for r in read_lineage(paths)
            if not (r["stage"] == "pack" and r["key"] in ("2", "3"))
            and r["stage"] != "build"]
    write_lineage(paths, rows)

    # a reader must refuse the partial index (no servable marker)
    assert not os.path.exists(paths.meta)

    # the repair path: resume completes only the missing groups...
    build_index(spark, pages, broken, cfg, resume=True)
    assert os.path.exists(paths.meta)
    got = [(r["url"], round(r["score"], 9))
           for r in SearchEngine(spark, broken, cfg).search("world trade", 10).collect()]
    assert got == want


def test_fresh_resume_noop(spark, fixture_pages_parquet, tmp_dir):
    cfg = EngineConfig(n_doc_shards=4, n_term_buckets=4, n_bucket_groups=2)
    pages = spark.read.parquet(fixture_pages_parquet)
    build_index(spark, pages, tmp_dir, cfg)
    paths = IndexPaths(tmp_dir)
    before = _mtimes(paths.postings_raw) | _mtimes(paths.doc_stats) | _mtimes(paths.index)
    build_index(spark, pages, tmp_dir, cfg, resume=True)  # complete: full no-op
    after = _mtimes(paths.postings_raw) | _mtimes(paths.doc_stats) | _mtimes(paths.index)
    assert before == after


def test_noop_resume_keeps_index_fingerprint(spark, fixture_pages_parquet, tmp_dir):
    """A resume pass over a COMPLETE index must not move the lineage
    position: side-car staleness stamps (docstore/MLT/suggest,
    indexer.index_fingerprint) count lineage rows, and a fingerprint
    that grows on every resume check would fail those guards with no
    actual mutation (each engine-open used to append a duplicate
    ('build','all') row)."""
    from search_engine_spark.indexer import index_fingerprint

    cfg = EngineConfig(n_doc_shards=4, n_term_buckets=4, n_bucket_groups=2)
    pages = spark.read.parquet(fixture_pages_parquet)
    build_index(spark, pages, tmp_dir, cfg)
    before = index_fingerprint(tmp_dir)
    build_index(spark, pages, tmp_dir, cfg, resume=True)
    build_index(spark, pages, tmp_dir, cfg, resume=True)
    assert index_fingerprint(tmp_dir) == before
