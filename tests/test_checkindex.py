"""CheckIndex (checkindex.py): offline integrity fsck — green on a
healthy index through every mutation, red on planted corruption."""

from __future__ import annotations

import glob
import json
import os
import shutil

from search_engine_spark.checkindex import check_index


def _copy(built_index, tmp_path, name):
    out, cfg, _ = built_index
    dst = str(tmp_path / name)
    shutil.copytree(out, dst)
    return dst, cfg


def _by_name(report):
    return {c["name"]: c for c in report["checks"]}


def test_healthy_index_passes_everything(built_index):
    out, _, _ = built_index
    report = check_index(out)
    assert report["ok"], report
    assert {c["name"] for c in report["checks"]} >= {
        "meta", "servable", "doc_ids_unique", "doc_stats_sane",
        "doc_count", "dictionary_keys", "no_orphan_postings",
        "no_empty_terms", "bucket_agree"}


def test_mutated_index_still_passes(spark, built_index, tmp_path):
    from pyspark.sql import functions as F

    from search_engine_spark.incremental import (
        delete_documents, update_documents)
    from search_engine_spark.searcher import SearchEngine

    ix, cfg = _copy(built_index, tmp_path, "mut")
    eng = SearchEngine(spark, ix, cfg)
    urls = [r["url"] for r in
            eng._doc_stats.orderBy("url").limit(3).collect()]
    delete_documents(spark, urls[:1], ix)
    report = check_index(ix)
    assert report["ok"], report
    # recrawl supersede: superseded generations persist until
    # compaction, so the doc_count check must SKIP, not fail
    pages = spark.createDataFrame(
        [(urls[1], "recrawled fresh text rows data")], "url string, text string")
    update_documents(spark, pages, ix, cfg)
    report = check_index(ix)
    assert report["ok"], report
    assert "skipped" in _by_name(report)["doc_count"]["detail"]


def test_duplicate_doc_ids_fail(built_index, tmp_path):
    ix, _ = _copy(built_index, tmp_path, "dup")
    parts = glob.glob(os.path.join(ix, "doc_stats", "**", "*.parquet"),
                      recursive=True)
    shutil.copy(parts[0], parts[0].replace(".parquet", "_dup.parquet"))
    report = check_index(ix)
    assert not report["ok"]
    assert not _by_name(report)["doc_ids_unique"]["ok"]


def test_missing_dictionary_fails(built_index, tmp_path):
    ix, _ = _copy(built_index, tmp_path, "nodict")
    shutil.rmtree(os.path.join(ix, "dictionary"))
    report = check_index(ix)
    assert not report["ok"]
    assert not _by_name(report)["dictionary_keys"]["ok"]


def test_pending_marker_fails_servable(built_index, tmp_path):
    from search_engine_spark.incremental import pending_segment_marker
    from search_engine_spark.indexer import IndexPaths

    ix, _ = _copy(built_index, tmp_path, "pend")
    with open(pending_segment_marker(IndexPaths(ix)), "w") as fh:
        fh.write("{}")
    report = check_index(ix)
    assert not report["ok"]
    assert not _by_name(report)["servable"]["ok"]


def test_tampered_meta_fails_doc_count(built_index, tmp_path):
    ix, _ = _copy(built_index, tmp_path, "meta")
    mp = os.path.join(ix, "meta.json")
    with open(mp) as fh:
        meta = json.load(fh)
    meta["n_docs"] = int(meta["n_docs"]) + 7
    with open(mp, "w") as fh:
        json.dump(meta, fh)
    report = check_index(ix)
    assert not report["ok"]
    assert not _by_name(report)["doc_count"]["ok"]


def test_checkindex_cli(built_index):
    """The CLI verb is Spark-free and exits 0/2 on ok/corrupt."""
    import subprocess
    import sys as _sys

    out, _, _ = built_index
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [_sys.executable, "index_admin.py", "checkindex", "--index", out],
        capture_output=True, text=True, cwd=repo, timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout.splitlines()[-1])
    assert payload["ok"] and payload["verb"] == "checkindex"


def test_snapshot_verify_cli(built_index, tmp_path):
    """snapshot --verify fscks the COPY: green copy exits 0 with the
    report; a corrupted copy target is caught at exit 2."""
    import subprocess
    import sys as _sys

    out, _, _ = built_index
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = str(tmp_path / "backup")
    r = subprocess.run(
        [_sys.executable, "index_admin.py", "snapshot", "--index", out,
         "--out", dst, "--verify"],
        capture_output=True, text=True, cwd=repo, timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout.splitlines()[-1])
    assert payload["verified"] and payload["fingerprint"]
