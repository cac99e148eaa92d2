"""CheckIndex — offline integrity verification of a packed index.

Lucene ships ``CheckIndex`` (walk every segment, verify postings /
stored fields / norms agree before trusting or force-merging an
index); Elasticsearch exposes it as the last resort behind
``index.shard.check_on_startup``.  This is the same tool for this
engine's layout: every cross-table invariant the build pipeline
guarantees is re-verified from the FILES, so a corrupted copy, a
torn manual edit, or a bug in a future mutation path is caught
before it serves silently-wrong results.

Spark-free by design (like ``index_admin.py stats``): the checks run
in DuckDB straight over the parquet directories, so an operator can
fsck a broken index — or a restored snapshot — next to a live
cluster without scheduling a job.  At 100 TB the same SQL runs
through any engine that reads the table layout; checks are
aggregation-shaped (counts and anti-join counts), never row dumps.

Checked invariants:

* ``meta``        — meta.json present with the layout keys.
* ``servable``    — no pending-segment marker (a crashed append
  refuses readers; compact/refresh repairs).
* ``doc_ids_unique``   — (shard, local_id) is a key of doc_stats
  (a duplicate id would double-score every query touching it).
* ``doc_stats_sane``   — length >= unique_terms, max_tf in
  [1, length]: the A5 aggregation invariants.
* ``doc_count``   — doc_stats row count == meta n_docs (skipped
  while version tombstones are pending: update_documents keeps
  superseded generations until compaction, the stats-as-packed
  contract).
* ``dictionary_keys``  — term_key unique, df >= 1, cf >= df.
* ``no_orphan_postings`` — every packed (term_key) exists in the
  dictionary (an orphan would score with no idf).
* ``no_empty_terms``     — every dictionary term has >= 1 packed
  posting row (deletes tombstone docs, never dictionary rows, so
  this holds through every mutation).
* ``bucket_agree``       — dictionary and packed rows place each
  term in the SAME bucket partition (a disagreement breaks the
  pruned query scan: the dictionary would point the query at a
  partition the postings are not in).
"""

from __future__ import annotations

import glob
import json
import os

import duckdb

from .indexer import IndexPaths

META_KEYS = ("n_docs", "avgdl", "n_doc_shards", "n_term_buckets")


def _scan(path: str) -> str:
    return (f"parquet_scan('{path}/**/*.parquet', hive_partitioning=1, "
            "union_by_name=1)")


def _has_parquet(path: str) -> bool:
    return os.path.isdir(path) and bool(
        glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))


def check_index(index_dir: str) -> dict:
    """Run every integrity check; returns ``{"ok": bool, "checks":
    [{"name", "ok", "detail"}, ...]}``.  A missing layout piece fails
    its check rather than raising, so one fsck reports everything."""
    from .incremental import pending_segment_marker

    paths = IndexPaths(index_dir)
    checks: list[dict] = []

    def add(name: str, ok: bool, detail: str) -> None:
        checks.append({"name": name, "ok": bool(ok), "detail": detail})

    meta: dict = {}
    if os.path.exists(paths.meta):
        try:
            with open(paths.meta) as fh:
                meta = json.load(fh)
            missing = [k for k in META_KEYS if k not in meta]
            add("meta", not missing,
                f"missing keys: {missing}" if missing else "all layout keys")
        except Exception as ex:  # unreadable json IS the finding
            add("meta", False, f"unreadable meta.json: {ex}")
    else:
        add("meta", False, "meta.json absent")

    pending = os.path.exists(pending_segment_marker(paths))
    add("servable", not pending,
        "pending-segment marker present (crashed append; run compact "
        "or refresh)" if pending else "no pending-segment marker")

    con = duckdb.connect()
    try:
        if not _has_parquet(paths.doc_stats):
            add("doc_ids_unique", False, "doc_stats table absent")
        else:
            ds = _scan(paths.doc_stats)
            total, distinct = con.sql(
                f"SELECT count(*), count(DISTINCT (shard, local_id)) "
                f"FROM {ds}").fetchone()
            add("doc_ids_unique", total == distinct,
                f"{total} rows, {distinct} distinct (shard, local_id)")
            bad = con.sql(
                f"SELECT count(*) FROM {ds} WHERE length < unique_terms "
                "OR max_tf < 1 OR max_tf > length").fetchone()[0]
            add("doc_stats_sane", bad == 0,
                f"{bad} rows violate length/max_tf/unique_terms bounds")
            n_version_tombstones = 0
            if _has_parquet(paths.tombstones):
                n_version_tombstones = con.sql(
                    f"SELECT count(*) FROM {_scan(paths.tombstones)} "
                    "WHERE gen IS NOT NULL").fetchone()[0]
            if meta.get("n_docs") is None:
                add("doc_count", False, "meta n_docs absent")
            elif n_version_tombstones:
                add("doc_count", True,
                    f"skipped: {n_version_tombstones} version tombstones "
                    "pending (superseded generations persist until "
                    "compaction)")
            else:
                add("doc_count", total == int(meta["n_docs"]),
                    f"doc_stats {total} vs meta n_docs {meta['n_docs']}")

        if not _has_parquet(paths.dictionary):
            add("dictionary_keys", False, "dictionary table absent")
        elif not _has_parquet(paths.index):
            add("no_orphan_postings", False, "packed index table absent")
        else:
            dc = _scan(paths.dictionary)
            ix = _scan(paths.index)
            total, distinct, bad = con.sql(
                f"SELECT count(*), count(DISTINCT term_key), "
                f"sum(CASE WHEN df < 1 OR cf < df THEN 1 ELSE 0 END) "
                f"FROM {dc}").fetchone()
            add("dictionary_keys",
                total == distinct and not bad,
                f"{total} terms, {distinct} distinct, "
                f"{int(bad or 0)} with df/cf violations")
            orphans = con.sql(
                f"SELECT count(DISTINCT i.term_key) FROM {ix} i "
                f"ANTI JOIN {dc} d ON i.term_key = d.term_key").fetchone()[0]
            add("no_orphan_postings", orphans == 0,
                f"{orphans} packed terms missing from the dictionary")
            empties = con.sql(
                f"SELECT count(*) FROM {dc} d "
                f"ANTI JOIN {ix} i ON d.term_key = i.term_key").fetchone()[0]
            add("no_empty_terms", empties == 0,
                f"{empties} dictionary terms with no packed postings")
            mismatched = con.sql(
                f"SELECT count(DISTINCT i.term_key) FROM {ix} i "
                f"JOIN {dc} d ON i.term_key = d.term_key "
                f"WHERE i.bucket <> d.bucket").fetchone()[0]
            add("bucket_agree", mismatched == 0,
                f"{mismatched} terms packed in a different bucket than "
                "the dictionary says")
    finally:
        con.close()

    return {"ok": all(c["ok"] for c in checks), "checks": checks}
