"""Stored query-result cache — the ES shard-request-cache analog.

Head queries on a web index are extremely hot (a handful of strings
serve a double-digit share of traffic), and their top-k pages are
immutable between index mutations.  This side-car stores the
engine's OWN top-k frames keyed by the normalized query, partitioned
so one served query reads one partition directory, and — like every
other stored layout in this repo (MLT statistics, suggest
neighborhood, docstore) — stamps the main index's lineage
fingerprint at build so a post-mutation serve refuses loudly instead
of returning stale ranks (the round-4 side-car discipline,
mlt.check_mlt_fresh).

Cache key: md5 over the PARSED term keys (sorted, deduped) plus k —
so 'world trade', 'trade world', and 'Trade  World' share one entry
(they are the same query to the scorer), while a different k is a
different entry (a k=10 page must never serve a k=50 ask truncated
or padded).

Scale shape: the build is ONE batched engine job over the query list
(search_batch — one pruned scan over the union of terms) plus a
partitionBy write; a serve is a PartitionFilters-pruned read of <= k
rows, no scoring, no dictionary, no postings.  A miss costs one
metadata read and falls back to the live engine.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _query_digest(engine, query: str, k: int) -> str:
    keys = engine.parse_query(query)
    return hashlib.md5(("|".join(keys) + f"|k={k}").encode()).hexdigest()[:16]


def write_query_cache(engine, queries: list[str], out_dir: str,
                      k: int = 10) -> dict:
    """Materialize the engine's top-``k`` for every query string in
    ONE batched job and store it partitioned by query digest.
    Returns the meta dict (also written beside the parquet)."""
    from ..indexer import index_fingerprint

    pairs = [(_query_digest(engine, q, k), q) for q in queries]
    batch = engine.search_batch([(d, q) for d, q in pairs], k)
    (
        batch.withColumnRenamed("qid", "qdigest")
        .repartition("qdigest")
        .write.mode("overwrite").partitionBy("qdigest")
        .parquet(os.path.join(out_dir, "results"))
    )
    meta = {
        "k": int(k),
        "n_queries": len(pairs),
        "index_dir": engine.paths.root,
        "index_fingerprint": index_fingerprint(engine.paths.root),
    }
    with open(os.path.join(out_dir, "_cache_meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def check_cache_fresh(meta: dict, path: str,
                      index_dir: str | None = None) -> None:
    """Refuse a cached serve when the main index has moved since the
    cache build (lineage-position mismatch) — stale top-k pages are
    the one failure mode a result cache must never have."""
    from ..indexer import index_fingerprint

    stamped = meta["index_fingerprint"]
    current = index_fingerprint(index_dir or meta["index_dir"])
    if current != stamped:
        raise RuntimeError(
            f"query cache at {path} is STALE: built at index position "
            f"{stamped}, index is now at {current} — rebuild with "
            "write_query_cache after index mutations")


def cached_search(engine, cache_dir: str, query: str,
                  k: int | None = None) -> DataFrame | None:
    """Serve one query from the stored cache: a PartitionFilters-
    pruned read of <= k rows (no postings, no dictionary, no
    scoring).  Returns None on a miss (unknown query or mismatched
    k) — the caller falls back to the live engine; raises on a stale
    cache (index mutated since the build)."""
    with open(os.path.join(cache_dir, "_cache_meta.json")) as fh:
        meta = json.load(fh)
    check_cache_fresh(meta, cache_dir)
    k = k if k is not None else int(meta["k"])
    if k != int(meta["k"]):
        return None
    digest = _query_digest(engine, query, k)
    try:
        hit = (
            engine.spark.read.parquet(os.path.join(cache_dir, "results"))
            .filter(F.col("qdigest") == digest)
            .select("url", "score", "rank")
        )
    except Exception:
        # every cached query returned zero rows -> the partitioned
        # write left no schema-bearing files; everything is a miss
        return None
    return hit if hit.limit(1).count() else None


def cached_or_search(engine, cache_dir: str, query: str,
                     k: int | None = None) -> DataFrame:
    """:func:`cached_search` with the live-engine fallback — the
    serving entry point."""
    hit = cached_search(engine, cache_dir, query, k)
    if hit is not None:
        return hit
    with open(os.path.join(cache_dir, "_cache_meta.json")) as fh:
        meta = json.load(fh)
    return engine.search(query, k if k is not None else int(meta["k"]))
