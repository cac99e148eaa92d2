"""Incremental-ingest cost model at scale-bench corpus size.

bench.py times add_documents at sf0.1 (5k docs), where the ~10 fixed
job boundaries dominate and hide the claim that matters; this harness
evidences the O(delta) cost model where it is visible: on the 240k-doc
scaling corpus, a 5% delta add must cost a small fraction of the full
build, because the old corpus is never re-tokenized, re-aggregated, or
re-packed.  Also times delete_documents (O(|deletes|): tombstone write
only) and compact_index (corpus-cost by design — the deferred purge +
repack).

``--appends N`` (default 1) runs the multi-segment campaign a
production operator actually cares about (the Lucene merge-policy
question): N successive delta appends, with a BM25 top-10 query timed
after every append — evidencing how query latency fans out with
segment count — then one compaction back to a single segment and a
post-compact query.  Per-append cost should stay ~O(delta)+fixed
regardless of how many segments already exist (the merge is additive
on the dictionary and never touches packed rows), query cost should
grow mildly with segment count (more index rows per (term, shard)),
and compaction should repay itself in query time.

Usage: python tools/incremental_bench.py [--docs 240000] [--delta-pct 5]
       [--cpus 16] [--appends 8] [--query-reps 3]
Prints one JSON line with wall seconds, per-stage lineage seconds, the
add/build ratio, per-segment-count query seconds, and /proc/stat
steal%% per phase.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

QUERY = "world trade market"


def _cpu_sample() -> tuple[int, int]:
    from tools.scale_bench import _cpu_sample as probe  # one shared probe

    return probe()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=240_000)
    ap.add_argument("--delta-pct", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--appends", type=int, default=1)
    ap.add_argument("--query-reps", type=int, default=3,
                    help="min-of-k per query point (steal smoothing)")
    args = ap.parse_args()

    from tools.scale_bench import ensure_corpus

    corpus = ensure_corpus(args.docs)

    from pyspark.sql import functions as F

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.incremental import (
        add_documents, compact_index, delete_documents)
    from search_engine_spark.indexer import IndexPaths, build_index, read_lineage
    from search_engine_spark.searcher import SearchEngine
    from search_engine_spark.session import get_spark

    spark = get_spark(app="incremental_bench", master=f"local[{args.cpus}]")
    cfg = EngineConfig(n_doc_shards=32, n_term_buckets=16, n_bucket_groups=1)
    ix = tempfile.mkdtemp(prefix="se_inc_bench_")
    shutil.rmtree(ix, ignore_errors=True)

    pages = spark.read.parquet(corpus)
    mod = 100 // args.delta_pct
    assert args.appends < mod, "appends * delta_pct must stay below 100%"
    # deltas = `appends` disjoint delta-pct re-samples under fresh urls
    # (new docs of the same shape); base = everything else
    part = F.pmod(F.xxhash64("url"), F.lit(mod))
    base = pages.filter(part >= args.appends)
    deltas = [
        pages.filter(part == i)
        .withColumn("url", F.concat(F.lit(f"delta{i}://"), F.col("url")))
        for i in range(args.appends)
    ]
    n_base = base.count()
    n_delta = [d.count() for d in deltas]

    timings: dict[str, float] = {}
    steal: dict[str, float] = {}

    def phase(name: str, thunk) -> None:
        s0, j0 = _cpu_sample()
        t0 = time.time()
        thunk()
        timings[name] = round(time.time() - t0, 2)
        s1, j1 = _cpu_sample()
        steal[name] = round(100 * (s1 - s0) / max(1, j1 - j0), 2)
        print(f"{name}: {timings[name]}s (steal {steal[name]}%)",
              file=sys.stderr, flush=True)

    def timed_query(name: str) -> None:
        # fresh engine per point: add/compact replace part files, and
        # a production searcher reopens after a refresh anyway
        eng = SearchEngine(spark, ix, cfg)
        eng.search(QUERY, 10).collect()  # warm the dictionary resolve
        best = float("inf")
        bs = 0.0
        for _ in range(args.query_reps):
            s0, j0 = _cpu_sample()
            t0 = time.time()
            eng.search(QUERY, 10).collect()
            dt = time.time() - t0
            s1, j1 = _cpu_sample()
            if dt < best:
                best, bs = dt, 100 * (s1 - s0) / max(1, j1 - j0)
        timings[name] = round(best, 3)
        steal[name] = round(bs, 2)
        print(f"{name}: {timings[name]}s (steal {steal[name]}%)",
              file=sys.stderr, flush=True)

    phase("build_full", lambda: build_index(spark, base, ix, cfg, resume=False))
    timed_query("query_segments_1")
    for i, d in enumerate(deltas):
        phase(f"add_delta_{i + 1}", lambda d=d: add_documents(spark, d, ix, cfg))
        timed_query(f"query_segments_{i + 2}")
    victim_urls = [r["url"] for r in deltas[0].select("url").limit(1000).collect()]
    phase("delete_1k", lambda: delete_documents(spark, victim_urls, ix))
    phase("compact", lambda: compact_index(spark, ix, cfg))
    timed_query("query_post_compact")

    stage_secs = {
        f"{r['stage']}:{r['key']}": round(float(r["seconds"]), 2)
        for r in read_lineage(IndexPaths(ix)) if r.get("seconds")
    }
    adds = [timings[f"add_delta_{i + 1}"] for i in range(args.appends)]
    out = {
        "metric": "incremental ingest cost vs full build",
        "docs_base": n_base,
        "docs_delta": n_delta,
        "delta_fraction": round(sum(n_delta) / max(1, n_base), 4),
        "cpus": args.cpus,
        "appends": args.appends,
        "seconds": timings,
        "steal_pct": steal,
        "add_over_build": round(adds[0] / timings["build_full"], 4),
        "add_seconds": adds,
        "query_by_segments": {
            k: v for k, v in timings.items() if k.startswith("query_")
        },
        "lineage_stage_seconds": stage_secs,
    }
    shutil.rmtree(ix, ignore_errors=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
