"""Incremental-ingest cost model at scale-bench corpus size.

bench.py times add_documents at sf0.1 (5k docs), where the ~10 fixed
job boundaries dominate and hide the claim that matters; this harness
evidences the O(delta) cost model where it is visible: on the 240k-doc
scaling corpus, a 5% delta add must cost a small fraction of the full
build, because the old corpus is never re-tokenized, re-aggregated, or
re-packed.  Also times delete_documents (O(|deletes|): tombstone write
only) and compact_index (corpus-cost by design — the deferred purge +
repack).

Usage: python tools/incremental_bench.py [--docs 240000] [--delta-pct 5]
       [--cpus 16]
Prints one JSON line with wall seconds, per-stage lineage seconds, the
add/build ratio, and /proc/stat steal%% per phase.
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


def _cpu_sample() -> tuple[int, int]:
    from tools.scale_bench import _cpu_sample as probe  # one shared probe

    return probe()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=240_000)
    ap.add_argument("--delta-pct", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    from tools.scale_bench import ensure_corpus

    corpus = ensure_corpus(args.docs)

    from pyspark.sql import functions as F

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.incremental import (
        add_documents, compact_index, delete_documents)
    from search_engine_spark.indexer import IndexPaths, build_index, read_lineage
    from search_engine_spark.session import get_spark

    spark = get_spark(app="incremental_bench", master=f"local[{args.cpus}]")
    cfg = EngineConfig(n_doc_shards=32, n_term_buckets=16, n_bucket_groups=1)
    ix = tempfile.mkdtemp(prefix="se_inc_bench_")
    shutil.rmtree(ix, ignore_errors=True)

    pages = spark.read.parquet(corpus)
    mod = 100 // args.delta_pct
    # delta = a delta-pct re-sample under fresh urls (new docs of the
    # same shape); base = the rest, so base+delta ~= the full corpus
    base = pages.filter(F.pmod(F.xxhash64("url"), F.lit(mod)) != 0)
    delta = (
        pages.filter(F.pmod(F.xxhash64("url"), F.lit(mod)) == 0)
        .withColumn("url", F.concat(F.lit("delta://"), F.col("url")))
    )
    n_base, n_delta = base.count(), delta.count()

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

    phase("build_full", lambda: build_index(spark, base, ix, cfg, resume=False))
    phase("add_delta", lambda: add_documents(spark, delta, ix, cfg))
    victim_urls = [r["url"] for r in delta.select("url").limit(1000).collect()]
    phase("delete_1k", lambda: delete_documents(spark, victim_urls, ix))
    phase("compact", lambda: compact_index(spark, ix, cfg))

    stage_secs = {
        f"{r['stage']}:{r['key']}": round(float(r["seconds"]), 2)
        for r in read_lineage(IndexPaths(ix)) if r.get("seconds")
    }
    out = {
        "metric": "incremental ingest cost vs full build",
        "docs_base": n_base,
        "docs_delta": n_delta,
        "delta_fraction": round(n_delta / max(1, n_base), 4),
        "cpus": args.cpus,
        "seconds": timings,
        "steal_pct": steal,
        "add_over_build": round(timings["add_delta"] / timings["build_full"], 4),
        "lineage_stage_seconds": stage_secs,
    }
    shutil.rmtree(ix, ignore_errors=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
