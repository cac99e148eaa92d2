"""Physical-plan hygiene sweep over EVERY driver-contract query.

For each row in ``__spark_entry__.queries()`` (streaming rows excluded
— their sink table is only materialized by running the stream), build
the DataFrame at the given sf dir and grep the executed plan for the
anti-patterns that kill 100 TB runs:

* ``CartesianProduct``      — an unconstrained all-pairs join
* ``BatchEvalPython``       — a row-at-a-time Python UDF in the plan
                              (Arrow/Pandas kernels show up as
                              ArrowEvalPython / MapInPandas and are
                              allowed: they are the vectorized path)

``BroadcastNestedLoopJoin`` is reported but not failed: the rows that
carry one cross-join a BROADCAST side of O(1) rows (a query vector, a
1-row norm), which is exactly how a scalar subquery should plan.

Usage: python tools/plan_audit.py [sf_dir]   (default sf0.001)
Prints one JSON line; exit 1 if any hard anti-pattern is found.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SKIP = {"streaming_dedup", "streaming_events_hourly"}  # require running the stream

HARD = ("CartesianProduct", "BatchEvalPython")
SOFT = ("BroadcastNestedLoopJoin",)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as entry
    from search_engine_spark.session import get_spark

    spark = get_spark(app="plan_audit", master="local[8]", shuffle_partitions=8)
    bad: dict[str, list[str]] = {}
    soft: dict[str, list[str]] = {}
    for name, fn in entry.queries().items():
        if name in SKIP:
            continue
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        hits = [p for p in HARD if p in plan]
        if hits:
            bad[name] = hits
        s = [p for p in SOFT if p in plan]
        if s:
            soft[name] = s
        print(f"{'FAIL' if hits else 'ok  '} {name}"
              + (f"  {hits}" if hits else ""), file=sys.stderr, flush=True)

    from search_engine_spark.operators.dedup import clear_shingle_cache
    from search_engine_spark.operators.textstats import clear_doc_tf_cache

    clear_shingle_cache()
    clear_doc_tf_cache()
    n = len([q for q in entry.queries() if q not in SKIP])
    print(json.dumps({
        "metric": "plan-hygiene sweep (hard: CartesianProduct, row-at-a-time PythonUDF)",
        "sf": sf, "queries_audited": n,
        "hard_failures": bad, "soft_notes": soft,
    }))
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
