"""Segment-count merge policy: live_segments counting, the
maybe_compact threshold decision, and the compacted stamp written by
the full refresh path."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from search_engine_spark.config import EngineConfig  # noqa: E402
from search_engine_spark.incremental import (  # noqa: E402
    add_documents,
    live_segments,
    maybe_compact,
)
from search_engine_spark.indexer import IndexPaths, build_index  # noqa: E402
from search_engine_spark.searcher import SearchEngine  # noqa: E402


def test_policy_counts_and_compacts(spark, fixture_pages_parquet,
                                    tmp_path_factory):
    cfg = EngineConfig(n_doc_shards=4, n_term_buckets=4, n_bucket_groups=2)
    out = str(tmp_path_factory.mktemp("policy_index"))
    pages = spark.read.parquet(fixture_pages_parquet)
    part = F.pmod(F.xxhash64("url"), F.lit(4))

    build_index(spark, pages.filter(part == 0), out, cfg)
    paths = IndexPaths(out)
    assert live_segments(paths) == 1

    add_documents(spark, pages.filter(part == 1), out, cfg)
    add_documents(spark, pages.filter(part == 2), out, cfg)
    assert live_segments(paths) == 3

    # below threshold: a no-op that reports the live count
    did, live = maybe_compact(spark, out, max_segments=3, cfg=cfg)
    assert (did, live) == (False, 3)
    assert live_segments(paths) == 3

    # cross the threshold: compacts and the count resets
    add_documents(spark, pages.filter(part == 3), out, cfg)
    assert live_segments(paths) == 4
    did, live = maybe_compact(spark, out, max_segments=3, cfg=cfg)
    assert (did, live) == (True, 4)
    assert live_segments(paths) == 1

    # post-compact answers match a one-shot build over the full corpus
    full = str(tmp_path_factory.mktemp("policy_full"))
    build_index(spark, pages, full, cfg)
    q = "world trade market"
    a = [(r["url"], r["score"])
         for r in SearchEngine(spark, out, cfg).search(q, k=10).collect()]
    b = [(r["url"], r["score"])
         for r in SearchEngine(spark, full, cfg).search(q, k=10).collect()]
    assert a == b

    # appends after the reset count from 1 again
    # (segment ids stay monotonic; only the generation count resets)
    add_documents(
        spark,
        pages.filter(part == 0).withColumn(
            "url", F.concat(F.lit("again-"), F.col("url"))),
        out, cfg)
    assert live_segments(paths) == 2
