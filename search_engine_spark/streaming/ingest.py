"""Structured Streaming incremental ingest (SURVEY.md §2.10).

The reference is batch-only; its incremental story per the north rule
is "append new pages + resumable re-index via lineage".  This module
is that story on Structured Streaming:

1. ``stream_ingest`` watches a pages directory (file source — the
   stand-in for a Kafka/Iceberg CDC feed), tokenizes each micro-batch
   with the SAME Arrow kernel as the batch build, appends to
   ``postings_raw`` (bucket-partitioned), and records one lineage row
   per epoch.  Exactly-once = streaming checkpoint (which epochs ran)
   PLUS an idempotent per-epoch publish (replayed epochs overwrite
   their own files, never append duplicates); ``availableNow`` drains
   what's there and stops (the test/ops mode).
2. ``refresh_index`` invalidates the DERIVED stages (doc_stats /
   dictionary / entities / pack) in lineage and re-runs them over the
   accumulated raw postings — the batch builder's resume machinery
   does the rest.  Tokenization is never repeated for already-ingested
   pages; at 10^12 docs the refresh cost is the shuffle-merge over
   raw, not the parse.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT, EngineConfig
from ..indexer import (
    IndexPaths,
    _lineage_append,
    build_index,
    read_lineage,
    term_bucket,
    write_lineage,
)
from ..plans.tokenize import tokenize_pages

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"

DERIVED_STAGES = ("doc_stats", "dictionary", "entities", "pack", "build")


def stream_ingest(
    spark: SparkSession,
    pages_dir: str,
    index_dir: str,
    cfg: EngineConfig = DEFAULT,
    available_now: bool = True,
) -> None:
    """Ingest new page files from ``pages_dir`` into postings_raw."""
    paths = IndexPaths(index_dir)
    stream = spark.readStream.schema(PAGES_DDL).parquet(pages_dir)

    def handle_batch(batch: DataFrame, epoch_id: int) -> None:
        t0 = time.time()
        tokenized = tokenize_pages(batch, cfg).withColumn("bucket", term_bucket(cfg))
        # IDEMPOTENT epoch publish (exactly-once, not just
        # at-least-once): foreachBatch replays an epoch if the job
        # dies between the data write and the checkpoint commit, so a
        # plain mode("append") would duplicate postings rows and
        # silently inflate tf/df on the next refresh.  Instead each
        # epoch writes to a scratch dir and is then published under
        # deterministic ``epoch-<id>-*`` names, deleting any partial
        # files a crashed attempt of the SAME epoch left — replays
        # overwrite, never duplicate.  (On a cluster this publish is
        # an Iceberg/Delta transactional commit keyed by epoch_id;
        # same layout: plain files, bucket as a column, so appends
        # and full builds interleave.)
        scratch = os.path.join(paths.root, "_epoch_scratch")
        tokenized.write.mode("overwrite").parquet(scratch)
        os.makedirs(paths.postings_raw, exist_ok=True)
        for fn in os.listdir(paths.postings_raw):
            if fn.startswith(f"epoch-{epoch_id}-"):
                os.remove(os.path.join(paths.postings_raw, fn))
        for fn in sorted(os.listdir(scratch)):
            if fn.endswith(".parquet"):
                os.replace(os.path.join(scratch, fn),
                           os.path.join(paths.postings_raw, f"epoch-{epoch_id}-{fn}"))
        shutil.rmtree(scratch, ignore_errors=True)
        _lineage_append(spark, paths, [{
            "stage": "stream_batch", "key": str(epoch_id),
            "seconds": time.time() - t0,
        }])

    writer = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", f"{index_dir}/_stream_checkpoint")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        writer.start()


def refresh_index(spark: SparkSession, index_dir: str,
                  cfg: EngineConfig = DEFAULT) -> dict:
    """Rebuild the derived tables over all ingested raw postings.

    Marks tokenize as done (the stream already materialized raw),
    drops the derived stages from lineage, and re-enters the batch
    builder's resume path — stages B-D run, stage A never does."""
    paths = IndexPaths(index_dir)
    rows = [r for r in read_lineage(paths) if r["stage"] not in DERIVED_STAGES]
    if not any(r["stage"] == "tokenize" for r in rows):
        rows.append({"stage": "tokenize", "key": "all"})
    write_lineage(paths, rows)
    return build_index(spark, None, index_dir, cfg, resume=True)
