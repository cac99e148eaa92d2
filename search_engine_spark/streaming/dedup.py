"""Streaming exact deduplication for incremental corpus ingest: emit
each document the FIRST time its content hash is seen across the
life of the stream, drop every later duplicate — the dedup half of a
continuously-ingesting training-data pipeline (the batch operators in
``operators/dedup.py`` handle the one-shot campaign over a static
corpus; this handles the firehose).

Semantics (deterministic):
- key = md5(text) — the same content hash as the batch
  ``exact_duplicates``;
- FIRST-INGESTED wins across micro-batches (ingest-order semantics:
  a re-crawled page never replaces the copy already admitted);
- within one micro-batch, smallest doc_id wins (a total order, so
  replaying the same chunks yields the same keep-list).

Implementation is ``applyInPandasWithState`` with one boolean of
state per distinct hash and no timeout: the state must outlive any
watermark because a duplicate can arrive years later.  Scale shape:
state is O(distinct content) — at 100 TB that is exactly the working
set HashedDedup needs anywhere; on a cluster, back it with the
RocksDB state store (`spark.sql.streaming.stateStore.providerClass`)
so it spills, and shard by hash (the groupBy already does).  When the
product only needs duplicates caught within a bounded reingest window
(e.g. recrawls land within days), use :func:`dedup_stream_bounded` —
Spark's built-in ``dropDuplicatesWithinWatermark`` evicts state at
the watermark and keeps memory flat.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "text_hash string, doc_id long"
STATE_SCHEMA = "seen byte"


def _hashed(docs: DataFrame) -> DataFrame:
    return docs.select(
        F.md5(F.to_binary(F.col("text"), F.lit("utf-8"))).alias("text_hash"),
        "doc_id",
    )


def dedup_stream(docs: DataFrame) -> DataFrame:
    """docs(doc_id long, text string) stream -> (text_hash, doc_id)
    keep-list stream: one row per distinct content, emitted on first
    arrival."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (text_hash,) = key
        if state.exists:
            for _ in pdfs:  # drain: every row is a known duplicate
                pass
            return
        keep = None
        for pdf in pdfs:
            if len(pdf):
                lo = int(pdf["doc_id"].min())
                keep = lo if keep is None else min(keep, lo)
        if keep is None:
            return
        state.update((1,))
        yield pd.DataFrame({"text_hash": [text_hash], "doc_id": [keep]})

    return _hashed(docs).groupBy("text_hash").applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


def dedup_stream_bounded(docs: DataFrame, ts_col: str = "ts",
                         watermark: str = "1 hour") -> DataFrame:
    """Bounded-state variant for recrawl-window dedup: Spark's
    ``dropDuplicatesWithinWatermark`` on the content hash — duplicates
    arriving within ``watermark`` of each other are dropped, state is
    evicted as the watermark advances, memory stays flat forever.
    Which copy survives follows arrival order (Spark's built-in
    semantics), so use :func:`dedup_stream` when the keep-list must be
    deterministic."""
    hashed = docs.withColumn(
        "text_hash", F.md5(F.to_binary(F.col("text"), F.lit("utf-8")))
    ).withWatermark(ts_col, watermark)
    return hashed.dropDuplicatesWithinWatermark(["text_hash"])


def dedup_batch_twin(docs: DataFrame) -> DataFrame:
    """Batch oracle for :func:`dedup_stream` under ingest-ordered
    replay (duplicates' doc_ids nondecreasing across chunks): keep =
    min(doc_id) per content hash."""
    return _hashed(docs).groupBy("text_hash").agg(
        F.min("doc_id").alias("doc_id")
    )
