"""Token-budget shard packing — the training-data materialization
step: lay documents out into contiguous shards of at most ``budget``
tokens each (plus at most one straddling document), deterministically.

Every large-scale training pipeline ends with exactly this operator:
the curated corpus must become N fixed-size files whose boundaries are
stable across reruns and cluster sizes, or resumed jobs and shuffled
readers disagree about what shard 17 contains.  The rule here is the
simplest deterministic one — next-fit over the doc-id total order:

    shard_id(d) = floor(cum_before(d) / budget)

where ``cum_before`` is the EXCLUSIVE prefix sum of token counts in
doc-id order.  A document straddling a boundary stays whole in the
shard its prefix started in (shards may exceed the budget by less
than one document), and the assignment depends only on (order,
weights, budget) — never on partitioning or engine.

The prefix sum is the textbook distributed scan, NOT a global window
(a window with no PARTITION BY collapses the corpus onto one task):

  1. range-partition by doc id + sort within partitions (one shuffle,
     disjoint ordered ranges), localCheckpoint so the partition
     layout is frozen across the two passes;
  2. per-partition totals (tiny: one row per partition) -> driver
     cumsum -> per-partition START OFFSETS broadcast back;
  3. one map-only Arrow pass (mapInPandas, running total carried
     across batches) stamps exclusive-prefix-sum + offset, and the
     BIGINT integer division assigns the shard.

Step 2's collect is one row per partition — O(parallelism), not
O(data) — the same driver-side footprint as PageRank's dangling-mass
scalar.  Reference has no counterpart (batch rebuild of a single
index); this is part of the LLM-data-pipeline surface.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_shards(docs: DataFrame, budget: int, id_col: str = "doc_id",
                weight_col: str = "n_tokens",
                n_parts: int | None = None) -> DataFrame:
    """(id, weight, shard_id): next-fit token-budget packing over the
    ``id_col`` total order.  Output is partitioning-independent and
    equals the single-window SQL form row for row."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    spark = docs.sparkSession
    n_parts = n_parts or int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = (
        docs.select(F.col(id_col).alias("id"),
                    F.col(weight_col).cast("long").alias("w"))
        .repartitionByRange(n_parts, "id")
        .sortWithinPartitions("id")
        # freeze the sampled range boundaries: both passes below must
        # see the SAME partition layout or the offsets misalign
        .localCheckpoint()
    )
    with_pid = d.withColumn("pid", F.spark_partition_id())
    totals = sorted(
        (r["pid"], r["tot"])
        for r in with_pid.groupBy("pid").agg(F.sum("w").alias("tot")).collect()
    )
    offsets, run = {}, 0
    for pid, tot in totals:
        offsets[pid] = run
        run += int(tot)
    off = spark.createDataFrame(
        [(pid, o) for pid, o in offsets.items()], "pid int, offset long")
    joined = with_pid.join(F.broadcast(off), "pid")

    def scan(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        run = 0
        for pdf in it:
            if pdf.empty:
                continue
            inc = pdf["w"].cumsum()
            cum_before = pdf["offset"] + run + inc - pdf["w"]
            run += int(pdf["w"].sum())
            yield pd.DataFrame({
                "id": pdf["id"],
                "w": pdf["w"],
                "shard_id": (cum_before // budget).astype("int64"),
            })

    out = joined.mapInPandas(scan, "id long, w long, shard_id long")
    return out.select(F.col("id").alias(id_col),
                      F.col("w").alias(weight_col), "shard_id")


def pack_shards_window(docs: DataFrame, budget: int, id_col: str = "doc_id",
                       weight_col: str = "n_tokens") -> DataFrame:
    """The single-window reference form (one partition, tiny data
    only) — the in-Spark twin tests pin :func:`pack_shards` against."""
    from pyspark.sql import Window

    w = (
        Window.orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = docs.select(id_col, F.col(weight_col).cast("long").alias(weight_col))
    return d.withColumn(
        "shard_id",
        F.expr(f"coalesce(sum({weight_col}) over (order by {id_col} "
               f"rows between unbounded preceding and 1 preceding), 0) "
               f"div {int(budget)}"),
    ).select(id_col, weight_col, "shard_id")


def write_packed_shards(docs: DataFrame, path: str, budget: int,
                        id_col: str = "doc_id",
                        weight_col: str = "n_tokens",
                        payload_cols: list[str] | None = None) -> None:
    """Materialize the packed corpus: one parquet directory per shard
    (``partitionBy(shard_id)``), each holding its documents' payload.
    Readers stream shard directories independently; a shard is the
    unit of training-data delivery."""
    assign = pack_shards(docs, budget, id_col, weight_col)
    keep = payload_cols or [c for c in docs.columns if c != weight_col]
    out = docs.select(id_col, *[c for c in keep if c != id_col]).join(
        assign.select(id_col, "shard_id"), id_col)
    (out.repartition(F.col("shard_id"))
     .write.mode("overwrite").partitionBy("shard_id")
     .parquet(os.path.join(path, "shards")))


def chunk_documents(docs: DataFrame, window: int = 128, stride: int = 96,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id, chunk_id, start_pos, n_tokens, chunk_text): overlapping
    fixed-token-window chunking — the context-window materialization
    every training pipeline runs between curation and shard packing
    (and every RAG indexer runs before embedding).

    Rule (pure integer arithmetic, engine-independent): a document of
    n tokens yields ``1 + ceil(max(n - window, 0) / stride)`` chunks
    starting at 0, stride, 2*stride, ...; the last window may be
    short; an empty document yields one empty chunk (the row is
    preserved — droppable downstream, never silently lost).  Chunks
    are (window - stride)-token overlapped so no span is split across
    a boundary unseen.

    Plan: ONE map-only codegen projection — tokenize, a sequence()
    explode of the chunk index, slice + array_join per chunk.  No
    shuffle, no Python; scan speed, trivially linear at 100 TB."""
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    from .textstats import simple_tokens

    toks = simple_tokens(text_col)
    n = F.size(toks)
    n_chunks = (
        F.lit(1)
        + F.floor((F.greatest(n - F.lit(window), F.lit(0))
                   + F.lit(stride - 1)) / F.lit(stride)).cast("int")
    )
    d = docs.select(
        F.col(id_col), toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_id"),
    )
    piece = F.slice(F.col("_toks"),
                    F.col("chunk_id") * F.lit(stride) + F.lit(1),
                    F.lit(window))
    return d.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        (F.col("chunk_id").cast("long") * F.lit(stride)).alias("start_pos"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
