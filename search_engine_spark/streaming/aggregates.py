"""Streaming aggregations over the events stream.

Tumbling-window counts with a watermark for late data — the
streaming twin of the batch ``events_hourly`` query in the driver
contract.  With ``availableNow`` the same code drains a static
directory and must agree with the batch groupBy (asserted in
tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """(window_start, event_type, n_events, sum_value) with late rows
    beyond ``watermark`` dropped once the watermark passes.  Works on
    both streaming and batch frames (watermark is a no-op in batch —
    which is exactly why the batch run is a valid oracle)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


def windowed_item_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """(window_start, item, n) — the trending-dashboard state: per
    tumbling window, how often each item (the ``props`` payload's
    ``k`` key, extracted by regex so batch and the DuckDB oracle
    state the same rule) was seen.  Streaming-safe: keyed state is
    (window, item), the watermark bounds it, and the top-k CUT
    deliberately stays out of the stream — ranking inside an
    append-mode stream would need retractions, so the serving read
    applies :func:`top_items_per_window` over the sink, the same
    split Lucene-style serving stacks use (heavy state in the
    stream, cheap rank at read)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    item = F.regexp_extract(F.col("props"), r'"k": (\d+)', 1).cast("int")
    return (
        src.withColumn("item", item)
        .filter(F.col("item").isNotNull())
        .groupBy(F.window("ts", window).alias("w"), "item")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.col("w.start").alias("window_start"), "item", "n")
    )


def top_items_per_window(counts: DataFrame, k: int = 3) -> DataFrame:
    """(window_start, rank, item, n) — the read-side trending cut:
    top-``k`` items per window by (count desc, item asc).  One window
    function over the already-aggregated counts (windows × items
    rows, never the event stream)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("window_start").orderBy(F.desc("n"), F.asc("item"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("window_start", "rank", "item", "n")
    )
