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
