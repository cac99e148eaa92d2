"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (the capability Structured Streaming's
built-in windows don't cover — per-key custom state with event-time
timeouts).

Semantics are the exact streaming twin of the batch sessionizer
(`__spark_entry__.q_events_sessionize`): per user, events sorted by
(event time, event_id) split into sessions wherever the gap exceeds
``gap_us``; sessions are numbered 1..k in time order and summarized
as (user_id, session, n_events, start_us, end_us).

Mechanics per micro-batch and user:
- fold the batch's events into the open session carried in state
  (session counter, count, start, end);
- every session CLOSED by an in-batch gap is emitted immediately;
- the still-open session stays in state with an event-time timeout at
  ``end + gap``: when the watermark passes that point no earlier
  event may extend it (late rows beyond the watermark are dropped),
  so the timeout callback emits it exactly once.

Scale shape: state is O(1) per active user (five longs), shuffled by
user_id — the same partitioning a 1000-executor cluster would use;
no per-key Python until a key actually has data or a timeout.
Correctness requires per-user event-time order ACROSS micro-batches
(true for replayed logs and for any source partitioned by user);
out-of-order arrivals within a batch are handled by the sort.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEFAULT_GAP_US = 8 * 3600 * 1_000_000  # same 8h gap as the batch twin

OUT_SCHEMA = "user_id long, session long, n_events long, start_us long, end_us long"
STATE_SCHEMA = "session long, n_events long, start_us long, end_us long"


def sessionize_stream(
    events: DataFrame,
    gap_us: int = DEFAULT_GAP_US,
    watermark: str = "10 seconds",
) -> DataFrame:
    """events(ts timestamp, user_id, event_id, ...) -> closed-session
    summaries, one row per session, emitted when the session closes
    (in-batch gap) or when the watermark passes end+gap (timeout)."""
    gap_ms = gap_us // 1000

    ev = (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .withColumn("us", F.unix_micros(F.col("ts")))
        .select("ts", "us", "user_id", "event_id")
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            session, n, s_us, e_us = state.get
            # keep the SESSION COUNTER (n_events=0 marks "no open
            # session") instead of state.remove(): dropping it would
            # restart numbering at 1 for this user's next session,
            # emitting duplicate (user_id, session) keys and
            # diverging from the batch twin's 1..k order.  Cost: four
            # longs per ever-seen user, no further timeouts.
            state.update((session, 0, 0, 0))
            if n > 0:
                yield pd.DataFrame({
                    "user_id": [user_id], "session": [session], "n_events": [n],
                    "start_us": [s_us], "end_us": [e_us],
                })
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        rows = rows.sort_values(["us", "event_id"])
        if state.exists:
            session, n, s_us, e_us = state.get
        else:
            session, n, s_us, e_us = 0, 0, 0, 0
        closed = {"user_id": [], "session": [], "n_events": [],
                  "start_us": [], "end_us": []}
        for us in rows["us"]:
            us = int(us)
            if n == 0 or us - e_us > gap_us:
                if n > 0:
                    closed["user_id"].append(user_id)
                    closed["session"].append(session)
                    closed["n_events"].append(n)
                    closed["start_us"].append(s_us)
                    closed["end_us"].append(e_us)
                session += 1
                n, s_us, e_us = 1, us, us
            else:
                n += 1
                e_us = us
        state.update((session, n, s_us, e_us))
        state.setTimeoutTimestamp(e_us // 1000 + gap_ms)
        if closed["user_id"]:
            yield pd.DataFrame(closed)

    return ev.groupBy("user_id").applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.EventTimeTimeout
    )


def sessionize_batch(events: DataFrame, gap_us: int = DEFAULT_GAP_US) -> DataFrame:
    """The batch oracle: identical semantics via lag + running sum
    (the same plan as the driver row `events_sessionize`)."""
    from pyspark.sql import Window

    ev = events.withColumn("us", F.unix_micros(F.col("ts").cast("timestamp")))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    ev = ev.withColumn(
        "new_s",
        F.when(
            F.lag("us").over(w).isNull()
            | ((F.col("us") - F.lag("us").over(w)) > gap_us),
            1,
        ).otherwise(0),
    ).withColumn(
        "session",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return ev.groupBy("user_id", "session").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
    )
