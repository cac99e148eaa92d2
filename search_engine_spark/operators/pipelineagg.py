"""ES pipeline aggregations over bucketed frames.

Elasticsearch's pipeline aggregations (``cumulative_sum``,
``derivative``, ``moving_avg``/``moving_fn``) are SECOND-stage
aggregations: they consume the bucket list another aggregation
produced (typically a ``date_histogram``) and emit one derived value
per bucket.  The reference engine has no aggregation layer at all
(flat top-50 UI); this module is the post-agg half of the repo's
date-histogram / facets kernel (SURVEY §2.10).

Scale shape — and the deliberate single-partition window: pipeline
aggs run over the BUCKETED frame, never the corpus.  A bucket frame's
cardinality is the time range divided by the interval (a year of
hourly buckets is 8,760 rows; even a decade of minutes is ~5M), so
the global-order window that would be a scale bug on a document frame
is the correct plan here — exactly why ES computes these on the
coordinating node after the shards reduce.  The corpus-sized work
(the distinct-doc count per bucket) stays in the first-stage
aggregation.

Determinism: every derived value is BIGINT arithmetic on the bucket
counts — cumulative and window sums are integer additions, and the
moving average is a half-up 1e-6 micro-grid integer division
((sum·1e6 + n//2) div n) — so DuckDB window functions reproduce every
cell bit for bit (the integer-grid discipline used across the repo).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def bucket_pipeline(buckets: DataFrame, order_col: str,
                    count_col: str = "n_docs",
                    window: int = 3) -> DataFrame:
    """Attach the three classic ES pipeline aggregations to a bucket
    frame: ``cum_docs`` (cumulative_sum), ``delta_docs`` (derivative —
    NULL on the first bucket, the ES contract), and ``mavg_micro``
    (simple moving average over the trailing ``window`` buckets
    INCLUDING the current one, on the half-up 1e-6 integer grid;
    partial head windows average over the rows that exist, ES's
    default).  Bucket order is ``order_col`` ascending, which must be
    unique per row (a bucket key)."""
    if window < 1:
        raise ValueError("window must be >= 1")
    w_all = Window.orderBy(F.col(order_col).asc()) \
                  .rowsBetween(Window.unboundedPreceding, 0)
    w_tail = Window.orderBy(F.col(order_col).asc()) \
                   .rowsBetween(-(window - 1), 0)
    w_lag = Window.orderBy(F.col(order_col).asc())
    c = F.col(count_col).cast("long")
    staged = buckets.select(
        order_col,
        c.alias(count_col),
        F.sum(c).over(w_all).cast("long").alias("cum_docs"),
        (c - F.lag(c, 1).over(w_lag)).cast("long").alias("delta_docs"),
        F.sum(c).over(w_tail).cast("long").alias("_wsum"),
        F.count(c).over(w_tail).cast("long").alias("_wn"),
    )
    # BIGINT `div` (never float `/`): the average lives on the half-up
    # 1e-6 integer grid so both engines reproduce it bit for bit
    return staged.withColumn(
        "mavg_micro",
        F.expr(f"(_wsum * {MICRO} + _wn div 2) div _wn").cast("long"),
    ).drop("_wsum", "_wn")


def duckdb_bucket_pipeline_sql(buckets_sql: str, order_col: str,
                               count_col: str = "n_docs",
                               window: int = 3) -> str:
    """DuckDB twin of :func:`bucket_pipeline` over a bucket subquery —
    the same window frames and the same integer-grid arithmetic."""
    w = window - 1
    return f"""
WITH b AS ({buckets_sql})
SELECT {order_col},
       CAST({count_col} AS BIGINT) AS {count_col},
       CAST(sum({count_col}) OVER (ORDER BY {order_col} ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_docs,
       CAST({count_col} - lag({count_col}, 1) OVER (ORDER BY {order_col} ASC)
            AS BIGINT) AS delta_docs,
       CAST((sum({count_col}) OVER (ORDER BY {order_col} ASC
             ROWS BETWEEN {w} PRECEDING AND CURRENT ROW) * {MICRO}
             + count({count_col}) OVER (ORDER BY {order_col} ASC
               ROWS BETWEEN {w} PRECEDING AND CURRENT ROW) // 2)
            // count({count_col}) OVER (ORDER BY {order_col} ASC
               ROWS BETWEEN {w} PRECEDING AND CURRENT ROW) AS BIGINT)
           AS mavg_micro
FROM b
"""


def bucket_stats(buckets: DataFrame,
                 count_col: str = "n_docs") -> DataFrame:
    """ES sibling aggregation ``stats_bucket``: ONE summary row over a
    bucket frame — n_buckets / min / max / sum as BIGINTs and the
    mean on the half-up 1e-6 integer grid (exact BIGINT Σ and count,
    one division — no float running sum, so the value is
    partition-order-independent and DuckDB reproduces it bit for
    bit).  Like every pipeline agg this consumes bucket cardinality,
    never the corpus."""
    c = F.col(count_col).cast("long")
    return buckets.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.min(c).cast("long").alias("min_docs"),
        F.max(c).cast("long").alias("max_docs"),
        F.sum(c).cast("long").alias("sum_docs"),
    ).select(
        "n_buckets", "min_docs", "max_docs", "sum_docs",
        F.expr(f"(sum_docs * {MICRO} + n_buckets div 2) div n_buckets")
        .cast("long").alias("avg_micro"),
    )


def serial_diff(buckets: DataFrame, order_col: str,
                count_col: str = "n_docs", lag: int = 1) -> DataFrame:
    """ES ``serial_diff`` pipeline aggregation: the lag-``n``
    difference of the bucket counts (seasonal differencing — lag 24
    on hourly buckets compares each hour with the same hour
    yesterday).  NULL for the first ``lag`` buckets, the ES
    contract; ``lag=1`` degenerates to the ``derivative``."""
    if lag < 1:
        raise ValueError("lag must be >= 1")
    c = F.col(count_col).cast("long")
    w = Window.orderBy(F.col(order_col).asc())
    return buckets.select(
        order_col, c.alias(count_col),
        (c - F.lag(c, lag).over(w)).cast("long").alias("sdiff_docs"),
    )


def bucket_selector(buckets: DataFrame, count_col: str = "n_docs",
                    min_count: int = 1) -> DataFrame:
    """ES ``bucket_selector`` pipeline aggregation, reduced to the
    threshold predicate serving stacks actually use (drop
    near-empty buckets from a dashboard): keep buckets whose count
    is at least ``min_count``.  A post-agg filter over the bucket
    frame — the full ES surface takes a script; arbitrary
    predicates compose the same way (``buckets.filter(...)``)."""
    if min_count < 0:
        raise ValueError("min_count must be >= 0")
    return buckets.filter(
        F.col(count_col).cast("long") >= F.lit(int(min_count)))


def duckdb_bucket_stats_sql(buckets_sql: str,
                            count_col: str = "n_docs") -> str:
    """DuckDB twin of :func:`bucket_stats` — the same BIGINT moments
    and the same half-up micro-grid mean."""
    return f"""
WITH b AS ({buckets_sql}),
m AS (SELECT CAST(count(*) AS BIGINT) AS n_buckets,
             CAST(min({count_col}) AS BIGINT) AS min_docs,
             CAST(max({count_col}) AS BIGINT) AS max_docs,
             CAST(sum({count_col}) AS BIGINT) AS sum_docs
      FROM b)
SELECT n_buckets, min_docs, max_docs, sum_docs,
       CAST((sum_docs * {MICRO} + n_buckets // 2) // n_buckets AS BIGINT)
           AS avg_micro
FROM m
"""


def duckdb_serial_diff_sql(buckets_sql: str, order_col: str,
                           count_col: str = "n_docs",
                           lag: int = 1, min_count: int = 0) -> str:
    """DuckDB twin of :func:`serial_diff` composed with
    :func:`bucket_selector` (selector applied AFTER the diff, the ES
    pipeline order — a dropped bucket still participates in its
    neighbours' lags)."""
    return f"""
WITH b AS ({buckets_sql}),
d AS (SELECT {order_col},
             CAST({count_col} AS BIGINT) AS {count_col},
             CAST({count_col} - lag({count_col}, {lag})
                  OVER (ORDER BY {order_col} ASC) AS BIGINT) AS sdiff_docs
      FROM b)
SELECT * FROM d WHERE {count_col} >= {min_count}
"""
