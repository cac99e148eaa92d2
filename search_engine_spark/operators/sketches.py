"""Frequency sketches for web-scale term statistics.

A count-min sketch (Cormode & Muthukrishnan 2005) over corpus term
frequencies: at 10^12 documents the exact dictionary is enormous, and
many consumers (rate monitors, heavy-hitter detection, join-size
estimation) only need approximate frequency point queries.  A (d × w)
CMS answers them in O(d) lookups with one-sided additive error
(estimate ≥ truth, error ≤ total_mass / w per row, min over d rows),
independent of vocabulary size.

Engine-independence discipline (the repo's integer-grid rule): the
row hashes are md5-derived (first 8 hex chars mod w — the same
portable hash the MLT/docstore bucket layouts use) and every count is
BIGINT, so the sketch CELLS themselves are bit-identical across
engines and partitionings and the driver oracle checks them exactly —
an "approximate" structure with an exact contract.

Plan shape: building is d map-side projections unioned then ONE
(row, col) hash aggregation — cells ≤ d·w rows regardless of corpus
size; map-side combine collapses each partition to ≤ d·w rows before
the exchange.  A point query touches d cells via a broadcast of the
sketch (d·w BIGINTs — a few KB), never the corpus.

Reference counterpart: none (Indexer.java keeps the full TreeMap
dictionary in memory) — this is the 100 TB tooling the rebuild brief
calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WIDTH = 1024
DEFAULT_DEPTH = 4


def _col_expr(tok_col: str, row: int, width: int):
    """Portable CMS column hash: first 8 md5 hex chars of
    '<row>:<token>' mod width — identical arithmetic in Spark and
    DuckDB (the bucket-layout hash family, salted by the row index so
    the d rows are independent)."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{row}:"), F.col(tok_col))),
                           1, 8), 16, 10)
        .cast("long") % width
    )


def cms_cells(tf: DataFrame, width: int = DEFAULT_WIDTH,
              depth: int = DEFAULT_DEPTH,
              tok_col: str = "tok", weight_col: str = "tf") -> DataFrame:
    """(row, col, count) — the sketch cells over a (…, tok, weight)
    frame.  Exact BIGINT: the cells are a deterministic function of
    the corpus, not of the partitioning."""
    parts = [
        tf.select(
            F.lit(i).cast("long").alias("row"),
            _col_expr(tok_col, i, width).alias("col"),
            F.col(weight_col).cast("long").alias("c"),
        )
        for i in range(depth)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy("row", "col").agg(F.sum("c").alias("count"))


def cms_estimate(cells: DataFrame, terms: list[str],
                 width: int = DEFAULT_WIDTH,
                 depth: int = DEFAULT_DEPTH) -> DataFrame:
    """(term, est) — CMS point queries: min over the d rows of the
    probed cell (0 when a cell is empty), the classic one-sided
    estimate (est ≥ true count always; equality when no collision).
    The probe frame is |terms|·d rows; the sketch side is ≤ d·w rows
    — broadcast by construction, never a corpus touch."""
    spark = cells.sparkSession
    probes = spark.createDataFrame(
        [(t, i) for t in sorted(set(terms)) for i in range(depth)],
        "term string, row long",
    )
    keyed = None
    # the column hash depends on the row index, so build per-row
    # slices of the probe frame (d is tiny and static)
    for i in range(depth):
        part = (
            probes.filter(F.col("row") == i)
            .select("term", "row", _col_expr("term", i, width).alias("col"))
        )
        keyed = part if keyed is None else keyed.unionByName(part)
    joined = keyed.join(F.broadcast(cells), ["row", "col"], "left")
    return (
        joined.groupBy("term")
        .agg(F.min(F.coalesce(F.col("count"), F.lit(0)))
             .cast("long").alias("est"))
    )
