"""Input-split hygiene for map-only operators.

Spark can split parquet only at row-group boundaries: a file written
with one giant row group reports a healthy partition count but feeds
every row to a single task, silently serializing any map-only (no
shuffle) operator on one core at EVERY parallelism level — the exact
regression the round-1 index build hit.  ``build_index`` guards its
own scan; this helper is the same guard for the standalone Arrow
kernels (shingling, winnowing, multimodal decode, SimHash's token
explode).

On a real crawl table (thousands of splits) the guard no-ops; the
balancing exchange only fires for pathological inputs, where one
round-robin pass of the rows costs far less than the serialized
kernel it unblocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def balanced(df: DataFrame, factor: int = 2) -> DataFrame:
    """Round-robin repartition ``df`` iff it is under-split for the
    cluster (fewer partitions than cores)."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(factor * par)
    return df
