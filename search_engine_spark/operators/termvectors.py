"""Doc-major term vectors: the url → [(term_key, tf)] side-car.

The inverted index is term-major — answering "which terms does THIS
document contain, and how often" (what pseudo-relevance feedback,
classification-on-results, and result clustering all consume) from
it costs a corpus scan per lookup.  Lucene's answer is term vectors
stored beside the index; this module is the Spark shape of it:
(url, term_key, tf) in md5-url-bucket partitions (literal
PartitionFilters at fetch time), url-sorted within files (parquet
row-group min/max pruning), so fetching the feedback set's 10
documents touches only their buckets and row groups — never the
corpus.  The layout is the docstore's (operators/docstore.py) with
term rows instead of text, and carries the same index-lineage
staleness stamp: after ``update_documents`` a recrawled url's stored
vector is the OLD version, so ``fetch_term_vectors`` refuses once
the index moves, until a rebuild.

Reference counterpart: none — the reference (edanBI/Search_Engine)
is batch-built and query-only; Searcher.java has no feedback loop.
The consumer here is ``SearchEngine.prf_search`` (Rocchio-style
pseudo-relevance feedback).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .docstore import DEFAULT_DOC_BUCKETS, _bucket_expr, _py_bucket


def write_term_vectors(raw_postings: DataFrame, path: str,
                       n_buckets: int = DEFAULT_DOC_BUCKETS,
                       index_dir: str | None = None) -> dict:
    """Materialize (url, term_key, tf) doc-major from the index's own
    raw posting store (stage A output — the same rows the packed
    index was built from, so vector tf ≡ posting tf by construction).
    Pass ``index_dir`` to stamp the index's lineage position;
    ``fetch_term_vectors`` then refuses after any index mutation
    until the layout is rebuilt."""
    rows = (
        raw_postings.select("url", "term_key", F.col("tf").cast("long").alias("tf"))
        .withColumn("bucket", _bucket_expr("url", n_buckets))
        .repartition("bucket")
        .sortWithinPartitions("url", "term_key")
    )
    rows.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(path, "vectors"))
    meta: dict = {"n_buckets": n_buckets}
    if index_dir is not None:
        from ..indexer import index_fingerprint

        meta["index_dir"] = os.path.abspath(index_dir)
        meta["index_fingerprint"] = index_fingerprint(index_dir)
    with open(os.path.join(path, "_tv_meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def fetch_term_vectors(spark: SparkSession, path: str,
                       urls: list[str],
                       index_dir: str | None = None) -> DataFrame:
    """(url, term_key, tf) for exactly the requested urls — bucket
    literals prune partition dirs, the url IN-list prunes row groups
    on the url-sorted files.  Refuses when the layout was stamped
    against a packed index that has since moved (stale vectors)."""
    meta_path = os.path.join(path, "_tv_meta.json")
    with open(meta_path) as fh:
        meta = json.load(fh)
    if meta.get("index_fingerprint") is not None:
        from ..indexer import index_fingerprint

        current = index_fingerprint(index_dir or meta["index_dir"])
        if current != meta["index_fingerprint"]:
            raise RuntimeError(
                f"term-vector layout at {path} is STALE: built at index "
                f"position {meta['index_fingerprint']}, index is now at "
                f"{current} — stored vectors no longer match; rebuild "
                "with write_term_vectors after index mutations")
    want = sorted(set(urls))
    if not want:
        return spark.createDataFrame([], "url string, term_key string, tf long")
    n = int(meta["n_buckets"])
    buckets = sorted({_py_bucket(u, n) for u in want})
    return (
        spark.read.parquet(os.path.join(path, "vectors"))
        .filter(F.col("bucket").isin(buckets) & F.col("url").isin(want))
        .select("url", "term_key", "tf")
    )
