"""Stored fields: the url -> raw-text docstore side-car.

A result page needs the document's own text (the KWIC excerpt, a
title line) at serve time, but the inverted index stores only
postings and doc stats — and re-scanning the crawl per query is
corpus cost.  Lucene's answer is stored fields living beside the
index; this module is the Spark shape of it: (url, text) partitioned
by an md5 url bucket (literal PartitionFilters at fetch time) and
url-sorted within files (parquet row-group min/max pruning), so
fetching a result page's k documents touches only the k urls' buckets
and, inside them, only the row groups whose url range covers a hit.

Reference counterpart: none as a storage component — the JavaFX app
re-reads the corpus files from disk at display time
(MainWindowController result pane); at 10^12 documents the serving
tier cannot re-open crawl archives per query.

Highlighting composes here: ``SearchEngine.search_with_snippets``
takes the FIRST match position of any query term from the positional
postings (the term-vector trick — the index already knows where the
hit is, no text rescan), fetches the k result texts from this store,
and re-tokenizes ONLY those k documents for the excerpt window
(positions index the N1 ``tokenize`` stream, so the window aligns
exactly with what the index recorded).

Staleness: the stored text is a corpus snapshot.  After
``update_documents`` a recrawled url's stored text is the OLD
version, so layouts built with ``index_dir=`` stamp the index's
lineage position and ``fetch_docs`` refuses once the index moves —
the same discipline as the MLT / suggest / autocomplete side-cars.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_DOC_BUCKETS = 16


def _bucket_expr(col: str = "url", n_buckets: int = DEFAULT_DOC_BUCKETS):
    """Portable url bucket: first 8 md5 hex chars mod n_buckets —
    computable identically in Spark (write side) and driver-side
    Python (fetch side, for literal PartitionFilters)."""
    return (F.conv(F.substring(F.md5(F.col(col)), 1, 8), 16, 10)
            .cast("long") % n_buckets)


def _py_bucket(url: str, n_buckets: int) -> int:
    return int(hashlib.md5(url.encode()).hexdigest()[:8], 16) % n_buckets


def write_docstore(pages: DataFrame, path: str,
                   n_buckets: int = DEFAULT_DOC_BUCKETS,
                   index_dir: str | None = None) -> dict:
    """Materialize the (url, text) store once per corpus.  Pass
    ``index_dir`` (the packed index this store sits beside) to stamp
    its lineage position; ``fetch_docs`` then refuses after any index
    mutation until the store is rebuilt."""
    rows = (
        pages.select("url", "text")
        .withColumn("bucket", _bucket_expr("url", n_buckets))
        .repartition("bucket")
        .sortWithinPartitions("url")
    )
    rows.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(path, "docs"))
    meta: dict = {"n_buckets": n_buckets}
    if index_dir is not None:
        from ..indexer import index_fingerprint

        meta["index_dir"] = os.path.abspath(index_dir)
        meta["index_fingerprint"] = index_fingerprint(index_dir)
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def _load_meta(path: str) -> dict:
    with open(os.path.join(path, "meta.json")) as fh:
        return json.load(fh)


def check_docstore_fresh(meta: dict, path: str,
                         index_dir: str | None = None) -> None:
    """Refuse a docstore fetch when the main index has moved since the
    store's build (a recrawled url would serve its OLD text).  No-op
    for stores built without an ``index_dir`` tie."""
    stamped = meta.get("index_fingerprint")
    if stamped is None:
        return
    from ..indexer import index_fingerprint

    current = index_fingerprint(index_dir or meta["index_dir"])
    if current != stamped:
        raise RuntimeError(
            f"docstore at {path} is STALE: built at index position "
            f"{stamped}, index is now at {current} — stored text no "
            "longer matches the indexed corpus; rebuild with "
            "write_docstore after index mutations")


def fetch_docs(spark: SparkSession, path: str, urls: list[str],
               index_dir: str | None = None) -> DataFrame:
    """(url, text) for exactly the requested urls: bucket literals
    prune partition dirs, the url IN-list prunes row groups via
    min/max stats on the url-sorted files — the fetch touches the k
    results' data, never the corpus."""
    meta = _load_meta(path)
    check_docstore_fresh(meta, path, index_dir)
    want = sorted(set(urls))
    if not want:
        return spark.createDataFrame([], "url string, text string")
    n = int(meta["n_buckets"])
    buckets = sorted({_py_bucket(u, n) for u in want})
    return (
        spark.read.parquet(os.path.join(path, "docs"))
        .filter(F.col("bucket").isin(buckets) & F.col("url").isin(want))
        .select("url", "text")
    )


def attach_snippets(frame: DataFrame, window: int = 5) -> DataFrame:
    """Replace a ``text`` column with the +-``window``-token excerpt
    around 0-based ``match_pos`` over the BUILD tokenizer's stream —
    the exact stream the index's positions refer to (textproc.tokenize
    = N1; stop words were filtered AFTER position assignment, so raw
    indexes align).  Runs as an Arrow batch over however many rows the
    caller passes — the serving path passes k result rows, never a
    corpus."""
    cols = [c for c in frame.columns if c != "text"]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in frame.schema.fields if f.name != "text"
    ) + ", snippet string"

    def mk(it):
        from ..textproc import tokenize

        for pdf in it:
            snips = []
            for text, pos in zip(pdf["text"], pdf["match_pos"]):
                toks = tokenize(text)
                p = int(pos)
                lo = max(p - window, 0)
                snips.append(" ".join(toks[lo: p + window + 1]))
            out = pdf[cols].copy()
            out["snippet"] = snips
            yield out

    return frame.mapInPandas(mk, schema=schema)
