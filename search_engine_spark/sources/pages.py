"""Pages source (S1/S2): load the corpus table and extract text.

The canonical input is the BASELINE input-hint table
``pages(url:string, warc_ts:timestamp, html:binary, text:string,
lang:string)`` — the Spark-native equivalent of the reference's
recursive SGML corpus scan + field extraction (ReadFile.java:48-167).
On a production cluster this is ``spark.read.format("iceberg")``;
here it reads parquet (same schema, same partition semantics).

``load_documents_as_pages`` maps the driver testdata table
``documents(doc_id, text, lang, source, n_chars)`` onto the pages
shape (FIXTURES.md §1 mapping).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_HTML_PRE = b"<html><body>"
_HTML_POST = b"</body></html>"


def load_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def load_documents_as_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map driver testdata ``documents.parquet`` onto the pages schema."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").cast("string").alias("url"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("warc_ts"),
        F.concat(
            F.lit(_HTML_PRE), F.encode(F.col("text"), "UTF-8"), F.lit(_HTML_POST)
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def _extract_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        texts = []
        for blob in pdf["html"]:
            if blob is None:
                texts.append(None)
                continue
            b = bytes(blob)
            if b.startswith(_HTML_PRE) and b.endswith(_HTML_POST):
                b = b[len(_HTML_PRE) : len(b) - len(_HTML_POST)]
            texts.append(b.decode("utf-8", errors="replace"))
        yield pd.DataFrame({"url": pdf["url"], "text": texts})


def extract_text(pages: DataFrame) -> DataFrame:
    """S2: ``html:binary -> text:string`` as an Arrow-batched UDF.
    Must be byte-identical to the stored ``text`` per url (per-row
    invariant; asserted in tests).  A real crawler would plug an HTML
    parser into ``_extract_batch`` — the Spark plumbing (schema, batch
    shape, vectorized transfer) is identical."""
    return pages.select("url", "html").mapInPandas(
        _extract_batch, schema="url string, text string"
    )
