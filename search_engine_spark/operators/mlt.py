"""More-like-this: document similarity through the inverted term
space — given a query document, rank the corpus by tf-idf cosine
computed as a sparse dot product over SHARED TERMS ONLY (the
inverted-index form of "related documents", cf. Lucene's
MoreLikeThis).

Scale shape (100 TB):
- the query side is ONE document's term vector — broadcast; candidate
  generation is the posting union of the query's terms (docs sharing
  at least one term), never a corpus self-join or a dense matmul.
- weights/norms are two map-side-combining aggs over the (doc, term,
  tf) frame; the final score is one groupBy over candidate rows and
  the top-k is TakeOrdered (orderBy + limit), not a global window.
- at production scale the (doc, term, tf) frame IS the index's raw
  postings table — this operator reads the same artifact the BM25
  path packs, no extra corpus pass.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import shared_doc_tf


def doc_term_weights(docs: DataFrame) -> DataFrame:
    """(doc_id, tok, w) tf-idf weights over the simple tokenizer:
    w = tf * log2(N / df), built on the PERSISTED shared doc-tf frame
    (textstats.shared_doc_tf) — a multi-branch consumer re-runs only
    the df agg + join, never the corpus tokenize."""
    tf = shared_doc_tf(docs)
    n_docs = docs.count()
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    return (
        tf.join(df, "tok")
        .select(
            "doc_id", "tok",
            (F.col("tf") * F.log2(F.lit(float(n_docs)) / F.col("df"))).alias("w"),
        )
    )


def more_like_this(docs: DataFrame, query_doc_id: int, k: int = 10) -> DataFrame:
    """Top-k documents most similar to ``query_doc_id`` by tf-idf
    cosine; the query doc itself is excluded.  Deterministic ties:
    (cosine desc, doc_id asc); cosine rounded at 6dp.

    The query document's vector is ONE doc's terms — collected to the
    driver (bounded by a single doc's vocabulary) and re-broadcast as
    a literal frame, so the plan has exactly two consumers of the
    shared tf frame (norms, dots) instead of four.

    Docs with zero-norm vectors (every term in every doc -> idf 0)
    cannot score and drop out, matching the SQL twin."""
    w = doc_term_weights(docs)
    q_rows = w.filter(F.col("doc_id") == query_doc_id).select("tok", "w").collect()
    qnrm = math.sqrt(sum(r["w"] * r["w"] for r in q_rows))
    if not q_rows or qnrm <= 0:
        return docs.sparkSession.createDataFrame([], "doc_id long, cosine double")
    q = docs.sparkSession.createDataFrame(
        [(r["tok"], float(r["w"])) for r in q_rows], "tok string, qw double"
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    dots = (
        w.filter(F.col("doc_id") != query_doc_id)
        .join(F.broadcast(q), "tok")
        .groupBy("doc_id")
        .agg(F.sum(F.col("w") * F.col("qw")).alias("dot"))
    )
    scored = (
        dots.join(norms, "doc_id")
        .filter(F.col("nrm") > 0)
        .select(
            "doc_id",
            F.round(F.col("dot") / (F.col("nrm") * F.lit(qnrm)), 6).alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), F.asc("doc_id")).limit(k)
