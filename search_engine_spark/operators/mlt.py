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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import simple_tokens


def doc_term_weights(docs: DataFrame) -> DataFrame:
    """(doc_id, tok, w) tf-idf weights over the simple tokenizer:
    w = tf * log2(N / df).  One explode + two hash aggs."""
    tf = (
        docs.select("doc_id", F.explode(simple_tokens()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
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

    Docs with zero-norm vectors (every term in every doc -> idf 0)
    cannot score and drop out, matching the SQL twin."""
    w = doc_term_weights(docs)
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    q = w.filter(F.col("doc_id") == query_doc_id).select(
        F.col("tok"), F.col("w").alias("qw")
    )
    qnorm = norms.filter(F.col("doc_id") == query_doc_id).select(
        F.col("nrm").alias("qnrm")
    )
    dots = (
        w.filter(F.col("doc_id") != query_doc_id)
        .join(F.broadcast(q), "tok")
        .groupBy("doc_id")
        .agg(F.sum(F.col("w") * F.col("qw")).alias("dot"))
    )
    scored = (
        dots.join(norms, "doc_id")
        .crossJoin(F.broadcast(qnorm))
        .filter((F.col("nrm") > 0) & (F.col("qnrm") > 0))
        .select(
            "doc_id",
            F.round(F.col("dot") / (F.col("nrm") * F.col("qnrm")), 6).alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), F.asc("doc_id")).limit(k)
