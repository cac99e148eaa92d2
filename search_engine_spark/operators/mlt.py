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
- the PER-QUERY serving form is the STORED layout
  (:func:`write_mlt_index` + :func:`more_like_this_indexed`): the
  query-independent statistics — tf-idf weights, per-doc norms, the
  (tok, df, idf) dictionary, corpus N — are computed ONCE per corpus
  and persisted beside doc_stats/meta.json; a query then reads only
  the weight partitions of its own terms (md5 term-bucket
  PartitionFilters, the same pushdown shape as the BM25 dictionary)
  plus a norm lookup on the candidates.  No corpus pass per query.
"""

from __future__ import annotations

import hashlib
import json
import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textstats import shared_doc_tf, simple_tokens

DEFAULT_MLT_BUCKETS = 16


def doc_term_weights(docs: DataFrame, n_docs: int | None = None) -> DataFrame:
    """(doc_id, tok, w) tf-idf weights over the simple tokenizer:
    w = tf * log2(N / df), built on the PERSISTED shared doc-tf frame
    (textstats.shared_doc_tf) — a multi-branch consumer re-runs only
    the df agg + join, never the corpus tokenize.  Pass ``n_docs`` to
    skip the corpus count when the caller already knows N."""
    tf = shared_doc_tf(docs)
    if n_docs is None:
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


# ---------------------------------------------------------------------------
# stored layout: per-query serving without corpus passes

def _bucket_expr(col: str = "tok", n_buckets: int = DEFAULT_MLT_BUCKETS):
    """Portable term bucket: first 8 md5 hex chars mod n_buckets —
    computable identically in Spark (write side) and driver-side
    Python (query side, for literal PartitionFilters)."""
    return (F.conv(F.substring(F.md5(F.col(col)), 1, 8), 16, 10)
            .cast("long") % n_buckets)


def _py_bucket(tok: str, n_buckets: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n_buckets


def write_mlt_index(docs: DataFrame, path: str,
                    n_buckets: int = DEFAULT_MLT_BUCKETS,
                    index_dir: str | None = None) -> dict:
    """Materialize the query-independent MLT statistics once per
    corpus (the artifacts that belong beside doc_stats/meta.json):

    - ``weights/``    (doc_id, tok, w, nrm) partitioned by md5 term
      bucket.  The per-doc norm is DENORMALIZED onto every posting row
      (8 bytes/row) — the same trick the BM25 index plays with doc
      lengths: the serving plan then needs NO join against a
      corpus-sized norm table (whose doc_ids are only known at
      runtime, so no pushdown could prune that scan).
    - ``dictionary/`` (tok, df, idf) partitioned the same way — the
      query vector is re-weighted from stored idf, never a fresh
      corpus df pass
    - ``norms/``      (doc_id, nrm) — the standalone norm table for
      other consumers (audits, re-ranking)
    - ``meta.json``   {n_docs, n_buckets}

    One corpus pass at build time; afterwards a query touches only
    its own terms' bucket partitions (:func:`more_like_this_indexed`).

    Pass ``index_dir`` (the main packed index this layout sits
    beside) to stamp its lineage position into ``meta.json``: the
    stored N/df/vocabulary are a CORPUS SNAPSHOT, so after any index
    mutation (add/update/delete/compact) the layout would serve
    silently stale idf — with the stamp, the indexed serve path
    refuses instead (same discipline as the searcher's pending-append
    guard) until the layout is rebuilt."""
    n_docs = docs.count()
    # ONE df aggregation feeds both artifacts (doc_term_weights would
    # recompute the same groupBy internally), and the weights frame is
    # persisted across its two consumers (norms agg + the weights
    # write's norm join) — without it the tf-idf join executes twice
    # per build
    from pyspark import StorageLevel

    tf = shared_doc_tf(docs)
    dic = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df")).select(
        "tok", F.col("df").cast("long").alias("df"),
        F.log2(F.lit(float(n_docs)) / F.col("df")).alias("idf"),
    )
    w = (
        tf.join(dic, "tok")
        .select("doc_id", "tok", (F.col("tf") * F.col("idf")).alias("w"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    (w.join(norms, "doc_id")
     .withColumn("bucket", _bucket_expr("tok", n_buckets))
     .repartition("bucket")
     .write.mode("overwrite").partitionBy("bucket")
     .parquet(os.path.join(path, "weights")))
    (dic.withColumn("bucket", _bucket_expr("tok", n_buckets))
     .repartition("bucket")
     .write.mode("overwrite").partitionBy("bucket")
     .parquet(os.path.join(path, "dictionary")))
    # norms' plan reads w too — release only after its write
    norms.write.mode("overwrite").parquet(os.path.join(path, "norms"))
    w.unpersist()
    meta = {"n_docs": n_docs, "n_buckets": n_buckets}
    if index_dir is not None:
        from ..indexer import index_fingerprint

        meta["index_dir"] = os.path.abspath(index_dir)
        meta["index_fingerprint"] = index_fingerprint(index_dir)
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def check_mlt_fresh(meta: dict, path: str,
                    index_dir: str | None = None) -> None:
    """Refuse a stored-layout serve when the main index has moved
    since the layout's build (lineage-position mismatch).  No-op for
    layouts built without an ``index_dir`` tie (e.g. over a bare
    documents table)."""
    stamped = meta.get("index_fingerprint")
    if stamped is None:
        return
    from ..indexer import index_fingerprint

    current = index_fingerprint(index_dir or meta["index_dir"])
    if current != stamped:
        raise RuntimeError(
            f"stored MLT layout at {path} is STALE: built at index "
            f"position {stamped}, index is now at {current} — its "
            "baked N/df/idf no longer match the corpus; rebuild with "
            "write_mlt_index after index mutations")


def more_like_this_indexed(spark: SparkSession, path: str, docs: DataFrame,
                           query_doc_id: int, k: int = 10) -> DataFrame:
    """Top-k related documents over the STORED layout — the per-query
    plan :func:`more_like_this` promises at production scale:

    1. the query doc's term frequencies: one pushdown-pruned read of
       the docs table (filter on doc_id) + a one-doc tokenize,
    2. stored idf for exactly those terms: a dictionary read pruned to
       the query terms' bucket partitions (PartitionFilters) and terms
       (PushedFilters),
    3. candidate dots + norms: ONE weights read pruned the same way,
       joined to the broadcast query vector — candidates = posting
       union of the query's terms, never a corpus scan; the per-doc
       norm rides on the posting rows (denormalized at build time),
       so no corpus-sized table is touched after the pruned scan.

    Scores are identical to :func:`more_like_this` (same weights, same
    rounding); ties (cosine desc, doc_id asc).  When the layout was
    built beside a packed index (``write_mlt_index(...,
    index_dir=)``), serving REFUSES if that index has moved since —
    stale baked idf must fail loudly, like the searcher's
    pending-append guard."""
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    check_mlt_fresh(meta, path)
    n_buckets = int(meta["n_buckets"])
    qtf = {
        r["tok"]: int(r["n"])
        for r in docs.filter(F.col("doc_id") == query_doc_id)
        .select(F.explode(simple_tokens()).alias("tok"))
        .groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    empty = spark.createDataFrame([], "doc_id long, cosine double")
    if not qtf:
        return empty
    terms = sorted(qtf)
    buckets = sorted({_py_bucket(t, n_buckets) for t in terms})
    dic = (
        spark.read.parquet(os.path.join(path, "dictionary"))
        .filter(F.col("bucket").isin(buckets) & F.col("tok").isin(terms))
        .select("tok", "idf").collect()
    )
    idf = {r["tok"]: float(r["idf"]) for r in dic}
    qvec = [(t, float(qtf[t]) * idf[t]) for t in terms if t in idf]
    qnrm = math.sqrt(sum(w * w for _, w in qvec))
    if not qvec or qnrm <= 0:
        return empty
    q = spark.createDataFrame(qvec, "tok string, qw double")
    cand = (
        spark.read.parquet(os.path.join(path, "weights"))
        .filter(F.col("bucket").isin(buckets) & F.col("tok").isin(terms)
                & (F.col("doc_id") != query_doc_id))
    )
    dots = (
        cand.join(F.broadcast(q), "tok")
        # every row of a doc carries the same denormalized nrm —
        # first() inside the same hash agg that sums the dot product
        .groupBy("doc_id").agg(
            F.sum(F.col("w") * F.col("qw")).alias("dot"),
            F.first("nrm").alias("nrm"),
        )
    )
    scored = (
        dots.filter(F.col("nrm") > 0)
        .select(
            "doc_id",
            F.round(F.col("dot") / (F.col("nrm") * F.lit(qnrm)), 6).alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), F.asc("doc_id")).limit(k)
