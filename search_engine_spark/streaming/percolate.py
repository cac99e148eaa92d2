"""Streaming percolation: every incoming crawl micro-batch matched
against the registered alert queries at ingest — the production shape
of operators/percolate.py (alerts are an inherently streaming
product: the subscriber wants the hit when the page ARRIVES, not at
the next batch campaign).

Fully STATELESS, so it runs in append mode with no watermark and no
state store: a document's entire token set rides in its own row
(``array_distinct`` over the tokenizer output — per-row, no
cross-batch aggregation), the anchor join keys candidates on each
query's single anchor term, and the all-MUST gate is a map-side
array-containment check against the broadcast (query_id, terms)
table.  Exactly one candidate row exists per (doc, query) — one
anchor per query — so the append-mode output needs no dedup.

Scale shape: the static alert table broadcasts once per stream (a
few MB for millions of term rows); per micro-batch the work is one
explode + one anchor join (rare-term keyed when anchors come from
:func:`query_anchors` with corpus stats) + a codegen ``forall``
filter.  No shuffle survives between micro-batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.percolate import doc_token_sets
from ..operators.textstats import simple_tokens


def query_sets(queries: DataFrame) -> DataFrame:
    """(query_id, need: array<string>) — the broadcastable alert
    table, one row per registered query."""
    return queries.groupBy("query_id").agg(
        F.array_sort(F.collect_set("term")).alias("need"))


def query_anchors(queries: DataFrame, corpus_docs: DataFrame | None = None,
                  id_col: str = "doc_id") -> DataFrame:
    """(tok, query_id) — one anchor term per query, keying the
    candidate join.  With ``corpus_docs`` the anchor is the query's
    RAREST corpus term (df asc, term asc — the batch presearcher's
    rule, operators/percolate.py); without stats it falls back to the
    lexicographically first term (still exactly one candidate row per
    (doc, query); the rare-term choice only shrinks the candidate
    set, never the result)."""
    qterms = queries.select("query_id", "term")
    if corpus_docs is None:
        return (qterms.groupBy("query_id")
                .agg(F.min("term").alias("tok"))
                .select("tok", "query_id"))
    toks = doc_token_sets(corpus_docs, id_col)
    vocab_df = (
        toks.join(qterms.select("term").distinct()
                  .withColumnRenamed("term", "tok"), "tok", "left_semi")
        .groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    )
    with_df = qterms.join(
        vocab_df.withColumnRenamed("tok", "term"), "term", "left")
    return (
        with_df.groupBy("query_id")
        .agg(F.min(F.struct(
            F.coalesce("df", F.lit(0)).alias("df"), F.col("term")
        )).alias("a"))
        .select(F.col("a.term").alias("tok"), "query_id")
    )


def percolate_stream(docs: DataFrame, queries: DataFrame,
                     anchors: DataFrame | None = None,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """docs(id, text) STREAM -> (id, query_id) match stream.
    ``queries`` and ``anchors`` are static frames (anchors default to
    :func:`query_anchors` without corpus stats).  Output rows carry
    exactly the batch :func:`operators.percolate.percolate`
    semantics; pytest pins streamed ≡ batch over chunked replay."""
    if anchors is None:
        anchors = query_anchors(queries)
    qsets = query_sets(queries)
    toks = docs.select(
        F.col(id_col),
        F.array_distinct(simple_tokens(text_col)).alias("toks"))
    cand = (
        toks.select(id_col, "toks", F.explode("toks").alias("tok"))
        .join(F.broadcast(anchors), "tok")
        .select(id_col, "toks", "query_id")
    )
    return (
        cand.join(F.broadcast(qsets), "query_id")
        .filter(F.expr("forall(need, t -> array_contains(toks, t))"))
        .select(id_col, "query_id")
    )
