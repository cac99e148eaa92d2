"""Reverse search (percolation): stored queries evaluated against
incoming documents — Lucene Monitor / the saved-search "alerting"
layer every production crawl pipeline bolts onto ingest.  Ordinary
search asks "which docs match this query"; percolation asks "which of
the REGISTERED queries match this new doc", at crawl time, before the
document is even indexed.

Reference counterpart: none (edanBI/Search_Engine is query-only) —
this is forward infrastructure for the 100 TB deployment, where the
alert table (saved searches, takedown monitors, topic feeds) holds
millions of rows and every crawl batch must be matched against all
of them.

Semantics: a query is a set of terms with MUST semantics — a document
matches iff it contains EVERY term (the BooleanQuery-all-MUST shape;
OR-groups compose as multiple registered rows).  Queries arrive as
(query_id, term) rows under the shared simple tokenization.

Scale shape (the Lucene-Monitor "presearcher" in DataFrame form):
the naive plan joins every doc token against every query term — a
head term ('the') in ONE alert would pull every document into the
exchange.  Instead:

  1. anchor: per query, its RAREST term by corpus df (deterministic
     tie-break term asc) — one tiny vocab-sized join to compute.
  2. candidates: doc tokens ⋈ anchors — keyed on rare terms, so the
     exchange tracks the rare terms' posting sizes, not the corpus.
  3. verify: candidate (doc, query) pairs expand to the query's full
     term list and count matches against the doc's token set —
     candidate-restricted, the dedup-verify discipline.

The driver row's DuckDB oracle intentionally computes the NAIVE
all-terms join: result equality per (doc, query) proves the
presearcher reduction sound, not just fast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import simple_tokens


def doc_token_sets(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(id, tok) DISTINCT — each document's token set under the
    shared simple tokenization."""
    return (
        docs.select(id_col, F.explode(simple_tokens(text_col)).alias("tok"))
        .distinct()
    )


def percolate(docs: DataFrame, queries: DataFrame,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, query_id) — every (document, registered query) pair where
    the document contains ALL of the query's terms.  ``queries`` is
    (query_id, term) rows; queries whose terms never occur in the
    corpus simply match nothing (their anchor df is 0-ish but the
    candidate join finds no docs).

    Plan: presearcher anchor join (rare-term keyed) → candidate-
    restricted verify (two map-side-combining aggs + one semi-shaped
    match join).  No step is ever corpus × queries."""
    toks = doc_token_sets(docs, id_col, text_col)
    # corpus df per term — only for terms that appear in some query
    # (left-semi first: the df agg touches the queries' vocab slice)
    qterms = queries.select("query_id", "term")
    vocab_df = (
        toks.join(qterms.select("term").distinct().withColumnRenamed("term", "tok"),
                  "tok", "left_semi")
        .groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    )
    # 1. anchor: per query the rarest term (df asc, term asc); a term
    # absent from the corpus has no df row — it anchors FIRST via the
    # null-df sort (nulls first => df 0 beats everything), correctly
    # sending the query's candidate set to empty.
    with_df = qterms.join(
        vocab_df.withColumnRenamed("tok", "term"), "term", "left")
    anchors = (
        with_df.groupBy("query_id")
        .agg(F.min(F.struct(
            F.coalesce("df", F.lit(0)).alias("df"), F.col("term")
        )).alias("a"))
        .select("query_id", F.col("a.term").alias("tok"))
    )
    # 2. candidates: keyed on the rare anchor terms
    cand = toks.join(anchors, "tok").select(id_col, "query_id")
    # 3. verify: expand candidates to full term lists, count matches
    need = qterms.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_terms"))
    expanded = cand.join(qterms, "query_id")
    matched = (
        expanded.join(
            toks.withColumnRenamed("tok", "term"), [id_col, "term"], "left_semi")
        .groupBy(id_col, "query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        matched.join(need, "query_id")
        .filter(F.col("n_hit") == F.col("n_terms"))
        .select(id_col, "query_id")
    )


def percolate_naive(docs: DataFrame, queries: DataFrame,
                    id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """The direct all-terms join — the equivalence twin of
    :func:`percolate` (and the plan you must NOT run at scale: one
    head term in one alert pulls the whole corpus into the join)."""
    toks = doc_token_sets(docs, id_col, text_col)
    qterms = queries.select("query_id", "term")
    need = qterms.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_terms"))
    hit = (
        toks.join(qterms.withColumnRenamed("term", "tok"), "tok")
        .groupBy(id_col, "query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        hit.join(need, "query_id")
        .filter(F.col("n_hit") == F.col("n_terms"))
        .select(id_col, "query_id")
    )
