"""Result presentation operators: snippets and spell suggestions.

The reference shows retrieved documents in its JavaFX result pane
(MainWindowController.java result table) but computes no excerpt; a
production search result page needs one.  Both operators here are
pure built-in-function plans (JVM codegen, no Python in the hot
path), so they run at scan speed and compose with any top-k frame.

``best_snippet``  — per doc, the +-window token context around the
earliest occurrence of any query term (the classic keyword-in-context
excerpt).

``suggest_terms`` — "did you mean": for query terms missing from the
dictionary, the closest in-vocabulary term by Levenshtein distance
(ties: higher df, then lexicographic).  The plan is a broadcast of
the HANDFUL of query terms against a pruned scan of the vocab —
vocab-linear, never corpus-linear, and the distance filter runs as a
codegen expression.  At 10^12 docs the vocabulary is still only
millions of rows, so this is a sub-second scan on a cluster; the
SymSpell deletion-neighborhood index is the next step if vocab growth
ever makes it matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the ONE ML-pipeline tokenization every documents-table operator
# shares — a local copy could drift from the oracles
from .textstats import simple_tokens


def best_snippet(docs: DataFrame, terms: list[str], window: int = 5,
                 id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, match_pos, snippet) for every doc containing at least one
    of ``terms``: the earliest matching term's 1-based token position
    and the space-joined +-window token context around it.

    One map-only pass — tokenize, per-term array_position, min over
    hits, slice — all built-in higher-order functions, so the whole
    thing inlines into WholeStageCodegen on the scan.  No shuffle, no
    UDF: the shape that streams through 100 TB at I/O speed."""
    toks = simple_tokens(text_col)
    pos_arr = F.array(*[F.array_position(F.col("_toks"), t) for t in terms])
    first = F.array_min(F.filter(pos_arr, lambda p: p > 0))
    start = F.greatest(first - F.lit(window), F.lit(1))
    return (
        docs.select(F.col(id_col), toks.alias("_toks"))
        .withColumn("match_pos", first)
        .filter(F.col("match_pos").isNotNull())
        .select(
            id_col,
            F.col("match_pos").cast("long").alias("match_pos"),
            F.concat_ws(
                " ",
                # true KWIC bounds [max(1, pos-w), pos+w]: the length is
                # derived from the clamped start so a match near the doc
                # head doesn't over-extend rightward
                F.slice(F.col("_toks"), start,
                        first + F.lit(window) - start + F.lit(1)),
            ).alias("snippet"),
        )
    )


def suggest_terms(dictionary: DataFrame, terms: list[str],
                  max_dist: int = 2,
                  term_col: str = "term_key", df_col: str = "df") -> DataFrame:
    """(term, suggestion, dist, df) — for each input term, the single
    closest dictionary term within ``max_dist`` edits (ties broken by
    higher df, then suggestion asc).  Terms with an exact dictionary
    hit suggest themselves at dist 0; terms with no candidate in range
    are absent from the result.

    Plan: broadcast the query terms (a handful of rows) against the
    vocab scan, codegen ``levenshtein`` filter, then one tiny groupBy
    over candidates.  The length pre-filter (|len(a)-len(b)| <=
    max_dist) prunes most of the vocab before the O(len^2) distance
    runs."""
    spark = dictionary.sparkSession
    q = spark.createDataFrame([(t,) for t in sorted(set(terms))], "term string")
    vocab = dictionary.select(
        F.col(term_col).alias("suggestion"), F.col(df_col).cast("long").alias("df")
    )
    cand = (
        vocab.crossJoin(F.broadcast(q))
        .filter(
            F.abs(F.length("suggestion") - F.length("term")) <= max_dist
        )
        .withColumn("dist", F.levenshtein("term", "suggestion"))
        .filter(F.col("dist") <= max_dist)
    )
    # min_by over a composite order: (dist asc, df desc, suggestion asc)
    best = cand.groupBy("term").agg(
        F.min(
            F.struct(
                F.col("dist"),
                (-F.col("df")).alias("neg_df"),
                F.col("suggestion"),
            )
        ).alias("b")
    )
    return best.select(
        "term",
        F.col("b.suggestion").alias("suggestion"),
        F.col("b.dist").cast("long").alias("dist"),
        (-F.col("b.neg_df")).cast("long").alias("df"),
    )
