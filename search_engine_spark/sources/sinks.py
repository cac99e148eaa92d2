"""Result sinks (S14): TREC run output.

The reference writes ``qid 0 docId 1 42.38 mt`` with a hard-coded
constant score (Searcher.java:173,185 — quirk Q8); this sink emits
the REAL blended score and the true rank, which is what any
downstream trec_eval actually needs.  Batch results
(qid, rank, url, score) come from ``SearchEngine.search_batch``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RUN_TAG = "mt"


def trec_run_lines(results: DataFrame, tag: str = RUN_TAG) -> DataFrame:
    """(qid, rank, url, score) -> single-column TREC run lines
    ``qid Q0 url rank score tag`` in (qid, rank) order."""
    return (
        results.select(
            F.concat_ws(
                " ",
                F.col("qid"), F.lit("Q0"), F.col("url"),
                F.col("rank").cast("string"),
                # printf-style, NOT format_number: the latter inserts
                # comma grouping for scores >= 1000, corrupting the
                # space-delimited run format
                F.format_string("%.6f", F.col("score")),
                F.lit(tag),
            ).alias("line"),
            "qid", "rank",
        )
        .orderBy("qid", "rank")
        .select("line")
    )


def write_trec_run(results: DataFrame, path: str, tag: str = RUN_TAG) -> None:
    """Write the run as a text file tree (one part per partition at
    scale; coalesced here because runs are small — k rows per qid)."""
    trec_run_lines(results, tag).coalesce(1).write.mode("overwrite").text(path)
