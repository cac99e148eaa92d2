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
codegen expression.

``did_you_mean`` — the whole-query banner form: every input term
gets a row, and an IN-vocabulary term is replaced only when a near
neighbor is more than ``gain``x as frequent (the ES term-suggester
``suggest_mode=popular`` rule with a confidence gate) — real-word
error correction, not just out-of-vocabulary repair.

``suggest_index`` / ``suggest_terms_indexed`` — the SymSpell form of
the same operator: materialize the vocabulary's deletion
neighborhood ONCE per index (every string reachable from a vocab
term by deleting <= max_dist characters — vocab-sized times a small
polynomial in term length), store it sorted by variant, and answer a
query by joining the query terms' own deletion variants against it.
SymSpell's theorem (Garbe's symmetric-delete scheme): if
lev(a, b) <= d then Del<=d(a) and Del<=d(b) intersect, so the
variant equality join has FULL RECALL and the per-candidate
levenshtein verify makes the output identical to the brute scan —
but the per-query plan is a pushdown-pruned lookup of a few hundred
variant keys, not a vocab scan.

``autocomplete`` / ``write_autocomplete_index`` /
``autocomplete_indexed`` — the suggest box: top-k completions of a
typed prefix by collection frequency, served from a range-sorted
stored vocabulary whose ``startswith`` filter prunes parquet row
groups (string min/max stats), with the same index-lineage
staleness stamp as the MLT/suggest layouts.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
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


def did_you_mean(dictionary: DataFrame, terms: list[str],
                 max_dist: int = 2, gain: int = 4,
                 term_col: str = "term_key", df_col: str = "df") -> DataFrame:
    """(term, suggestion, dist, df_term, df_sugg, changed) — the
    whole-query "did you mean" banner.  Unlike :func:`suggest_terms`
    (which only corrects and silently drops hopeless terms), this is
    the ES term-suggester ``suggest_mode=popular`` rule generalized
    with a confidence gate: EVERY input term gets a row, and a term
    is replaced only when a candidate within ``max_dist`` edits is
    MORE THAN ``gain``x as frequent (df_sugg > gain * df_term,
    BIGINT compare — an out-of-vocabulary term has df 0, so any
    candidate clears the gate; an in-vocabulary term needs strong
    frequency evidence, which is what makes real-word corrections
    safe).  The winning candidate follows the shared spell rule:
    dist asc, df desc, suggestion asc.  Unreplaced terms suggest
    themselves at dist 0 with ``changed = false`` — a banner never
    drops words.

    Plan: ONE broadcast of the handful of query terms against the
    vocab scan (codegen length-prefiltered levenshtein, dist 0 rows
    doubling as the exact-match df_term lookup), a q-sized join to
    thread df_term into the gate, then a tiny min_by-struct agg.
    Vocab-linear, never corpus-linear."""
    spark = dictionary.sparkSession
    q = spark.createDataFrame([(t,) for t in sorted(set(terms))], "term string")
    vocab = dictionary.select(
        F.col(term_col).alias("suggestion"),
        F.col(df_col).cast("long").alias("df"),
    )
    cand = (
        vocab.crossJoin(F.broadcast(q))
        .filter(F.abs(F.length("suggestion") - F.length("term")) <= max_dist)
        .withColumn("dist", F.levenshtein("term", "suggestion"))
        .filter(F.col("dist") <= max_dist)
    )
    exact = cand.filter(F.col("dist") == 0).select(
        "term", F.col("df").alias("df_term"))
    orig = q.join(exact, "term", "left").na.fill(0, ["df_term"])
    gated = (
        cand.filter(F.col("dist") >= 1)
        .join(F.broadcast(orig), "term")
        .filter(F.col("df") > F.lit(gain) * F.col("df_term"))
    )
    best = gated.groupBy("term").agg(
        F.min(
            F.struct(
                F.col("dist"),
                (-F.col("df")).alias("neg_df"),
                F.col("suggestion"),
            )
        ).alias("b")
    )
    return orig.join(best, "term", "left").select(
        "term",
        F.coalesce(F.col("b.suggestion"), F.col("term")).alias("suggestion"),
        F.coalesce(F.col("b.dist").cast("long"), F.lit(0)).alias("dist"),
        F.col("df_term").cast("long").alias("df_term"),
        F.coalesce((-F.col("b.neg_df")).cast("long"),
                   F.col("df_term").cast("long")).alias("df_sugg"),
        F.col("b").isNotNull().alias("changed"),
    )


# ---------------------------------------------------------------------------
# SymSpell deletion-neighborhood index


def _single_deletions(col: Column) -> Column:
    """Array of every string obtained by deleting ONE character of
    ``col`` (empty array for the empty string).  Pure codegen: a
    position sequence mapped through substring concatenation."""
    return F.when(F.length(col) > 0, F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.concat(col.substr(F.lit(1), i - 1),
                           col.substr(i + 1, F.length(col))),
    ))).otherwise(F.array().cast("array<string>"))


def _py_deletions(term: str, max_dist: int) -> list[str]:
    """Driver-side twin of the index's neighborhood expansion for the
    query side: all strings reachable by <= max_dist deletions,
    including the term itself."""
    out = {term}
    frontier = {term}
    for _ in range(max_dist):
        nxt = set()
        for v in frontier:
            for i in range(len(v)):
                nxt.add(v[:i] + v[i + 1:])
        nxt -= out
        out |= nxt
        frontier = nxt
    return sorted(out)


def suggest_index(dictionary: DataFrame, max_dist: int = 2,
                  term_col: str = "term_key", df_col: str = "df") -> DataFrame:
    """(variant, suggestion, df): every deletion variant (depth
    <= max_dist, the term itself included at depth 0) of every
    vocabulary term.  Vocab-sized x O(len^max_dist) rows — built once
    per index, exactly like the dictionary itself."""
    base = dictionary.select(
        F.col(term_col).alias("suggestion"),
        F.col(df_col).cast("long").alias("df"),
        F.col(term_col).alias("variant"),
    )
    out, frontier = base, base
    for _ in range(max_dist):
        frontier = (
            frontier.select(
                "suggestion", "df",
                F.explode(_single_deletions(F.col("variant"))).alias("variant"),
            )
            .groupBy("suggestion", "variant").agg(F.first("df").alias("df"))
        )
        out = out.unionByName(frontier.select("suggestion", "df", "variant"))
    return (
        out.groupBy("variant", "suggestion").agg(F.first("df").alias("df"))
    )


def write_suggest_index(dictionary: DataFrame, path: str, max_dist: int = 2,
                        term_col: str = "term_key", df_col: str = "df",
                        n_files: int = 8,
                        index_dir: str | None = None) -> None:
    """Materialize :func:`suggest_index` range-sorted by variant so a
    query's ``variant IN (...)`` literal filter prunes at the parquet
    row-group level (min/max stats) — the same pushdown shape as the
    BM25 dictionary's (bucket, term_key) seek.

    Pass ``index_dir`` (the packed index whose dictionary fed this
    neighborhood) to stamp its lineage position: the stored
    vocabulary is a corpus snapshot, and after an index mutation the
    neighborhood silently lacks new terms (or suggests deleted ones)
    — with the stamp, the indexed serve path refuses instead until a
    rebuild."""
    ix = suggest_index(dictionary, max_dist, term_col, df_col)
    (ix.repartitionByRange(n_files, "variant")
     .sortWithinPartitions("variant")
     .write.mode("overwrite").parquet(path))
    # SymSpell needs deletion depth d on BOTH sides: a query asking a
    # larger max_dist than the stored neighborhood would silently lose
    # recall, so record the build depth for the reader guard
    meta: dict = {"max_dist": max_dist}
    if index_dir is not None:
        from ..indexer import index_fingerprint

        meta["index_dir"] = os.path.abspath(index_dir)
        meta["index_fingerprint"] = index_fingerprint(index_dir)
    with open(os.path.join(path, "_suggest_meta.json"), "w") as fh:
        json.dump(meta, fh)


def suggest_terms_indexed(spark: SparkSession, path: str, terms: list[str],
                          max_dist: int = 2) -> DataFrame:
    """'Did you mean' over the STORED deletion-neighborhood index —
    output identical to :func:`suggest_terms` (SymSpell full recall +
    the same levenshtein verify and (dist, df desc, asc) tie-break),
    but the plan is a literal-IN pushdown lookup of the query terms'
    own deletion variants, never a vocabulary scan.

    Raises when ``max_dist`` exceeds the depth the index was built
    with (the stored neighborhood cannot answer a deeper query —
    distance-d matches whose shared variant needs d index-side
    deletions would be silently missing)."""
    meta_path = os.path.join(path, "_suggest_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            smeta = json.load(fh)
        if smeta.get("index_fingerprint") is not None:
            # built beside a packed index: refuse to serve once that
            # index has moved (stale vocabulary), like the MLT layout
            from ..indexer import index_fingerprint

            current = index_fingerprint(smeta["index_dir"])
            if current != smeta["index_fingerprint"]:
                raise RuntimeError(
                    f"suggest index at {path} is STALE: built at index "
                    f"position {smeta['index_fingerprint']}, index is "
                    f"now at {current} — its vocabulary no longer "
                    "matches; rebuild with write_suggest_index after "
                    "index mutations")
        built_dist = int(smeta["max_dist"])
        if max_dist > built_dist:
            raise ValueError(
                f"suggest index at {path} was built with max_dist="
                f"{built_dist}; cannot answer max_dist={max_dist} — "
                "rebuild with write_suggest_index(..., max_dist="
                f"{max_dist})")
    pairs = [(t, v) for t in sorted(set(terms)) for v in _py_deletions(t, max_dist)]
    all_variants = sorted({v for _, v in pairs})
    q = spark.createDataFrame(pairs, "term string, variant string")
    hits = (
        spark.read.parquet(path)
        .filter(F.col("variant").isin(all_variants))
        .join(F.broadcast(q), "variant")
        .select("term", "suggestion", "df").distinct()
        .withColumn("dist", F.levenshtein("term", "suggestion"))
        .filter(F.col("dist") <= max_dist)
    )
    best = hits.groupBy("term").agg(
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


# ---------------------------------------------------------------------------
# Prefix autocomplete ("search as you type")


def autocomplete(dictionary: DataFrame, prefixes: list[str], k: int = 8,
                 term_col: str = "term_key",
                 cf_col: str = "cf") -> DataFrame:
    """(prefix, completion, cf, rank) — for each query prefix, the
    top-``k`` vocabulary completions ordered by collection frequency
    desc, completion asc (total order: deterministic under cf ties).

    The suggest-box operator every search front-end fires on each
    keystroke.  Plan: broadcast the HANDFUL of typed prefixes against
    the dictionary scan (``startswith`` is a codegen predicate — at
    most a few prefix rows per vocab row, never a corpus pass), then
    one per-prefix ``row_number`` window over the surviving
    candidates.  The window partitions by prefix — a few partitions
    of vocab-subset size, no global sort.  ``cf`` stays BIGINT all
    the way, so ranking is exact and engine-independent.

    Serving at scale reads the STORED range-sorted layout instead
    (:func:`write_autocomplete_index` / :func:`autocomplete_indexed`)
    — same output, pruned scan.
    """
    spark = dictionary.sparkSession
    q = spark.createDataFrame(
        [(p,) for p in sorted(set(prefixes))], "prefix string")
    vocab = dictionary.select(
        F.col(term_col).alias("completion"),
        F.col(cf_col).cast("long").alias("cf"),
    )
    cand = vocab.join(
        F.broadcast(q), F.col("completion").startswith(F.col("prefix")))
    w = Window.partitionBy("prefix").orderBy(
        F.desc("cf"), F.asc("completion"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("prefix", "completion", "cf", "rank")
    )


def write_autocomplete_index(dictionary: DataFrame, path: str,
                             term_col: str = "term_key",
                             cf_col: str = "cf", n_files: int = 8,
                             index_dir: str | None = None) -> None:
    """Materialize the (completion, cf) vocabulary range-sorted by
    completion so a prefix query's ``startswith`` filter prunes at
    the parquet row-group level (min/max string stats — Spark pushes
    ``StringStartsWith`` to the parquet reader): the suggest-box
    lookup touches only the row groups whose term range overlaps the
    prefix, never the whole vocabulary.

    Pass ``index_dir`` (the packed index whose dictionary fed this
    layout) to stamp its lineage position, exactly like the stored
    MLT/suggest layouts: the vocabulary is a corpus snapshot, and
    after an index mutation the box would silently complete to
    deleted terms (or miss new ones) — with the stamp,
    :func:`autocomplete_indexed` refuses instead until a rebuild."""
    vocab = dictionary.select(
        F.col(term_col).alias("completion"),
        F.col(cf_col).cast("long").alias("cf"),
    )
    (vocab.repartitionByRange(n_files, "completion")
     .sortWithinPartitions("completion")
     .write.mode("overwrite").parquet(os.path.join(path, "vocab")))
    meta: dict = {"term_col": term_col}
    if index_dir is not None:
        from ..indexer import index_fingerprint

        meta["index_dir"] = os.path.abspath(index_dir)
        meta["index_fingerprint"] = index_fingerprint(index_dir)
    with open(os.path.join(path, "_autocomplete_meta.json"), "w") as fh:
        json.dump(meta, fh)


def autocomplete_indexed(spark: SparkSession, path: str,
                         prefixes: list[str], k: int = 8) -> DataFrame:
    """Autocomplete served from the STORED layout — output identical
    to :func:`autocomplete` on the same vocabulary, but the scan is a
    literal ``startswith`` pushdown over the range-sorted files (row
    groups outside every prefix's term range never decompress).

    Refuses to serve when the layout was stamped against a packed
    index that has since moved (stale vocabulary), like the stored
    MLT/suggest layouts."""
    meta_path = os.path.join(path, "_autocomplete_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        if meta.get("index_fingerprint") is not None:
            from ..indexer import index_fingerprint

            current = index_fingerprint(meta["index_dir"])
            if current != meta["index_fingerprint"]:
                raise RuntimeError(
                    f"autocomplete index at {path} is STALE: built at "
                    f"index position {meta['index_fingerprint']}, index "
                    f"is now at {current} — its vocabulary no longer "
                    "matches; rebuild with write_autocomplete_index "
                    "after index mutations")
    ps = sorted(set(prefixes))
    cond = F.col("completion").startswith(ps[0])
    for p in ps[1:]:
        cond = cond | F.col("completion").startswith(p)
    vocab = spark.read.parquet(os.path.join(path, "vocab")).filter(cond)
    return autocomplete(vocab, ps, k, term_col="completion", cf_col="cf")
