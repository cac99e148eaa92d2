"""K-gram wildcard index: infix / leading / arbitrary ``*`` patterns.

The trailing-wildcard path (``searcher.wildcard_search``) serves
``pre*`` from the range-sorted vocabulary because a prefix is a
parquet row-group range.  ``*fix``, ``*infix*`` and ``a*b`` have no
such range — Lucene answers them with an n-gram index over the
vocabulary (the classic IR-book k-gram index; Lucene's
``NGramTokenizer``-backed wildcard field works the same way), and so
does this module:

``write_kgram_index``  — materialize, ONCE per index, every k-gram of
every padded vocabulary term (``^term$`` — the boundary markers make
anchored grams like ``^pre`` and ``fix$`` first-class), range-sorted
by gram so a query's literal ``gram IN (...)`` filter prunes at the
parquet row-group level.  The artifact is vocab-sized × O(term
length) — trivial next to the postings even at 10^12 docs, where the
vocabulary is millions of terms, not trillions.

``expand_wildcard_indexed`` — the query-time rewrite: a pattern's
literal runs are cut into k-grams, candidate terms must contain ALL
of them (one pruned scan + a count-distinct gate — grams are
NECESSARY conditions, so recall is total), and a per-candidate
anchored-regex verify makes the expansion EXACT before the df-desc /
term-asc cap (Lucene's TopTermsRewrite, same rule as the trailing
path).  Patterns whose literal runs are all shorter than k (e.g.
``*a*``) get no gram evidence; they fall back to a full-vocabulary
regex scan — still vocab-linear, never corpus-linear, exactly what
Lucene's wildcard query degrades to on a leading single character.

Reference anchor: the reference engine has no wildcard surface at all
(Searcher.java parses plain terms only); this is part of the
web-scale serving layer the rebuild adds.  Scale shape: candidate
generation is a pruned scan of a vocab-sized side-car; scoring is the
unchanged pruned-scan BM25 tail over the expanded keys.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

GRAM_K = 3


def _padded(col):
    """``^term$`` — '^'/'$' cannot occur in index terms (the analyzer
    emits lowercased alnum stems), so the markers are unambiguous."""
    return F.concat(F.lit("^"), col, F.lit("$"))


def kgram_rows(vocab: DataFrame, term_col: str = "term_key",
               df_col: str = "df", k: int = GRAM_K) -> DataFrame:
    """(gram, term, df): every distinct k-gram of each padded
    vocabulary term.  Pure codegen — sequence → transform →
    array_distinct → explode; no Python touches a row."""
    padded = _padded(F.col(term_col))
    grams = F.array_distinct(F.expr(
        f"transform(sequence(1, length(concat('^', {term_col}, '$')) "
        f"- {k - 1}), i -> substring(concat('^', {term_col}, '$'), i, {k}))"
    ))
    return (
        vocab.filter(F.length(F.col(term_col)) >= 1)
        .select(F.col(term_col).alias("term"),
                F.col(df_col).cast("long").alias("df"),
                F.explode(grams).alias("gram"))
        .select("gram", "term", "df")
    )


def write_kgram_index(vocab: DataFrame, path: str,
                      term_col: str = "term_key", df_col: str = "df",
                      k: int = GRAM_K, n_files: int = 8,
                      index_dir: str | None = None) -> None:
    """Materialize the k-gram table range-sorted by gram (literal
    ``gram IN`` filters prune row groups via min/max string stats)
    plus the plain (term, df) vocabulary for the no-gram fallback
    scan.  ``index_dir`` stamps the packed index's lineage position,
    the same staleness discipline as the MLT / suggest / autocomplete
    side-cars: serve-time refuses once the index has moved."""
    rows = kgram_rows(vocab, term_col, df_col, k)
    (rows.repartitionByRange(n_files, "gram")
     .sortWithinPartitions("gram", "term")
     .write.mode("overwrite").parquet(os.path.join(path, "grams")))
    (vocab.select(F.col(term_col).alias("term"),
                  F.col(df_col).cast("long").alias("df"))
     .repartitionByRange(max(2, n_files // 4), "term")
     .sortWithinPartitions("term")
     .write.mode("overwrite").parquet(os.path.join(path, "vocab")))
    meta: dict = {"k": k, "term_col": term_col}
    if index_dir is not None:
        from ..indexer import index_fingerprint

        meta["index_dir"] = os.path.abspath(index_dir)
        meta["index_fingerprint"] = index_fingerprint(index_dir)
    with open(os.path.join(path, "_kgram_meta.json"), "w") as fh:
        json.dump(meta, fh)


def pattern_grams(pattern: str, k: int = GRAM_K) -> list[str]:
    """The k-grams a matching term MUST contain: pad the pattern with
    the boundary markers, split on ``*``, and cut every literal run
    into k-grams.  Runs shorter than k contribute nothing (a gram
    spanning a ``*`` would over-constrain — Lucene's kgram query drops
    them the same way)."""
    padded = "^" + pattern + "$"
    grams: set[str] = set()
    for run in padded.split("*"):
        for i in range(len(run) - k + 1):
            grams.add(run[i:i + k])
    return sorted(grams)


def pattern_regex(pattern: str) -> str:
    """Anchored verify regex: literal runs escaped, ``*`` → ``.*``."""
    return "^" + ".*".join(re.escape(p) for p in pattern.split("*")) + "$"


def _check_fresh(path: str) -> dict:
    with open(os.path.join(path, "_kgram_meta.json")) as fh:
        meta = json.load(fh)
    if meta.get("index_fingerprint") is not None:
        from ..indexer import index_fingerprint

        current = index_fingerprint(meta["index_dir"])
        if current != meta["index_fingerprint"]:
            raise RuntimeError(
                f"kgram index at {path} is STALE: built at index "
                f"position {meta['index_fingerprint']}, index is now "
                f"at {current} — its vocabulary no longer matches; "
                "rebuild with write_kgram_index after index mutations")
    return meta


def expand_wildcard(vocab: DataFrame, patterns: list[str],
                    max_expansions: int = 16,
                    term_col: str = "term", df_col: str = "df") -> DataFrame:
    """(pattern, term, df, rank): brute-force expansion — anchored
    regex over the FULL vocabulary, capped per pattern by df desc,
    term asc.  Vocab-linear; the recall baseline the indexed path is
    verified against, and the fallback for gram-less patterns."""
    spark = vocab.sparkSession
    q = spark.createDataFrame(
        [(p, pattern_regex(p)) for p in sorted(set(patterns))],
        "pattern string, rx string")
    cand = (
        vocab.select(F.col(term_col).alias("term"),
                     F.col(df_col).cast("long").alias("df"))
        .join(F.broadcast(q), F.expr("term rlike rx"))
    )
    w = Window.partitionBy("pattern").orderBy(F.desc("df"), F.asc("term"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= max_expansions)
        .select("pattern", "term", "df", "rank")
    )


def expand_wildcard_indexed(spark: SparkSession, path: str,
                            patterns: list[str],
                            max_expansions: int = 16) -> DataFrame:
    """(pattern, term, df, rank) served from the STORED k-gram layout
    — output identical to :func:`expand_wildcard` over the same
    vocabulary (SymSpell-style contract: the gram gate has full
    recall, the regex verify restores exactness), but the scan is a
    literal ``gram IN (...)`` pushdown over the range-sorted gram
    files.  Gram-less patterns (all literal runs < k) are answered by
    the fallback vocabulary scan, unioned in the same plan."""
    meta = _check_fresh(path)
    k = int(meta["k"])
    pats = sorted(set(patterns))
    with_grams = [(p, pattern_grams(p, k)) for p in pats]
    indexed = [(p, gs) for p, gs in with_grams if gs]
    fallback = [p for p, gs in with_grams if not gs]

    out: DataFrame | None = None
    if indexed:
        all_grams = sorted({g for _, gs in indexed for g in gs})
        need = spark.createDataFrame(
            [(p, g, len(gs), pattern_regex(p)) for p, gs in indexed
             for g in gs],
            "pattern string, gram string, n_grams int, rx string")
        grams = (
            spark.read.parquet(os.path.join(path, "grams"))
            .filter(F.col("gram").isin(all_grams))
        )
        cand = (
            grams.join(F.broadcast(need), "gram")
            .groupBy("pattern", "term", "df", "n_grams", "rx")
            .agg(F.countDistinct("gram").alias("got"))
            .filter(F.col("got") == F.col("n_grams"))
            .filter(F.expr("term rlike rx"))
        )
        w = Window.partitionBy("pattern").orderBy(
            F.desc("df"), F.asc("term"))
        out = (
            cand.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= max_expansions)
            .select("pattern", "term", "df", "rank")
        )
    if fallback:
        vocab = spark.read.parquet(os.path.join(path, "vocab"))
        fb = expand_wildcard(vocab, fallback, max_expansions)
        out = fb if out is None else out.unionByName(fb)
    if out is None:
        return spark.createDataFrame(
            [], "pattern string, term string, df long, rank long")
    return out

# ---------------------------------------------------------------------------
# Regex term query (Lucene RegexpQuery) over the same k-gram layout

_UNSAFE_RX = re.compile(r"[(|]|\\[0-9]")


def regex_mandatory_runs(pattern: str) -> list[str] | None:
    """Literal runs every match of the (implicitly anchored — Lucene
    RegexpQuery semantics) regex must contain as contiguous
    substrings, with ``^``/``$`` boundary markers when a run is
    pinned to the start/end of the term.  Returns ``None`` when no
    SOUND evidence is extractable (alternation, groups, backrefs —
    a branch could avoid any literal we pick), and may return fewer
    /shorter runs than the theoretical maximum: under-constraining
    only costs pruning, never recall, because the grams are used as
    NECESSARY conditions ahead of an exact regex verify.

    The conservative atom rules: ``.``/``[class]``/``\\d``-style
    escapes break the current run; ``?``/``*``/``{m,n}`` drop the
    previous literal from its run (the atom may be absent) and break;
    ``+`` keeps it (>= 1 occurrence is contiguous with what precedes)
    but still breaks (the repetition unpins whatever follows)."""
    if _UNSAFE_RX.search(pattern):
        return None
    runs: list[str] = []
    run = ""
    run_at_start = True  # current run began before any other atom

    def close() -> None:
        nonlocal run, run_at_start
        if run:
            runs.append(("^" + run) if run_at_start else run)
        run = ""
        run_at_start = False

    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            if nxt.isalnum():          # \d \w \s \b ... : wildcard atom
                close()
            else:                      # \. \* ... : literal char
                run += nxt
            i += 2
            continue
        if c in ".^$" or c == "[":
            if c == "[":               # skip the class body
                j = i + 1
                if j < n and pattern[j] == "]":
                    j += 1
                while j < n and pattern[j] != "]":
                    j += 2 if pattern[j] == "\\" else 1
                i = j
            close()
            i += 1
            continue
        if c in "?*" or c == "{":
            if c == "{":               # skip the quantifier body
                while i < n and pattern[i] != "}":
                    i += 1
            if run:
                run = run[:-1]         # previous literal is optional
                if not run:
                    run_at_start = False  # a?bc: 'bc' is NOT anchored
            close()
            i += 1
            continue
        if c == "+":
            close()                    # run stays mandatory, contiguity
            i += 1                     # with what follows does not
            continue
        run += c                       # plain literal
        i += 1
    # final close by exhaustion: the run is pinned to the term's end
    if run:
        tail = ("^" + run) if run_at_start else run
        runs.append(tail + "$")
    return runs


def regex_grams(pattern: str, k: int = GRAM_K) -> list[str] | None:
    """The k-grams a term matching ``pattern`` MUST contain, or
    ``None``/``[]`` when the pattern yields no usable evidence (the
    caller falls back to the full-vocabulary scan)."""
    runs = regex_mandatory_runs(pattern)
    if runs is None:
        return None
    grams: set[str] = set()
    for run in runs:
        for i in range(len(run) - k + 1):
            grams.add(run[i:i + k])
    return sorted(grams)


def regex_anchor(pattern: str) -> str:
    """Whole-term verify form: Lucene RegexpQuery matches the ENTIRE
    term, Spark ``rlike`` is a substring search — anchor explicitly.
    The non-capturing group keeps top-level alternation honest
    (``a|b`` must mean ``^(?:a|b)$``, not ``^a|b$``)."""
    return "^(?:" + pattern + ")$"


def expand_regex(vocab: DataFrame, patterns: list[str],
                 max_expansions: int = 16,
                 term_col: str = "term", df_col: str = "df") -> DataFrame:
    """(pattern, term, df, rank): brute-force regex expansion —
    anchored match over the FULL vocabulary, capped per pattern by df
    desc, term asc (TopTermsRewrite).  Vocab-linear; the recall
    baseline the indexed path is verified against, and the fallback
    for patterns without gram evidence."""
    spark = vocab.sparkSession
    q = spark.createDataFrame(
        [(p, regex_anchor(p)) for p in sorted(set(patterns))],
        "pattern string, rx string")
    cand = (
        vocab.select(F.col(term_col).alias("term"),
                     F.col(df_col).cast("long").alias("df"))
        .join(F.broadcast(q), F.expr("term rlike rx"))
    )
    w = Window.partitionBy("pattern").orderBy(F.desc("df"), F.asc("term"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= max_expansions)
        .select("pattern", "term", "df", "rank")
    )


def expand_regex_indexed(spark: SparkSession, path: str,
                         patterns: list[str],
                         max_expansions: int = 16) -> DataFrame:
    """(pattern, term, df, rank) served from the STORED k-gram layout
    — output identical to :func:`expand_regex` over the same
    vocabulary.  Patterns whose mandatory literal runs yield k-grams
    are answered by the gram-IN pruned scan + count-distinct gate +
    anchored-regex verify (grams are necessary conditions, so recall
    is total); alternation/group patterns and gram-less ones fall
    back to the stored full-vocabulary scan, unioned in the same
    plan — still vocab-linear, exactly Lucene's RegexpQuery degrade
    path."""
    meta = _check_fresh(path)
    k = int(meta["k"])
    pats = sorted(set(patterns))
    with_grams = [(p, regex_grams(p, k)) for p in pats]
    indexed = [(p, gs) for p, gs in with_grams if gs]
    fallback = [p for p, gs in with_grams if not gs]

    out: DataFrame | None = None
    if indexed:
        all_grams = sorted({g for _, gs in indexed for g in gs})
        need = spark.createDataFrame(
            [(p, g, len(gs), regex_anchor(p)) for p, gs in indexed
             for g in gs],
            "pattern string, gram string, n_grams int, rx string")
        grams = (
            spark.read.parquet(os.path.join(path, "grams"))
            .filter(F.col("gram").isin(all_grams))
        )
        cand = (
            grams.join(F.broadcast(need), "gram")
            .groupBy("pattern", "term", "df", "n_grams", "rx")
            .agg(F.countDistinct("gram").alias("got"))
            .filter(F.col("got") == F.col("n_grams"))
            .filter(F.expr("term rlike rx"))
        )
        w = Window.partitionBy("pattern").orderBy(
            F.desc("df"), F.asc("term"))
        out = (
            cand.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= max_expansions)
            .select("pattern", "term", "df", "rank")
        )
    if fallback:
        vocab = spark.read.parquet(os.path.join(path, "vocab"))
        fb = expand_regex(vocab, fallback, max_expansions)
        out = fb if out is None else out.unionByName(fb)
    if out is None:
        return spark.createDataFrame(
            [], "pattern string, term string, df long, rank long")
    return out
