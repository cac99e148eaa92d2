"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language ID, fingerprinting.

All of these are pure built-in column expressions (JVM-side,
whole-stage codegen — no Python in the hot path) over a shared simple
tokenization, so they run at scan speed on 100 TB and each has an
exact DuckDB-SQL oracle in ``__spark_entry__``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# shared simple tokenization (distinct from the search-engine parser:
# these ops feed ML pipelines, not the rank-identical index)
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def simple_tokens(col="text"):
    return F.filter(F.split(F.lower(F.col(col)), TOKEN_SPLIT_RE), lambda x: x != F.lit(""))


# marker words per language for the n-gram/stopword language-ID heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with", "for", "was"),
    "fr": ("le", "la", "les", "et", "des", "une", "dans", "est", "pour", "que"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "auf", "den"),
    "es": ("el", "la", "los", "y", "de", "que", "en", "es", "por", "con"),
}

_EN_STOPWORDS = LANG_MARKERS["en"] + ("a", "it", "as", "on", "be", "are", "this", "by")


def token_stats(docs: DataFrame) -> DataFrame:
    """Token counting: total tokens, distinct tokens, mean token
    length per document (whitespace+punct tokenization)."""
    toks = simple_tokens()
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(
            F.aggregate(toks, F.lit(0.0), lambda acc, x: acc + F.length(x))
            / F.greatest(F.size(toks), F.lit(1)),
            6,
        ).alias("mean_token_len"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality score: length band + stop-word ratio +
    alpha ratio — the standard cheap pre-filter for web-text corpora
    (cf. C4/Gopher-style rules), as one codegen'd expression."""
    toks = simple_tokens()
    n_tok = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*_EN_STOPWORDS)))
    n_alpha = F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z]", ""))
    n_chars = F.greatest(F.length("text"), F.lit(1))
    stop_ratio = stop_hits / F.greatest(n_tok, F.lit(1))
    alpha_ratio = n_alpha / n_chars
    length_ok = (n_tok >= 10) & (n_tok <= 100000)
    score = (
        F.when(length_ok, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.least(stop_ratio * 2.0, F.lit(0.3))
        + F.least(alpha_ratio, F.lit(0.3))
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(score, 6).alias("quality"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Marker-word language ID: argmax over per-language marker-hit
    counts; no-hits resolve to 'und'.  Deterministic tie-break:
    lexicographically smallest language code (first match in a sorted
    CASE chain — identical semantics in the DuckDB oracle)."""
    toks = simple_tokens()

    def hits(markers: tuple[str, ...]):
        # one-parameter lambda only: PySpark passes the element index
        # to two-parameter callables, clobbering a default argument
        return F.size(F.filter(toks, lambda x: x.isin(*markers)))

    hit_cols = {lang: hits(markers) for lang, markers in sorted(LANG_MARKERS.items())}
    mx = F.greatest(*hit_cols.values())
    detected = F.when(mx <= 0, F.lit("und"))
    for lang in sorted(hit_cols):
        detected = detected.when(hit_cols[lang] == mx, F.lit(lang))
    return docs.select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        detected.alias("detected_lang"),
        mx.alias("marker_hits"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 over the sorted distinct token set
    (set-semantics fingerprint — robust to token order/repetition).
    A windowed rolling-hash (winnowing) variant lives in dedup.py."""
    toks = simple_tokens()
    return docs.select(
        "doc_id",
        F.md5(F.to_binary(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))), F.lit("utf-8"))).alias("fp"),
    )
