"""Webtext corpus-quality operators for training-data pipelines:

* Gopher-style per-document quality stats and rule flags (word-count
  band, mean word length, top-word / top-bigram repetition, stop-word
  containment — cf. Rae et al. 2021 "Scaling Language Models" App. A)
* deterministic hash-bucket stratified sampling (per-language rates)
* per-source corpus rollup (docs / tokens / mean quality by origin)

Scale shape (100 TB):
- ``gopher_stats`` is ONE map-only Arrow pass — the tokenizer runs
  once per document inside the kernel and every metric (word counts,
  top bigram, stop-word containment) is a per-doc reduction, so the
  plan has ZERO shuffles and all downstream flags are codegen'd
  integer comparisons.  The naive relational form (explode tokens →
  groupBy(doc, token) → groupBy(doc) + a self-join for bigrams) is
  what the DuckDB oracle runs — three shuffles the kernel avoids.
- every metric is an INTEGER (counts, not fractions), and the rule
  flags compare cross-multiplied integers (``100*top_word <=
  pct*n_words``), so the exact-oracle claim never meets float
  rounding at all.
- ``sample_stratified`` is a pure codegen filter (portable md5
  bucket), deterministic and reproducible across engines/runs — the
  standard way to cut a training mix without materializing a shuffle.
- ``source_rollup`` is a single map-side-combining groupBy over the
  quality expressions.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..partitioning import balanced
from .textstats import _EN_STOPWORDS, TOKEN_SPLIT_RE, quality_score, shared_doc_tf

GOPHER_STATS_SCHEMA = (
    "doc_id long, n_words long, n_distinct long, top_word long, "
    "n_bigrams long, top_bigram long, tok_chars long, n_stop long"
)

# rule thresholds (integer percents so flags stay float-free)
MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MEAN_LEN, MAX_MEAN_LEN = 3, 10          # mean word length band
TOP_WORD_MAX_PCT = 20                        # most-frequent word <= 20%
TOP_BIGRAM_MAX_PCT = 18                      # most-frequent bigram <= 18%
MIN_STOPWORDS = 2                            # >= 2 distinct stop words


def gopher_stats(docs: DataFrame, col: str = "text") -> DataFrame:
    """Per-document integer repetition/containment metrics in one
    Arrow pass: total words, distinct words, the top word's count,
    bigram total and top bigram's count, total token characters, and
    the number of DISTINCT stop words present.

    Tokenizer is the exact twin of ``textstats.simple_tokens`` (split
    lower(text) on ``[^a-z0-9]+``, drop empties), same as
    ``dedup.shingle_rows`` — asserted identical by the DuckDB oracle's
    ``regexp_split_to_array`` CTE."""
    pat = re.compile(TOKEN_SPLIT_RE)
    stops = frozenset(_EN_STOPWORDS)
    docs = balanced(docs)

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[col]):
                toks = (
                    [t for t in pat.split(text.lower()) if t]
                    if text is not None else []
                )
                wc = Counter(toks)
                bc = Counter(zip(toks, toks[1:]))
                rows.append((
                    doc_id,
                    len(toks),
                    len(wc),
                    max(wc.values(), default=0),
                    max(len(toks) - 1, 0),
                    max(bc.values(), default=0),
                    sum(len(t) for t in toks),
                    len(stops.intersection(wc)),
                ))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_words", "n_distinct", "top_word",
                         "n_bigrams", "top_bigram", "tok_chars", "n_stop"],
            )

    return docs.select("doc_id", col).mapInPandas(batch, schema=GOPHER_STATS_SCHEMA)


def gopher_quality(docs: DataFrame) -> DataFrame:
    """Gopher-rule quality flags over :func:`gopher_stats` — every
    flag an integer comparison (cross-multiplied percents), composed
    declaratively so Catalyst codegens the whole thing on top of the
    single Arrow stats pass."""
    s = gopher_stats(docs)
    ok_words = F.col("n_words").between(MIN_WORDS, MAX_WORDS)
    ok_mean_len = (
        (F.lit(MIN_MEAN_LEN) * F.col("n_words") <= F.col("tok_chars"))
        & (F.col("tok_chars") <= F.lit(MAX_MEAN_LEN) * F.col("n_words"))
    )
    ok_top_word = F.lit(100) * F.col("top_word") <= F.lit(TOP_WORD_MAX_PCT) * F.col("n_words")
    ok_top_bigram = (F.col("n_bigrams") == 0) | (
        F.lit(100) * F.col("top_bigram") <= F.lit(TOP_BIGRAM_MAX_PCT) * F.col("n_bigrams")
    )
    ok_stop = F.col("n_stop") >= MIN_STOPWORDS
    return s.select(
        "*",
        ok_words.alias("ok_words"),
        ok_mean_len.alias("ok_mean_len"),
        ok_top_word.alias("ok_top_word"),
        ok_top_bigram.alias("ok_top_bigram"),
        ok_stop.alias("ok_stop"),
        (ok_words & ok_mean_len & ok_top_word & ok_top_bigram & ok_stop).alias("passes"),
    )


REP_STATS_SCHEMA = (
    "doc_id long, n_lines long, n_dup_lines long, line_chars long, "
    "dup_line_chars long, tot_chars long, "
    "top2_chars long, top3_chars long, top4_chars long, "
    "dup5_chars long, dup6_chars long, dup7_chars long, "
    "dup8_chars long, dup9_chars long, dup10_chars long"
)

# Gopher repetition thresholds (Rae et al. 2021, Table A1), integer
# percents so every flag is a cross-multiplied BIGINT comparison
DUP_LINE_MAX_PCT = 30          # fraction of lines that are duplicates
DUP_LINE_CHAR_MAX_PCT = 20     # chars inside duplicate line occurrences
TOP_NGRAM_MAX_PCT = {2: 20, 3: 18, 4: 16}
DUP_NGRAM_MAX_PCT = {5: 15, 6: 14, 7: 13, 8: 12, 9: 11, 10: 10}


def repetition_stats(docs: DataFrame, col: str = "text") -> DataFrame:
    """Per-document Gopher REPETITION signals (Rae et al. 2021,
    App. A "repetition removal") in one map-only Arrow pass — the
    other half of :func:`gopher_stats`' quality rules:

    * duplicate lines: ``n_dup_lines`` = line occurrences beyond the
      first of an identical line within the SAME doc, and
      ``dup_line_chars`` = the characters inside those occurrences
      (Gopher bounds both fractions; cross-doc boilerplate is the
      separate ``curation.dedup_lines`` pass)
    * top n-gram containment, n = 2..4: ``top{n}_chars`` =
      occurrences x token-chars of the most frequent n-gram (ties:
      the largest such product among max-count grams — an integer
      max, so engine-order-free)
    * duplicate n-gram coverage, n = 5..10: ``dup{n}_chars`` = token
      characters at positions covered by ANY n-gram occurring more
      than once in the doc (position-coverage union, so overlapping
      repeats are not double-counted — the datatrove/NeMo reading of
      the Gopher metric)

    All outputs are exact BIGINTs (counts and character sums, never
    fractions); :func:`repetition_quality` turns them into the
    published threshold flags via cross-multiplied integer
    comparisons.  Lines split on newline; tokens are the shared
    simple tokenizer (lower, ``[^a-z0-9]+``, drop empties) — both
    stated identically in the DuckDB oracle.

    Scale shape: ZERO shuffles — every metric is a per-doc reduction
    inside the Arrow kernel riding the scan; the relational
    equivalent (three gram explodes + per-doc windows) is what the
    oracle runs."""
    pat = re.compile(TOKEN_SPLIT_RE)
    docs = balanced(docs)

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[col]):
                text = text or ""
                lines = [ln for ln in text.split("\n") if ln != ""]
                lc = Counter(lines)
                n_lines = len(lines)
                n_dup_lines = n_lines - len(lc)
                line_chars = sum(len(ln) for ln in lines)
                dup_line_chars = sum((c - 1) * len(ln)
                                     for ln, c in lc.items() if c > 1)
                toks = [t for t in pat.split(text.lower()) if t]
                lens = [len(t) for t in toks]
                tot_chars = sum(lens)
                tops = {}
                for n in (2, 3, 4):
                    grams = Counter(
                        tuple(toks[i:i + n])
                        for i in range(len(toks) - n + 1))
                    if not grams:
                        tops[n] = 0
                        continue
                    mx = max(grams.values())
                    tops[n] = max(
                        c * sum(len(t) for t in g)
                        for g, c in grams.items() if c == mx)
                dups = {}
                for n in (5, 6, 7, 8, 9, 10):
                    starts: dict[tuple, list[int]] = {}
                    for i in range(len(toks) - n + 1):
                        starts.setdefault(tuple(toks[i:i + n]), []).append(i)
                    covered: set[int] = set()
                    for g, pos in starts.items():
                        if len(pos) > 1:
                            for p in pos:
                                covered.update(range(p, p + n))
                    dups[n] = sum(lens[i] for i in covered)
                rows.append((
                    doc_id, n_lines, n_dup_lines, line_chars,
                    dup_line_chars, tot_chars,
                    tops[2], tops[3], tops[4],
                    dups[5], dups[6], dups[7], dups[8], dups[9], dups[10],
                ))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_lines", "n_dup_lines", "line_chars",
                "dup_line_chars", "tot_chars",
                "top2_chars", "top3_chars", "top4_chars",
                "dup5_chars", "dup6_chars", "dup7_chars",
                "dup8_chars", "dup9_chars", "dup10_chars",
            ])

    return docs.select("doc_id", col).mapInPandas(batch, schema=REP_STATS_SCHEMA)


def repetition_quality(docs: DataFrame, col: str = "text") -> DataFrame:
    """Gopher repetition-removal flags over :func:`repetition_stats`:
    one boolean per published rule plus the conjunction, every
    comparison a cross-multiplied BIGINT (float-free).  An empty doc
    (no tokens) fails the conjunction, mirroring gopher_quality's
    word-count floor."""
    s = repetition_stats(docs, col)
    ok_dup_lines = (F.lit(100) * F.col("n_dup_lines")
                    <= F.lit(DUP_LINE_MAX_PCT) * F.col("n_lines"))
    ok_dup_line_chars = (F.lit(100) * F.col("dup_line_chars")
                         <= F.lit(DUP_LINE_CHAR_MAX_PCT) * F.col("line_chars"))
    flags = [ok_dup_lines.alias("ok_dup_lines"),
             ok_dup_line_chars.alias("ok_dup_line_chars")]
    conj = ok_dup_lines & ok_dup_line_chars & (F.col("tot_chars") > 0)
    for n, pct in TOP_NGRAM_MAX_PCT.items():
        ok = (F.lit(100) * F.col(f"top{n}_chars")
              <= F.lit(pct) * F.col("tot_chars"))
        flags.append(ok.alias(f"ok_top{n}"))
        conj = conj & ok
    for n, pct in DUP_NGRAM_MAX_PCT.items():
        ok = (F.lit(100) * F.col(f"dup{n}_chars")
              <= F.lit(pct) * F.col("tot_chars"))
        flags.append(ok.alias(f"ok_dup{n}"))
        conj = conj & ok
    return s.select("doc_id", *flags, conj.alias("passes_repetition"))


def sample_bucket(salt: str) -> F.Column:
    """Deterministic per-doc bucket in [0, 1e6): first 8 hex chars of
    md5(doc_id ':' salt) as an int — the md5-prefix trick DuckDB
    evaluates identically (``('0x'||substr(md5(..),1,8))::BIGINT``),
    so sampling decisions are reproducible across engines."""
    h = F.md5(F.to_binary(
        F.concat_ws(":", F.col("doc_id").cast("string"), F.lit(salt)),
        F.lit("utf-8"),
    ))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 1_000_000).alias("bucket")


def sample_stratified(docs: DataFrame, rates: dict[str, float],
                      salt: str = "r3", default_rate: float = 0.0,
                      strata_col: str = "lang") -> DataFrame:
    """Deterministic stratified sample: keep a document iff its hash
    bucket falls under its stratum's rate — how a training mix is cut
    per language/source without a shuffle or an RNG state.  Pure
    codegen filter; same doc set on every engine, run, and cluster
    size."""
    rate_micros = F.lit(int(round(default_rate * 1_000_000)))
    for stratum, rate in sorted(rates.items()):
        rate_micros = (
            F.when(F.col(strata_col) == stratum, F.lit(int(round(rate * 1_000_000))))
            .otherwise(rate_micros)
        )
    return (
        docs.withColumn("bucket", sample_bucket(salt))
        .filter(F.col("bucket") < rate_micros)
    )


SURPRISAL_HEAD_PCT = 95     # bucket boundaries as integer percents of
SURPRISAL_TAIL_PCT = 105    # the corpus-mean surprisal


def unigram_surprisal(docs: DataFrame) -> DataFrame:
    """Per-doc mean surprisal under the corpus's OWN unigram LM —
    the self-contained stand-in for CCNet-style LM-perplexity quality
    scoring: p(tok) = cf(tok)/total_tokens over the corpus,
    surprisal = -mean log2 p over the doc's tokens.

    Shape: one explode + (doc, tok) agg, a corpus-level cf agg, and
    the tf ⋈ cf join — the exact shape of the BM25 idf join, so at
    production scale the cf table IS the index dictionary (no extra
    corpus pass).  The tf frame is the PERSISTED shared one
    (textstats.shared_doc_tf): the total/mean scalar aggs and the
    final consumer all reuse it instead of re-tokenizing the corpus
    per action.  Low surprisal = repetitive/templated text, high =
    OOV-ish noise; both tails are what a perplexity filter cuts."""
    tf = shared_doc_tf(docs)
    cf = tf.groupBy("tok").agg(F.sum("tf").alias("cf"))
    total = int(cf.agg(F.sum("cf")).first()[0] or 0)
    return (
        tf.join(cf, "tok")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            (F.sum(F.col("tf") * -F.log2(F.col("cf") / F.lit(float(total))))
             / F.sum("tf")).alias("s_raw"),
        )
    )


def surprisal_buckets(docs: DataFrame) -> DataFrame:
    """Head/middle/tail bucketing of :func:`unigram_surprisal`
    relative to the CORPUS MEAN surprisal — the distributed form of
    perplexity-bucket filtering without a global sort (a quantile
    ntile would be a single-partition window; a mean threshold is one
    scalar agg).

    Exactness: surprisal and the mean are half-up-rounded to a 1e-6
    integer grid (micro-units) BEFORE the integer cross-multiplied
    comparisons, so the bucket decision is bit-identical across
    engines — no float boundary can flip it."""
    s = unigram_surprisal(docs)
    micro = F.floor(F.col("s_raw") * 1_000_000 + 0.5).cast("long")
    s = s.withColumn("s_micro", micro)
    mean_micro = int(s.agg(
        F.floor(F.avg("s_micro") + 0.5).cast("long")
    ).first()[0] or 0)
    head = F.lit(100) * F.col("s_micro") < F.lit(SURPRISAL_HEAD_PCT * mean_micro)
    tail = F.lit(100) * F.col("s_micro") > F.lit(SURPRISAL_TAIL_PCT * mean_micro)
    return s.select(
        "doc_id", "n_tokens",
        (F.col("s_micro") / 1_000_000).alias("surprisal"),
        F.when(head, "head").when(tail, "tail").otherwise("middle").alias("bucket"),
    )


def source_rollup(docs: DataFrame) -> DataFrame:
    """Per-(source, lang) corpus rollup — document count, total
    tokens, mean quality — the aggregate view a domain-level filter
    ranks origins by.  One map-side-combining groupBy.

    The mean is computed ON THE INTEGER MICRO GRID: per-row quality
    sits exactly on a 1e-6 grid, so ``floor(q*1e6 + 0.5)`` recovers
    its integer exactly, the BIGINT sum is order-independent, and the
    half-up 4dp average is pure integer arithmetic
    (``(2*sum + 100*n) div (200*n)``) — a float ``round(avg(q), 4)``
    flips when a group's true mean lands ON a grid edge and the two
    engines' differently-ordered double sums straddle it (observed at
    sf0.001: one (source, lang) group hit exactly x.xxxx5)."""
    per_doc = quality_score(docs, keep=("source", "lang"))
    agg = per_doc.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum(F.floor(F.col("quality") * 1e6 + F.lit(0.5)).cast("long"))
        .alias("q_micro"),
    )
    return agg.select(
        "source", "lang", "n_docs", "total_tokens",
        (F.expr("(2*q_micro + 100*n_docs) div (200*n_docs)") / F.lit(1e4))
        .alias("avg_quality"),
    )
