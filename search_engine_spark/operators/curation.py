"""Corpus-curation operators — the steps between "crawled pages" and
"training mix" that a 100 TB data pipeline runs after quality scoring
and dedup:

* eval-set decontamination (``contamination_hits``): which documents
  contain an n-gram from a held-out benchmark/eval set — the standard
  n-gram-overlap decontamination check (cf. GPT-3 App. C / PaLM:
  13-gram collision against eval sets).
* cross-document duplicated-gram fraction (``crossdoc_dup_grams``):
  per doc, what share of its n-grams also occur in OTHER documents —
  the corpus-level twin of paragraph/line dedup for corpora whose
  documents carry no line structure.
* cross-document line dedup (``dedup_lines``): remove every line that
  occurs verbatim in >= ``min_docs`` distinct documents — the
  CCNet/RefinedWeb boilerplate pass (nav bars, cookie banners,
  footers) that runs line-wise BEFORE document-level near-dup.
* training-mix manifest (``training_mix``): the end-to-end
  composition quality-filter ∧ dedup-keep-list ∧ deterministic
  stratified sample — the final "which docs go in the run" cut.

Scale shape (100 TB):
- every operator starts from the shared ZERO-shuffle shingle kernel
  (``dedup.shingle_rows``) — tokenize runs once per doc in Arrow.
- ``contamination_hits`` joins the corpus grams against the eval-gram
  set; eval sets are tiny next to the corpus (1e5-1e7 grams), so the
  join side is broadcast and the whole check is one map-side pass +
  one per-doc groupBy.  No corpus self-join anywhere.
- ``crossdoc_dup_grams`` is two shuffles on the gram key (df count +
  join back), both with map-side partial aggregation; the shingle
  frame is persisted once per campaign (``dedup._shared_shingles``)
  so multi-branch plans never re-tokenize.
- ``training_mix`` is filters all the way down: the quality flags are
  one Arrow pass, the keep-list anti-join keys on doc_id with NO
  forced broadcast (web-crawl near-dup drop rates run 30-80% of
  documents, so the drop side is corpus-scale — AQE picks the join
  strategy at runtime, exactly like the city semi-join in
  searcher.py), and the sample is a pure codegen hash filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import (
    DEFAULT_SHINGLE,
    _shared_shingles,
    dedup_clusters,
    near_dup_pairs,
    shingle_rows,
)
from .webquality import gopher_quality, sample_stratified

DEFAULT_CONTAM_NGRAM = 8    # realistic eval-set gram width (GPT-3 uses 13)


def contamination_hits(docs: DataFrame, eval_grams: DataFrame,
                       n: int = DEFAULT_CONTAM_NGRAM,
                       gram_col: str = "gram",
                       broadcast_eval: bool = True) -> DataFrame:
    """Per-document eval-set n-gram overlap: for every doc sharing at
    least one n-gram with ``eval_grams``, emit
    ``(doc_id, n_grams, n_hit, hit_frac)``.

    ``eval_grams`` is any frame with a column of token-normalized
    grams (space-joined lowercase tokens — the exact shingle form of
    ``dedup.shingle_rows``).  Clean docs are not emitted: at corpus
    scale the output must be |contaminated|, not |corpus|.

    ``broadcast_eval=True`` (default) broadcasts the eval grams —
    right whenever the eval set fits an executor (every real eval
    set); pass False for a pathologically large eval side and let AQE
    pick the join.

    The corpus shingles feed TWO branches (totals + hits); the shared
    persisted frame (``dedup._shared_shingles``, keyed by corpus and
    gram width) computes the tokenize kernel once — unpersisted, each
    branch would re-run the full-corpus pass."""
    sh = _shared_shingles(docs, n)
    ev = eval_grams.select(F.col(gram_col).alias("s")).distinct()
    if broadcast_eval:
        ev = F.broadcast(ev)
    # shingle_rows emits DISTINCT (doc_id, s), so count(*) == count of
    # distinct grams on both branches
    totals = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = sh.join(ev, "s").groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        hits.join(totals, "doc_id")
        .select(
            "doc_id", "n_grams", "n_hit",
            F.round(F.col("n_hit") / F.col("n_grams"), 6).alias("hit_frac"),
        )
    )


def contamination_hits_bloom(docs: DataFrame, eval_grams: DataFrame,
                             n: int = DEFAULT_CONTAM_NGRAM,
                             gram_col: str = "gram",
                             m_bits: int = 1 << 20,
                             k_hashes: int = 5) -> DataFrame:
    """:func:`contamination_hits` with a Bloom semi-join reduction —
    the form for eval sets too large to broadcast.  Instead of
    shipping the eval-gram SET to every task, ship its Bloom filter
    (the sparse set-bit list, KBs): k broadcast-hash semi-joins drop
    the overwhelming majority of corpus grams MAP-SIDE (no exchange
    of the shingle stream, and no false negatives — nothing real is
    lost), then only the surviving sliver meets the exact eval set in
    an AQE-planned join whose probe side is |true hits| + |false
    positives| (~(1 - e^{-k·n/m})^k of the corpus) instead of every
    gram.  Output is bit-identical to :func:`contamination_hits` —
    the prefilter passes a superset of true hits and the exact join
    settles it — so the SAME oracle pins both forms."""
    from .sketches import _col_expr, bloom_bits

    sh = _shared_shingles(docs, n)
    ev = eval_grams.select(F.col(gram_col).alias("s")).distinct()
    bits = bloom_bits(ev, key_col="s", m_bits=m_bits, k_hashes=k_hashes)
    cand = sh
    for i in range(k_hashes):
        probe = bits.withColumnRenamed("bit", f"_b{i}")
        cand = cand.join(
            F.broadcast(probe),
            _col_expr("s", i, m_bits) == F.col(f"_b{i}"),
            "left_semi",
        )
    totals = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    # exact verify on the survivors only — no forced broadcast: the
    # whole point of the bloom form is an eval side AQE may choose to
    # shuffle, against a probe side the filter already shrank
    hits = cand.join(ev, "s").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_hit"))
    return (
        hits.join(totals, "doc_id")
        .select(
            "doc_id", "n_grams", "n_hit",
            F.round(F.col("n_hit") / F.col("n_grams"), 6).alias("hit_frac"),
        )
    )


def eval_grams_from_docs(docs: DataFrame, n: int = DEFAULT_CONTAM_NGRAM) -> DataFrame:
    """Distinct gram set of a (small) doc frame in the shingle form
    ``contamination_hits`` consumes — how a benchmark's question/answer
    texts become the eval-gram table."""
    return shingle_rows(docs, n=n).select(F.col("s").alias("gram")).distinct()


def crossdoc_dup_grams(docs: DataFrame, n: int = DEFAULT_SHINGLE) -> DataFrame:
    """Per-document cross-corpus duplication: ``(doc_id, n_grams,
    n_dup_grams, dup_frac)`` where a gram is "dup" iff it appears in
    more than one document.  The corpus-level signal line/paragraph
    dedup thresholds on (a doc that is mostly other documents' text is
    boilerplate or a template farm)."""
    sh = _shared_shingles(docs, n)
    gdf = sh.groupBy("s").agg(F.count(F.lit(1)).alias("gram_df"))
    return (
        sh.join(gdf, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("gram_df") > 1, 1).otherwise(0)).cast("long").alias("n_dup_grams"),
        )
        .withColumn("dup_frac", F.round(F.col("n_dup_grams") / F.col("n_grams"), 6))
    )


def dedup_lines(docs: DataFrame, min_docs: int = 30,
                text_col: str = "text",
                line_key: str = "digest") -> DataFrame:
    """Cross-document line-level dedup (boilerplate removal): drop
    every line that occurs verbatim in >= ``min_docs`` DISTINCT
    documents, preserving the order of the surviving lines.  Output:
    ``(doc_id, clean_text, n_removed, n_lines)`` — one row per input
    doc (a doc that is ALL boilerplate survives with an empty
    ``clean_text``, so downstream length filters see it).

    This is the line-wise pass of CCNet / RefinedWeb ("remove any
    line shared by many pages") that strips nav bars, cookie banners
    and footers BEFORE document-level near-dup — the reference engine
    has no counterpart (it indexes pages whole, ReadFile.java).

    Scale shape (100 TB): posexplode is a codegen Generate (no UDF,
    no shuffle); the boilerplate set is two key-partitioned hash aggs
    (distinct (line, doc_id), then count per line — both with
    map-side partial aggregation, never a corpus-wide window); the
    mark join carries NO broadcast hint — at web scale the
    boilerplate side is large (AQE decides).  Reassembly is one
    groupBy on doc_id.  Blank lines count as lines: if blanks appear
    in >= min_docs docs they are removed like any other boilerplate.

    ``line_key`` picks the distinct/count/mark-join exchange key:

    * ``"digest"`` (default, the production setting) — a 128-bit md5
      of the line.  Web boilerplate lines are long (cookie banners,
      nav bars), and the key is what every exchange MOVES; 32 bytes
      per row regardless of line length.  Identical keep-decisions
      up to an md5 collision (~2^-64 per distinct line pair).
    * ``"text"`` — the raw line, byte-exact by construction; what the
      driver's SQL oracle row pins (the digest variant is
      equivalence-pinned against it in pytest and the
      ``dedup_lines_digest`` driver row)."""
    if line_key not in ("digest", "text"):
        raise ValueError(f"line_key must be 'digest' or 'text', got {line_key!r}")
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    if line_key == "digest":
        lines = lines.withColumn("lk", F.md5("line"))
        key = "lk"
    else:
        key = "line"
    boiler = (
        lines.select(key, "doc_id").distinct()
        .groupBy(key).agg(F.count(F.lit(1)).alias("line_df"))
        .filter(F.col("line_df") >= min_docs)
        .select(key, F.lit(True).alias("is_b"))
    )
    flagged = lines.join(boiler, key, "left")
    kept_lines = F.transform(
        F.filter(
            F.array_sort(F.collect_list(F.struct("pos", "line", "is_b"))),
            lambda x: x["is_b"].isNull(),
        ),
        lambda x: x["line"],
    )
    return flagged.groupBy("doc_id").agg(
        F.array_join(kept_lines, "\n").alias("clean_text"),
        F.sum(F.when(F.col("is_b"), 1).otherwise(0)).cast("long").alias("n_removed"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


def synthetic_lined(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic line structure over a flat (doc_id, text) corpus
    for exercising ``dedup_lines`` — the testdata documents carry no
    newlines.  Four lines per doc: a constant nav header (boilerplate
    in every doc), a section banner shared by doc_id%5 (boilerplate at
    any corpus size >= 5*min_docs), the original body (unique), and a
    long-tail notice keyed on doc_id%997 (~|corpus|/997 docs each —
    BELOW a min_docs=30 cut at every test scale, so it must survive).
    Mirrored byte-for-byte by DUCKDB_LINED_SQL."""
    d = F.col("doc_id")
    return docs.withColumn(
        text_col,
        F.concat_ws(
            "\n",
            F.lit("nav home about contact"),
            F.concat(F.lit("section "), (d % 5).cast("string")),
            F.col(text_col),
            F.concat(F.lit("notice "), (d % 997).cast("string")),
        ),
    )


# The DuckDB twin of synthetic_lined over the pre-registered
# ``documents`` view — keep in lockstep with the Spark expression.
DUCKDB_LINED_SQL = """
SELECT doc_id,
       'nav home about contact' || chr(10) ||
       'section ' || (doc_id % 5) || chr(10) ||
       text || chr(10) ||
       'notice ' || (doc_id % 997) AS text
FROM documents
"""


# ---------------------------------------------------------------------------
# C4-style per-document line cleaning (Raffel et al. 2020, §2.2 —
# the published rule set every webtext pipeline starts from).  The
# cross-document pass (dedup_lines) removes shared boilerplate; this
# pass removes lines that are junk on their own.

C4_MIN_WORDS = 3        # "only retained lines that contained at least
C4_MIN_KEPT = 3         #  3 words" / "at least 3 sentences" per doc
C4_BAD_RE = "(?i)(javascript|lorem ipsum)"
C4_PUNCT_RE = '[.!?"]$'  # line must end in terminal punctuation


def c4_keep_expr(line: Column) -> Column:
    """The C4 line-retention predicate as one codegen boolean: after
    trimming, the line ends in terminal punctuation, has >= 3
    whitespace words, mentions neither javascript nor lorem ipsum
    (case-insensitive), and carries no curly brace (the code
    tell).  Spelled a second time in :func:`duckdb_c4_keep_sql`;
    regexes stay in the Java/RE2-shared dialect ((?i) inline flag,
    char classes — no lookaround)."""
    t = F.trim(line)
    return (
        t.rlike(C4_PUNCT_RE)
        & (F.size(F.split(t, r"\s+")) >= C4_MIN_WORDS)
        & ~t.rlike(C4_BAD_RE)
        & ~line.contains("{")
    )


def c4_clean(docs: DataFrame, col: str = "text") -> DataFrame:
    """All input columns + ``n_lines``/``n_kept`` (BIGINT), the
    C4-cleaned text (kept lines re-joined), and ``kept_doc`` — False
    when fewer than 3 lines survive (C4 drops the whole page then).
    One map-only projection: the split / higher-order filter /
    re-join all ride the scan — ZERO shuffles, no UDF."""
    lines = F.split(F.col(col), "\n")
    kept = F.filter(lines, lambda line: c4_keep_expr(line))
    return docs.select(
        "*",
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        (F.size(kept) >= C4_MIN_KEPT).alias("kept_doc"),
        F.array_join(kept, "\n").alias("cleaned"),
    )


def synthetic_c4(docs: DataFrame, col: str = "text") -> DataFrame:
    """Deterministic line structure exercising EVERY C4 rule (the
    testdata text is newline-free): per doc a keeper sentence, a
    word-count reject, the body (punctuation appended -> keeper), a
    javascript reject, a doc_id%3-switched lorem-ipsum reject /
    third keeper (toggles the kept_doc threshold), a curly-brace
    reject, and a no-terminal-punctuation reject.  Mirrored
    byte-for-byte by DUCKDB_SYNTH_C4_SQL."""
    d = F.col("doc_id")
    return docs.withColumn(
        col,
        F.concat_ws(
            "\n",
            F.concat(F.lit("This sentence number "), (d % 100).cast("string"),
                     F.lit(" is long enough to keep.")),
            F.lit("Too short."),
            F.concat(F.col(col), F.lit(".")),
            F.lit("Enable javascript to view this page properly."),
            F.when(d % 3 == 0, F.lit("lorem ipsum dolor sit amet."))
            .otherwise(F.lit("Another perfectly fine sentence appears here!")),
            F.lit("function() { return 1; }"),
            F.lit("no terminal punctuation on this line"),
        ),
    )


DUCKDB_SYNTH_C4_SQL = """
SELECT doc_id,
       'This sentence number ' || (doc_id % 100) || ' is long enough to keep.'
       || chr(10) || 'Too short.'
       || chr(10) || text || '.'
       || chr(10) || 'Enable javascript to view this page properly.'
       || chr(10) || CASE WHEN doc_id % 3 = 0
                          THEN 'lorem ipsum dolor sit amet.'
                          ELSE 'Another perfectly fine sentence appears here!'
                     END
       || chr(10) || 'function() { return 1; }'
       || chr(10) || 'no terminal punctuation on this line' AS text
FROM documents
"""


def duckdb_c4_keep_sql(line: str) -> str:
    """RE2 side of :func:`c4_keep_expr` (same predicate, same
    regexes)."""
    return (
        f"(regexp_matches(trim({line}), '{C4_PUNCT_RE}')"
        f" AND len(regexp_split_to_array(trim({line}), '\\s+')) >= {C4_MIN_WORDS}"
        f" AND NOT regexp_matches(trim({line}), '{C4_BAD_RE}')"
        f" AND NOT contains({line}, chr(123)))"
    )


def training_mix(docs: DataFrame, rates: dict[str, float], salt: str,
                 default_rate: float = 0.0,
                 near_dup_threshold: float = 0.5) -> DataFrame:
    """The final curation cut, composed from the real operators:

    keep a document iff it
      1. passes the Gopher quality rules (one Arrow pass + codegen
         flags, ``webquality.gopher_quality``),
      2. is not a DISCARDED member of a near-dup cluster (MinHash+LSH
         candidates -> Jaccard verify -> connected-components
         keep-list, ``dedup.dedup_clusters`` — the cluster minimum
         survives), and
      3. falls under its language's deterministic hash-sample rate
         (``webquality.sample_stratified``).

    Output: the manifest ``(doc_id, lang, source, bucket)``.  Every
    stage is a filter — the corpus is scanned, never self-joined.
    The drop-list anti-join carries NO broadcast hint: on real crawls
    near-dup drop rates reach 30-80% of documents (the drop side is
    corpus-scale), so a forced broadcast would OOM the driver at the
    target scale; AQE / autoBroadcastJoinThreshold picks the strategy
    (it still broadcasts when the list happens to be small, as on
    this synthetic corpus)."""
    quality_pass = gopher_quality(docs).filter(F.col("passes")).select("doc_id")
    drop = (
        dedup_clusters(near_dup_pairs(docs, threshold=near_dup_threshold))
        .filter(~F.col("keep"))
        .select("doc_id")
    )
    sampled = sample_stratified(
        docs.select("doc_id", "lang", "source"),
        rates=rates, salt=salt, default_rate=default_rate,
    )
    return (
        sampled.join(quality_pass, "doc_id")
        .join(drop, "doc_id", "left_anti")
        .select("doc_id", "lang", "source", F.col("bucket").cast("long").alias("bucket"))
    )


DEFAULT_SPAN_NGRAM = 50     # Lee et al. 2021's 50-token span threshold


def strip_dup_spans(docs: DataFrame, n: int = DEFAULT_SPAN_NGRAM,
                    min_docs: int = 2, text_col: str = "text",
                    gram_key: str = "digest") -> DataFrame:
    """Cross-document SPAN removal — the text-transformation half of
    exact-substring dedup (Lee et al. 2021, "Deduplicating Training
    Data Makes Language Models Better", who cut exact repeats >= 50
    tokens with a suffix array): every token position covered by an
    ``n``-gram that occurs in >= ``min_docs`` DISTINCT documents is
    removed, and the surviving tokens re-join in order.  Output:
    ``(doc_id, clean_text, n_tokens, n_removed)`` — one row per input
    doc (a fully-duplicated doc survives with an empty ``clean_text``,
    the :func:`dedup_lines` contract).  A repeat longer than ``n``
    tokens is a run of overlapping duplicated ``n``-grams, so its
    WHOLE extent is covered — the seed-gram + position-coverage
    reading of the suffix-array pass (the same union rule as
    ``webquality.repetition_stats``' dup-gram coverage, lifted
    cross-document).  Intra-document repeats are repetition_stats'
    domain; here a gram needs ``min_docs`` distinct docs.

    Distinct from :func:`dedup_lines` (needs line structure) and
    :func:`crossdoc_dup_grams` (emits a per-doc SIGNAL, not the
    cleaned text).  No reference counterpart (ReadFile.java indexes
    pages whole).

    Scale shape (100 TB): the gram pass is pure codegen (sequence →
    transform → posexplode — no UDF); the duplicated-gram set is two
    map-side-combining key aggs (distinct (gram, doc), then the
    distinct-doc count — never a corpus window); the mark join
    carries NO broadcast hint (at web scale the duplicated-gram side
    is large; AQE decides).  Coverage is one (doc, pos) distinct;
    reassembly anti-joins the token stream and groups per doc — one
    token-level exchange, the linear-cost reassembly (a
    membership-filter form would be O(n_tok × coverage) per doc).
    ``gram_key="digest"`` (default) exchanges a 16-byte md5 instead
    of the raw n-token gram text — n=50 grams are ~300 bytes, and
    the key is what the shuffle MOVES (the dedup_lines rationale);
    ``"text"`` keeps the raw gram, what the SQL oracle row pins."""
    if n < 2:
        raise ValueError("n must be >= 2")
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2 (a 1-doc 'duplicate' "
                         "would cover every position of every doc)")
    if gram_key not in ("digest", "text"):
        raise ValueError(f"gram_key must be 'digest' or 'text', got {gram_key!r}")
    base = _span_token_base(docs, text_col)
    grams = _span_grams(base, n).select(
        "doc_id", "p0",
        (F.md5("g") if gram_key == "digest" else F.col("g")).alias("gk"))
    dup_keys = (
        grams.select("gk", "doc_id").distinct()
        .groupBy("gk").agg(F.count(F.lit(1)).alias("gram_docs"))
        .filter(F.col("gram_docs") >= min_docs)
        .select("gk")
    )
    covered = _span_coverage(grams.join(dup_keys, "gk"), n)
    return _strip_covered(base, covered)


def _span_token_base(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, toks, n_tokens) under the shared simple tokenization
    (lower, split on /[^a-z0-9]+/, drop empties) — the span operators'
    token universe, matching ``textstats.simple_tokens``."""
    return docs.select(
        "doc_id",
        F.filter(F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                         "[^a-z0-9]+"),
                 lambda x: x != F.lit("")).alias("toks"),
    ).withColumn("n_tokens", F.size("toks").cast("long"))


def _span_grams(base: DataFrame, n: int) -> DataFrame:
    """(doc_id, p0, g): one row per n-gram START position, pure
    codegen (sequence -> explode -> slice/array_join); sequence() is
    guarded — start > stop would generate a DESCENDING range."""
    return (
        base.select(
            "doc_id", "toks",
            F.explode(
                F.when(F.col("n_tokens") >= n,
                       F.sequence(F.lit(0), F.col("n_tokens") - n))
                .otherwise(F.array().cast("array<int>"))
            ).alias("p0"),
        )
        .select(
            "doc_id", "p0",
            F.array_join(F.slice("toks", F.col("p0") + 1, n), " ").alias("g"),
        )
    )


def _span_coverage(marked_grams: DataFrame, n: int) -> DataFrame:
    """(doc_id, pos) distinct: the union of the n positions under
    every marked gram start — overlapping marks coalesce."""
    return (
        marked_grams
        .select("doc_id",
                F.explode(F.sequence(F.col("p0"),
                                     F.col("p0") + n - 1)).alias("pos"))
        .distinct()
    )


def _strip_covered(base: DataFrame, covered: DataFrame) -> DataFrame:
    """Remove the covered positions and re-join survivors in order:
    anti-join the token stream + one per-doc collect_list — the
    linear reassembly (a membership-filter form would be
    O(n_tok × coverage) per doc).  Docs losing every token keep an
    empty ``clean_text`` row."""
    tokpos = base.select(
        "doc_id", F.posexplode("toks").alias("pos", "tok"))
    kept = (
        tokpos.join(covered, ["doc_id", "pos"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"]),
                " ").alias("clean_text"),
            F.count(F.lit(1)).cast("long").alias("n_kept"),
        )
    )
    return (
        base.select("doc_id", "n_tokens")
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long").alias("n_removed"),
        )
    )


def strip_contaminated_spans(docs: DataFrame, eval_grams: DataFrame,
                             n: int = DEFAULT_CONTAM_NGRAM,
                             text_col: str = "text",
                             gram_col: str = "gram",
                             broadcast_eval: bool = True) -> DataFrame:
    """Decontamination by EXCISION: cut every token span matching an
    eval-set n-gram and keep the rest of the document — the surgical
    alternative to :func:`contamination_hits`-then-drop when whole
    documents are too valuable to discard over one leaked benchmark
    sentence (the GPT-3 App. C "conservatively remove the overlapping
    portions" treatment).  Output is the :func:`strip_dup_spans`
    contract: ``(doc_id, clean_text, n_tokens, n_removed)``, one row
    per input doc.  Overlapping eval grams coalesce their coverage,
    so a leaked passage longer than ``n`` is cut in full.

    Scale shape: the same pure-codegen gram pass and linear
    reassembly as :func:`strip_dup_spans`; the mark join is a
    broadcast semi-join against the (tiny) eval-gram set — exactly
    :func:`contamination_hits`' join shape, with the same
    ``broadcast_eval=False`` escape hatch for oversized eval sets."""
    if n < 2:
        raise ValueError("n must be >= 2")
    base = _span_token_base(docs, text_col)
    grams = _span_grams(base, n)
    ev = eval_grams.select(F.col(gram_col).alias("g")).distinct()
    if broadcast_eval:
        ev = F.broadcast(ev)
    covered = _span_coverage(grams.join(ev, "g", "left_semi"), n)
    return _strip_covered(base, covered)
