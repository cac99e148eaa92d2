"""PII scrubbing — mask personal identifiers before a web corpus is
used as training data (the redaction pass every published webtext
pipeline runs after quality filtering and before tokenization; the
reference engine has no counterpart — its corpus is pre-cleaned TREC
text, ReadFile.java reads it verbatim).

Three rule classes, applied in a FIXED order (email -> ipv4 -> phone)
so the output is deterministic even where patterns could overlap
(``user@192.168.1.1``: the email rule skips it — a TLD must be
letters — then the ipv4 rule masks the address part):

* ``email``  — ``local@domain.tld`` with a >=2-letter TLD;
* ``ipv4``   — four dot-separated 1-3 digit octets on word
  boundaries (no range check: 999.1.1.1 is still somebody's typo'd
  address and should not survive scrubbing);
* ``phone``  — NANP-shaped ``NNN-NNN-NNNN`` / ``NNN.NNN.NNNN`` on
  word boundaries.

Counts are measured on the ORIGINAL text (each rule independently),
the scrubbed text applies the rules sequentially — both choices are
part of the spec and mirrored verbatim in the DuckDB oracle
(``duckdb_scrub_sql``/``duckdb_count_sql``).

Dialect parity (Spark = Java regex, DuckDB = RE2): the patterns use
only the shared subset — character classes, bounded repetition,
``\\b`` word boundaries; no lookaround, no backreferences (RE2 has
neither), and both engines resolve alternation/greediness
leftmost-first.  Java's ``\\b`` is Unicode-word-aware where RE2's is
ASCII, so the two could disagree on a digit adjacent to a non-ASCII
letter — irrelevant for the ASCII testdata and called out here so a
Unicode corpus knows to pre-fold.

Scale shape (100 TB): ``scrub_pii``/``pii_stats`` are pure codegen
projections (regexp_replace / regexp_extract_all ride the parquet
scan) — ZERO shuffles, no UDF, no Python; the only aggregation in
``pii_rollup`` is one map-side-combining groupBy on the bounded
``source`` key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, mask) — ORDER IS THE SPEC: replacements cascade in
# this sequence in both engines.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
)


def scrub_expr(col: Column) -> Column:
    """The masked text as one codegen expression chain."""
    out = col
    for _name, pat, mask in PII_RULES:
        out = F.regexp_replace(out, pat, mask)
    return out


def count_expr(col: Column, pattern: str) -> Column:
    """BIGINT match count of ``pattern`` in ``col`` (group idx 0 —
    the rules carry no capture groups)."""
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0))).cast("long")


def scrub_pii(docs: DataFrame, col: str = "text") -> DataFrame:
    """All input columns + per-rule BIGINT counts (``n_email``,
    ``n_ipv4``, ``n_phone``, measured on the original text) +
    ``scrubbed`` (the masked text).  One map-only projection."""
    c = F.col(col)
    return docs.select(
        "*",
        *[count_expr(c, pat).alias(f"n_{name}") for name, pat, _m in PII_RULES],
        scrub_expr(c).alias("scrubbed"),
    )


def pii_rollup(docs: DataFrame, col: str = "text",
               by: str = "source") -> DataFrame:
    """Corpus accounting: per ``by``-group document count, documents
    carrying any PII, and total matches per rule — the report a
    pipeline reads before deciding whether a source needs the scrub
    at all.  One groupBy on a bounded key."""
    s = scrub_pii(docs, col)
    hit = sum((F.col(f"n_{n}") for n, _p, _m in PII_RULES), F.lit(0))
    return (
        s.groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((hit > 0).cast("long")).alias("n_docs_with_pii"),
            *[F.sum(f"n_{name}").alias(f"tot_{name}")
              for name, _p, _m in PII_RULES],
        )
    )


def synthetic_pii(docs: DataFrame, col: str = "text") -> DataFrame:
    """Deterministic PII injection for tests/oracles — the testdata
    text carries no addresses, so each doc gets one email, one ipv4
    and one phone derived from ``doc_id`` appended (mirrored in
    ``DUCKDB_SYNTH_PII_SQL``).  ``doc_id % 7 == 0`` docs stay clean
    so the zero-count path is exercised too."""
    d = F.col("doc_id")
    tail = F.concat(
        F.lit(" contact user"), d.cast("string"), F.lit("@example.com"),
        F.lit(" from 10."), (d % 224).cast("string"),
        F.lit("."), (d % 256).cast("string"),
        F.lit("."), (1 + d % 254).cast("string"),
        F.lit(" call 555-"), F.lpad((d % 1000).cast("string"), 3, "0"),
        F.lit("-"), F.lpad((d % 10000).cast("string"), 4, "0"),
    )
    injected = F.when(d % 7 == 0, F.col(col)).otherwise(
        F.concat(F.col(col), tail))
    return docs.withColumn(col, injected)


# ---------------------------------------------------------------------------
# DuckDB oracle halves (RE2) — the same spec, written a second time.

DUCKDB_SYNTH_PII_SQL = """
SELECT doc_id, source,
       CASE WHEN doc_id % 7 = 0 THEN text
            ELSE text || ' contact user' || CAST(doc_id AS VARCHAR)
                 || '@example.com from 10.' || CAST(doc_id % 224 AS VARCHAR)
                 || '.' || CAST(doc_id % 256 AS VARCHAR)
                 || '.' || CAST(1 + doc_id % 254 AS VARCHAR)
                 || ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                 || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       END AS text
FROM documents
"""


def duckdb_scrub_sql(col: str) -> str:
    """RE2 side of :func:`scrub_expr` (global replace per rule, same
    cascade order)."""
    out = col
    for _name, pat, mask in PII_RULES:
        out = f"regexp_replace({out}, '{pat}', '{mask}', 'g')"
    return out


def duckdb_count_sql(col: str, pattern: str) -> str:
    """RE2 side of :func:`count_expr`."""
    return f"CAST(len(regexp_extract_all({col}, '{pattern}')) AS BIGINT)"
