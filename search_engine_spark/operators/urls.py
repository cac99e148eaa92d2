"""URL-level curation operators — the steps a Common-Crawl-scale
pipeline runs BEFORE content dedup, keyed on the crawl table's own
``(url, warc_ts)`` columns (BASELINE input-hint shape; the reference
engine identifies documents by their DOCNO the same way,
ReadFile.java:80-95 — URL hygiene is its web-corpus twin):

* ``normalize_url``: canonicalize a URL column so recrawls of the
  same resource compare equal (case-folded scheme/host, ``www.``
  and default-port stripped, fragment dropped, tracking params
  removed, remaining query params sorted, trailing slashes trimmed).
* ``url_dedup_latest``: latest-crawl-wins — for every normalized
  URL keep exactly the row with the greatest ``warc_ts`` (the
  standard WARC revisit policy), plus how many crawls it collapsed.
* ``host_rollup``: per-host corpus accounting (crawl rows, unique
  resources, recrawl ratio) with an optional blocklist anti-join.

Normalization spec (implemented twice — as Spark codegen expressions
here and as the DuckDB oracle in ``DUCKDB_NORM_SQL`` — and pinned
against each other by the driver gate and tests/test_urls.py):

1. drop ``#fragment``;
2. ``scheme`` = text before ``://`` lowercased (no ``://`` -> the
   input is returned unchanged, opaque ids pass through);
3. ``host[:port]`` = text after ``://`` up to the first ``/`` or
   ``?``, lowercased, leading ``www.`` stripped, then ``:80``
   (http) / ``:443`` (https) stripped;
4. ``path`` = up to ``?``, case preserved, trailing ``/`` runs
   trimmed; empty path -> ``/``;
5. ``query`` = ``&``-separated params minus tracking keys
   (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``, ``ref``) and
   empty pieces, sorted lexicographically, re-joined; empty -> the
   ``?`` is dropped too.

Scale shape (100 TB):
- ``normalize_url`` is a pure codegen expression chain (regexp
  extracts + a higher-order filter/sort over the split query) — it
  rides the scan, zero shuffles, usable as a partition/bucket key.
- ``url_dedup_latest`` is ONE hash aggregation on the normalized
  key (``max_by`` carries the winning row; no window sort, no
  row_number over a corpus-wide ordering) — map-side combine
  applies because max_by is associative, so the shuffle moves one
  candidate row per (partition, key), not every crawl row.
- ``host_rollup`` aggregates by host (bounded cardinality next to
  the corpus: ~1e8 hosts vs 1e12 pages); the recrawl ratio falls
  out of the same pass via ``count_distinct`` partial aggregation.
  The blocklist is a curated table (1e3-1e6 rows) anti-joined with
  NO forced broadcast — AQE picks the strategy, same policy as the
  training_mix drop-list.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tracking params stripped by rule 5 (shared by both implementations)
TRACKING_RE = "^(utm_[^=]*|fbclid|gclid|msclkid|ref)="


def _norm_expr(url: Column) -> Column:
    nofrag = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, "^([^:/?#]+)://", 1))
    rest = F.regexp_replace(nofrag, "^[^:/?#]+://", "")
    hostport = F.lower(F.regexp_extract(rest, "^([^/?]*)", 1))
    host = F.regexp_replace(hostport, "^www\\.", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    pathq = F.regexp_replace(rest, "^[^/?]*", "")
    path = F.regexp_extract(pathq, "^([^?]*)", 1)
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    rawq = F.regexp_replace(pathq, "^[^?]*\\??", "")
    canonq = F.array_join(
        F.array_sort(
            F.filter(
                F.split(rawq, "&"),
                lambda p: (p != "") & ~p.rlike(TRACKING_RE),
            )
        ),
        "&",
    )
    normed = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(canonq == "", F.lit("")).otherwise(F.concat(F.lit("?"), canonq)),
    )
    return F.when(scheme == "", url).otherwise(normed)


def normalize_url(pages: DataFrame, url_col: str = "url",
                  out_col: str = "norm_url") -> DataFrame:
    """Rule 1-5 canonicalization as a zero-shuffle codegen column."""
    return pages.withColumn(out_col, _norm_expr(F.col(url_col)))


def url_dedup_latest(pages: DataFrame, url_col: str = "url",
                     ts_col: str = "warc_ts") -> DataFrame:
    """Latest-crawl-wins per normalized URL:
    ``(norm_url, url, warc_ts, n_crawls)`` where ``url``/``warc_ts``
    belong to the most recent crawl (ties on ``warc_ts`` broken by
    the greatest raw ``url`` so the winner is total-ordered).  One
    hash aggregation — ``max_by`` on the (ts, url) struct instead of
    a row_number window, so partial aggregation runs map-side."""
    pick = F.struct(F.col(ts_col), F.col(url_col))
    return (
        normalize_url(pages, url_col)
        .groupBy("norm_url")
        .agg(
            F.max_by(F.col(url_col), pick).alias(url_col),
            F.max(F.col(ts_col)).alias(ts_col),
            F.count(F.lit(1)).cast("long").alias("n_crawls"),
        )
    )


def host_of(norm_url: Column) -> Column:
    """Host of an ALREADY-NORMALIZED url — one regexp over the
    canonical form (rules 2-3 ran once in :func:`_norm_expr`; a
    second raw-URL parse here would be a third copy of those rules to
    keep in sync, and wasted scan work).  No-scheme pass-throughs
    yield ''."""
    return F.regexp_extract(norm_url, "^[^:]+://([^/?]*)", 1)


def host_rollup(pages: DataFrame, blocklist: DataFrame | None = None,
                url_col: str = "url") -> DataFrame:
    """Per-host crawl accounting over rows surviving the blocklist:
    ``(host, n_crawls, n_resources, recrawl_pct)`` where
    ``n_resources`` counts distinct normalized URLs and
    ``recrawl_pct`` = 100 - 100*resources/crawls (integer floor, so
    the exact-oracle comparison never meets float rounding).

    ``blocklist`` is a one-column ``(host)`` table anti-joined
    WITHOUT a forced broadcast (AQE decides; blocklists are usually
    tiny but this keeps the corpus-scale-side-safe policy)."""
    with_host = normalize_url(pages, url_col).withColumn(
        "host", host_of(F.col("norm_url")))
    if blocklist is not None:
        with_host = with_host.join(blocklist, "host", "left_anti")
    return with_host.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_crawls"),
        F.count_distinct(F.col("norm_url")).cast("long").alias("n_resources"),
        (
            F.lit(100)
            - F.floor(F.lit(100) * F.count_distinct(F.col("norm_url"))
                      / F.count(F.lit(1)))
        ).cast("long").alias("recrawl_pct"),
    )


# ---------------------------------------------------------------------------
# Deterministic synthetic crawl-URL column for the driver testdata
# (documents has no url column; FIXTURES.md maps doc_id -> url).  The
# same derivation exists as DUCKDB_SYNTH_SQL so the oracle sees
# byte-identical raw URLs.  The shape deliberately exercises every
# normalization rule: mixed-case schemes/hosts, www. prefixes,
# default ports, trailing slashes, tracking params, unsorted params,
# fragments — and collides doc_ids onto shared normalized URLs
# (host mod 40 x path mod 25 x query-class) so latest-wins has work.
# ---------------------------------------------------------------------------

RECENCY_GRID = 1_000_000_000  # nano grid, blend_prior's prior shape


def recency_prior(pages: DataFrame, id_col: str = "url",
                  ts_col: str = "warc_ts") -> DataFrame:
    """Crawl-freshness prior in ``graph.blend_prior``'s (id,
    rank_nano) shape: min-max-normalized recency on the 1e-9 integer
    grid — newest page scores 1e9, oldest 0, a single-timestamp
    corpus is uniformly fresh.  Composes with ``blend_prior`` exactly
    like the PageRank authority prior (relevance × freshness, the
    standard web-search recency blend); the reference ranker is
    purely lexical (Ranker.java) and the (url, warc_ts) crawl schema
    makes freshness a first-class signal it never had.

    Exactness at scale: the normalization runs in SECONDS —
    ``delta_s * 1e9`` stays under BIGINT for a century-wide crawl
    span — and the min-max DELTA cancels any epoch/timezone offset,
    so the value is engine- and partitioning-independent (pure BIGINT
    arithmetic, no float anywhere).  Plan: one O(1)-row scalar
    aggregate broadcast + a codegen projection — scan speed."""
    ts_s = F.expr(f"unix_micros({ts_col}) div 1000000")
    base = pages.select(F.col(id_col).alias("id"), ts_s.alias("ts_s"))
    bounds = base.agg(F.min("ts_s").alias("mn"), F.max("ts_s").alias("mx"))
    return (
        base.crossJoin(F.broadcast(bounds))
        .select(
            "id",
            F.when(F.col("mx") == F.col("mn"), F.lit(RECENCY_GRID))
            .otherwise(F.expr(
                f"(ts_s - mn) * {RECENCY_GRID} div (mx - mn)"))
            .cast("long").alias("rank_nano"),
        )
    )


def synthetic_crawl(docs: DataFrame, n_resources: int = 100) -> DataFrame:
    """Resource identity and surface form are INDEPENDENT dimensions:
    ``r = doc_id % n_resources`` names the resource (n_resources//5
    hosts x 5 paths x a query class), ``p = doc_id // n_resources %
    6`` names the presentation (plain / WWW+case / default port /
    fragment+trailing slash / tracking param / unsorted params) — so
    successive crawls of the same resource arrive under DIFFERENT raw
    spellings and only the normalizer can collapse them.

    The default (100) matches DUCKDB_SYNTH_SQL (the driver oracle,
    sized for the 500-doc testdata at ~5 crawls/resource);
    tools/pipeline_bench.py scales ``n_resources`` with the corpus so
    the scale numbers keep the same crawl-depth distribution."""
    d = F.col("doc_id")
    return docs.select(
        "doc_id",
        synth_url(d, n_resources).alias("url"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(secs=d.cast("double"))).alias("warc_ts"),
    )


def synth_url(d: Column, n_resources: int = 100) -> Column:
    """The synthetic crawl's raw url spelling for an arbitrary doc-id
    EXPRESSION ``d`` — factored out so link anchors can reference a
    target page's spelling without a self-join
    (``graph.synthetic_linked_crawl``)."""
    n_hosts = max(1, n_resources // 5)
    r, p = d % n_resources, (d / n_resources).cast("long") % 6
    host = F.concat(F.lit("site"), (r % n_hosts).cast("string"),
                    F.lit(".example.com"))
    path = F.concat(F.lit("/cat/"),
                    (r / n_hosts).cast("long").cast("string"))
    qid = (r % 5).cast("string")
    canonq = (
        F.when(r % 3 == 1, F.concat(F.lit("id="), qid))
        .when(r % 3 == 2, F.concat(F.lit("b=2&id="), qid))
        .otherwise(F.lit(""))
    )
    qmark = F.when(canonq == "", F.lit("")).otherwise(F.lit("?"))
    return (
        F.when(p == 1, F.concat(
            F.lit("HTTPS://WWW."), F.upper(host), path, qmark, canonq))
        .when(p == 2, F.concat(
            F.lit("https://"), host, F.lit(":443"), path, qmark, canonq))
        .when(p == 3, F.concat(
            F.lit("https://"), host, path, F.lit("/"), qmark, canonq,
            F.lit("#top")))
        .when(p == 4, F.concat(
            F.lit("https://"), host, path,
            F.when(canonq == "", F.lit("?utm_source=feed"))
            .otherwise(F.concat(F.lit("?"), canonq, F.lit("&utm_source=feed")))))
        .when(p == 5, F.concat(
            F.lit("HTTPS://"), host, path, qmark,
            F.when(r % 3 == 2, F.concat(F.lit("id="), qid, F.lit("&b=2")))
            .otherwise(canonq)))
        .otherwise(F.concat(F.lit("https://"), host, path, qmark, canonq))
    )


DUCKDB_SYNTH_SQL = """
WITH syn AS (
  SELECT doc_id, doc_id % 100 AS r, (doc_id // 100) % 6 AS p,
    'site' || CAST(doc_id % 100 % 20 AS VARCHAR) || '.example.com' AS host,
    '/cat/' || CAST((doc_id % 100) // 20 AS VARCHAR) AS path,
    CASE WHEN doc_id % 100 % 3 = 1
           THEN 'id=' || CAST(doc_id % 100 % 5 AS VARCHAR)
         WHEN doc_id % 100 % 3 = 2
           THEN 'b=2&id=' || CAST(doc_id % 100 % 5 AS VARCHAR)
         ELSE '' END AS canonq
  FROM documents
)
SELECT doc_id,
  CASE p
    WHEN 1 THEN 'HTTPS://WWW.' || upper(host) || path
                || (CASE WHEN canonq = '' THEN '' ELSE '?' || canonq END)
    WHEN 2 THEN 'https://' || host || ':443' || path
                || (CASE WHEN canonq = '' THEN '' ELSE '?' || canonq END)
    WHEN 3 THEN 'https://' || host || path || '/'
                || (CASE WHEN canonq = '' THEN '' ELSE '?' || canonq END)
                || '#top'
    WHEN 4 THEN 'https://' || host || path
                || (CASE WHEN canonq = '' THEN '?utm_source=feed'
                    ELSE '?' || canonq || '&utm_source=feed' END)
    WHEN 5 THEN 'HTTPS://' || host || path
                || (CASE WHEN canonq = '' THEN ''
                    WHEN r % 3 = 2
                      THEN '?id=' || CAST(r % 5 AS VARCHAR) || '&b=2'
                    ELSE '?' || canonq END)
    ELSE 'https://' || host || path
         || (CASE WHEN canonq = '' THEN '' ELSE '?' || canonq END)
  END AS url,
  TIMESTAMP '2024-01-01 00:00:00'
    + to_seconds(CAST(doc_id AS BIGINT)) AS warc_ts
FROM syn
"""


def duckdb_norm_sql(col: str) -> str:
    """The rule 1-5 normalization as a DuckDB scalar expression over
    ``col`` — the oracle twin of :func:`_norm_expr`."""
    nofrag = f"regexp_replace({col}, '#.*$', '')"
    scheme = f"lower(regexp_extract({nofrag}, '^([^:/?#]+)://', 1))"
    rest = f"regexp_replace({nofrag}, '^[^:/?#]+://', '')"
    hostport = f"lower(regexp_extract({rest}, '^([^/?]*)', 1))"
    host0 = f"regexp_replace({hostport}, '^www\\.', '')"
    host = (
        f"(CASE WHEN {scheme} = 'http' THEN regexp_replace({host0}, ':80$', '')"
        f" WHEN {scheme} = 'https' THEN regexp_replace({host0}, ':443$', '')"
        f" ELSE {host0} END)"
    )
    pathq = f"regexp_replace({rest}, '^[^/?]*', '')"
    path0 = f"regexp_replace(regexp_extract({pathq}, '^([^?]*)', 1), '/+$', '')"
    path = f"(CASE WHEN {path0} = '' THEN '/' ELSE {path0} END)"
    rawq = f"regexp_replace({pathq}, '^[^?]*\\??', '')"
    # coalesce: DuckDB's array_to_string returns NULL on [] where
    # Spark's array_join returns ''
    canonq = (
        "coalesce(array_to_string(list_sort(list_filter("
        f"string_split({rawq}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_RE}'))), '&'), '')"
    )
    return (
        f"(CASE WHEN {scheme} = '' THEN {col} ELSE "
        f"{scheme} || '://' || {host} || {path} || "
        f"(CASE WHEN {canonq} = '' THEN '' ELSE '?' || {canonq} END) END)"
    )
