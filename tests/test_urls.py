"""URL-curation operators: normalization spec table, latest-crawl-wins
semantics, host rollup, and the plan shapes the 100 TB story needs
(no shuffle in normalize, max_by agg instead of a row_number window,
no forced broadcast on the blocklist anti-join)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from search_engine_spark.operators import urls as U  # noqa: E402

# (raw, normalized) — one case per spec rule plus combinations
SPEC_CASES = [
    # rule 1: fragment dropped
    ("https://a.com/x#sec", "https://a.com/x"),
    # rule 2: scheme lowercased; no-scheme passes through unchanged
    ("HTTPS://a.com/x", "https://a.com/x"),
    ("not a url", "not a url"),
    ("doc:42", "doc:42"),
    # rule 3: host lowercased, www. stripped, default port stripped
    ("https://WWW.A.com/x", "https://a.com/x"),
    ("http://a.com:80/x", "http://a.com/x"),
    ("https://a.com:443/x", "https://a.com/x"),
    ("https://a.com:8443/x", "https://a.com:8443/x"),  # non-default kept
    ("http://a.com:443/x", "http://a.com:443/x"),  # wrong-scheme port kept
    # rule 4: trailing slash runs trimmed; empty path -> '/'
    ("https://a.com/x///", "https://a.com/x"),
    ("https://a.com", "https://a.com/"),
    ("https://a.com/", "https://a.com/"),
    # rule 5: tracking params dropped, rest sorted, empty '?' dropped
    ("https://a.com/x?utm_source=f&b=1", "https://a.com/x?b=1"),
    ("https://a.com/x?z=1&b=2", "https://a.com/x?b=2&z=1"),
    ("https://a.com/x?utm_campaign=c", "https://a.com/x"),
    ("https://a.com/x?fbclid=1&gclid=2&msclkid=3&ref=r", "https://a.com/x"),
    ("https://a.com/x?b=1&&", "https://a.com/x?b=1"),
    # refXYZ is NOT the tracking key 'ref'
    ("https://a.com/x?refresh=1", "https://a.com/x?refresh=1"),
    # everything at once
    ("HTTP://WWW.A.com:80/x/?z=1&utm_x=9&b=2#top", "http://a.com/x?b=2&z=1"),
]


def test_normalize_spec_table(spark):  # noqa: F811
    df = spark.createDataFrame([(r,) for r, _ in SPEC_CASES], "url string")
    got = {r.url: r.norm_url
           for r in U.normalize_url(df).collect()}
    for raw, want in SPEC_CASES:
        assert got[raw] == want, f"{raw!r}: {got[raw]!r} != {want!r}"


def test_normalize_is_shuffle_free(spark):  # noqa: F811
    df = spark.createDataFrame([("https://a.com/x?b=1",)], "url string")
    plan = U.normalize_url(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_dedup_latest_keeps_newest_and_counts(spark):  # noqa: F811
    rows = [
        # three spellings of one resource; ts decides
        ("https://a.com/x?b=1", "2024-01-01 00:00:01"),
        ("HTTPS://WWW.a.com/x?b=1&utm_s=1", "2024-01-03 00:00:00"),
        ("https://a.com:443/x/?b=1", "2024-01-02 00:00:00"),
        # a singleton
        ("https://b.com/y", "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts string").select(
        "url", F.to_timestamp("warc_ts").alias("warc_ts"))
    out = {r.norm_url: r for r in U.url_dedup_latest(df).collect()}
    assert set(out) == {"https://a.com/x?b=1", "https://b.com/y"}
    win = out["https://a.com/x?b=1"]
    assert win.url == "HTTPS://WWW.a.com/x?b=1&utm_s=1"
    assert win.n_crawls == 3
    assert str(win.warc_ts) == "2024-01-03 00:00:00"
    assert out["https://b.com/y"].n_crawls == 1


def test_dedup_latest_ts_tie_breaks_on_url(spark):  # noqa: F811
    rows = [
        ("https://a.com/x", "2024-01-01 00:00:00"),
        ("HTTPS://a.com/x", "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts string").select(
        "url", F.to_timestamp("warc_ts").alias("warc_ts"))
    (row,) = U.url_dedup_latest(df).collect()
    assert row.url == "https://a.com/x"  # greatest raw url wins the tie


def test_dedup_latest_plan_is_one_agg_no_window(spark):  # noqa: F811
    df = U.synthetic_crawl(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    out = U.url_dedup_latest(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # max_by rides a hash aggregate (map-side combine); a row_number
    # formulation would show a Window + Sort over every crawl row
    assert "Window" not in plan
    assert "max_by" in plan.lower() or "HashAggregate" in plan


def test_host_rollup_blocklist_and_ratio(spark):  # noqa: F811
    pages = U.synthetic_crawl(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    bl = spark.createDataFrame([("site3.example.com",)], "host string")
    out = U.host_rollup(pages, blocklist=bl)
    rows = {r.host: r for r in out.collect()}
    assert "site3.example.com" not in rows
    # synthetic: 20 hosts, one blocked; 5 crawls per resource
    assert len(rows) == 19
    for r in rows.values():
        assert r.n_crawls == r.n_resources * 5
        assert r.recrawl_pct == 80
    # blocklist join must not be a forced broadcast hint (AQE decides)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in plan


def test_synthetic_crawl_matches_duckdb(spark):  # noqa: F811
    """The raw synthetic URLs (not just their normal forms) must be
    byte-identical between the Spark and DuckDB derivations."""
    duckdb = pytest.importorskip("duckdb")
    sf = "/root/testdata/sf0.001"
    got = {
        r.doc_id: r.url
        for r in U.synthetic_crawl(
            spark.read.parquet(f"{sf}/documents.parquet")).collect()
    }
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    for doc_id, url in con.sql(
            f"SELECT doc_id, url FROM ({U.DUCKDB_SYNTH_SQL})").fetchall():
        assert got[doc_id] == url


def test_recency_prior_hand_values(spark):  # noqa: F811
    """Exact nano-grid freshness: hand-computed min-max positions,
    including a non-divisible span (floor semantics) and the
    single-timestamp corpus (uniformly fresh)."""
    pages = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00"),
         ("b", "2024-01-01 00:00:30"),
         ("c", "2024-01-01 00:01:30")],
        "url string, ts string",
    ).withColumn("warc_ts", F.to_timestamp("ts"))
    got = {r["id"]: r["rank_nano"]
           for r in U.recency_prior(pages).collect()}
    # span 90s: a=0, b=30*1e9//90, c=1e9
    assert got == {"a": 0, "b": 333333333, "c": 1_000_000_000}
    one = spark.createDataFrame(
        [("x", "2024-01-01 00:00:00"), ("y", "2024-01-01 00:00:00")],
        "url string, ts string",
    ).withColumn("warc_ts", F.to_timestamp("ts"))
    got1 = {r["id"]: r["rank_nano"] for r in U.recency_prior(one).collect()}
    assert got1 == {"x": 1_000_000_000, "y": 1_000_000_000}


def test_recency_prior_is_timezone_invariant(spark):  # noqa: F811
    """The min-max delta cancels the epoch: shifting every timestamp
    by a constant leaves the prior bit-identical."""
    base = spark.createDataFrame(
        [("a", 0), ("b", 45), ("c", 100)], "url string, off long",
    )
    def prior(shift):
        pages = base.withColumn(
            "warc_ts",
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=(F.col("off") + F.lit(shift)).cast("double")))
        return {r["id"]: r["rank_nano"]
                for r in U.recency_prior(pages).collect()}
    assert prior(0) == prior(86400 * 365)
