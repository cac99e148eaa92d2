"""ES composite aggregation (SearchEngine.search_composite): buckets
keyed by the source-value tuple, totally ordered by key, paginated by
a strict after-key cursor — pages must tile the global bucket list
with no skip and no dup, and counts must agree with search_facets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.searcher import SearchEngine

QUERY = "world trade market"


def _dims(spark, fixture_pages_parquet):
    pages = spark.read.parquet(fixture_pages_parquet)
    return pages.select(
        "url", "lang", (F.crc32(F.col("url")) % 5).cast("long").alias("b5"))


def _specs(dims):
    return [("lang", dims, "lang"), ("b5", dims, "b5")]


def _keys(rows):
    return [(r["lang"], r["b5"]) for r in rows]


def _walk(eng, specs, size):
    """Full composite page walk: resume from each page's last key."""
    pages, after = [], None
    while True:
        rows = (
            eng.search_composite(QUERY, specs, size=size, after=after)
            .orderBy("lang", "b5").collect()
        )
        if not rows:
            return pages
        pages.append(rows)
        after = (rows[-1]["lang"], rows[-1]["b5"])


def test_pages_tile_the_global_bucket_list(spark, built_index,
                                           fixture_pages_parquet):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    specs = _specs(_dims(spark, fixture_pages_parquet))
    full = (
        eng.search_composite(QUERY, specs, size=100_000)
        .orderBy("lang", "b5").collect()
    )
    assert len(full) > 4  # the walk below must take several pages
    walked = [r for page in _walk(eng, specs, 4) for r in page]
    assert _keys(walked) == _keys(full)
    assert [r["n_docs"] for r in walked] == [r["n_docs"] for r in full]
    # keys strictly ascending across the whole walk (no dup, no skip)
    ks = _keys(walked)
    assert all(a < b for a, b in zip(ks, ks[1:]))


def test_single_source_counts_match_search_facets(spark, built_index,
                                                  fixture_pages_parquet):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    dims = _dims(spark, fixture_pages_parquet)
    comp = eng.search_composite(QUERY, [("lang", dims, "lang")], size=1000)
    facets = eng.search_facets(QUERY, dims, "lang")
    got = {r["lang"]: r["n_docs"] for r in comp.collect()}
    # search_facets keeps a NULL facet bucket; composite's key space
    # excludes missing values (ES missing_bucket:false)
    want = {r["facet"]: r["n_docs"] for r in facets.collect()
            if r["facet"] is not None}
    assert None not in got
    assert got == want and got


def test_after_below_every_key_is_the_first_page(spark, built_index,
                                                 fixture_pages_parquet):
    """The cursor is a pure keyset filter: an after key sorting below
    the whole bucket space (even one absent from it) yields page 1."""
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    specs = _specs(_dims(spark, fixture_pages_parquet))
    p1 = eng.search_composite(QUERY, specs, size=5)
    p1b = eng.search_composite(QUERY, specs, size=5, after=("", -1))
    assert _keys(p1.collect()) == _keys(p1b.collect())


def test_multivalued_source_crosses(spark, built_index):
    """A doc carrying two values of one source lands in BOTH buckets
    (the ES multi-valued composite contract), once each."""
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    urls = [r["url"] for r in eng.matching_urls(QUERY).limit(3).collect()]
    assert len(urls) == 3
    rows = [(urls[0], "x"), (urls[0], "y"), (urls[1], "x"), (urls[2], "y")]
    dims = spark.createDataFrame(rows, "url string, tag string")
    out_rows = {
        r["tag"]: r["n_docs"]
        for r in eng.search_composite(
            QUERY, [("tag", dims, "tag")], size=10).collect()
    }
    assert out_rows == {"x": 2, "y": 2}


def test_missing_source_drops_the_doc(spark, built_index):
    """Inner-join semantics (ES missing_bucket:false): a matching doc
    absent from a source contributes no bucket."""
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    urls = [r["url"] for r in eng.matching_urls(QUERY).limit(2).collect()]
    dims = spark.createDataFrame([(urls[0], "only")], "url string, tag string")
    rows = eng.search_composite(QUERY, [("tag", dims, "tag")], size=10)
    assert [(r["tag"], r["n_docs"]) for r in rows.collect()] == [("only", 1)]


def test_unknown_query_is_empty_with_schema(spark, built_index,
                                            fixture_pages_parquet):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    specs = _specs(_dims(spark, fixture_pages_parquet))
    empty = eng.search_composite("zzzzqqqq", specs, size=5)
    assert empty.count() == 0
    assert empty.columns == ["lang", "b5", "n_docs"]


def test_validation(spark, built_index, fixture_pages_parquet):
    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    dims = _dims(spark, fixture_pages_parquet)
    specs = _specs(dims)
    with pytest.raises(ValueError):
        eng.search_composite(QUERY, specs, size=0)
    with pytest.raises(ValueError):
        eng.search_composite(QUERY, specs, size=5, after=("en",))
    with pytest.raises(ValueError):
        eng.search_composite(
            QUERY, [("a", dims, "lang"), ("a", dims, "b5")], size=5)
