"""Prefix autocomplete + result-page collapse (operators/snippets.py
autocomplete family, operators/collapse.py).

Golden edge cases the sf-table oracle rows can't guarantee hitting:
cf tie-breaking (completion asc), a prefix with no completions
(absent from the output), overlapping prefixes (a term counted under
each prefix it extends), the per-group cap binding exactly at the
boundary, and the two collapse implementations (window vs
aggregation) agreeing on a frame with duplicate scores.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.collapse import (
    collapse_run, collapse_run_agg)
from search_engine_spark.operators.snippets import (
    autocomplete, autocomplete_indexed, write_autocomplete_index)


def _vocab(spark):
    return spark.createDataFrame(
        [
            ("scan", 40), ("sort", 40), ("stream", 90), ("spark", 10),
            ("cable", 7), ("cat", 7), ("dog", 3), ("sos", 1),
        ],
        "term_key string, cf long",
    )


def test_autocomplete_ranking_and_ties(spark):
    out = autocomplete(_vocab(spark), ["s", "so", "x"], k=3)
    got = {(r["prefix"], r["rank"]): (r["completion"], r["cf"])
           for r in out.collect()}
    # cf desc first; the 40-40 tie breaks completion asc
    assert got[("s", 1)] == ("stream", 90)
    assert got[("s", 2)] == ("scan", 40)
    assert got[("s", 3)] == ("sort", 40)
    # overlapping prefix ranks independently; k cut respected
    assert got[("so", 1)] == ("sort", 40)
    assert got[("so", 2)] == ("sos", 1)
    # a prefix with no completions is absent, not an empty row
    assert not [k for k in got if k[0] == "x"]
    assert len(got) == 5


def test_autocomplete_indexed_equals_scan(spark, tmp_dir):
    from search_engine_spark.operators.textstats import simple_tokens

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dic = (docs.select(F.explode(simple_tokens()).alias("tok"))
           .groupBy("tok").agg(F.count(F.lit(1)).alias("cf")))
    path = f"{tmp_dir}/ac"
    write_autocomplete_index(dic, path, term_col="tok", cf_col="cf")
    fresh = {tuple(r) for r in
             autocomplete(dic, ["s", "c", "qu"], 5,
                          term_col="tok", cf_col="cf").collect()}
    stored = {tuple(r) for r in
              autocomplete_indexed(spark, path, ["s", "c", "qu"], 5).collect()}
    assert stored == fresh and fresh, "stored layout must equal the scan"


def test_autocomplete_indexed_plan_is_pruned(spark, tmp_dir):
    """The stored-layout serve must push the startswith predicates to
    the parquet scan (StringStartsWith reaches PushedFilters, so the
    range-sorted row groups outside every prefix prune on min/max
    string stats) and must not plan a cartesian product."""
    path = f"{tmp_dir}/ac_plan"
    write_autocomplete_index(_vocab(spark), path)
    out = autocomplete_indexed(spark, path, ["s", "ca"], 3)
    txt = out._jdf.queryExecution().toString()
    assert "PushedFilters:" in txt and "StringStartsWith" in txt
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_autocomplete_indexed_refuses_stale_index(spark, tmp_dir):
    """The stored vocabulary is a corpus snapshot: once the packed
    index it was stamped against moves, the suggest box must refuse
    (same discipline as the MLT/suggest side-cars), and serve again
    after a rebuild."""
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.incremental import add_documents
    from search_engine_spark.indexer import build_index

    cfg = EngineConfig(n_doc_shards=2, n_term_buckets=2, n_bucket_groups=1)
    ix = f"{tmp_dir}/ix"
    rows = [(f"http://s/{i}", f"alpha beta gamma doc{i}") for i in range(6)]
    pages = (
        spark.createDataFrame(rows, "url string, text string")
        .withColumn("warc_ts", F.current_timestamp())
        .withColumn("html", F.lit(None).cast("binary"))
        .withColumn("lang", F.lit("en"))
    )
    build_index(spark, pages.filter(F.col("url") != "http://s/5"), ix, cfg)
    path = f"{tmp_dir}/ac_stale"
    write_autocomplete_index(_vocab(spark), path, index_dir=ix)
    assert autocomplete_indexed(spark, path, ["s"], 2).count() == 2
    add_documents(spark, pages.filter(F.col("url") == "http://s/5"), ix, cfg)
    with pytest.raises(RuntimeError, match="STALE"):
        autocomplete_indexed(spark, path, ["s"], 2)
    write_autocomplete_index(_vocab(spark), path, index_dir=ix)
    assert autocomplete_indexed(spark, path, ["s"], 2).count() == 2


def _run(spark):
    # scores engineered so the two-per-host cap actually bites and a
    # duplicate score crosses hosts (tie broken by url asc)
    return spark.createDataFrame(
        [
            ("a/1", "a", 9.0), ("a/2", "a", 8.0), ("a/3", "a", 7.5),
            ("b/1", "b", 8.0), ("b/2", "b", 6.0), ("b/3", "b", 5.9),
            ("c/1", "c", 7.0),
        ],
        "url string, host string, score double",
    )


def test_collapse_caps_and_reranks(spark):
    out = collapse_run(_run(spark), group_col="host", per_group=2, k=4,
                       score_col="score", id_col="url").collect()
    got = [(r["rank"], r["url"]) for r in
           sorted(out, key=lambda r: r["rank"])]
    # a/3 (7.5) outranks c/1 globally but is host a's THIRD hit — the
    # cap drops it and c/1 enters the page; the a/2-b/1 score tie
    # breaks url asc
    assert got == [(1, "a/1"), (2, "a/2"), (3, "b/1"), (4, "c/1")]
    out5 = collapse_run(_run(spark), "host", 2, 5, "score", "url").collect()
    urls = {r["url"] for r in out5}
    assert "a/3" not in urls and "c/1" in urls


def test_collapse_agg_plan_matches_window_plan(spark):
    """The aggregation twin (sort_array/slice) must produce exactly
    the window form's output, including the equal-score cross-host
    tie broken by url asc."""
    a = collapse_run(_run(spark), "host", 2, 5, "score", "url")
    b = collapse_run_agg(_run(spark), "host", 2, 5, "score", "url")
    ra = [(r["rank"], r["url"], r["score"]) for r in
          sorted(a.collect(), key=lambda r: r["rank"])]
    rb = [(r["rank"], r["url"], r["score"]) for r in
          sorted(b.collect(), key=lambda r: r["rank"])]
    assert ra == rb and len(ra) == 5
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
