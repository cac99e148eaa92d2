"""Entity operators (A7/A8/R6) against an independent per-doc
recomputation, and the city semi-join (F2/J4)."""

import math

from pyspark.sql import functions as F

from search_engine_spark.fixtures import STOP_WORDS, make_pages
from search_engine_spark.searcher import SearchEngine
from search_engine_spark.textproc import parse_doc

N_DOCS = 300


def _round_half_up(x: float, places: int = 3) -> float:
    factor = 10 ** places
    return math.floor(x * factor + 0.5) / factor


def test_entities_match_reference_semantics(spark, built_index):
    out, cfg, meta = built_index
    eng = SearchEngine(spark, out, cfg)
    stop = frozenset(STOP_WORDS)

    # independent recomputation (A7/A8 semantics straight from the
    # reference: Indexer.java:86-93, MainWindowController.java:606-630)
    pages = make_pages(N_DOCS, seed=42)
    df_by_key: dict[str, int] = {}
    per_doc: dict[str, dict[str, int]] = {}
    for p in pages:
        terms = parse_doc(p["text"], stop, True)
        ents = {}
        for key, ts in terms.items():
            df_by_key[key.lower()] = df_by_key.get(key.lower(), 0) + 1
            if key[0].isupper():
                ents[key] = ts.tf + (10 if ts.important else 0)
        per_doc[p["url"]] = ents

    got = eng.entities_top5().collect()
    by_url: dict[str, list] = {}
    for r in got:
        by_url.setdefault(r["url"], []).append(r)

    checked = 0
    for url, ents in per_doc.items():
        want = sorted(
            (
                (-_round_half_up(new_tf / df_by_key[t.lower()]), t,
                 _round_half_up(new_tf / df_by_key[t.lower()]), new_tf)
                for t, new_tf in ents.items()
            ),
        )[:5]
        rows = sorted(by_url.get(url, []), key=lambda r: r["rank"])
        assert [r["term"] for r in rows] == [w[1] for w in want], url
        for r, w in zip(rows, want):
            assert abs(r["score"] - w[2]) < 1e-9, (url, r["term"])
            assert r["new_tf"] == w[3]
        checked += 1 if ents else 0
    assert checked > 50  # the fixture corpus has plenty of entities


def test_city_semi_join_filters_results(spark, built_index):
    out, cfg, meta = built_index
    eng = SearchEngine(spark, out, cfg)
    pages = {p["url"]: p["text"] for p in make_pages(N_DOCS, seed=42)}

    # full unfiltered ranking (k >= corpus size) as the baseline
    base = {r["url"]: r["score"] for r in eng.search("world trade", N_DOCS).collect()}
    filtered = {r["url"]: r["score"]
                for r in eng.search("world trade", 50, cities=["york"]).collect()}
    assert filtered, "city filter should keep some matching docs"
    assert set(filtered) <= set(base)
    for url, score in filtered.items():
        assert "york" in pages[url].lower(), url
        assert abs(score - base[url]) < 1e-9  # filter must not change scores
    # the filter is the exact text-membership set intersected with matches
    want = {u for u in base if "york" in pages[u].lower()}
    assert set(filtered) == want or len(filtered) == 50

    # unknown city term -> empty result (reference: no posting list)
    assert eng.search("world trade", 10, cities=["zzznocity"]).count() == 0


def test_entities_table_partitioned_by_shard(spark, built_index):
    out, cfg, meta = built_index
    ents = spark.read.parquet(f"{out}/entities")
    assert set(ents.columns) >= {"url", "term", "term_key", "new_tf", "shard"}
    assert ents.filter(~F.col("capital")).count() == 0 if "capital" in ents.columns else True


# ---------------------------------------------------------------------------
# facet counts over the full matching doc set


def test_search_facets_matches_twin_and_dedups_tags(spark, built_index):
    """Engine facets == plain-postings twin on a real dim; a doc
    tagged twice with the same value counts once; docs without a dim
    row contribute to no facet."""
    from pyspark.sql import functions as F

    from search_engine_spark import twin as TW
    from search_engine_spark.searcher import SearchEngine

    out, cfg, meta = built_index
    eng = SearchEngine(spark, out, cfg)
    # derive a dim from doc urls: parity buckets + a duplicate tag row
    urls = spark.read.parquet(f"{out}/doc_stats").select("url")
    dims = urls.select(
        "url",
        F.when(F.crc32(F.col("url")) % 2 == 0, "even").otherwise("odd").alias("v"),
    )
    dims = dims.unionByName(dims.limit(5))  # duplicate tags must not double-count
    got = {r["facet"]: r["n_docs"]
           for r in eng.search_facets("world trade", dims, "v").collect()}
    want = {r["facet"]: r["n_docs"]
            for r in TW.twin_facets(spark, eng, "world trade", dims, "v").collect()}
    assert got == want and set(got) <= {"even", "odd"} and sum(got.values()) > 0


def test_search_facets_excludes_tombstoned_docs(spark, built_index):
    from pyspark.sql import functions as F

    from search_engine_spark.searcher import SearchEngine

    out, cfg, meta = built_index
    full = SearchEngine(spark, out, cfg)
    urls = spark.read.parquet(f"{out}/doc_stats").select("url")
    dims = urls.select("url", F.lit("all").alias("v"))
    base = full.search_facets("world trade", dims, "v").collect()[0]["n_docs"]
    # tombstone two matching docs via the overlay
    victims = [r["url"] for r in full.search("world trade", 2).collect()]
    eng = SearchEngine(spark, out, cfg, deleted_urls=victims)
    after = eng.search_facets("world trade", dims, "v").collect()[0]["n_docs"]
    assert after == base - len(victims)


def test_search_facets_empty_query(spark, built_index):
    from pyspark.sql import functions as F

    from search_engine_spark.searcher import SearchEngine

    out, cfg, meta = built_index
    eng = SearchEngine(spark, out, cfg)
    urls = spark.read.parquet(f"{out}/doc_stats").select("url")
    dims = urls.select("url", F.lit("x").alias("v"))
    assert eng.search_facets("the and of", dims, "v").count() == 0  # stop-only


def test_search_facets_multi_equals_per_dim(spark, built_index):
    """One-pass multi-dimension facets == a per-dim search_facets
    loop across heterogeneous dim types (string + int, the int facet
    string-cast), honoring tombstones, with stop-only queries empty
    and a single shared candidate scan in the plan."""
    from pyspark.sql import functions as F

    from search_engine_spark.searcher import SearchEngine

    out, cfg, meta = built_index
    urls = spark.read.parquet(f"{out}/doc_stats").select("url")
    parity = urls.select(
        "url",
        F.when(F.crc32(F.col("url")) % 2 == 0, "even").otherwise("odd").alias("v"),
    )
    tri = urls.select("url", (F.crc32(F.col("url")) % 3).alias("t"))
    victims = [r["url"] for r in
               SearchEngine(spark, out, cfg).search("world trade", 2).collect()]
    eng = SearchEngine(spark, out, cfg, deleted_urls=victims)
    specs = [("parity", parity, "v"), ("tri", tri, "t")]
    multi = {(r["dim"], r["facet"]): r["n_docs"]
             for r in eng.search_facets_multi("world trade", specs).collect()}
    per = {}
    for name, dims, col in specs:
        for r in eng.search_facets("world trade", dims, col).collect():
            per[(name, str(r["facet"]))] = r["n_docs"]
    assert multi == per and len(multi) == 5
    assert eng.search_facets_multi("the and of", specs).count() == 0
    # ONE index scan feeds all dimensions: the posting-unpack kernel
    # (MapInPandas) appears exactly once in the MAIN plan — a copy
    # inside a SubqueryAdaptiveBroadcast is dynamic partition pruning
    # of the doc_stats scan (the candidate set reused as a DPP filter,
    # a win), not a duplicated candidate pass
    plan = (eng.search_facets_multi("world trade", specs)
            ._jdf.queryExecution().executedPlan().toString())
    n_unpack = plan.count("MapInPandas unpack_batch")
    n_dpp = plan.count("SubqueryAdaptiveBroadcast")
    assert n_unpack - n_dpp == 1, (n_unpack, n_dpp)
