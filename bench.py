"""Per-round benchmark harness (driver contract).

Runs the headline suite at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": ...}

Headline set: full inverted-index build (tokenize N1-N15 + Porter ->
SPIMI -> delta+varint pack), batch BM25 top-10, block-max WAND, and
the heavy relational / training-pipeline operators.  Every query is
forced end-to-end with the noop sink (``count()`` would let Catalyst
prune the projections we mean to measure).

The N->4N scaling-efficiency evidence required by BASELINE.md lives
in ``tools/scale_bench.py`` (writes BENCH/BASELINE.md); this file is
the quick per-round feedback loop.

Measurement note: this sandbox shows 10-30% CPU steal and ~2.5x
per-core throughput swings (multi-tenant host), so each query is run
twice and the MIN is reported; the cold index build is single-shot.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _cpu_sample() -> tuple[int, int]:
    """(steal_jiffies, total_jiffies) — THE shared probe from
    tools/scale_bench.py (one implementation, so the steal%% columns
    of every harness stay comparable); lets a reader tell a real
    regression from a stolen window without re-litigating numbers."""
    from tools.scale_bench import _cpu_sample as probe

    return probe()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entry
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.indexer import build_index
    from search_engine_spark.searcher import SearchEngine
    from search_engine_spark.session import get_spark
    from search_engine_spark.sources.pages import load_documents_as_pages
    from search_engine_spark.wand import wand_search, wand_search_batch

    spark = get_spark(app="bench", master=f"local[{cpus}]")

    # one pack job: at 5k docs a second bucket-group job is pure fixed
    # cost (the 240k scale_bench uses --bucket-groups 1 for the same
    # reason; resume granularity matters at scale, not in a benchmark)
    cfg = EngineConfig(n_doc_shards=32, n_term_buckets=16, n_bucket_groups=1)
    ix_dir = tempfile.mkdtemp(prefix="se_bench_ix_")
    timings: dict[str, float] = {}
    steal: dict[str, float] = {}

    # warm the JVM + Python-worker + Arrow paths before the clock
    # starts: the benchmark measures the pipeline, not cold-start
    # codegen (~5-9s on this host, identical at every data scale)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = spark.createDataFrame([(i, "w" * 50) for i in range(500)], "id long, s string")
    warm.mapInPandas(lambda it: it, schema="id long, s string").write.format(
        "noop").mode("overwrite").save()

    t_all = time.time()

    # -- index build (cold, full pipeline) -----------------------------------
    pages = load_documents_as_pages(spark, sf_dir)
    s0, j0 = _cpu_sample()
    t0 = time.time()
    meta = build_index(spark, pages, ix_dir, cfg, resume=False)
    timings["index_build"] = round(time.time() - t0, 3)
    s1, j1 = _cpu_sample()
    steal["index_build"] = round(100 * (s1 - s0) / max(1, j1 - j0), 2)

    def timed(name, thunk, reps: int = 2) -> None:
        best, best_steal = float("inf"), 0.0
        for _ in range(reps):
            s0, j0 = _cpu_sample()
            t0 = time.time()
            _force(thunk())
            dt = time.time() - t0
            s1, j1 = _cpu_sample()
            if dt < best:
                best = dt
                best_steal = 100 * (s1 - s0) / max(1, j1 - j0)
        timings[name] = round(best, 3)
        steal[name] = round(best_steal, 2)

    # -- query paths over the packed index -----------------------------------
    eng = SearchEngine(spark, ix_dir, cfg)
    # r5 fix: the old batch reused fixtures.REFERENCE_QUERIES, whose
    # vocabulary (world/trade/river) does not occur in the testdata
    # corpus — most rows timed the empty-result path.  This batch
    # speaks the testdata vocabulary (match-heavy head queries plus
    # the stop-word-only and out-of-dictionary edges), so the serving
    # rows now price real scoring work.
    batch = [
        ("q01", "data table row"),
        ("q02", "query plan join"),
        ("q03", "fast scan filter"),
        ("q04", "hash merge sort"),
        ("q05", "stream window batch"),
        ("q06", "customer order value"),
        ("q07", "vector column agg"),
        ("q08", "spark group key"),
        ("q09", "the of and"),
        ("q10", "zzzunknownterm data"),
    ]
    timed("bm25_batch_top10", lambda: eng.search_batch(batch, 10))
    timed("wand_top10", lambda: wand_search(eng, "data table row", 10))
    timed("wand_batch_top10", lambda: wand_search_batch(eng, batch, 10))
    timed("boolean_top10", lambda: eng.boolean_search(
        must="data", should="table row", must_not="dup", k=10))
    # typo-tolerant path: correction (fresh vocab-scan suggester) +
    # the ordinary pruned-scan BM25 tail
    timed("fuzzy_top10", lambda: eng.fuzzy_search("dta tabel row", 10))
    # trailing-wildcard path: df-capped prefix expansion + the same tail
    timed("wildcard_top10", lambda: eng.wildcard_search("dat* table", 10))
    # minimum-should-match gate (one countDistinct over unpacked rows)
    timed("msm_top10", lambda: eng.boolean_search(
        should="data table row query", k=10, min_should_match=2))
    # keyset deep paging: cursor fetched once (an ordinary page-1
    # query), then the timed row is the url-cursor page-2 fetch
    _cursor = eng.search("data table row", 10).collect()[-1]["url"]
    timed("search_after_top10",
          lambda: eng.search_after("data table row", _cursor, 10))
    # filter-context: metadata predicate (half the corpus) semi-joined
    # into the per-posting rows before the score agg
    from pyspark.sql import functions as _F
    _allowed = pages.filter(
        _F.pmod(_F.xxhash64("url"), _F.lit(2)) == 0).select("url")
    timed("filtered_top10",
          lambda: eng.search_filtered("data table row", _allowed, 10))

    # pseudo-relevance feedback: the doc-major term-vector side-car is
    # a one-off corpus-cost build (timed separately); the query then
    # pays two pruned-scan passes + a 10-doc pruned vector fetch
    from search_engine_spark import twin as TW
    from search_engine_spark.operators.termvectors import write_term_vectors

    tv_dir = tempfile.mkdtemp(prefix="se_bench_tv_")
    s0, j0 = _cpu_sample()
    t0 = time.time()
    write_term_vectors(TW.raw_postings(spark, eng), tv_dir, index_dir=ix_dir)
    timings["termvectors_build"] = round(time.time() - t0, 3)
    s1, j1 = _cpu_sample()
    steal["termvectors_build"] = round(100 * (s1 - s0) / max(1, j1 - j0), 2)
    timed("prf_top10", lambda: eng.prf_search("data table row", tv_dir, 10))

    # infix/leading wildcard: the k-gram side-car is a one-off
    # vocab-sized build (timed separately); the query then pays a
    # gram-IN pruned lookup + regex verify + the ordinary BM25 tail
    from search_engine_spark.operators.kgram import write_kgram_index

    kg_dir = tempfile.mkdtemp(prefix="se_bench_kg_")
    s0, j0 = _cpu_sample()
    t0 = time.time()
    write_kgram_index(eng._dictionary, kg_dir, index_dir=ix_dir)
    timings["kgram_build"] = round(time.time() - t0, 3)
    s1, j1 = _cpu_sample()
    steal["kgram_build"] = round(100 * (s1 - s0) / max(1, j1 - j0), 2)
    timed("wildcard_infix_top10",
          lambda: eng.wildcard_search_indexed("*able row", kg_dir, 10))
    # regex term query: same stored k-gram layout, mandatory-run gram
    # gate + anchored verify (alternation falls back to the vocab scan)
    timed("regex_top10",
          lambda: eng.regex_search_indexed("/t[ao]ble.*/ data", kg_dir, 10))
    # whole-query correction banner: one length-prefiltered
    # levenshtein pass over the dictionary scan
    timed("did_you_mean",
          lambda: eng.did_you_mean("dta tabel row"))
    # per-term boosts: the plain pruned-scan plan + a literal map
    # lookup — must price at parity with bm25
    timed("boosted_top10",
          lambda: eng.boosted_search("data^2 table row^0.5", 10))
    # synonym groups: expanded pruned scan + one extra (group, doc)
    # blend agg over the raw-tf unpack
    _syn = spark.createDataFrame(
        [("data", "stream"), ("row", "line")], "term string, syn string")
    timed("synonyms_top10",
          lambda: eng.synonym_search("data row", _syn, 10))
    # grouped result page: one window pass over the scored match set
    _langs = pages.select(
        "url", (_F.pmod(_F.xxhash64("url"), _F.lit(5))).cast("string").alias("g"))
    timed("top_hits_3x5",
          lambda: eng.search_top_hits("data table row", _langs, "g", 3))
    # numeric sidebar: count/min/max/sum/mean/sd/quartiles per facet
    # over the full matching set (exact percentiles)
    _vals = pages.select("url", _F.length("text").alias("v"),
                         (_F.pmod(_F.xxhash64("url"), _F.lit(5)))
                         .cast("string").alias("g"))
    timed("extended_stats",
          lambda: eng.search_extended_stats("data table row",
                                            _vals, "g", "v"))
    # LTR: BM25 top-50 window -> feature extraction (same pruned
    # scan) -> micro-grid linear rescore
    from search_engine_spark.operators import ltr as LTR

    timed("ltr_top10",
          lambda: LTR.ltr_rescore(
              LTR.ltr_features(eng, "data table row", 50),
              {"f_bm25": 1.0, "f_match": 0.25, "f_dl": -0.0005}, 10))
    # stored query-result cache: build outside the timer, then the
    # timed row is the PartitionFilters-pruned <=k-row serve
    from search_engine_spark.operators import qcache as QC

    qc_dir = tempfile.mkdtemp(prefix="se_bench_qc_")
    QC.write_query_cache(eng, ["data table row"], qc_dir, 10)
    timed("cached_top10",
          lambda: QC.cached_search(eng, qc_dir, "data table row", 10))
    # ES `range` aggregation: caller-defined bands through the facets
    # kernel — band membership is a codegen when()-array on the
    # candidate-values join, no band-table join
    timed("range_agg",
          lambda: eng.search_range_agg(
              "data table row", _vals, "v",
              [(None, 200), (100, 400), (300, None)]))
    # single-member federated search: prices the federation machinery
    # itself (global-stat fetch + idf/avgdl-override unpack + the
    # union/heap tail) against bm25_batch_top10's direct plan — the
    # per-query overhead an alias pays at any member count
    from search_engine_spark.federated import federated_search

    timed("federated_top10",
          lambda: federated_search(spark, [ix_dir], "data table row",
                                   10, cfg, engines=[eng]))

    # -- relational / pipeline operators (driver-contract queries) -----------
    qs = entry.queries()
    for name in (
        "tpch_q1_pricing",
        "revenue_by_nation",
        "window_top5_parts",
        "events_sessionize",
        "dedup_minhash_lsh",
        "dedup_near_pairs",
        "dedup_crossdoc_grams",
        "dedup_lines",
        "dedup_lines_digest",
        "dedup_simhash",
        # first rep builds the /tmp-cached corpus signature side-car;
        # min-of-2 reports the O(delta) serving cost
        "dedup_ingest_gate",
        "ann_dup_pairs",
        "ann_lsh_topk",
        "ann_int8_topk",
        "ann_pq_topk",
        "hits_links",
        "pack_shards",
        "chunk_windows",
        "knn_join_first5",
        "text_quality",
        "text_gopher_quality",
        "text_surprisal",
        "text_contamination",
        "training_mix",
        "text_fingerprint",
        "multimodal_features",
        "entities_top5",
        # stored-layout serving paths (round 4): first rep may build
        # the /tmp-cached artifact; min-of-2 reports the serving cost
        "text_more_like_this",
        "text_suggest",
        "url_dedup_latest",
        "nb_classify",
        "pagerank",
        "link_graph",
        "pagerank_links",
        "trustrank_links",
        "link_anchor_terms",
        "search_anchor_topk",
        "search_autocomplete_indexed",
        "search_collapse",
        "ft_hybrid_rrf",
    ):
        timed(name, lambda name=name: qs[name](spark, sf_dir))

    # span-level duplicate-text removal in its PRODUCTION setting
    # (md5-digest exchange keys; the driver row pins the raw-text twin)
    from search_engine_spark.operators import curation as CU

    _docs_tbl = entry._tbl(spark, sf_dir, "documents")
    timed("dedup_span_strip",
          lambda: CU.strip_dup_spans(_docs_tbl, n=8, min_docs=2))

    # -- incremental ingest: delta cost, not corpus cost ---------------------
    # add a 5% delta (re-sampled docs under fresh urls) to the just-built
    # index via segment append (incremental.py).  The headline claim is
    # the RATIO to index_build: at 100 TB a daily crawl delta must cost
    # O(delta) + fixed job overhead, never a repack of the corpus.  Runs
    # last so it perturbs no other timing (it mutates ix_dir).
    from pyspark.sql import functions as F

    from search_engine_spark.incremental import add_documents

    delta = (
        pages.filter(F.pmod(F.xxhash64("url"), F.lit(20)) == 0)
        .withColumn("url", F.concat(F.lit("delta://"), F.col("url")))
    )
    n_delta = delta.count()
    s0, j0 = _cpu_sample()
    t0 = time.time()
    add_documents(spark, delta, ix_dir, cfg)
    timings["incremental_add_5pct"] = round(time.time() - t0, 3)
    s1, j1 = _cpu_sample()
    steal["incremental_add_5pct"] = round(100 * (s1 - s0) / max(1, j1 - j0), 2)

    # -- recrawl supersede: the SAME O(delta) claim for updates -------------
    # re-crawl 5% of the corpus's EXISTING urls with changed text through
    # ONE update_documents call (version-tombstone + replacement segment,
    # latest-wins immediately).  Before round 5 this operation cost
    # delete -> compact -> add, i.e. a full corpus-priced rebuild.
    from search_engine_spark.incremental import update_documents

    recrawl = (
        pages.filter(F.pmod(F.xxhash64("url"), F.lit(20)) == 7)
        .withColumn("text", F.concat(F.lit("recrawled revision "),
                                     F.substring(F.col("text"), 1, 256)))
    )
    n_recrawl = recrawl.count()
    s0, j0 = _cpu_sample()
    t0 = time.time()
    update_documents(spark, recrawl, ix_dir, cfg)
    timings["incremental_update_5pct"] = round(time.time() - t0, 3)
    s1, j1 = _cpu_sample()
    steal["incremental_update_5pct"] = round(100 * (s1 - s0) / max(1, j1 - j0), 2)

    # -- delete-by-query: resolve through the index's own pruned scan -------
    # (dictionary lookup -> the query terms' posting rows, never a corpus
    # pass) + the O(|matches|) tombstone append.  Runs after the other
    # mutations; perturbs nothing that follows it.
    from search_engine_spark.incremental import delete_by_query

    s0, j0 = _cpu_sample()
    t0 = time.time()
    n_dbq = delete_by_query(spark, "delta recrawled", ix_dir, cfg)
    timings["delete_by_query"] = round(time.time() - t0, 3)
    s1, j1 = _cpu_sample()
    steal["delete_by_query"] = round(100 * (s1 - s0) / max(1, j1 - j0), 2)

    total = round(time.time() - t_all, 3)
    n_docs = meta.get("n_docs", 0)
    out = {
        "metric": "headline suite sec (cold index build + BM25/WAND queries + pipeline ops)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "steal_pct": steal,
        "sf": sf_dir,
        "n_docs_indexed": n_docs,
        "index_docs_per_sec": round(n_docs / timings["index_build"], 1),
        "incremental_delta_docs": n_delta,
        "recrawl_update_docs": n_recrawl,
        "delete_by_query_docs": n_dbq,
        "cpus": int(cpus),
    }
    # end of campaign: release the persisted shared frames the dedup /
    # term-frequency rows created (scoped persists)
    from search_engine_spark.operators.dedup import clear_shingle_cache
    from search_engine_spark.operators.textstats import clear_doc_tf_cache

    clear_shingle_cache()
    clear_doc_tf_cache()
    shutil.rmtree(ix_dir, ignore_errors=True)
    shutil.rmtree(tv_dir, ignore_errors=True)
    shutil.rmtree(qc_dir, ignore_errors=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
