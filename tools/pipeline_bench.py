"""Training-data-pipeline operators at scale-bench corpus size.

The per-round bench (bench.py, sf0.1 = 5k docs) verifies the operators
are wired correctly; this harness runs the expensive pipeline ops on
the 240k-doc scaling corpus (48x) to evidence that their plans hold at
scale — LSH candidate counts stay bounded, the verify stage touches
candidates only, cluster propagation converges, and wall time scales
with the corpus, not with pairs^2.

Usage: python tools/pipeline_bench.py [--docs 240000] [--cpus 16]
Prints one JSON line: {"op": seconds, ...} plus output row counts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=240_000)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--only", nargs="*", default=None,
                    help="run only these op names (default: all)")
    args = ap.parse_args()

    from tools.scale_bench import ensure_corpus

    corpus = ensure_corpus(args.docs)

    from pyspark.sql import functions as F

    from search_engine_spark.operators import curation as CU
    from search_engine_spark.operators import dedup as D
    from search_engine_spark.operators import textstats as TS
    from search_engine_spark.operators import webquality as WQ
    from search_engine_spark.session import get_spark

    spark = get_spark(app="pipeline_bench", master=f"local[{args.cpus}]")
    # documents-shaped view of the pages corpus: deterministic doc_id
    # from the url's trailing ordinal
    docs = (
        spark.read.parquet(corpus)
        .select(
            F.regexp_extract("url", r"(\d+)$", 1).cast("long").alias("doc_id"),
            "text", "lang", F.lit("crawl").alias("source"),
        )
    )

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    def run(name: str, thunk, sink: str = "count") -> None:
        """sink='count' for join/agg-shaped ops (count() forces the
        work AND yields the row count in one pass); sink='noop' for
        pure projections, where count() would let Catalyst prune the
        very expressions being measured."""
        if args.only is not None and name not in args.only:
            return
        t0 = time.time()
        df = thunk()
        if sink == "count":
            counts[name] = int(df.count())
        else:
            df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 2)
        print(f"{name}: {timings[name]}s, rows={counts.get(name, 'n/a')}",
              file=sys.stderr, flush=True)

    run("exact_dups", lambda: D.exact_duplicates(docs))
    run("minhash_lsh_candidates", lambda: D.lsh_candidate_pairs(docs))
    run("near_dup_pairs", lambda: D.near_dup_pairs(docs, threshold=0.5))
    run("dedup_clusters", lambda: D.dedup_clusters(
        D.near_dup_pairs(docs, threshold=0.5)))
    run("simhash_near_pairs_h1", lambda: D.simhash_near_pairs(docs, max_hamming=1))
    # the driver-row default (h=3): round-2's fixed 4x16-bit banding
    # measured 598s here (16-bit key space -> ~N^2/2^16 collisions);
    # the block-combination layout keys on 40-bit subsets instead
    run("simhash_near_pairs_h3", lambda: D.simhash_near_pairs(docs, max_hamming=3))
    run("crossdoc_dup_grams", lambda: CU.crossdoc_dup_grams(docs))
    run("contamination_hits", lambda: CU.contamination_hits(
        docs.filter(F.col("doc_id") >= 50),
        CU.eval_grams_from_docs(docs.filter(F.col("doc_id") < 50), n=3), n=3))
    # the Bloom semi-join reduction form (bit-identical output): the
    # eval set ships as a sparse bit list and k broadcast semi-joins
    # drop clean grams map-side before the exact verify
    run("contamination_bloom", lambda: CU.contamination_hits_bloom(
        docs.filter(F.col("doc_id") >= 50),
        CU.eval_grams_from_docs(docs.filter(F.col("doc_id") < 50), n=3), n=3))
    run("training_mix", lambda: CU.training_mix(
        docs, rates={"en": 0.5, "de": 0.25}, salt="pb", default_rate=0.1))
    # span-level duplicate-text removal, production digest keys: gram
    # pass + two gram-key aggs + coverage distinct + linear reassembly
    run("span_strip_full", lambda: CU.strip_dup_spans(docs, n=8, min_docs=2))
    # decontamination by excision: same kernel, broadcast eval
    # semi-join as the mark stage
    run("decontam_strip_full", lambda: CU.strip_contaminated_spans(
        docs.filter(F.col("doc_id") >= 50),
        CU.eval_grams_from_docs(docs.filter(F.col("doc_id") < 50), n=3), n=3))
    from search_engine_spark.operators import embed as EM

    run("hash_embed", lambda: EM.embed_summary(docs))
    # round-5 curation additions: both pure codegen projections riding
    # the scan (noop-sinked so Catalyst cannot prune the regex work)
    from search_engine_spark.operators import pii as PI

    run("pii_scrub_corpus", lambda: PI.scrub_pii(PI.synthetic_pii(docs)),
        sink="noop")
    run("c4_clean_corpus", lambda: CU.c4_clean(CU.synthetic_c4(docs)),
        sink="noop")
    run("winnow_fingerprint", lambda: TS.winnow_fingerprint(docs), sink="noop")

    # count-min sketch straight over token OCCURRENCES (no dictionary
    # pre-agg — the streaming shape): d projections + one (row, col)
    # agg, map-side combine collapses each partition to <= d*w rows
    from search_engine_spark.operators import sketches as SKC

    def _cms():
        occ = docs.select(F.explode(TS.simple_tokens()).alias("tok")) \
                  .withColumn("n", F.lit(1).cast("long"))
        return SKC.cms_cells(occ, width=4096, depth=4, weight_col="n")

    run("cms_term_sketch", _cms)
    run("gopher_quality", lambda: WQ.gopher_quality(docs), sink="noop")
    run("quality_score", lambda: TS.quality_score(docs), sink="noop")
    run("token_count_bpe", lambda: TS.token_count_bpe(docs), sink="noop")

    # round-4 operators at the same corpus
    from search_engine_spark.operators import classify as CL
    from search_engine_spark.operators import graph as GR
    from search_engine_spark.operators import urls as UR

    pages = UR.synthetic_crawl(docs, n_resources=max(100, args.docs // 5))
    run("url_normalize", lambda: UR.normalize_url(pages), sink="noop")
    run("url_dedup_latest", lambda: UR.url_dedup_latest(pages))
    run("host_rollup", lambda: UR.host_rollup(pages))

    def _nb():
        train = docs.filter(F.col("doc_id") % 2 == 0)
        test = docs.filter(F.col("doc_id") % 2 == 1)
        model, classes = CL.train_nb(train)
        return CL.predict_nb(test, model, classes)

    run("nb_train_and_classify", _nb)
    run("pagerank_8iter", lambda: GR.pagerank(
        docs.select("doc_id"), GR.synthetic_links(docs),
        n_iters=8, id_col="doc_id"))

    # round-5 operators at the same corpus
    linked = GR.synthetic_linked_crawl(docs,
                                       n_resources=max(100, args.docs // 5))
    run("link_extract", lambda: GR.extract_links(linked))
    run("link_host_graph", lambda: GR.host_graph(GR.extract_links(linked)))

    def _pagerank_links():
        nodes = (UR.normalize_url(linked)
                 .select(F.col("norm_url").alias("id")).distinct())
        return GR.pagerank(nodes, GR.extract_links(linked), n_iters=8,
                           id_col="id")

    run("pagerank_links_8iter", _pagerank_links)
    run("anchor_term_stats", lambda: GR.anchor_term_stats(
        GR.extract_anchors(linked)))

    def _anchor_search():
        stats = GR.anchor_term_stats(GR.extract_anchors(linked))
        return GR.anchor_search(stats, ("topic2", "topic5", "about"), k=10)

    run("anchor_search_topk", _anchor_search)

    if args.only is None or "anchor_search_indexed" in args.only:
        # build the stored layout OUTSIDE the timer: it is a
        # once-per-corpus artifact; the measured number is the
        # per-query serve from the pruned bucket partitions
        import tempfile as _tf

        anchor_ix = _tf.mkdtemp(prefix="pb_anchor_ix_")
        GR.write_anchor_index(GR.anchor_term_stats(
            GR.extract_anchors(linked)), anchor_ix)
        run("anchor_search_indexed", lambda: GR.anchor_search_indexed(
            spark, anchor_ix, ("topic2", "topic5", "about"), k=10))

    def _pagerank_hosts():
        hedges = GR.host_graph(GR.extract_links(linked))
        hosts = (UR.normalize_url(linked)
                 .select(UR.host_of(F.col("norm_url")).alias("id"))
                 .distinct())
        return GR.pagerank(hosts, hedges, n_iters=8, id_col="id",
                           weight_col="n_links")

    run("pagerank_hosts_8iter", _pagerank_hosts)
    lined = CU.synthetic_lined(docs)
    run("dedup_lines_raw", lambda: CU.dedup_lines(
        lined, min_docs=30, line_key="text"))
    run("dedup_lines_digest", lambda: CU.dedup_lines(
        lined, min_docs=30, line_key="digest"))

    # result-page collapse over a FULL corpus-sized scored set (the
    # offline re-rank shape: window partitioned by host, never a
    # global sort) — the serving path collapses a pool cut instead
    from search_engine_spark.operators import collapse as CP

    def _collapse_full():
        scored = docs.select(
            F.col("doc_id").cast("string").alias("url"),
            (F.col("doc_id") % 997).cast("string").alias("host"),
            (F.pmod(F.xxhash64(F.col("doc_id").cast("string")),
                    F.lit(1_000_000))).cast("double").alias("score"))
        return CP.collapse_run(scored, group_col="host", per_group=2, k=10)

    run("collapse_full_corpus", _collapse_full)

    if args.only is None or "autocomplete_indexed" in args.only:
        # layout built OUTSIDE the timer (once-per-corpus artifact);
        # measured: the startswith-pruned suggest-box serve
        import tempfile as _tf2

        from search_engine_spark.operators import snippets as SNP

        dic = (docs.select(F.explode(TS.simple_tokens()).alias("tok"))
               .groupBy("tok").agg(F.count(F.lit(1)).alias("cf")))
        ac_ix = _tf2.mkdtemp(prefix="pb_ac_ix_")
        SNP.write_autocomplete_index(dic, ac_ix, term_col="tok", cf_col="cf")
        run("autocomplete_indexed", lambda: SNP.autocomplete_indexed(
            spark, ac_ix, ["s", "c", "d"], k=4))

    # hybrid lexical ⊕ dense RRF over the documents shape: BM25 leg +
    # feature-hash MIPS leg + integer fusion (operators/hybrid.py)
    from search_engine_spark.operators import hybrid as HYB

    run("hybrid_rrf_top10", lambda: HYB.hybrid_rrf_topk(
        docs, ["world", "trade", "market"], k=10, candidate_k=20))

    # round-5 training-layout ops over the full corpus: the packing
    # scan (range shuffle + tiny totals collect + one Arrow pass) and
    # the map-only chunk explode (noop-sinked — a count would prune
    # the slice/join work being measured)
    from search_engine_spark.operators import packing as PKG

    def _pack():
        w = docs.select(
            "doc_id",
            F.size(TS.simple_tokens()).cast("long").alias("n_tokens"))
        return PKG.pack_shards(w, budget=100_000, n_parts=args.cpus)

    run("pack_shards_full", _pack)
    run("chunk_windows_full", lambda: PKG.chunk_documents(docs, 128, 96),
        sink="noop")

    # int8-quantized MIPS over the full corpus's embeddings table:
    # the embeddings materialize ONCE outside the timer (they are an
    # upstream artifact — hash_embed has its own row, and the driver
    # rows read a stored embeddings table the same way); measured:
    # quantize (absmax scalar subquery) + BIGINT dot + TakeOrdered,
    # which an in-plan lazy hash_embed would otherwise recompute 3x
    if args.only is None or "ann_int8_top10_full" in args.only:
        import tempfile as _tf4

        from search_engine_spark.operators import embed as EMB
        from search_engine_spark.operators import similarity as SIML

        emb_path = _tf4.mkdtemp(prefix="pb_emb_")
        (EMB.hash_embed(docs)
         .select(F.col("doc_id").alias("vec_id"), "embedding")
         .write.mode("overwrite").parquet(emb_path))
        run("ann_int8_top10_full", lambda: SIML.ann_int8_topk(
            spark.read.parquet(emb_path), query_id=0, k=10))

    _QP = {"fuzzy_top10", "fuzzy_top10_indexed", "proximity_top10",
           "result_page_top10", "docstore_fetch_10", "wildcard_top10",
           "prf_top10", "span_near_top10", "span_unordered_top10",
           "rescore_top10", "tree_top10", "kgram_build",
           "wildcard_infix_top10", "sort_by_time_top10",
           "phrase_prefix_top10", "federated_top10_240k",
           "range_agg_240k", "checkindex_240k"}
    if args.only is None or _QP & set(args.only):
        # packed POSITIONAL index over the same corpus, built once
        # OUTSIDE the timers (a per-corpus artifact, like the anchor
        # and autocomplete layouts above); measured: the per-query
        # serving cost of the round-5 typo-correction and proximity
        # paths at 48x the per-round bench corpus
        import tempfile as _tf3

        from search_engine_spark.config import EngineConfig
        from search_engine_spark.indexer import build_index
        from search_engine_spark.searcher import SearchEngine

        qp_cfg = EngineConfig(n_doc_shards=32, n_term_buckets=16,
                              n_bucket_groups=1, keep_positions=True)
        qp_ix = _tf3.mkdtemp(prefix="pb_qp_ix_")
        build_index(spark, spark.read.parquet(corpus), qp_ix, qp_cfg,
                    resume=False)
        eng = SearchEngine(spark, qp_ix, qp_cfg)
        # two misses (corrected via the fresh vocab-scan suggester) +
        # one exact hit — the realistic typo mix
        run("fuzzy_top10", lambda: eng.fuzzy_search("wrold tade market", 10))
        from search_engine_spark.operators import snippets as SNP2

        sug_ix = _tf3.mkdtemp(prefix="pb_sug_ix_")
        SNP2.write_suggest_index(eng._dictionary, sug_ix, max_dist=2)
        run("fuzzy_top10_indexed", lambda: eng.fuzzy_search(
            "wrold tade market", 10, suggest_path=sug_ix))
        run("proximity_top10", lambda: eng.proximity_search(
            "world trade market", 10))
        # ordered/unordered span-near over the same head terms (the
        # worst case: candidates ~ the corpus) — chain joins keyed on
        # (shard, local_id) with the slop window as a band predicate
        run("span_near_top10", lambda: eng.span_near_search(
            "world trade", slop=3, k=10))
        run("span_unordered_top10", lambda: eng.span_near_search(
            "world trade", slop=3, k=10, ordered=False))
        # two-phase rescore: BM25 top-50 window + candidate-restricted
        # proximity second pass (the whole point: positional cost is
        # window-sized no matter how common the terms are)
        run("rescore_top10", lambda: eng.rescore_search(
            "world trade market", k=10, window=50))
        # single-member federation over the 240k index: the alias
        # read path's overhead (global-stat fetch + override unpack +
        # union/heap tail) vs the direct plan at corpus scale
        from search_engine_spark.federated import federated_search

        run("federated_top10_240k", lambda: federated_search(
            spark, [qp_ix], "world trade market", 10, qp_cfg,
            engines=[eng]))
        # ES range aggregation under a query context: three overlapping
        # text-length bands over every matching doc
        _rv = spark.read.parquet(corpus).select(
            "url", F.length("text").cast("long").alias("v"))
        run("range_agg_240k", lambda: eng.search_range_agg(
            "world trade market", _rv, "v",
            [(None, 400), (200, 800), (600, None)]))
        # CheckIndex fsck of the 240k packed index (Spark-free DuckDB
        # aggregations over the parquet layout)
        if args.only is None or "checkindex_240k" in args.only:
            from search_engine_spark.checkindex import check_index

            t0 = time.time()
            rep = check_index(qp_ix)
            timings["checkindex_240k"] = round(time.time() - t0, 2)
            counts["checkindex_240k"] = int(rep["ok"])
            print(f"checkindex_240k: {timings['checkindex_240k']}s, "
                  f"ok={rep['ok']}", file=sys.stderr, flush=True)
        # nested boolean tree on the non-positional paths
        run("tree_top10", lambda: eng.tree_search(
            {"op": "andnot", "kids": [
                {"op": "and", "kids": [
                    {"op": "or", "kids": [{"term": "world"}, {"term": "global"}]},
                    {"op": "or", "kids": [{"term": "trade"}, {"term": "market"}]},
                ]},
                {"term": "growth"},
            ]}, 10))
        # stored-fields docstore (built once, outside the timer):
        # measured are the k-result text fetch alone and the fully
        # assembled result page (top-10 + match positions from the
        # positional postings + KWIC excerpts over the 10 fetched docs)
        from search_engine_spark.operators import docstore as DSO

        ds_path = _tf3.mkdtemp(prefix="pb_docstore_")
        DSO.write_docstore(spark.read.parquet(corpus).select("url", "text"),
                           ds_path, index_dir=qp_ix)
        some_urls = [r["url"] for r in
                     spark.read.parquet(corpus).select("url").limit(10).collect()]
        run("docstore_fetch_10", lambda: DSO.fetch_docs(
            spark, ds_path, some_urls))
        run("result_page_top10", lambda: eng.search_with_snippets(
            "world trade market", ds_path, k=10))
        # trailing-wildcard serve: df-capped prefix expansion over the
        # 240k dictionary + the ordinary pruned-scan BM25 tail
        run("wildcard_top10", lambda: eng.wildcard_search("wor* trade", 10))
        # pseudo-relevance feedback: the doc-major term-vector layout
        # is built once OUTSIDE the timer (per-corpus artifact);
        # measured: base top-10 + pruned 10-doc vector fetch +
        # expansion + second pass
        from search_engine_spark import twin as TWN
        from search_engine_spark.operators import termvectors as TVO

        tv_path = _tf3.mkdtemp(prefix="pb_tv_")
        TVO.write_term_vectors(TWN.raw_postings(spark, eng), tv_path,
                               index_dir=qp_ix)
        run("prf_top10", lambda: eng.prf_search(
            "world trade market", tv_path, 10))
        # k-gram side-car over the 240k dictionary (built once,
        # outside the timers like the suggest/tv layouts); measured:
        # the gram-IN pruned infix-wildcard serve
        from search_engine_spark.operators import kgram as KGO

        kg_ix = _tf3.mkdtemp(prefix="pb_kg_")
        t0 = time.time()
        KGO.write_kgram_index(eng._dictionary, kg_ix, index_dir=qp_ix)
        timings["kgram_build"] = round(time.time() - t0, 2)
        print(f"kgram_build: {timings['kgram_build']}s",
              file=sys.stderr, flush=True)
        run("wildcard_infix_top10", lambda: eng.wildcard_search_indexed(
            "*rld trade", kg_ix, 10))
        # as-you-type phrase box: head chain join + ONE expansion leg
        # pruned to the df-capped prefix set over the 240k vocabulary
        run("phrase_prefix_top10",
            lambda: eng.phrase_prefix_search("world tra*", 10))
        # newest-first sorted page over the matching set
        pages_ts = spark.read.parquet(corpus).select(
            "url", F.col("warc_ts").cast("long").alias("sort_key"))
        run("sort_by_time_top10", lambda: eng.search_sorted(
            "world trade market", pages_ts, 10))

    print(json.dumps({
        "metric": "pipeline ops at scale corpus",
        "docs": args.docs,
        "cpus": args.cpus,
        "seconds": timings,
        "rows": counts,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
