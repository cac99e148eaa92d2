"""CLI: query a built index.

    python query.py --index /tmp/ix "world trade"            # single query
    python query.py --index /tmp/ix --batch q1:"world trade" q2:"space rocket"
    python query.py --index /tmp/ix --wand "world trade"     # block-max WAND
    python query.py --index /tmp/ix --batch --wand q1:"..." q2:"..."  # batched WAND
    python query.py --index /tmp/ix --phrase "world trade"   # exact phrase
    python query.py --index /tmp/ix --must nation --must-not growth "policy"  # boolean
    python query.py --index /tmp/ix --loop 20 "world trade"  # q/s measurement
    python query.py --index /tmp/ix --collapse 2 "world trade" # <=2 hits/host
    python query.py --index /tmp/ix --complete wor tra       # suggest box
    python query.py --index /tmp/ix --fuzzy "wrold tade"      # typo correction
    python query.py --index /tmp/ix --did-you-mean "wrold tade"  # banner + search
    python query.py --index /tmp/ix "trade ma*"               # trailing wildcard
    python query.py --index /tmp/ix 'data /tr[ae]d.*/'        # regex term query
    python query.py --index /tmp/ix '+trade ma* -growth'      # query-string syntax
    python query.py --index /tmp/ix --prf /tmp/tv "world trade"  # feedback expansion
    python query.py --index /tmp/ix --proximity "world trade" # closest-pair rank
    python query.py --index /tmp/ix --span-near 3 "world trade"  # ordered within slop
    python query.py --index /tmp/ix --rescore 50 "world trade"   # two-phase ranking
    python query.py --index /tmp/ix --tree '{"op":"or","kids":[...]}' x  # boolean tree
    python query.py --index /tmp/ix --snippets /tmp/store "world trade"  # result page
    python query.py --index /tmp/ix --explain "world trade"  # score breakdown
    python query.py --index /tmp/ix --synonyms syn.parquet "data row"  # synonym groups
    python query.py --index /tmp/ix "data^2 table row^0.5"    # per-term boosts

Cluster: ``spark-submit --py-files engine.zip query.py ...``.
Outputs TREC-style lines ``qid rank url score`` (real scores — the
reference hard-codes 42.38, quirk Q8 resolved per SURVEY §2.9).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--master", default=None)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--wand", action="store_true")
    ap.add_argument("--batch", action="store_true",
                    help="args are qid:querytext pairs, scored in one job")
    ap.add_argument("--phrase", action="store_true",
                    help="exact phrase query (index must be built with "
                         "keep_positions=True)")
    ap.add_argument("--must", default="",
                    help="boolean search: terms every result must contain")
    ap.add_argument("--must-not", dest="must_not", default="",
                    help="boolean search: terms no result may contain")
    ap.add_argument("--loop", type=int, default=0,
                    help="repeat the query N times and report q/s")
    ap.add_argument("--complete", action="store_true",
                    help="args are typed prefixes; print top-k dictionary "
                         "completions by collection frequency")
    ap.add_argument("--collapse", type=int, default=0, metavar="N",
                    help="diversify the result page: at most N results per "
                         "host (pool = max(50, 5k), then top-k)")
    ap.add_argument("--page", type=int, default=1,
                    help="result page (1-based, k rows per page, global ranks)")
    ap.add_argument("--prf", default=None, metavar="TV",
                    help="pseudo-relevance feedback: expand the query with "
                         "the top results' strongest terms, read from the "
                         "stored term-vector layout at TV "
                         "(index_admin.py termvectors)")
    ap.add_argument("--fuzzy", action="store_true",
                    help="correct out-of-vocabulary query terms to their "
                         "closest dictionary term (<=2 edits) before scoring")
    ap.add_argument("--did-you-mean", dest="did_you_mean",
                    action="store_true",
                    help="print a whole-query correction banner (every "
                         "term kept; in-vocabulary terms replaced only on "
                         "a >4x-more-frequent neighbor) and score the "
                         "corrected query")
    ap.add_argument("--span-near", dest="span_near", type=int, default=None,
                    metavar="SLOP",
                    help="ordered span-near: phrase terms in order within "
                         "the phrase's minimal span + SLOP (positional "
                         "index required); ranks by exact span_tf")
    ap.add_argument("--any-order", action="store_true",
                    help="with --span-near: drop the phrase-order constraint")
    ap.add_argument("--phrase-prefix", dest="phrase_prefix",
                    action="store_true",
                    help="as-you-type phrase box: the query's last token is "
                         "a prefix ('quick bro*') expanded against the "
                         "vocabulary (df-capped); positional index required")
    ap.add_argument("--tree", default=None, metavar="JSON",
                    help="nested boolean query tree, e.g. "
                         "'{\"op\":\"and\",\"kids\":[{\"term\":\"a\"},"
                         "{\"op\":\"or\",\"kids\":[...]}]}' "
                         "(query args are ignored)")
    ap.add_argument("--rescore", type=int, default=None, metavar="WINDOW",
                    help="two-phase ranking: BM25 top-WINDOW, then a "
                         "proximity second pass over those docs only "
                         "(needs keep_positions)")
    ap.add_argument("--proximity", action="store_true",
                    help="rank by min pairwise token distance between "
                         "distinct query terms (needs keep_positions)")
    ap.add_argument("--window", type=int, default=None, metavar="W",
                    help="with --proximity: drop docs whose closest pair "
                         "is farther than W tokens")
    ap.add_argument("--snippets", default=None, metavar="STORE",
                    help="docstore dir (index_admin.py docstore): print the "
                         "assembled result page with KWIC excerpts")
    ap.add_argument("--matched", action="store_true",
                    help="append each hit's matched query terms "
                         "(Lucene/ES matched_queries)")
    ap.add_argument("--explain", action="store_true",
                    help="print the top-1 result's per-term score "
                         "breakdown (BM25 contribution, bonus, blended part)")
    ap.add_argument("--kgram", default=None, metavar="KGRAM_DIR",
                    help="serve infix/leading wildcards (*fix, *in*, a*b) "
                         "from a stored k-gram side-car "
                         "(operators/kgram.write_kgram_index)")
    ap.add_argument("--synonyms", default=None, metavar="SYN_PARQUET",
                    help="(term, syn) parquet table: expand query terms "
                         "into synonym groups scored with Lucene "
                         "SynonymQuery semantics (blended tf, max df)")
    ap.add_argument("--dismax", type=float, default=None, metavar="TIE",
                    help="DisjunctionMax scoring: best clause + TIE x "
                         "the others (Lucene dis_max / best_fields)")
    ap.add_argument("--alias", action="store_true",
                    help="treat --index as an ALIAS directory "
                         "(aliases.py): federated search over every "
                         "member with global collection statistics")
    ap.add_argument("query", nargs="+")
    args = ap.parse_args()

    from search_engine_spark.searcher import SearchEngine
    from search_engine_spark.session import get_spark
    from search_engine_spark.wand import wand_search

    spark = get_spark(app="query", master=args.master)

    if args.alias:
        from search_engine_spark.aliases import alias_search

        text = " ".join(args.query)
        for r in alias_search(spark, args.index, text, args.k).collect():
            print(f"q1 {r['rank']} {r['url']} {r['score']:.6f}")
        spark.stop()
        return

    eng = SearchEngine(spark, args.index)

    if args.complete:
        from search_engine_spark.operators.snippets import autocomplete

        out = autocomplete(eng.dictionary, args.query, args.k,
                           term_col="term_key", cf_col="cf")
        for r in out.collect():
            print(f"{r['prefix']} {r['rank']} {r['completion']} {r['cf']}")
        spark.stop()
        return

    if args.dismax is not None:
        text = " ".join(args.query)
        for r in eng.dismax_search(text, args.k, tie=args.dismax).collect():
            print(f"q1 {r['rank']} {r['url']} {r['score']:.6f}")
        spark.stop()
        return

    if args.batch:
        pairs = []
        for item in args.query:
            qid, _, text = item.partition(":")
            pairs.append((qid, text))
        if args.wand:
            from search_engine_spark.wand import wand_search_batch

            out = wand_search_batch(eng, pairs, args.k)
        else:
            out = eng.search_batch(pairs, args.k)
        for r in out.collect():
            print(f"{r['qid']} {r['rank']} {r['url']} {r['score']:.6f}")
    elif args.phrase:
        text = " ".join(args.query)
        for r in eng.phrase_search(text, args.k).collect():
            print(f"q1 {r['rank']} {r['url']} {r['phrase_tf']}")
    elif args.matched:
        text = " ".join(args.query)
        for r in eng.search_matched(text, args.k).collect():
            terms = ",".join(r["matched"])
            print(f"q1 {r['rank']} {r['url']} {r['score']:.6f} [{terms}]")
    elif args.explain:
        text = " ".join(args.query)
        top = eng.search(text, 1).collect()
        if not top:
            print("no results")
        else:
            r0 = top[0]
            print(f"top1 {r0['url']} score={r0['score']:.6f}")
            for r in eng.explain_score(text, r0["url"]).collect():
                print(f"  {r['term_key']}: bm25={r['bm25_contrib']:.6f} "
                      f"bonus={r['bonus']:.1f} part={r['part']:.6f}")
    elif args.snippets:
        text = " ".join(args.query)
        for r in eng.search_with_snippets(text, args.snippets,
                                          k=args.k).collect():
            print(f"q1 {r['rank']} {r['url']} {r['score']:.6f} "
                  f"[{r['match_pos']}] {r['snippet']}")
    elif args.kgram is not None:
        text = " ".join(args.query)
        has_rx = any(len(t) > 2 and t[0] == "/" and t[-1] == "/"
                     for t in text.split())
        run_ix = (eng.regex_search_indexed if has_rx
                  else eng.wildcard_search_indexed)
        for r in run_ix(text, args.kgram, args.k).collect():
            print(f"q1 {r['rank']} {r['url']} {r['score']:.6f}")
    elif args.phrase_prefix:
        text = " ".join(args.query)
        for r in eng.phrase_prefix_search(text, args.k).collect():
            print(f"q1 {r['rank']} {r['url']} {r['phrase_tf']}")
    elif args.did_you_mean:
        text = " ".join(args.query)
        banner = eng.did_you_mean(text).collect()
        for r in banner:
            mark = "->" if r["changed"] else "=="
            print(f"banner {r['term']} {mark} {r['suggestion']} "
                  f"dist={r['dist']} df={r['df_term']}->{r['df_sugg']}")
        for r in eng.did_you_mean_search(text, args.k).collect():
            print(f"q1 {r['rank']} {r['url']} {r['score']:.6f}")
    elif args.span_near is not None:
        text = " ".join(args.query)
        for r in eng.span_near_search(text, slop=args.span_near,
                                      k=args.k,
                                      ordered=not args.any_order).collect():
            print(f"q1 {r['rank']} {r['url']} {r['span_tf']}")
    elif args.tree is not None:
        for r in eng.tree_search(json.loads(args.tree), args.k).collect():
            print(f"q1 {r['rank']} {r['url']} {r['score']:.6f}")
    elif args.rescore is not None:
        text = " ".join(args.query)
        for r in eng.rescore_search(text, k=args.k,
                                    window=args.rescore).collect():
            print(f"q1 {r['rank']} {r['url']} {r['min_dist']} {r['rescore']:.6f}")
    elif args.proximity:
        text = " ".join(args.query)
        for r in eng.proximity_search(text, args.k,
                                      max_window=args.window).collect():
            print(f"q1 {r['rank']} {r['url']} {r['min_dist']} {r['score']:.6f}")
    else:
        text = " ".join(args.query)
        if args.must or args.must_not:
            run = lambda: eng.boolean_search(  # noqa: E731
                must=args.must, should=text, must_not=args.must_not,
                k=args.k)
        else:
            # Lucene-QueryParser markers route through the composed
            # query-string dispatch (+must, -not, term*, "phrase")
            from search_engine_spark.searcher import is_tree_syntax

            has_qs = is_tree_syntax(text) or any(
                (t[0] in '+-' and len(t) > 1)
                or (t.endswith("*") and len(t) > 1)
                or t.startswith('"')
                or "^" in t
                for t in text.split())
            has_rx = any(len(t) > 2 and t[0] == "/" and t[-1] == "/"
                         for t in text.split())
            run = (lambda: wand_search(eng, text, args.k)) if args.wand else (
                (lambda: eng.synonym_search(
                    text, spark.read.parquet(args.synonyms), args.k))
                if args.synonyms else
                (lambda: eng.prf_search(text, args.prf, args.k)) if args.prf else
                (lambda: eng.fuzzy_search(text, args.k)) if args.fuzzy else
                (lambda: eng.regex_search(text, args.k)) if has_rx else
                (lambda: eng.query_string_search(text, args.k)) if has_qs else
                (lambda: eng.search_page(text, args.k, args.page))
                if args.page > 1 else
                lambda: eng.search(text, args.k))
        if args.loop:
            run().collect()  # warm
            t0 = time.time()
            for _ in range(args.loop):
                run().collect()
            dt = time.time() - t0
            print(json.dumps({"queries": args.loop, "seconds": round(dt, 3),
                              "qps": round(args.loop / dt, 2)}))
        elif args.collapse:
            from pyspark.sql import functions as F

            from search_engine_spark.operators.collapse import collapse_run
            from search_engine_spark.operators.urls import _norm_expr, host_of

            pool_k = max(50, 5 * args.k)
            pool = (
                (wand_search(eng, text, pool_k) if args.wand
                 else eng.search(text, pool_k))
                .withColumn("host", host_of(_norm_expr(F.col("url"))))
            )
            out = collapse_run(pool, group_col="host",
                               per_group=args.collapse, k=args.k)
            for r in out.collect():
                print(f"q1 {r['rank']} {r['url']} {r['score']:.6f}")
        else:
            for r in run().collect():
                print(f"q1 {r['rank']} {r['url']} {r['score']:.6f}")
    spark.stop()


if __name__ == "__main__":
    main()
