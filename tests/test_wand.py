"""Block-max WAND must be rank-identical to the full DataFrame scorer
(same OR-semantics top-k, just with block pruning)."""

from search_engine_spark.fixtures import REFERENCE_QUERIES
from search_engine_spark.searcher import SearchEngine
from search_engine_spark.wand import wand_search, wand_search_batch


def test_wand_rank_identical_to_full_scorer(spark, built_index):
    out, cfg, meta = built_index
    eng = SearchEngine(spark, out, cfg)
    for qid, title, desc in REFERENCE_QUERIES[:10]:
        q = title + ("@" + desc if desc else "")
        full = [(r["url"], round(r["score"], 9)) for r in eng.search(q, 15).collect()]
        wand = [(r["url"], round(r["score"], 9)) for r in wand_search(eng, q, 15).collect()]
        assert wand == full, qid


def test_wand_empty_query(spark, built_index):
    out, cfg, meta = built_index
    eng = SearchEngine(spark, out, cfg)
    assert wand_search(eng, "the of and", 10).count() == 0


def test_wand_batch_rank_identical_to_exhaustive_batch(spark, built_index):
    out, cfg, meta = built_index
    eng = SearchEngine(spark, out, cfg)
    batch = [(qid, t + ("@" + d if d else "")) for qid, t, d in REFERENCE_QUERIES[:8]]
    # one stop-word-only query must simply produce no rows for its qid
    batch.append(("qz", "the of and"))
    full = {(r["qid"], r["rank"]): (r["url"], round(r["score"], 9))
            for r in eng.search_batch(batch, 12).collect()}
    wand = {(r["qid"], r["rank"]): (r["url"], round(r["score"], 9))
            for r in wand_search_batch(eng, batch, 12).collect()}
    assert wand == full
    assert not any(qid == "qz" for qid, _ in wand)
    assert len({qid for qid, _ in wand}) == 8


def test_wand_batch_duplicate_qid_unions_terms(spark, built_index):
    # a qid appearing twice is scored over the UNION of its queries'
    # terms in BOTH the exhaustive and the WAND batch path
    out, cfg, meta = built_index
    eng = SearchEngine(spark, out, cfg)
    t1, t2 = REFERENCE_QUERIES[0][1], REFERENCE_QUERIES[1][1]
    dup = [("q1", t1), ("q1", t2)]
    merged = [("q1", t1 + " " + t2)]
    full_dup = {(r["qid"], r["rank"]): (r["url"], round(r["score"], 9))
                for r in eng.search_batch(dup, 10).collect()}
    full_one = {(r["qid"], r["rank"]): (r["url"], round(r["score"], 9))
                for r in eng.search_batch(merged, 10).collect()}
    wand_dup = {(r["qid"], r["rank"]): (r["url"], round(r["score"], 9))
                for r in wand_search_batch(eng, dup, 10).collect()}
    assert full_dup == full_one == wand_dup


def test_wand_batch_with_tombstones(spark, built_index):
    out, cfg, meta = built_index
    full_eng = SearchEngine(spark, out, cfg)
    q = REFERENCE_QUERIES[0][1]
    top = full_eng.search(q, 10).orderBy("rank").collect()
    dead = sorted({r["url"] for r in top if int(r["rank"]) % 2 == 0})
    eng = SearchEngine(spark, out, cfg, deleted_urls=dead)
    batch = [("q1", q), ("q2", REFERENCE_QUERIES[1][1])]
    full = {(r["qid"], r["rank"]): (r["url"], round(r["score"], 9))
            for r in eng.search_batch(batch, 10).collect()}
    wand = {(r["qid"], r["rank"]): (r["url"], round(r["score"], 9))
            for r in wand_search_batch(eng, batch, 10).collect()}
    assert wand == full
    assert not any(u in dead for u, _ in wand.values())
