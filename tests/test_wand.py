"""Block-max WAND must be rank-identical to the full DataFrame scorer
(same OR-semantics top-k, just with block pruning)."""

from search_engine_spark.fixtures import REFERENCE_QUERIES
from search_engine_spark.searcher import SearchEngine
from search_engine_spark.wand import wand_search


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
