"""IR evaluation metrics (trec_eval twin) and more-like-this."""

import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import ireval as IR
from search_engine_spark.operators import mlt as MLT


def test_ir_metrics_handcrafted(spark):
    run = spark.createDataFrame(
        [("q1", 1, "a"), ("q1", 2, "b"), ("q1", 3, "c"),
         ("q2", 1, "x"), ("q2", 2, "y")],
        "qid string, rank long, url string",
    )
    qrels = spark.createDataFrame(
        [("q1", "a", 1), ("q1", "c", 1), ("q1", "d", 1),   # d never retrieved
         ("q1", "b", 0),                                    # graded 0 = irrelevant
         ("q2", "zz", 0)],                                  # q2: nothing relevant
        "qid string, url string, rel long",
    )
    out = {r["qid"]: r for r in IR.ir_metrics(run, qrels, k=3).collect()}

    q1 = out["q1"]
    assert q1["n_ret"] == 3 and q1["n_rel"] == 3 and q1["n_rel_ret"] == 2
    assert q1["p_at_k"] == round(2 / 3, 6)
    assert q1["ap"] == round((1 / 1 + 2 / 3) / 3, 6)
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert q1["ndcg"] == round(dcg / idcg, 6)

    q2 = out["q2"]
    assert q2["n_rel"] == 0 and q2["n_rel_ret"] == 0
    assert q2["ap"] == 0.0 and q2["ndcg"] == 0.0 and q2["p_at_k"] == 0.0


def test_ir_metrics_ap_divides_by_total_relevant(spark):
    # trec_eval MAP: R=5 relevant but only 2 retrieved at k=2 ->
    # AP = (P(1)*1 + P(2)*1) / 5, NOT / min(R, k)
    run = spark.createDataFrame(
        [("q", 1, "u1"), ("q", 2, "u2")], "qid string, rank long, url string"
    )
    qrels = spark.createDataFrame(
        [("q", f"u{i}", 1) for i in range(1, 6)], "qid string, url string, rel long"
    )
    r = IR.ir_metrics(run, qrels, k=2).first()
    assert r["n_rel"] == 5 and r["n_rel_ret"] == 2
    assert r["ap"] == round((1.0 + 1.0) / 5, 6)


def test_ir_metrics_perfect_run(spark):
    run = spark.createDataFrame(
        [("q", i, f"u{i}") for i in range(1, 6)], "qid string, rank long, url string"
    )
    qrels = spark.createDataFrame(
        [("q", f"u{i}", 1) for i in range(1, 6)], "qid string, url string, rel long"
    )
    r = IR.ir_metrics(run, qrels, k=5).first()
    assert r["p_at_k"] == 1.0 and r["ap"] == 1.0 and r["ndcg"] == 1.0


def test_mean_metrics(spark):
    run = spark.createDataFrame(
        [("q1", 1, "a"), ("q2", 1, "b")], "qid string, rank long, url string"
    )
    qrels = spark.createDataFrame(
        [("q1", "a", 1)], "qid string, url string, rel long"
    )
    m = IR.mean_metrics(IR.ir_metrics(run, qrels, k=1)).first()
    assert m["n_queries"] == 2
    assert m["map"] == 0.5 and m["mean_ndcg"] == 0.5 and m["mean_p_at_k"] == 0.5


def _mlt_docs(spark):
    return spark.createDataFrame(
        [(0, "apple banana cherry"),
         (1, "apple banana dog"),
         (2, "unrelated words only"),
         (3, "apple apple apple")],
        "doc_id long, text string",
    )


def test_more_like_this_handcrafted(spark):
    out = MLT.more_like_this(_mlt_docs(spark), query_doc_id=0, k=10).collect()
    ids = [r["doc_id"] for r in sorted(out, key=lambda r: -r["cosine"])]
    # doc2 shares no term -> absent; doc1 (2 shared terms) beats doc3
    assert ids == [1, 3]
    ia, ib = math.log2(4 / 3), math.log2(4 / 2)   # idf(apple), idf(banana)
    ic = math.log2(4 / 1)
    n0 = math.sqrt(ia * ia + ib * ib + ic * ic)
    n1 = n0                                        # symmetric weights
    got = {r["doc_id"]: r["cosine"] for r in out}
    assert got[1] == round((ia * ia + ib * ib) / (n0 * n1), 6)
    n3 = 3 * ia
    assert got[3] == round((3 * ia * ia) / (n0 * n3), 6)


def test_more_like_this_plan_shape(spark):
    out = MLT.more_like_this(_mlt_docs(spark), query_doc_id=0, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan          # top-k, not a global window
    assert "CartesianProduct" not in plan.replace(
        "BroadcastNestedLoopJoin", "")              # 1-row qnorm cross join is broadcast
    assert "BroadcastHashJoin" in plan              # query-term side broadcast


def test_more_like_this_excludes_self(spark):
    out = MLT.more_like_this(_mlt_docs(spark), query_doc_id=0, k=10).collect()
    assert 0 not in {r["doc_id"] for r in out}


def test_more_like_this_missing_or_empty_query_doc(spark):
    docs = _mlt_docs(spark)
    assert MLT.more_like_this(docs, query_doc_id=999, k=5).count() == 0
    with_empty = docs.union(
        spark.createDataFrame([(7, "")], "doc_id long, text string")
    )
    assert MLT.more_like_this(with_empty, query_doc_id=7, k=5).count() == 0


def test_surprisal_skips_tokenless_docs(spark):
    from search_engine_spark.operators import webquality as WQ

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, ""), (3, None)], "doc_id long, text string"
    )
    out = WQ.surprisal_buckets(docs)
    assert {r["doc_id"] for r in out.collect()} == {1}


# ---------------------------------------------------------------------------
# stored MLT layout: per-query serving without corpus passes


def test_mlt_indexed_matches_inmemory(spark, tmp_dir):
    """The stored layout must return the exact rows of the in-memory
    operator (same weights, same rounding) for several query docs on
    the real fixture corpus."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = f"{tmp_dir}/mltix"
    MLT.write_mlt_index(docs, path)
    for qid in (0, 7, 33):
        mem = [(r["doc_id"], r["cosine"]) for r in
               MLT.more_like_this(docs, qid, k=10).collect()]
        idx = [(r["doc_id"], r["cosine"]) for r in
               MLT.more_like_this_indexed(spark, path, docs, qid, k=10).collect()]
        assert idx == mem, f"query doc {qid}"


def test_mlt_indexed_plan_is_candidates_only(spark, tmp_dir):
    """The per-query plan over the stored layout must prune the
    weights/dictionary scans to the query terms' bucket partitions
    (PartitionFilters) — no corpus-wide tokenize, count, df agg, or
    norm agg anywhere in the query plan."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = f"{tmp_dir}/mltix2"
    MLT.write_mlt_index(docs, path)
    out = MLT.more_like_this_indexed(spark, path, docs, 0, k=10)
    txt = out._jdf.queryExecution().toString()
    # the weights read is partition-pruned to the query's term buckets
    assert "PartitionFilters: [" in txt and "bucket" in txt
    # term pushdown reaches the parquet scan
    assert "PushedFilters:" in txt and "tok" in txt
    # the denormalized nrm means NO corpus-sized norm-table scan in
    # the per-query plan (the norms/ artifact exists for other
    # consumers but serving never touches it)
    assert "/norms" not in txt
    # no corpus tokenize in the per-query plan (explode only ran for
    # the one-doc query vector, which is collected before this plan)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" not in plan
    assert "TakeOrderedAndProject" in plan


def test_mlt_indexed_missing_query_doc(spark, tmp_dir):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = f"{tmp_dir}/mltix3"
    MLT.write_mlt_index(docs, path)
    assert MLT.more_like_this_indexed(spark, path, docs, 10**9, k=5).count() == 0


def test_sidecar_layouts_refuse_stale_index(spark, tmp_dir):
    """Side-car staleness guard: MLT and suggest layouts built with an
    ``index_dir`` tie serve while the index is at the stamped lineage
    position, REFUSE after any index mutation (add_documents moves the
    lineage), and serve again once rebuilt — the same fail-loudly
    discipline as the searcher's pending-append guard."""
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.incremental import add_documents
    from search_engine_spark.indexer import build_index
    from search_engine_spark.operators.snippets import (
        suggest_terms_indexed, write_suggest_index)
    from search_engine_spark.operators.textstats import simple_tokens

    cfg = EngineConfig(n_doc_shards=2, n_term_buckets=2, n_bucket_groups=1)
    ix = f"{tmp_dir}/ix"
    rows = [(f"http://s/{i}", f"alpha beta gamma delta doc{i}") for i in range(8)]
    pages = (
        spark.createDataFrame(rows, "url string, text string")
        .withColumn("warc_ts", F.current_timestamp())
        .withColumn("html", F.lit(None).cast("binary"))
        .withColumn("lang", F.lit("en"))
    )
    build_index(spark, pages.filter(F.col("url") != "http://s/7"), ix, cfg)
    docs = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(rows[:7])], "doc_id long, text string")
    vocab = (docs.select(F.explode(simple_tokens()).alias("tok"))
             .groupBy("tok").agg(F.count(F.lit(1)).alias("df")))
    mlt_path, sug_path = f"{tmp_dir}/mlt", f"{tmp_dir}/sug"

    def build_layouts():
        MLT.write_mlt_index(docs, mlt_path, index_dir=ix)
        write_suggest_index(vocab, sug_path, max_dist=1,
                            term_col="tok", df_col="df", index_dir=ix)

    def serve_both():
        MLT.more_like_this_indexed(spark, mlt_path, docs, 0, 3).collect()
        return suggest_terms_indexed(spark, sug_path, ["alpka"], 1).collect()

    build_layouts()
    assert serve_both()[0]["suggestion"] == "alpha"   # fresh: serves
    add_documents(spark, pages.filter(F.col("url") == "http://s/7"), ix, cfg)
    with pytest.raises(RuntimeError, match="STALE"):
        MLT.more_like_this_indexed(spark, mlt_path, docs, 0, 3)
    with pytest.raises(RuntimeError, match="STALE"):
        suggest_terms_indexed(spark, sug_path, ["alpka"], 1)
    build_layouts()                                   # rebuilt at the new position
    assert serve_both()[0]["suggestion"] == "alpha"
    # untied layouts (no index_dir) keep serving regardless
    MLT.write_mlt_index(docs, f"{tmp_dir}/mlt_free")
    MLT.more_like_this_indexed(spark, f"{tmp_dir}/mlt_free", docs, 0, 3).collect()
