"""Physical-plan assertions: the plans we ship are the plans we mean.

- filters reach the parquet scan (PushedFilters / PartitionFilters)
- small dims broadcast (BroadcastHashJoin, not SortMergeJoin)
- hot aggregates stay in codegen hash aggregation (a string agg
  buffer would silently fall back to SortAggregate — the dictionary
  regression this suite pins down)
"""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().toString()


def test_q1_filter_pushdown(spark):
    import __spark_entry__ as entry

    df = entry.queries()["tpch_q1_pricing"](spark, SF_DIR)
    txt = _optimized(df)
    assert "PushedFilters" in txt and "l_quantity" in txt


def test_revenue_joins_broadcast(spark):
    import __spark_entry__ as entry

    df = entry.queries()["revenue_by_nation"](spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_dictionary_agg_stays_hash_based(spark, built_index):
    """The dictionary stats aggregation must be hash-based: a string
    aggregation buffer silently degrades to SortAggregate (~70x at
    74M postings)."""
    out, cfg, meta = built_index
    raw = spark.read.parquet(f"{out}/postings_raw")
    stats = raw.groupBy("term_key").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
        F.bool_and("capital").alias("capital"),
    )
    plan = _plan(stats)
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan


def test_semi_join_is_semi(spark):
    import __spark_entry__ as entry

    plan = _plan(entry.queries()["semi_join_urgent_customers"](spark, SF_DIR))
    assert "LeftSemi" in plan


def test_simhash_band_join_is_hash_join(spark):
    """Banded-Hamming candidates must come from an equality hash join
    on band values — never a cartesian/BNLJ pass."""
    from search_engine_spark.operators import dedup as D

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(D.simhash_near_pairs(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_probe_filters_reach_scan(spark, tmp_dir):
    """Stored ANN layouts: the probe filter must be a PartitionFilter
    (reading only the probed directories), for both LSH and IVF."""
    import numpy as np

    from search_engine_spark.operators import similarity as SIM

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]

    p1 = os.path.join(tmp_dir, "lsh")
    SIM.write_bucketed_embeddings(emb, p1)
    plan1 = _plan(SIM.ann_lsh_topk_pruned(spark, p1, qvec))
    assert "PartitionFilters" in plan1 and "bucket" in plan1

    p2 = os.path.join(tmp_dir, "ivf")
    SIM.write_ivf_index(emb, p2)
    plan2 = _plan(SIM.ivf_topk_pruned(spark, p2, emb, qvec))
    assert "PartitionFilters" in plan2 and "centroid_id" in plan2


def test_tombstone_anti_join_broadcasts(spark, built_index):
    """The delete filter must cost a broadcast, not a shuffle: the
    tombstone side is delta-sized between compactions, so the
    anti-join on (shard, local_id) should plan as a broadcast join of
    the deleted set against the posting stream — a SortMergeJoin here
    would shuffle the full per-posting frame on every query."""
    from search_engine_spark.searcher import SearchEngine

    out, cfg, meta = built_index

    def per_posting_plan(engine):
        # the scored per-posting frame BEFORE the final top-k —
        # search()'s ranked() checkpoints its k-row input, which hides
        # the upstream join nodes from the final plan string
        resolved = engine.resolve_terms(engine.parse_query("world trade"))
        idf = dict(zip(resolved["term_key"], resolved["idf"].astype(float)))
        return _plan(engine._drop_deleted(
            engine._unpack(engine._scan_index(resolved), idf)))

    eng = SearchEngine(spark, out, cfg,
                       deleted_urls=["u1", "u2", "u3"])
    plan = per_posting_plan(eng)
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    # no-deletes engines must not pay ANY anti-join node
    clean = SearchEngine(spark, out, cfg)
    assert "LeftAnti" not in per_posting_plan(clean)


def test_index_scan_prunes(spark, built_index):
    """Query-path scan: bucket partition pruning + term_key pushdown
    (the Spark equivalent of the reference's bucket-file seek)."""
    from search_engine_spark.searcher import SearchEngine

    out, cfg, meta = built_index
    eng = SearchEngine(spark, out, cfg)
    resolved = eng.resolve_terms(eng.parse_query("world trade"))
    scan = eng._scan_index(resolved)
    txt = _optimized(scan)
    assert "PushedFilters" in txt or "term_key" in txt
    assert "PartitionFilters" in _plan(scan) or "bucket" in _plan(scan)
