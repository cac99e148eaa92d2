"""int8 scalar-quantized ANN (operators/similarity.py quantization
family).

Golden edge cases the sf-table oracle row can't guarantee hitting: the
quantization grid itself vs a numpy reference (half-up, symmetric,
[-127, 127] bounds), an all-zero corpus (absmax -> 1.0, no NaN), MIPS
recall of the quantized ranking vs exact float cosine, the stored
layout's grid consistency (query quantized on the STORED absmax) and
its bucket partition pruning.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from search_engine_spark.operators import similarity as SIM

SF_001 = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _np_embeddings(spark):
    rows = (
        spark.read.parquet(os.path.join(SF_001, "embeddings.parquet"))
        .select("vec_id", "embedding").collect()
    )
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, m


def _np_quant(m):
    absmax = np.abs(m).max() or 1.0
    return np.floor(m / absmax * 127.0 + 0.5).astype(np.int64)


def test_quantize_matches_numpy_reference(spark):
    emb = spark.read.parquet(os.path.join(SF_001, "embeddings.parquet"))
    ids, m = _np_embeddings(spark)
    want = _np_quant(m)
    got = {r["vec_id"]: r["qvec"]
           for r in SIM.quantize_embeddings(emb).collect()}
    for i, vid in enumerate(ids):
        assert got[int(vid)] == want[i].tolist()
    flat = want.ravel()
    assert flat.min() >= -127 and flat.max() <= 127


def test_quantize_all_zero_corpus(spark):
    emb = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.0, 0.0])],
        "vec_id long, embedding array<float>")
    rows = SIM.quantize_embeddings(emb).collect()
    assert all(r["qvec"] == [0, 0] for r in rows)


def test_int8_topk_matches_numpy_reference(spark):
    emb = spark.read.parquet(os.path.join(SF_001, "embeddings.parquet"))
    ids, m = _np_embeddings(spark)
    q = _np_quant(m)
    dots = q @ q[list(ids).index(0)]
    ref = sorted(zip(ids.tolist(), dots.tolist()),
                 key=lambda t: (-t[1], t[0]))[:10]
    got = [(r["vec_id"], r["dot_int"])
           for r in SIM.ann_int8_topk(emb, 0, 10).orderBy("rank").collect()]
    assert got == [(int(i), int(d)) for i, d in ref]


def test_int8_recall_vs_float_exact(spark):
    emb = spark.read.parquet(os.path.join(SF_001, "embeddings.parquet"))
    ids, m = _np_embeddings(spark)
    approx = {r["vec_id"] for r in SIM.ann_int8_topk(emb, 0, 10).collect()}
    exact = {r["vec_id"]
             for r in SIM.cosine_topk(emb, m[0].tolist(), 10).collect()}
    # int8 MIPS vs float cosine: grid noise + norm-vs-dot ranking can
    # shuffle the tail, but a broken grid collapses the overlap
    recall = len(approx & exact) / 10
    assert recall >= 0.5, f"recall@10 {recall}"


def test_stored_layout_grid_and_pruning(spark, tmp_dir):
    emb = spark.read.parquet(os.path.join(SF_001, "embeddings.parquet"))
    ids, m = _np_embeddings(spark)
    qvec = m[0].tolist()
    path = os.path.join(tmp_dir, "q8")
    SIM.write_quantized_embeddings(emb, path)
    out = SIM.ann_int8_topk_stored(spark, path, qvec, k=10)
    # grid consistency: the stored-path dot for the query's own row
    # equals the in-plan quantized dot (same absmax, same rule)
    whole = {r["vec_id"]: r["dot_int"]
             for r in SIM.ann_int8_topk(emb, 0, 1000).collect()}
    got = [(r["vec_id"], r["dot_int"]) for r in out.orderBy("rank").collect()]
    assert got, "stored probe returned nothing"
    for vid, d in got:
        assert whole[vid] == d
    # partition pruning: the probed scan reads only probed buckets
    probe = SIM.query_bucket_and_probe(qvec, 8, 1)
    from pyspark.sql import functions as F

    vecs = (spark.read.parquet(os.path.join(path, "vectors"))
            .filter(F.col("bucket").isin(probe)))
    plan = vecs._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1][:200]
