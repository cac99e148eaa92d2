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


def test_pq_codes_match_numpy_reference(spark):
    """PQ encode == a from-scratch numpy PQ on the micro grid (seed
    codebooks, argmin with smallest-code ties), and the stored-layout
    ADC top-10 == the numpy ADC ranking."""
    ids, m = _np_embeddings(spark)
    micro = np.floor(m * 1e6 + 0.5).astype(np.int64)
    books = np.stack([micro[:16, s * 8:(s + 1) * 8] for s in range(8)])

    emb = spark.read.parquet(os.path.join(SF_001, "embeddings.parquet"))
    got = {r["vec_id"]: list(r["codes"])
           for r in SIM.pq_encode(emb, SIM.pq_codebooks(emb)).collect()}
    want = {}
    for i, vid in enumerate(ids):
        codes = []
        for s in range(8):
            d = ((books[s] - micro[i, s * 8:(s + 1) * 8]) ** 2).sum(axis=1)
            codes.append(int(np.argmin(d)))
        want[int(vid)] = codes
    assert got == want

    # ADC ranking vs numpy
    q = micro[ids.tolist().index(0)]
    dtab = np.stack([((books[s] - q[s * 8:(s + 1) * 8]) ** 2).sum(axis=1)
                     for s in range(8)])
    adc = {int(v): int(sum(dtab[s][c] for s, c in enumerate(cs)))
           for v, cs in want.items()}
    order = sorted(adc, key=lambda v: (adc[v], v))[:10]
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        SIM.write_pq_index(emb, td)
        out = SIM.pq_topk_stored(spark, td, [float(x) for x in m[ids.tolist().index(0)]], 10)
        rows = sorted(out.collect(), key=lambda r: r["rank"])
        assert [r["vec_id"] for r in rows] == order
        assert [r["adc"] for r in rows] == [adc[v] for v in order]


def test_pq_recall_vs_float_exact(spark):
    """ADC over 8x16 seed codebooks keeps useful neighbor recall on
    the clustered synthetic embeddings (>= 4 of the exact-cosine
    top-10 in the ADC top-10 for the vec_id=0 query) — PQ trades
    exactness for 32x memory, not for garbage."""
    emb = spark.read.parquet(os.path.join(SF_001, "embeddings.parquet"))
    qvec = [float(x) for x in
            emb.filter(emb.vec_id == 0).first()["embedding"]]
    exact = {r["vec_id"] for r in SIM.cosine_topk(emb, qvec, 10).collect()}
    books = SIM.pq_codebooks(emb)
    pq = {r["vec_id"] for r in
          SIM.pq_adc_topk(SIM.pq_encode(emb, books), books, qvec, 10).collect()}
    assert len(exact & pq) >= 4


def test_pq_trained_codebooks(spark):
    """Trained per-subspace k-means: deterministic across
    partitionings (repartition(7) trains bit-identical books), and it
    optimizes the actual k-means objective — total BIGINT
    quantization distortion drops monotonically from the seed books
    through more iterations (376T -> 299T -> 281T on this corpus;
    recall@10 for any single query is too noisy to pin)."""
    emb = spark.read.parquet(os.path.join(SF_001, "embeddings.parquet"))
    b1 = SIM.train_pq_codebooks(emb, n_iters=1)
    b3 = SIM.train_pq_codebooks(emb, n_iters=3)
    b3b = SIM.train_pq_codebooks(emb.repartition(7), n_iters=3)
    assert (b3 == b3b).all()

    ids, m = _np_embeddings(spark)
    micro = np.floor(m * 1e6 + 0.5).astype(np.int64)

    def distortion(books):
        tot = 0
        for i in range(micro.shape[0]):
            for s in range(8):
                d = ((books[s] - micro[i, s * 8:(s + 1) * 8]) ** 2).sum(axis=1)
                tot += int(d.min())
        return tot

    d_seed = distortion(SIM.pq_codebooks(emb))
    d1, d3 = distortion(b1), distortion(b3)
    assert d1 < d_seed and d3 < d1
