"""Feature-hash document embeddings: deterministic construction and
the docs -> vectors -> embedding-dedup integration."""

import hashlib

from pyspark.sql import functions as F

from search_engine_spark.operators import dedup as D
from search_engine_spark.operators import embed as EM
from search_engine_spark.operators.textstats import clear_doc_tf_cache


def _py_embed(text: str, n_dims: int = 64) -> list[float]:
    from collections import Counter

    v = [0] * n_dims
    for tok, tf in Counter(text.split()).items():
        d = int(hashlib.md5(f"d:{tok}".encode()).hexdigest()[:8], 16) % n_dims
        s = 1 if hashlib.md5(f"r:{tok}".encode()).hexdigest()[0] in "01234567" else -1
        v[d] += s * tf
    return [float(x) for x in v]


def test_hash_embed_matches_python_reference(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: list(r["embedding"])
           for r in EM.hash_embed(docs).collect()}
    clear_doc_tf_cache()
    assert got[1] == _py_embed("alpha beta alpha")
    assert got[2] == _py_embed("gamma delta epsilon zeta")


def test_hash_embed_identical_texts_identical_vectors(spark):
    docs = spark.createDataFrame(
        [(1, "same words here exactly"), (2, "same words here exactly"),
         (3, "different content entirely now")],
        "doc_id long, text string",
    )
    vecs = EM.hash_embed(docs)
    # duplicate docs are exact embedding duplicates -> cosine 1.0 in
    # the embedding-dedup operator (the docs->vectors->dedup pipeline)
    pairs = D.embedding_dup_pairs(
        vecs.select(F.col("doc_id").alias("vec_id"), "embedding"),
        threshold=0.99,
    ).collect()
    clear_doc_tf_cache()
    assert [(r["vec_a"], r["vec_b"], r["cosine"]) for r in pairs] == [(1, 2, 1.0)]


def test_embed_to_ann_layout_end_to_end(spark, tmp_dir):
    """The full docs -> vectors -> stored LSH layout -> pruned query
    chain: hash-embed the sf0.001 documents, write the bucketed
    layout, and the partition-pruned ANN query must agree with the
    in-memory ANN over the same vectors."""
    import os

    from search_engine_spark.operators import similarity as SIM

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    vecs = EM.hash_embed(docs).select(
        F.col("doc_id").alias("vec_id"), "embedding")
    qvec = [float(x) for x in
            vecs.filter(F.col("vec_id") == 0).first()["embedding"]]
    path = os.path.join(tmp_dir, "emb_lsh")
    SIM.write_bucketed_embeddings(vecs, path, n_planes=6, dim=EM.DEFAULT_DIMS)
    pruned = SIM.ann_lsh_topk_pruned(spark, path, qvec, k=5, n_planes=6)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    got = [(r["vec_id"], r["cosine"]) for r in pruned.collect()]
    want = [(r["vec_id"], r["cosine"]) for r in
            SIM.ann_lsh_topk(vecs, qvec, k=5, n_planes=6).collect()]
    clear_doc_tf_cache()
    assert got == want and got


def test_hash_embed_skips_tokenless_docs(spark):
    docs = spark.createDataFrame(
        [(1, "real words"), (2, ""), (3, None)], "doc_id long, text string"
    )
    out = EM.hash_embed(docs)
    ids = {r["doc_id"] for r in out.collect()}
    clear_doc_tf_cache()
    assert ids == {1}
