"""Hybrid lexical ⊕ dense RRF fusion (operators/hybrid.py):
hand-computed fusion arithmetic, a numpy twin of the integer MIPS
leg, and the end-to-end composition."""

import hashlib

import pytest

from search_engine_spark.operators import hybrid as HY

NANO, K = HY.RRF_NANO, HY.RRF_K


def test_rrf_fuse_hand_computed(spark):
    lex = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id bigint, rank bigint")
    dense = spark.createDataFrame(
        [(11, 1), (13, 2)], "doc_id bigint, rank bigint")
    out = {r["doc_id"]: r for r in HY.rrf_fuse(lex, dense, 10).collect()}
    # doc 11 is in both legs; 10/12 lexical-only; 13 dense-only
    assert out[11]["rrf_nano"] == NANO // (K + 2) + NANO // (K + 1)
    assert out[10]["rrf_nano"] == NANO // (K + 1)
    assert out[13]["rrf_nano"] == NANO // (K + 2)
    assert out[12]["rrf_nano"] == NANO // (K + 3)
    # absent legs encode as rank 0, never null
    assert out[10]["dense_rank"] == 0 and out[13]["lex_rank"] == 0
    # fused order: the two-leg doc first, then by single-leg rank
    order = [r["doc_id"] for r in sorted(out.values(), key=lambda r: r["rank"])]
    assert order == [11, 10, 13, 12]


def _py_cells(tokens, n_dims=64):
    acc = {}
    for t in tokens:
        d = int(hashlib.md5(f"d:{t}".encode()).hexdigest()[:8], 16) % n_dims
        s = 1 if hashlib.md5(f"r:{t}".encode()).hexdigest()[0] in "01234567" else -1
        acc[d] = acc.get(d, 0) + s
    return acc


def test_dense_mips_matches_python_twin(spark):
    docs = spark.createDataFrame(
        [(0, "data table table row"), (1, "join the table"),
         (2, "nothing shared here"), (3, "data data data")],
        "doc_id bigint, text string")
    terms = ["data", "table"]
    got = {r["doc_id"]: r["dot"] for r in
           HY.dense_mips_topk(docs, terms, k=10).collect()}
    qc = _py_cells(terms)
    for doc_id, text in [(0, "data table table row"), (1, "join the table"),
                         (2, "nothing shared here"), (3, "data data data")]:
        dc = _py_cells(text.split())
        expected = sum(v * qc[d] for d, v in dc.items() if d in qc)
        shares_dim = any(d in qc for d in dc)
        if shares_dim:
            assert got[doc_id] == expected
        else:
            assert doc_id not in got


def test_query_hash_cells_accumulates_tf_and_sorts():
    base = _py_cells(["table"])
    (dim_t,) = base.keys()
    # a repeated token accumulates signed tf in its dimension
    cells = dict(HY.query_hash_cells(["table", "table", "join"]))
    assert cells[dim_t] == 2 * base[dim_t]
    assert all(v != 0 for v in cells.values())
    out = HY.query_hash_cells(["table", "join", "query"])
    assert out == sorted(out)


def test_hybrid_topk_shape_and_determinism(spark):
    rows = [(i, f"data table row term{i % 7} filler{i % 3}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    a = HY.hybrid_rrf_topk(docs, ["data", "table"], k=5, candidate_k=10).collect()
    b = HY.hybrid_rrf_topk(docs.repartition(7), ["data", "table"],
                           k=5, candidate_k=10).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert [r["rrf_nano"] for r in a] == [r["rrf_nano"] for r in b]
    assert [r["rank"] for r in a] == [1, 2, 3, 4, 5]
