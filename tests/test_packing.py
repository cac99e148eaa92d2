"""Token-budget shard packing (operators/packing.py).

Golden edge cases the sf-table oracle row can't guarantee hitting:
the straddle rule (a document crossing the budget boundary stays
whole in the shard its prefix started in), exact equality between the
distributed scan and the single-window reference form, partitioning
independence (2 vs 7 range partitions, same assignment), the writer's
per-shard directories, and the invalid-budget guard.
"""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.packing import (
    pack_shards, pack_shards_window, write_packed_shards)


def _docs(spark, weights):
    return spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)],
        "doc_id long, n_tokens long")


def test_straddle_stays_in_starting_shard(spark):
    out = {r["doc_id"]: r["shard_id"]
           for r in pack_shards(_docs(spark, [4, 4, 4, 4]), 10,
                                n_parts=2).collect()}
    # cum_before: 0, 4, 8, 12 -> shards 0, 0, 0, 1: doc 2 straddles
    # (shard 0 ends with 12 tokens), doc 3 opens shard 1
    assert out == {0: 0, 1: 0, 2: 0, 3: 1}


def test_distributed_equals_window_form(spark):
    rng = random.Random(7)
    weights = [rng.randint(1, 50) for _ in range(400)]
    d = _docs(spark, weights)
    got = {(r["doc_id"], r["shard_id"])
           for r in pack_shards(d, 137, n_parts=7).collect()}
    want = {(r["doc_id"], r["shard_id"])
            for r in pack_shards_window(d, 137).collect()}
    assert got == want


def test_partitioning_independence(spark):
    rng = random.Random(11)
    weights = [rng.randint(1, 99) for _ in range(300)]
    d = _docs(spark, weights)
    a = {(r["doc_id"], r["shard_id"])
         for r in pack_shards(d, 250, n_parts=2).collect()}
    b = {(r["doc_id"], r["shard_id"])
         for r in pack_shards(d, 250, n_parts=13).collect()}
    assert a == b


def test_shard_budget_invariant(spark):
    rng = random.Random(3)
    weights = [rng.randint(1, 40) for _ in range(200)]
    budget = 100
    rows = pack_shards(_docs(spark, weights), budget, n_parts=5).collect()
    sums: dict[int, int] = {}
    for r in rows:
        sums[r["shard_id"]] = sums.get(r["shard_id"], 0) + r["n_tokens"]
    # every shard holds < budget + its straddling doc; dropping the
    # straddler (any doc <= 40 tokens) always brings it under budget
    assert all(s < budget + 40 for s in sums.values())
    # shards are dense 0..max
    assert sorted(sums) == list(range(max(sums) + 1))


def test_writer_partitions_by_shard(spark, tmp_dir):
    docs = spark.createDataFrame(
        [(i, f"text {i}", 30) for i in range(20)],
        "doc_id long, text string, n_tokens long")
    write_packed_shards(docs, tmp_dir, budget=100)
    root = os.path.join(tmp_dir, "shards")
    dirs = {d for d in os.listdir(root) if d.startswith("shard_id=")}
    # 20 docs x 30 tokens = 600 -> shards 0..5
    assert dirs == {f"shard_id={i}" for i in range(6)}
    back = spark.read.parquet(root)
    assert back.count() == 20
    assert {r["doc_id"] for r in
            back.filter(F.col("shard_id") == 0).collect()} == {0, 1, 2, 3}


def test_invalid_budget_raises(spark):
    with pytest.raises(ValueError):
        pack_shards(_docs(spark, [1]), 0)


def test_chunking_layout_and_overlap(spark):
    from search_engine_spark.operators.packing import chunk_documents

    text = " ".join(f"t{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, text), (2, "a b c"), (3, "x")], "doc_id long, text string")
    rows = chunk_documents(docs, window=4, stride=3).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_id"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 10 tokens, window 4, stride 3 -> 1 + ceil(6/3) = 3 chunks
    c = by_doc[1]
    assert [(r["start_pos"], r["n_tokens"]) for r in c] == [
        (0, 4), (3, 4), (6, 4)]
    assert c[0]["chunk_text"] == "t0 t1 t2 t3"
    # one-token overlap between consecutive windows (window - stride)
    assert c[0]["chunk_text"].split()[-1] == c[1]["chunk_text"].split()[0]
    # shorter-than-window doc -> exactly one whole chunk
    assert [(r["n_tokens"], r["chunk_text"]) for r in by_doc[2]] == [
        (3, "a b c")]
    assert [(r["n_tokens"], r["chunk_text"]) for r in by_doc[3]] == [(1, "x")]


def test_chunking_exact_multiple_and_short_tail(spark):
    from search_engine_spark.operators.packing import chunk_documents

    text = " ".join(f"t{i}" for i in range(8))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(chunk_documents(docs, window=4, stride=4).collect(),
                  key=lambda r: r["chunk_id"])
    # 8 tokens, window 4 = stride 4 -> two full disjoint chunks
    assert [(r["start_pos"], r["n_tokens"]) for r in rows] == [(0, 4), (4, 4)]
    rows = sorted(chunk_documents(docs, window=5, stride=4).collect(),
                  key=lambda r: r["chunk_id"])
    # ceil((8-5)/4) = 1 -> 2 chunks; tail has 4 tokens (positions 5-8)
    assert [(r["start_pos"], r["n_tokens"]) for r in rows] == [(0, 5), (4, 4)]


def test_chunking_invalid_args(spark):
    from search_engine_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, window=0, stride=3)
    with pytest.raises(ValueError):
        chunk_documents(docs, window=3, stride=0)
