"""Count-min sketch (operators/sketches.py).

Pins: exact estimates when the width makes collisions impossible,
the one-sided overestimate property under forced collisions, the
per-row mass invariant (every CMS row conserves the total weight),
bit-identical cells across partitionings, and the absent-term path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_spark.operators.sketches import cms_cells, cms_estimate


def _tf(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, tok string, tf long")


def test_exact_when_no_collisions(spark):
    tf = _tf(spark, [(1, "alpha", 3), (1, "beta", 2), (2, "alpha", 4),
                     (2, "gamma", 1)])
    cells = cms_cells(tf, width=1 << 16, depth=4)
    got = {r["term"]: r["est"] for r in
           cms_estimate(cells, ["alpha", "beta", "gamma", "absent"],
                        width=1 << 16, depth=4).collect()}
    # 3 tokens in a 65536-wide row: collisions are (checked) absent,
    # so the sketch answers exactly; the absent term hits empty cells
    assert got == {"alpha": 7, "beta": 2, "gamma": 1, "absent": 0}


def test_overestimate_and_row_mass_invariant(spark):
    # width 2 forces collisions in every row: estimates may only go UP
    tf = _tf(spark, [(1, f"tok{i}", i + 1) for i in range(20)])
    total = sum(i + 1 for i in range(20))
    cells = cms_cells(tf, width=2, depth=4)
    rows = cells.groupBy("row").agg(F.sum("count").alias("mass")).collect()
    assert {r["row"] for r in rows} == {0, 1, 2, 3}
    assert all(r["mass"] == total for r in rows)  # each row conserves mass
    exact = {f"tok{i}": i + 1 for i in range(20)}
    est = {r["term"]: r["est"] for r in
           cms_estimate(cells, list(exact), width=2, depth=4).collect()}
    assert all(est[t] >= exact[t] for t in exact)
    assert all(est[t] <= total for t in exact)


def test_cells_partitioning_independent(spark):
    tf = _tf(spark, [(i, f"t{i % 13}", (i % 5) + 1) for i in range(200)])
    a = {(r["row"], r["col"]): r["count"]
         for r in cms_cells(tf, width=64, depth=4).collect()}
    b = {(r["row"], r["col"]): r["count"]
         for r in cms_cells(tf.repartition(7), width=64, depth=4).collect()}
    assert a == b and a


def test_bloom_no_false_negatives_and_determinism(spark):
    from search_engine_spark.operators.sketches import bloom_bits, bloom_contains

    keys = spark.createDataFrame(
        [(f"word{i}",) for i in range(50)], "key string")
    bits = bloom_bits(keys, m_bits=1 << 16, k_hashes=5)
    got = {r["key"]: r["maybe_present"] for r in bloom_contains(
        bits, [f"word{i}" for i in range(50)] + ["absent1", "absent2"],
        m_bits=1 << 16, k_hashes=5).collect()}
    assert all(got[f"word{i}"] for i in range(50))  # never a false negative
    # 250 set bits in 65536: a 5-bit collision for the absent probes
    # is (deterministically) not happening at these parameters
    assert not got["absent1"] and not got["absent2"]
    a = {r["bit"] for r in bits.collect()}
    b = {r["bit"] for r in bloom_bits(
        keys.repartition(7), m_bits=1 << 16, k_hashes=5).collect()}
    assert a == b and a


def test_hll_merge_and_estimate(spark):
    from search_engine_spark.operators.sketches import (
        hll_estimate, hll_registers)
    from pyspark.sql import functions as F

    a = spark.createDataFrame([(f"a{i}",) for i in range(300)], "key string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(300)], "key string")
    both = a.unionByName(b)
    # mergeability: registers(A ∪ B) == per-register max of the parts
    merged = (
        hll_registers(a).unionByName(hll_registers(b))
        .groupBy("j").agg(F.max("reg").alias("reg"))
    )
    direct = {(r["j"], r["reg"]) for r in hll_registers(both).collect()}
    assert {(r["j"], r["reg"]) for r in merged.collect()} == direct
    # the estimate lands near the truth (64 registers: ~13% std error)
    est = hll_estimate(hll_registers(both)).collect()[0]["est"]
    assert 600 * 0.7 <= est <= 600 * 1.3
    # partitioning independence of the state
    alt = {(r["j"], r["reg"])
           for r in hll_registers(both.repartition(9)).collect()}
    assert alt == direct


def test_grouped_hll_per_key_distinct(spark):
    from search_engine_spark.operators.sketches import (
        hll_estimate_by, hll_registers_by)

    rows = ([("big", f"k{i}") for i in range(400)]
            + [("mid", f"k{i}") for i in range(40)]
            + [("tiny", "k0"), ("tiny", "k1"), ("tiny", "k0")])
    df = spark.createDataFrame(rows, "g string, k string")
    regs = hll_registers_by(df, "g", "k")
    # fixed-size state: never more than m register rows per group
    sizes = {r["g"]: r["n"] for r in
             regs.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert all(n <= 64 for n in sizes.values())
    est = {r["g"]: r["est"] for r in hll_estimate_by(regs, "g").collect()}
    truth = {"big": 400, "mid": 40, "tiny": 2}
    for g, n in truth.items():
        assert n * 0.7 <= est[g] <= n * 1.3, (g, est[g], n)
