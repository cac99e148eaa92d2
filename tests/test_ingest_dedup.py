"""Incremental near-dup gate (dedup.write_dedup_index /
ingest_near_dups): a crawl delta dedups against stored corpus MinHash
state — planted near-dups surface, unrelated docs don't, and the gate
equals a from-scratch Python recomputation over the engine's own
signatures."""

from __future__ import annotations

import itertools

import pytest

from search_engine_spark.operators import dedup as D

BASE = ("the quick brown fox jumps over the lazy dog while the "
        "september rain falls on the quiet harbor town and the "
        "fishing boats return before sunset carrying silver herring")
VARIANT = BASE.replace("silver herring", "silver mackerel")
OTHER = ("completely different subject matter entirely about quantum "
         "chromodynamics lattice simulations and gauge field theory "
         "renormalization group flow equations in four dimensions")
MIN_AGREE = 4


def _corpus(spark):
    rows = [(0, BASE), (1, OTHER)]
    rows += [(10 + i, f"filler document number {i} with some shared "
              f"boilerplate words appended {i * 7}") for i in range(5)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _delta(spark):
    return spark.createDataFrame(
        [(100, VARIANT),                      # near-dup of corpus doc 0
         (101, "totally novel page about alpine glacier mass balance "
               "measurements and firn densification model calibration"),
         (102, "hi there")],                  # < 3 tokens → no shingles
        "doc_id long, text string")


@pytest.fixture(scope="module")
def gate_case(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dedupix"))
    meta = D.write_dedup_index(_corpus(spark), out)
    rows = D.ingest_near_dups(_delta(spark), out, MIN_AGREE).collect()
    return out, meta, rows


def test_planted_near_dup_surfaces(gate_case):
    _, meta, rows = gate_case
    assert meta["n_hashes"] == D.DEFAULT_MINHASHES
    pairs = {(r["doc_id"], r["dup_of"]): r["n_agree"] for r in rows}
    assert (100, 0) in pairs
    assert pairs[(100, 0)] >= MIN_AGREE
    # unrelated and shingle-free delta docs never pair
    assert all(did == 100 for did, _ in pairs)


def test_gate_equals_python_recompute(spark, gate_case, tmp_path_factory):
    """Re-derive the expected gate output from the engine's own
    signature frames, in plain Python: band-bucket candidates +
    component-agreement count."""
    _, _, rows = gate_case
    csig = {r["doc_id"]: [r[f"mh{s}"] for s in range(D.DEFAULT_MINHASHES)]
            for r in D.minhash_signatures(_corpus(spark)).collect()}
    dsig = {r["doc_id"]: [r[f"mh{s}"] for s in range(D.DEFAULT_MINHASHES)]
            for r in D.minhash_signatures(_delta(spark)).collect()}
    bs = D.DEFAULT_BAND_SIZE
    want = {}
    for (did, dv), (cid, cv) in itertools.product(dsig.items(), csig.items()):
        shares_band = any(dv[b * bs:(b + 1) * bs] == cv[b * bs:(b + 1) * bs]
                          for b in range(D.DEFAULT_MINHASHES // bs))
        agree = sum(a == b for a, b in zip(dv, cv))
        if shares_band and agree >= MIN_AGREE:
            want[(did, cid)] = agree
    got = {(r["doc_id"], r["dup_of"]): r["n_agree"] for r in rows}
    assert got == want and want


def test_repartition_invariance(spark, gate_case):
    out, _, rows = gate_case
    again = D.ingest_near_dups(_delta(spark).repartition(7), out,
                               MIN_AGREE).collect()
    key = lambda r: (r["doc_id"], r["dup_of"], r["n_agree"])  # noqa: E731
    assert sorted(map(key, again)) == sorted(map(key, rows))


def test_validation(spark, gate_case, tmp_path_factory):
    out = gate_case[0]
    with pytest.raises(ValueError):
        D.ingest_near_dups(_delta(spark), out, 0)
    with pytest.raises(ValueError):
        D.ingest_near_dups(_delta(spark), out, D.DEFAULT_MINHASHES + 1)
    with pytest.raises(ValueError):
        D.write_dedup_index(_corpus(spark),
                            str(tmp_path_factory.mktemp("bad")),
                            n_hashes=8, band_size=3)
