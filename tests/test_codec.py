"""Codec roundtrip tests incl. hypothesis properties (FIXTURES.md §6)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.codec import (
    bm25_contribution,
    delta_decode,
    delta_encode,
    pack_bits,
    pack_postings,
    unpack_bits,
    unpack_postings,
    varint_decode,
    varint_encode,
)


def test_empty():
    assert varint_encode(np.zeros(0, np.uint64)) == b""
    assert varint_decode(b"").size == 0
    assert delta_decode(delta_encode(np.zeros(0, np.uint64))).size == 0


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=500, unique=True)
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.uint64)
    assert np.array_equal(delta_decode(delta_encode(arr)), arr)


def test_delta_edge_shapes():
    for ids in ([0], [7], list(range(100)), [0, 2**32, 2**33], [2**40]):
        arr = np.array(ids, dtype=np.uint64)
        assert np.array_equal(delta_decode(delta_encode(arr)), arr)


@given(st.lists(st.booleans(), max_size=300))
@settings(max_examples=100, deadline=None)
def test_bitset_roundtrip(flags):
    arr = np.array(flags, dtype=bool)
    assert np.array_equal(unpack_bits(pack_bits(arr), len(flags)), arr)


def test_pack_postings_roundtrip_and_blocks():
    rng = np.random.default_rng(7)
    for n, bs in [(1, 128), (5, 1), (300, 128), (5000, 4096)]:
        ids = np.cumsum(rng.integers(1, 50, n).astype(np.uint64))
        tfs = rng.integers(1, 60, n).astype(np.uint64)
        lens = rng.integers(20, 600, n).astype(np.uint64)
        imps = rng.random(n) < 0.25
        row = pack_postings(ids, tfs, lens, imps, idf=3.1, k1=1.2, b=0.75,
                            avgdl=250.0, block_size=bs)
        u = unpack_postings(row)
        assert np.array_equal(u["doc_ids"], ids)
        assert np.array_equal(u["tfs"], tfs)
        assert np.array_equal(u["lens"], lens)
        assert np.array_equal(u["imps"], imps)
        n_blocks = (n + bs - 1) // bs
        assert u["block_last"].size == n_blocks
        assert u["block_last"][-1] == ids[-1]
        # block max must upper-bound every blended contribution in it
        contrib = bm25_contribution(tfs, lens, 3.1, 1.2, 0.75, 250.0)
        blended = 0.8 * contrib + 0.2 * np.where(imps, 1.2, 1.0)
        for bi in range(n_blocks):
            lo, hi = bi * bs, min((bi + 1) * bs, n)
            assert u["block_max"][bi] >= np.float32(blended[lo:hi].max()) - 1e-6


def test_bm25_monotone_in_tf():
    tfs = np.arange(1, 50, dtype=np.uint64)
    lens = np.full(49, 100, dtype=np.uint64)
    c = bm25_contribution(tfs, lens, 2.0, 1.2, 0.75, 120.0)
    assert np.all(np.diff(c) > 0)
