"""BM25F fielded retrieval (operators/fielded.py): hand-computed
scores on a tiny corpus, the title-beats-body ordering property, and
degeneracy to plain BM25 when both fields share weight 1 and the
field split is disabled."""

from __future__ import annotations

import math

from search_engine_spark.operators import fielded as FLD


def _mk_docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string")


def test_bm25f_hand_computed(spark):
    """3-doc corpus, one query term, weights title=2 body=1: scores
    match a from-scratch Python computation of the Zaragoza simple
    BM25F formula."""
    rows = [
        "apple pear plum grape melon lemon fig date apple apple",  # tf: t=1, b=2
        "pear plum grape melon lemon fig date kiwi apple apple",   # tf: t=0, b=2
        "apple pear plum grape melon lemon fig date kiwi mango",   # tf: t=1, b=0
    ]
    got = {r["doc_id"]: r["score"]
           for r in FLD.bm25f_topk(_mk_docs(spark, rows), ["apple"], 10,
                                   title_tokens=8).collect()}

    toks = [t.split() for t in rows]
    n = len(rows)
    tls = [min(len(t), 8) for t in toks]
    bls = [max(len(t) - 8, 0) for t in toks]
    avt, avb = sum(tls) / n, sum(bls) / n
    df = sum(1 for t in toks if "apple" in t)
    idf = math.log2(n / df)
    want = {}
    for d, t in enumerate(toks):
        tf_t = t[:8].count("apple")
        tf_b = t[8:].count("apple")
        wtf = 0.0
        if tf_t:
            wtf += 2.0 * (tf_t / (1 - 0.75 + 0.75 * (tls[d] / avt)))
        if tf_b:
            wtf += 1.0 * (tf_b / (1 - 0.75 + 0.75 * (bls[d] / avb)))
        if wtf:
            want[d] = round(idf * wtf / (1.2 + wtf), 6)
    assert set(got) == set(want)
    for d in want:
        assert math.isclose(got[d], want[d], abs_tol=1e-9), d


def test_title_match_outranks_body_match(spark):
    """Same tf, same doc length: the doc whose match sits in the
    title field ranks first under title weight 2."""
    in_title = "apple " + " ".join(f"x{i}" for i in range(19))
    in_body = " ".join(f"x{i}" for i in range(19)) + " apple"
    no_match = " ".join(f"z{i}" for i in range(20))  # keeps idf > 0
    out = sorted(
        FLD.bm25f_topk(_mk_docs(spark, [in_title, in_body, no_match]),
                       ["apple"], 10).collect(),
        key=lambda r: r["rank"])
    assert [r["doc_id"] for r in out] == [0, 1]
    assert out[0]["score"] > out[1]["score"] > 0


def test_degenerates_to_single_field(spark):
    """title_tokens=0 puts everything in the body; with weight 1 and
    b=0.75 the formula collapses to BM25-with-(k1-free)-saturation of
    the whole doc — i.e. score depends only on (tf, dl), so two docs
    with identical tf and dl tie exactly."""
    a = "apple apple " + " ".join(f"x{i}" for i in range(8))
    b = "apple apple " + " ".join(f"y{i}" for i in range(8))
    out = FLD.bm25f_topk(
        _mk_docs(spark, [a, b]), ["apple"], 10, title_tokens=0,
        weights={"title": 1.0, "body": 1.0}).collect()
    assert len(out) == 2
    assert out[0]["score"] == out[1]["score"]
