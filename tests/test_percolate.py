"""Percolation (operators/percolate.py): planted-match golden, the
presearcher ≡ naive equivalence, and the empty edges the ft_percolate
driver row relies on."""

from __future__ import annotations

from search_engine_spark.operators import percolate as PC


def _queries(spark, spec):
    return spark.createDataFrame(
        [(qid, t) for qid, terms in spec for t in terms],
        "query_id string, term string")


def _pairs(df):
    return sorted((r["doc_id"], r["query_id"]) for r in df.collect())


def test_percolate_planted_matches(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"),
         (1, "alpha beta"),
         (2, "beta gamma delta"),
         (3, "unrelated words only")],
        "doc_id bigint, text string")
    qs = _queries(spark, [
        ("q_ab", ["alpha", "beta"]),          # docs 0, 1
        ("q_bg", ["beta", "gamma"]),          # docs 0, 2
        ("q_d", ["delta"]),                   # doc 2
        ("q_none", ["alpha", "zzz"]),         # absent term -> nothing
    ])
    assert _pairs(PC.percolate(docs, qs)) == [
        (0, "q_ab"), (0, "q_bg"), (1, "q_ab"), (2, "q_bg"), (2, "q_d")]


def test_presearcher_equals_naive(spark):
    # varied corpus: overlapping token sets incl. a corpus-wide head
    # token ('the'), so the anchor choice actually matters
    rows = [(i, "the " + " ".join(
        f"tok{(i * 7 + j) % 13}" for j in range(1 + i % 5)))
        for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    qs = _queries(spark, [
        ("a", ["the", "tok3"]),      # head + mid anchor
        ("b", ["tok1", "tok12"]),
        ("c", ["the"]),              # head-only query: matches all
        ("d", ["tok5", "nope"]),
    ])
    assert _pairs(PC.percolate(docs, qs)) == _pairs(PC.percolate_naive(docs, qs))
    # the head-only query must match every document
    got = _pairs(PC.percolate(docs, qs))
    assert sum(1 for _, q in got if q == "c") == 60


def test_percolate_empty_edges(spark):
    docs = spark.createDataFrame([(0, "alpha beta")], "doc_id bigint, text string")
    none = _queries(spark, [("q", ["zzz"])])
    assert PC.percolate(docs, none).count() == 0
    empty_q = spark.createDataFrame([], "query_id string, term string")
    assert PC.percolate(docs, empty_q).count() == 0
