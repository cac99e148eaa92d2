"""K-gram wildcard index (operators/kgram.py) + the engine's
infix-wildcard search path.

Golden edge cases the sf-table oracle rows can't guarantee hitting:
full recall of the gram gate vs the brute-force regex scan (property:
indexed ≡ brute on every pattern shape — prefix, suffix, infix,
mid-star, multi-star), the gram-less fallback, grams-as-necessary-
but-not-sufficient (a term containing all grams in the wrong order
must be rejected by the verify), the df-desc/term-asc cap, staleness
refusal after an index mutation, and hypothesis-driven pattern
equivalence over a random vocabulary.
"""

from __future__ import annotations

import os
import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.operators.kgram import (
    expand_wildcard, expand_wildcard_indexed, kgram_rows, pattern_grams,
    pattern_regex, write_kgram_index)

VOCAB = [
    ("window", 90), ("widow", 40), ("wind", 40), ("shadow", 35),
    ("meadow", 35), ("follow", 20), ("flow", 20), ("slow", 88),
    ("data", 70), ("update", 55), ("dates", 10), ("adapt", 9),
    ("filter", 66), ("customer", 30), ("order", 30), ("a", 5),
    ("ab", 4), ("ba", 3),
]


def _vocab(spark):
    return spark.createDataFrame(VOCAB, "term string, df long")


def _brute(pattern, max_expansions=16):
    rx = re.compile(pattern_regex(pattern))
    hits = [(t, df) for t, df in VOCAB if rx.match(t)]
    hits.sort(key=lambda x: (-x[1], x[0]))
    return [(pattern, t, df, i + 1)
            for i, (t, df) in enumerate(hits[:max_expansions])]


@pytest.fixture(scope="module")
def kgram_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kgram"))
    write_kgram_index(_vocab(spark), out, term_col="term", df_col="df")
    return out


PATTERNS = ["win*", "*dow", "*do*", "w*w", "*ow", "f*l*w", "*a*",
            "da*", "*ate*", "zz*", "*zzz", "a*"]


def test_pattern_grams_shapes():
    # anchored grams from the boundary markers
    assert "^wi" in pattern_grams("win*")
    assert "ow$" in pattern_grams("*dow")
    # no gram spans a star
    assert all("*" not in g for g in pattern_grams("w*w"))
    # gram-less: every literal run shorter than k
    assert pattern_grams("*a*") == []
    assert pattern_grams("a*") == []        # '^a' is 2 chars


def test_indexed_matches_brute_per_pattern(spark, kgram_dir):
    got = expand_wildcard_indexed(spark, kgram_dir, PATTERNS)
    rows = {(r.pattern, r.term, r.df, r.rank) for r in got.collect()}
    want = {row for p in PATTERNS for row in _brute(p)}
    assert rows == want


def test_gram_order_is_verified_not_assumed(spark, tmp_path):
    # 'badcab' contains grams of '^ba', 'ab$' style evidence for
    # pattern 'ba*ab' only in the wrong arrangement for 'ab*ba':
    # the regex verify must reject terms whose grams appear out of
    # order relative to the pattern
    vocab = spark.createDataFrame(
        [("abba", 5), ("baab", 5), ("abab", 5)], "term string, df long")
    out = str(tmp_path / "kg")
    write_kgram_index(vocab, out, term_col="term", df_col="df")
    got = {(r.pattern, r.term)
           for r in expand_wildcard_indexed(spark, out, ["ab*ba"]).collect()}
    assert got == {("ab*ba", "abba")}


def test_cap_binds_df_desc_term_asc(spark, kgram_dir):
    got = expand_wildcard_indexed(spark, kgram_dir, ["*ow"], max_expansions=3)
    ordered = [(r.term, r.df) for r in got.orderBy("rank").collect()]
    # window 90, slow 88, then the 40/35/20 tail is cut; widow(40)
    # beats wind? wind has no 'ow$' — not a match. meadow/shadow 35.
    assert ordered == [("window", 90), ("slow", 88), ("widow", 40)]


def test_brute_expansion_equals_python(spark):
    got = expand_wildcard(_vocab(spark), ["*do*", "*a*"], term_col="term")
    rows = {(r.pattern, r.term, r.df, r.rank) for r in got.collect()}
    want = {row for p in ["*do*", "*a*"] for row in _brute(p)}
    assert rows == want


def test_staleness_refusal_and_rebuild(spark, tmp_dir):
    from pyspark.sql import functions as F

    from search_engine_spark.config import EngineConfig
    from search_engine_spark.incremental import add_documents
    from search_engine_spark.indexer import build_index

    cfg = EngineConfig(n_doc_shards=2, n_term_buckets=2, n_bucket_groups=1)
    ix = f"{tmp_dir}/ix"
    rows = [(f"http://s/{i}", f"alpha beta gamma doc{i}") for i in range(6)]
    pages = (
        spark.createDataFrame(rows, "url string, text string")
        .withColumn("warc_ts", F.current_timestamp())
        .withColumn("html", F.lit(None).cast("binary"))
        .withColumn("lang", F.lit("en"))
    )
    build_index(spark, pages.filter(F.col("url") != "http://s/5"), ix, cfg)
    out = f"{tmp_dir}/kg"
    dic = spark.read.parquet(os.path.join(ix, "dictionary"))
    write_kgram_index(dic, out, index_dir=ix)
    # serves while the index is unmoved
    assert expand_wildcard_indexed(spark, out, ["*lph*"]).count() == 1
    add_documents(spark, pages.filter(F.col("url") == "http://s/5"), ix, cfg)
    with pytest.raises(RuntimeError, match="STALE"):
        expand_wildcard_indexed(spark, out, ["*lph*"]).collect()
    # rebuild against the moved index serves again
    dic2 = spark.read.parquet(os.path.join(ix, "dictionary"))
    write_kgram_index(dic2, out, index_dir=ix)
    assert expand_wildcard_indexed(spark, out, ["*lph*"]).count() == 1


def test_kgram_rows_cover_padded_term(spark):
    rows = kgram_rows(spark.createDataFrame([("abc", 1)],
                                            "term string, df long"),
                      term_col="term", df_col="df").collect()
    assert {r.gram for r in rows} == {"^ab", "abc", "bc$"}


@settings(max_examples=8, deadline=None)
@given(st.lists(st.text(alphabet="abcd", min_size=1, max_size=6),
                min_size=1, max_size=12, unique=True),
       st.integers(0, 3), st.integers(0, 3))
def test_property_indexed_equals_brute(spark, terms, cut_a, cut_b):
    """Any vocabulary, any single-star pattern cut from a real term:
    the indexed expansion equals the brute regex scan exactly."""
    vocab = spark.createDataFrame(
        [(t, i + 1) for i, t in enumerate(sorted(terms))],
        "term string, df long")
    base = sorted(terms)[0]
    a, b = sorted((min(cut_a, len(base)), min(cut_b, len(base))))
    pattern = base[:a] + "*" + base[b:]
    import tempfile

    with tempfile.TemporaryDirectory(prefix="kgram_prop_") as out:
        write_kgram_index(vocab, out, term_col="term", df_col="df")
        got = {(r.pattern, r.term, r.rank) for r in
               expand_wildcard_indexed(spark, out, [pattern]).collect()}
        want = {(r.pattern, r.term, r.rank) for r in
                expand_wildcard(vocab, [pattern],
                                term_col="term").collect()}
        assert got == want


# ---------------------------------------------------------------------------
# Regex term query (expand_regex / expand_regex_indexed)


REGEX_PATTERNS = [
    "win.ow",        # split start+end runs
    "da?ta",         # optional char: only the suffix run survives
    "d[au].*",       # class mid-pattern: anchored-prefix gram only... "^d"
    "wind(ow)?",     # group -> unsafe -> fallback scan
    "s(l|h)a?dow",   # alternation -> fallback
    ".*dow",         # suffix run
    "f.*w",          # runs too short for grams -> fallback
    "zzz+q",         # no match at all
    "upd\\w*",       # escape-class wildcard atom
    "ab{1,2}",       # bounded quantifier
]


def _brute_rx(pattern, max_expansions=16):
    from search_engine_spark.operators.kgram import regex_anchor

    rx = re.compile(regex_anchor(pattern))
    hits = [(t, df) for t, df in VOCAB if rx.match(t)]
    hits.sort(key=lambda x: (-x[1], x[0]))
    return [(pattern, t, df, i + 1)
            for i, (t, df) in enumerate(hits[:max_expansions])]


def test_regex_mandatory_runs_soundness():
    """Every extracted run (markers resolved) must be a substring of
    every true match — the necessary-condition contract that makes
    gram pruning recall-safe."""
    from search_engine_spark.operators.kgram import (
        regex_anchor, regex_mandatory_runs)

    for pattern in REGEX_PATTERNS:
        runs = regex_mandatory_runs(pattern)
        if runs is None:
            continue
        rx = re.compile(regex_anchor(pattern))
        for t, _ in VOCAB:
            if not rx.match(t):
                continue
            padded = "^" + t + "$"
            for run in runs:
                assert run in padded, (pattern, t, run)


def test_regex_runs_shapes():
    from search_engine_spark.operators.kgram import regex_mandatory_runs

    assert regex_mandatory_runs("win.ow") == ["^win", "ow$"]
    assert regex_mandatory_runs("da?ta") == ["^d", "ta$"]
    # alternation / groups: no sound evidence
    assert regex_mandatory_runs("gr(ou|u)p") is None
    assert regex_mandatory_runs("a|b") is None
    # backreference: bail
    assert regex_mandatory_runs(r"(a)\1") is None
    # '+' keeps the repeated literal, breaks contiguity after it
    assert regex_mandatory_runs("zz+q") == ["^zz", "q$"]
    # a dropped leading optional unpins the next run from the start
    assert regex_mandatory_runs("a?bc") == ["bc$"]
    # escaped metachar is a plain literal
    assert regex_mandatory_runs(r"a\.b") == ["^a.b$"]


def test_regex_indexed_matches_brute_per_pattern(spark, kgram_dir):
    from search_engine_spark.operators.kgram import expand_regex_indexed

    got = expand_regex_indexed(spark, kgram_dir, REGEX_PATTERNS)
    rows = {(r.pattern, r.term, r.df, r.rank) for r in got.collect()}
    want = {row for p in REGEX_PATTERNS for row in _brute_rx(p)}
    assert rows == want


def test_regex_grams_necessary_not_sufficient(spark, tmp_path):
    """A term containing all mandatory grams but failing the regex
    must be rejected by the verify stage."""
    from search_engine_spark.operators.kgram import (
        expand_regex_indexed, write_kgram_index)

    # 'win.ow' grams are ^wi win ow$; 'winxowxow' contains all three
    # but the anchored regex requires exactly 6 chars — only the
    # verify stage can reject it
    vocab2 = spark.createDataFrame(
        [("window", 9), ("winxowxow", 8)], "term string, df long")
    out2 = str(tmp_path / "kg2")
    write_kgram_index(vocab2, out2, term_col="term", df_col="df")
    got = [(r.term,) for r in
           expand_regex_indexed(spark, out2, ["win.ow"]).collect()]
    assert got == [("window",)]


def test_regex_search_engine_matches_twin(spark, built_index):
    """End-to-end: regex search over the packed index ≡ the
    plain-postings twin, rank for rank, on the 300-doc fixture."""
    from search_engine_spark.operators.kgram import write_kgram_index
    from search_engine_spark.searcher import SearchEngine
    from search_engine_spark.twin import twin_regex_topk

    out, cfg, _ = built_index
    eng = SearchEngine(spark, out, cfg)
    import tempfile

    with tempfile.TemporaryDirectory(prefix="kgram_rx_") as kg:
        write_kgram_index(eng._dictionary, kg, term_col="term_key",
                          df_col="df", index_dir=out)
        q = "/dat.*/ /t[ar].*/"
        got = eng.regex_search_indexed(q, kg, 15).collect()
        want = twin_regex_topk(spark, eng, q, 15).collect()
        assert [r["url"] for r in got] == [r["url"] for r in want]
        assert got, "fixture corpus must match the regex query"
        for g, w in zip(got, want):
            assert abs(g["score"] - w["score"]) < 1e-6
