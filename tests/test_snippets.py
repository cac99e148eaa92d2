"""Snippet extraction and spell suggestion (operators/snippets.py).

Golden edge cases the sf-table oracle row can't guarantee hitting:
a match inside the left window (clamped start must not over-extend
rightward), a doc with no match (absent), suggestion tie-breaking
(dist, then df desc, then lexicographic), and the no-candidate case.
"""

from __future__ import annotations

from search_engine_spark.operators.snippets import best_snippet, suggest_terms


def test_snippet_windows(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "Gamma! at the head, then filler words follow here now"),
            (3, "no matching words at all in this document text"),
            (4, "one two three four five six seven gamma nine ten eleven"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in best_snippet(docs, ["gamma"], window=2).collect()}
    assert set(out) == {1, 2, 4}
    # mid-doc: symmetric window
    assert out[1]["match_pos"] == 3
    assert out[1]["snippet"] == "alpha beta gamma delta epsilon"
    # head: start clamps to 1 AND the right edge stays pos+window
    assert out[2]["match_pos"] == 1
    assert out[2]["snippet"] == "gamma at the"
    # tail-side clamp
    assert out[4]["match_pos"] == 8
    assert out[4]["snippet"] == "six seven gamma nine ten"


def test_snippet_earliest_of_several_terms(spark):
    docs = spark.createDataFrame(
        [(1, "xx yy query zz table ww")], "doc_id long, text string")
    row = best_snippet(docs, ["table", "query"], window=1).collect()[0]
    assert row["match_pos"] == 3
    assert row["snippet"] == "yy query zz"


def test_suggest_tie_breaks(spark):
    vocab = spark.createDataFrame(
        [
            ("table", 50), ("cable", 80), ("fable", 80),
            ("join", 10), ("loin", 10),
            ("query", 7),
        ],
        "term_key string, df long",
    )
    got = {r["term"]: (r["suggestion"], r["dist"], r["df"])
           for r in suggest_terms(vocab, ["tabel", "aoin", "query", "zzzzz"]).collect()}
    # dist wins first: tabel->table = 2 edits; cable/fable = 3 despite
    # their higher df — table wins on dist alone
    assert got["tabel"] == ("table", 2, 50)
    # equal dist (1), equal df (10): join vs loin -> lexicographic asc
    assert got["aoin"] == ("join", 1, 10)
    # exact hit suggests itself at dist 0
    assert got["query"] == ("query", 0, 7)
    # nothing within 2 edits -> absent
    assert "zzzzz" not in got


def test_suggest_prefers_higher_df_on_dist_tie(spark):
    vocab = spark.createDataFrame(
        [("cable", 80), ("fable", 90)], "term_key string, df long")
    got = suggest_terms(vocab, ["aable"]).collect()
    assert [(r["suggestion"], r["dist"], r["df"]) for r in got] == [("fable", 1, 90)]
