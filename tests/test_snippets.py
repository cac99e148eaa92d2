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


def test_did_you_mean_gate_and_rows(spark):
    from search_engine_spark.operators.snippets import did_you_mean

    vocab = spark.createDataFrame(
        [("table", 100), ("cable", 30), ("tale", 24), ("query", 7)],
        "term_key string, df long",
    )
    got = {r["term"]: r for r in did_you_mean(
        vocab, ["tabel", "tale", "query", "zzzzz"], gain=4).collect()}
    # every input term keeps a row — a banner never drops words
    assert set(got) == {"tabel", "tale", "query", "zzzzz"}
    # OOV (df_term 0): any candidate clears the gate; dist wins first
    # ('tale' at 2 edits ties 'table' — plain Levenshtein has no
    # transposition — so df desc picks 'table')
    r = got["tabel"]
    assert (r["suggestion"], r["dist"], r["df_term"], r["df_sugg"],
            r["changed"]) == ("table", 2, 0, 100, True)
    # real-word error: 'tale' IS in vocab (df 24) but 'table' is
    # 100 > 4*24 — replaced despite being a valid word
    r = got["tale"]
    assert (r["suggestion"], r["df_term"], r["df_sugg"], r["changed"]) == (
        "table", 24, 100, True)
    # in-vocab with no strong neighbor: suggests itself, changed=false
    r = got["query"]
    assert (r["suggestion"], r["dist"], r["df_term"], r["df_sugg"],
            r["changed"]) == ("query", 0, 7, 7, False)
    # no candidate at all: still a self row
    r = got["zzzzz"]
    assert (r["suggestion"], r["dist"], r["df_term"], r["changed"]) == (
        "zzzzz", 0, 0, False)


def test_did_you_mean_gate_is_strict(spark):
    """df_sugg must EXCEED gain*df_term — equality keeps the term."""
    from search_engine_spark.operators.snippets import did_you_mean

    vocab = spark.createDataFrame(
        [("cable", 40), ("table", 10)], "term_key string, df long")
    got = {r["term"]: r for r in
           did_you_mean(vocab, ["table"], gain=4).collect()}
    assert got["table"]["changed"] is False      # 40 == 4*10, not >
    got = {r["term"]: r for r in
           did_you_mean(vocab, ["table"], gain=3).collect()}
    assert (got["table"]["suggestion"], got["table"]["changed"]) == (
        "cable", True)                           # 40 > 3*10


def test_did_you_mean_tie_breaks(spark):
    """Candidate pick follows the shared spell rule: dist asc, df
    desc, suggestion asc."""
    from search_engine_spark.operators.snippets import did_you_mean

    vocab = spark.createDataFrame(
        [("cable", 80), ("fable", 80), ("tables", 200)],
        "term_key string, df long",
    )
    r = did_you_mean(vocab, ["aable"], gain=4).collect()[0]
    # dist 1 (cable/fable) beats dist 2 (tables) despite lower df;
    # equal dist+df -> lexicographic asc
    assert (r["suggestion"], r["dist"], r["df_sugg"]) == ("cable", 1, 80)


# ---------------------------------------------------------------------------
# SymSpell deletion-neighborhood index


def test_py_deletions_matches_spark_expansion(spark):
    from search_engine_spark.operators.snippets import _py_deletions, suggest_index

    vocab = spark.createDataFrame(
        [("table", 5), ("a", 1), ("xy", 2)], "term_key string, df long")
    ix = suggest_index(vocab, max_dist=2)
    got = {t: sorted(r["variant"] for r in rows) for t, rows in (
        (t, [r for r in ix.collect() if r["suggestion"] == t])
        for t in ("table", "a", "xy"))}
    for term in ("table", "a", "xy"):
        assert got[term] == _py_deletions(term, 2), term


def test_suggest_indexed_matches_scan(spark, tmp_dir):
    """The stored SymSpell path must return exactly the brute-scan
    rows on the real fixture vocabulary, for hits at dist 0/1/2 and
    for a no-candidate term."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.snippets import (
        suggest_terms, suggest_terms_indexed, write_suggest_index)
    from search_engine_spark.operators.textstats import simple_tokens

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    vocab = (
        docs.select(F.explode(simple_tokens()).alias("tok"))
        .groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    )
    terms = ["tabel", "joni", "quey", "filtr", "zzzzqqq", "data"]
    path = f"{tmp_dir}/symspell"
    write_suggest_index(vocab, path, max_dist=2, term_col="tok", df_col="df")
    scan = {tuple(r) for r in
            suggest_terms(vocab, terms, 2, term_col="tok", df_col="df").collect()}
    idx = {tuple(r) for r in
           suggest_terms_indexed(spark, path, terms, 2).collect()}
    assert idx == scan and scan, "stored SymSpell path must equal the brute scan"


def test_suggest_indexed_plan_is_pruned_lookup(spark, tmp_dir):
    """The per-query plan must push the variant IN-list into the
    parquet scan (PushedFilters) and carry no levenshtein against the
    raw vocabulary — the verify runs on the joined candidates only."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.snippets import (
        suggest_terms_indexed, write_suggest_index)

    vocab = spark.createDataFrame(
        [("table", 5), ("cable", 8), ("query", 3)], "term_key string, df long")
    path = f"{tmp_dir}/symspell2"
    write_suggest_index(vocab, path, max_dist=2)
    out = suggest_terms_indexed(spark, path, ["tabel"], 2)
    txt = out._jdf.queryExecution().toString()
    assert "PushedFilters:" in txt and "variant" in txt
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_suggest_indexed_refuses_deeper_query_than_build(spark, tmp_dir):
    """SymSpell recall needs deletion depth d on BOTH sides: a query
    asking more than the stored neighborhood must raise, not silently
    lose matches."""
    import pytest

    from search_engine_spark.operators.snippets import (
        suggest_terms_indexed, write_suggest_index)

    vocab = spark.createDataFrame(
        [("spark", 5), ("shark", 3)], "term_key string, df long")
    path = f"{tmp_dir}/symspell3"
    write_suggest_index(vocab, path, max_dist=1)
    # equal/shallower depth is fine
    assert suggest_terms_indexed(spark, path, ["sparl"], max_dist=1).count() > 0
    with pytest.raises(ValueError, match="max_dist=1"):
        suggest_terms_indexed(spark, path, ["sparl"], max_dist=2)
