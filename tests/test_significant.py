"""Significant terms (textstats.significant_terms): hand-computed
lift golden, exclusion, the min_fg floor, and the empty edge."""

from __future__ import annotations

from search_engine_spark.operators import textstats as TS

NANO = 1_000_000_000


def _docs(spark):
    # 10 docs; 'special' in exactly docs 0-3, 'common' in all, 'half'
    # in docs 0-4, 'stray' only in doc 9
    rows = []
    for i in range(10):
        toks = ["common"]
        if i < 4:
            toks.append("special")
        if i < 5:
            toks.append("half")
        if i == 9:
            toks.append("stray")
        rows.append((i, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_lift_hand_computed(spark):
    docs = _docs(spark)
    fg = spark.createDataFrame([(i,) for i in range(4)], "doc_id bigint")
    out = {r["term"]: r for r in
           TS.significant_terms(docs, fg, k=10, min_fg=2).collect()}
    n_corpus, n_fg = 10, 4
    # special: fg_df 4, bg_df 4 -> lift = (4*10)/(4*4) = 2.5
    assert out["special"]["lift_nano"] == (4 * n_corpus * NANO) // (4 * n_fg)
    assert out["special"]["lift_nano"] == 2_500_000_000
    # common: fg 4, bg 10 -> exactly 1.0 (no more common here)
    assert out["common"]["lift_nano"] == NANO
    # half: fg 4, bg 5 -> 2.0
    assert out["half"]["lift_nano"] == 2_000_000_000
    # 'stray' never reaches min_fg (fg_df 0)
    assert "stray" not in out
    # ranking: special (2.5) > half (2.0) > common (1.0)
    order = [r["term"] for r in sorted(out.values(), key=lambda r: r["rank"])]
    assert order == ["special", "half", "common"]


def test_exclude_and_min_fg(spark):
    docs = _docs(spark)
    fg = spark.createDataFrame([(i,) for i in range(4)], "doc_id bigint")
    out = {r["term"] for r in TS.significant_terms(
        docs, fg, k=10, min_fg=2, exclude=["special"]).collect()}
    assert out == {"common", "half"}
    # min_fg above the foreground size keeps nothing
    assert TS.significant_terms(docs, fg, k=10, min_fg=5).count() == 0


def test_empty_foreground(spark):
    docs = _docs(spark)
    empty = spark.createDataFrame([], "doc_id bigint")
    assert TS.significant_terms(docs, empty, k=10).count() == 0
