"""Curation operators: eval-set decontamination, cross-document
duplicated-gram fraction, and the training-mix composition."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import curation as CU
from search_engine_spark.operators import dedup as D
from search_engine_spark.operators.webquality import gopher_quality, sample_stratified

SF_001 = "/root/testdata/sf0.001"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_hits_handcrafted(spark):
    docs = _df(spark, [
        (0, "alpha beta gamma delta"),              # eval doc
        (10, "x y alpha beta gamma z"),             # shares "alpha beta gamma"
        (11, "nothing shared here at all really"),  # clean -> absent
        (12, "ab"),                                 # < n tokens -> absent
    ])
    ev = CU.eval_grams_from_docs(docs.filter(F.col("doc_id") < 10), n=3)
    out = CU.contamination_hits(docs.filter(F.col("doc_id") >= 10), ev, n=3)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {10}
    assert rows[10]["n_grams"] == 4 and rows[10]["n_hit"] == 1
    assert rows[10]["hit_frac"] == 0.25


def test_contamination_eval_side_broadcasts(spark):
    docs = _df(spark, [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(20)])
    ev = CU.eval_grams_from_docs(docs.filter(F.col("doc_id") < 2), n=3)
    out = CU.contamination_hits(docs.filter(F.col("doc_id") >= 2), ev, n=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan     # eval grams never shuffle the corpus
    assert "CartesianProduct" not in plan


def test_crossdoc_dup_grams_handcrafted(spark):
    docs = _df(spark, [
        (1, "a b c d"),      # grams: "a b c", "b c d"
        (2, "b c d e"),      # grams: "b c d", "c d e"
        (3, "q r s"),        # gram "q r s" unique
    ])
    out = {r["doc_id"]: r for r in CU.crossdoc_dup_grams(docs, n=3).collect()}
    D.clear_shingle_cache()
    assert out[1]["n_grams"] == 2 and out[1]["n_dup_grams"] == 1
    assert out[1]["dup_frac"] == 0.5
    assert out[2]["n_grams"] == 2 and out[2]["n_dup_grams"] == 1
    assert out[3]["n_grams"] == 1 and out[3]["n_dup_grams"] == 0
    assert out[3]["dup_frac"] == 0.0


def test_crossdoc_dup_frac_counts_other_docs_only_via_df(spark):
    # a gram repeated WITHIN one doc is distinct-deduped by the
    # shingle kernel, so it must not count as duplicated
    docs = _df(spark, [(1, "a b c a b c"), (2, "z z z z")])
    out = {r["doc_id"]: r for r in CU.crossdoc_dup_grams(docs, n=3).collect()}
    D.clear_shingle_cache()
    assert out[1]["n_dup_grams"] == 0
    assert out[2]["n_grams"] == 1 and out[2]["n_dup_grams"] == 0


def test_curation_null_and_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "ab"), (4, "a b c d"), (5, "a b c e")],
        "doc_id long, text string",
    )
    # null/empty/too-short docs have no grams: absent, never a crash
    out = CU.crossdoc_dup_grams(docs, n=3)
    ids = {r["doc_id"] for r in out.collect()}
    D.clear_shingle_cache()
    assert ids == {4, 5}
    # eval = doc4's grams {'a b c', 'b c d'}; among the rest only doc5
    # ('a b c', 'b c e') shares one — null/empty/short docs stay silent
    ev = CU.eval_grams_from_docs(docs.filter(F.col("doc_id") == 4), n=3)
    hits = {r["doc_id"]: r for r in
            CU.contamination_hits(docs.filter(F.col("doc_id") != 4), ev, n=3).collect()}
    assert set(hits) == {5}
    assert hits[5]["n_hit"] == 1 and hits[5]["n_grams"] == 2


def test_contamination_exact_vs_bruteforce_random(spark):
    """Seeded random corpora: contamination_hits must report EXACTLY
    the docs sharing >= 1 n-gram with the eval set, with exact
    counts (brute-force recomputed in Python)."""
    import random

    for seed in (3, 17, 91):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(12)]
        rows = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
                for i in range(40)]
        n = 3

        def grams(text):
            t = text.split()
            return {" ".join(t[i:i + n]) for i in range(len(t) - n + 1)}

        ev_grams = set().union(*(grams(t) for i, t in rows if i < 4)) if rows else set()
        want = {}
        for i, t in rows:
            if i < 4:
                continue
            g = grams(t)
            hit = len(g & ev_grams)
            if hit:
                want[i] = (len(g), hit)

        docs = spark.createDataFrame(rows, "doc_id long, text string")
        ev = CU.eval_grams_from_docs(docs.filter(F.col("doc_id") < 4), n=n)
        got = {r["doc_id"]: (r["n_grams"], r["n_hit"]) for r in
               CU.contamination_hits(docs.filter(F.col("doc_id") >= 4), ev, n=n).collect()}
        assert got == want, f"seed {seed}"
    D.clear_shingle_cache()


def test_training_mix_composition(spark):
    docs = spark.read.parquet(f"{SF_001}/documents.parquet")
    rates = {"en": 1.0}
    out = CU.training_mix(docs, rates=rates, salt="t", default_rate=1.0)
    got = {r["doc_id"] for r in out.collect()}

    passes = {r["doc_id"] for r in
              gopher_quality(docs).filter(F.col("passes")).select("doc_id").collect()}
    dropped = {r["doc_id"] for r in
               D.dedup_clusters(D.near_dup_pairs(docs, threshold=0.5))
               .filter(~F.col("keep")).collect()}
    D.clear_shingle_cache()
    assert got == (passes - dropped)
    assert got, "mix must be non-empty on the fixture corpus"
    # manifest carries the sampling bucket for reproducibility audits
    assert set(out.columns) == {"doc_id", "lang", "source", "bucket"}


def test_training_mix_sampling_is_subset(spark):
    docs = spark.read.parquet(f"{SF_001}/documents.parquet")
    full = CU.training_mix(docs, rates={}, salt="t", default_rate=1.0)
    half = CU.training_mix(docs, rates={}, salt="t", default_rate=0.5)
    D.clear_shingle_cache()
    f = {r["doc_id"] for r in full.collect()}
    h = {r["doc_id"] for r in half.collect()}
    assert h < f   # deterministic hash sample: strict subset at a lower rate
    # and it matches the standalone sampler's decisions
    s = {r["doc_id"] for r in
         sample_stratified(docs.select("doc_id", "lang", "source"),
                           rates={}, salt="t", default_rate=0.5).collect()}
    assert h == f & s


def test_training_mix_drop_list_has_no_forced_broadcast(spark):
    """The near-dup drop list is corpus-scale on real crawls (30-80%
    dup rates on the web) — the anti-join must carry NO explicit
    broadcast hint; AQE picks the strategy at runtime.  Mirrors the
    round-2 city-semi-join guarantee (test_round2.py)."""
    docs = spark.read.parquet(f"{SF_001}/documents.parquet")
    out = CU.training_mix(docs, rates={}, salt="t", default_rate=1.0)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    D.clear_shingle_cache()
    assert "ResolvedHint" not in analyzed and "UnresolvedHint" not in analyzed


def test_dedup_lines_handcrafted(spark):
    """Hand-computed line dedup: the shared header crosses min_docs=3,
    a twice-repeated line within ONE doc counts that doc once (distinct
    doc count, not occurrence count), and an all-boilerplate doc
    survives with empty clean_text."""
    docs = _df(spark, [
        (0, "HDR\nbody zero\nHDR"),     # HDR twice in one doc -> 1 doc
        (1, "HDR\nbody one"),
        (2, "HDR\nbody two\nrare"),
        (3, "HDR"),                     # all boilerplate
    ])
    out = {r["doc_id"]: r for r in CU.dedup_lines(docs, min_docs=3).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert out[0]["clean_text"] == "body zero" and out[0]["n_removed"] == 2
    assert out[1]["clean_text"] == "body one" and out[1]["n_removed"] == 1
    assert out[2]["clean_text"] == "body two\nrare"   # order preserved
    assert out[3]["clean_text"] == "" and out[3]["n_removed"] == 1
    assert out[0]["n_lines"] == 3 and out[3]["n_lines"] == 1


def test_dedup_lines_threshold_counts_distinct_docs(spark):
    # "HDR" appears 4 times but in only 3 docs; min_docs=4 keeps it
    docs = _df(spark, [
        (0, "HDR\nbody zero\nHDR"),
        (1, "HDR\nbody one"),
        (2, "HDR\nbody two"),
    ])
    out = {r["doc_id"]: r["clean_text"]
           for r in CU.dedup_lines(docs, min_docs=4).collect()}
    assert out[0] == "HDR\nbody zero\nHDR"
    assert out[1] == "HDR\nbody one"


def test_dedup_lines_plan_shape(spark):
    """No cartesian product, no Python UDF, and no forced broadcast on
    the boilerplate mark join — at web scale the boilerplate set is
    large (AQE decides), same guarantee as the training_mix drop list."""
    docs = _df(spark, [(i, f"HDR\nbody {i}") for i in range(10)])
    out = CU.dedup_lines(docs, min_docs=3)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed and "UnresolvedHint" not in analyzed
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_synthetic_lined_shape(spark):
    docs = _df(spark, [(1003, "the body")])
    row = CU.synthetic_lined(docs).collect()[0]
    assert row["text"] == ("nav home about contact\n"
                           "section 3\nthe body\nnotice 6")


def test_dedup_lines_digest_equivalent_to_raw(spark):
    """The md5-keyed production variant must make EXACTLY the raw-line
    variant's keep-decisions on a corpus exercising repeats-within-doc,
    all-boilerplate docs, blank lines, and the threshold edge."""
    docs = _df(spark, [
        (0, "HDR\nbody zero\nHDR\n"),
        (1, "HDR\n\nbody one"),
        (2, "HDR\nbody two\nrare\n"),
        (3, "HDR"),
        (4, "\nlonely body"),
    ])
    cols = ["doc_id", "clean_text", "n_removed", "n_lines"]
    raw = {tuple(r[c] for c in cols)
           for r in CU.dedup_lines(docs, min_docs=3, line_key="text").collect()}
    dig = {tuple(r[c] for c in cols)
           for r in CU.dedup_lines(docs, min_docs=3, line_key="digest").collect()}
    assert raw == dig and len(raw) == 5


def test_dedup_lines_digest_plan_exchanges_on_md5(spark):
    """The production variant's distinct/count/mark-join exchanges key
    on the 32-byte md5, never the raw line text (what every shuffle
    MOVES at web scale, where boilerplate lines are long)."""
    docs = _df(spark, [(i, f"HDR\nbody {i}") for i in range(10)])
    plan = (CU.dedup_lines(docs, min_docs=3, line_key="digest")
            ._jdf.queryExecution().executedPlan().toString())
    import re

    keys = re.findall(r"hashpartitioning\(([^,)]+)", plan)
    assert keys, "expected exchanges in the plan"
    # the line-keyed exchanges are the lk (md5) ones; the only other
    # exchange key is the final doc_id reassembly
    assert all(k.startswith(("lk", "doc_id")) for k in keys), keys
    assert any(k.startswith("lk") for k in keys), keys
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan


def test_contamination_bloom_form_identical(spark):
    """The Bloom semi-join reduction must be BIT-identical to the
    broadcast form (no false negatives: the prefilter only ever
    passes a superset that the exact join settles), and its k
    membership probes must run as broadcast semi-joins — the shingle
    stream is never exchanged before the exact verify."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + j) % 40}" for j in range(30)), "en", "s")
         for i in range(60)],
        "doc_id long, text string, lang string, source string",
    )
    ev = CU.eval_grams_from_docs(docs.filter(F.col("doc_id") < 10), n=3)
    base = docs.filter(F.col("doc_id") >= 10)
    a = sorted(tuple(r) for r in CU.contamination_hits(base, ev, n=3).collect())
    out = CU.contamination_hits_bloom(base, ev, n=3)
    b = sorted(tuple(r) for r in out.collect())
    assert a == b and a
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_repetition_stats_hand_computed(spark):
    """Gopher repetition signals on a hand-built doc: duplicate
    lines, the top-bigram product, and 5-gram position coverage that
    must NOT double-count overlapping repeats."""
    from search_engine_spark.operators import webquality as WQ

    # doc 0: 'a b c d e' repeated twice + a duplicated line
    text0 = "a b c d e a b c d e\nx y\nx y"
    # doc 1: no repetition at all — 30 distinct 3-char tokens, so
    # every top-gram fraction sits far under its Gopher threshold
    text1 = " ".join(f"t{i:02d}" for i in range(15)) + "\n" + " ".join(
        f"u{i:02d}" for i in range(15))
    docs = spark.createDataFrame(
        [(0, text0), (1, text1)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in WQ.repetition_stats(docs).collect()}

    r0 = got[0]
    assert r0["n_lines"] == 3 and r0["n_dup_lines"] == 1
    assert r0["line_chars"] == 19 + 3 + 3
    assert r0["dup_line_chars"] == 3            # one extra 'x y'
    # tokens: a b c d e a b c d e x y x y -> 14 single-char tokens
    assert r0["tot_chars"] == 14
    # top bigram: 'a b' (+ every other gram in the repeated block)
    # occurs 2x; 'x y' also 2x; all are 2-char grams -> 2*2 = 4
    assert r0["top2_chars"] == 4
    # 5-grams: 'a b c d e' at pos 0 and 5; also 'b c d e a' etc. —
    # the repeated block covers positions 0..9 exactly once; the
    # trailing 'x y x y' has no 5-gram repeats.  coverage = 10 chars
    assert r0["dup5_chars"] == 10
    # no 7-gram repeats in a 10-token repeated block? 'a b c d e a b'
    # appears once only -> coverage 0
    assert r0["dup7_chars"] == 0

    r1 = got[1]
    assert r1["n_dup_lines"] == 0 and r1["dup_line_chars"] == 0
    # every bigram occurs once (max count 1): the tie rule picks the
    # max count*chars product = 1 * (3+3)
    assert r1["top2_chars"] == 6
    for n in range(5, 11):
        assert r1[f"dup{n}_chars"] == 0

    flags = {r["doc_id"]: r for r in WQ.repetition_quality(docs).collect()}
    # doc 0: dup5 coverage 10/14 = 71% > 15% -> fails repetition
    assert not flags[0]["passes_repetition"] and not flags[0]["ok_dup5"]
    # doc 1 passes every rule
    assert flags[1]["passes_repetition"]


# ---------------------------------------------------------------------------
# strip_dup_spans (cross-document span removal)

def test_strip_dup_spans_handcrafted(spark):
    from search_engine_spark.operators.curation import strip_dup_spans

    # docs 1 and 2 share the 4-token run "a b c d"; doc 3 is clean;
    # doc 4 IS entirely the shared run (empty clean_text contract)
    docs = _df(spark, [
        (1, "x a b c d y"),
        (2, "p q a b c d"),
        (3, "u v w z k m"),
        (4, "a b c d"),
    ])
    got = {r["doc_id"]: r for r in
           strip_dup_spans(docs, n=4, min_docs=2, gram_key="text").collect()}
    assert got[1]["clean_text"] == "x y" and got[1]["n_removed"] == 4
    assert got[2]["clean_text"] == "p q" and got[2]["n_removed"] == 4
    assert got[3]["clean_text"] == "u v w z k m" and got[3]["n_removed"] == 0
    assert got[4]["clean_text"] == "" and got[4]["n_removed"] == 4
    assert got[1]["n_tokens"] == 6 and got[4]["n_tokens"] == 4


def test_strip_dup_spans_long_repeat_covers_whole_extent(spark):
    from search_engine_spark.operators.curation import strip_dup_spans

    # a 6-token shared run with n=4: overlapping seed grams must
    # union to cover all 6 positions in both docs
    docs = _df(spark, [
        (1, "s t a b c d e f"),
        (2, "a b c d e f q r"),
    ])
    got = {r["doc_id"]: r for r in
           strip_dup_spans(docs, n=4, min_docs=2, gram_key="text").collect()}
    assert got[1]["clean_text"] == "s t" and got[1]["n_removed"] == 6
    assert got[2]["clean_text"] == "q r" and got[2]["n_removed"] == 6


def test_strip_dup_spans_intra_doc_repeat_not_removed(spark):
    from search_engine_spark.operators.curation import strip_dup_spans

    # the gram repeats INSIDE doc 1 only -> min_docs counts DISTINCT
    # docs, so nothing is removed
    docs = _df(spark, [
        (1, "a b c d a b c d"),
        (2, "u v w x y z"),
    ])
    got = {r["doc_id"]: r["n_removed"] for r in
           strip_dup_spans(docs, n=4, min_docs=2, gram_key="text").collect()}
    assert got == {1: 0, 2: 0}


def test_strip_dup_spans_digest_equivalent_to_text(spark):
    from search_engine_spark.operators.curation import strip_dup_spans

    docs = _df(spark, [
        (i, f"head{i} common run of tokens here tail{i} "
            + ("shared suffix block ends pages " if i % 2 == 0 else ""))
        for i in range(12)
    ])
    a = strip_dup_spans(docs, n=4, min_docs=2, gram_key="text")
    b = strip_dup_spans(docs, n=4, min_docs=2, gram_key="digest")
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b
    assert any(r[3] > 0 for r in rows_a)  # the shared block was cut


def test_strip_dup_spans_short_docs_and_validation(spark):
    import pytest as _pt

    from search_engine_spark.operators.curation import strip_dup_spans

    docs = _df(spark, [(1, "a b"), (2, "a b"), (3, None)])
    got = {r["doc_id"]: r for r in
           strip_dup_spans(docs, n=4, min_docs=2).collect()}
    # shorter than n: no grams, nothing removed; NULL text -> 0 tokens
    assert got[1]["n_removed"] == 0 and got[1]["clean_text"] == "a b"
    assert got[3]["n_tokens"] == 0 and got[3]["clean_text"] == ""
    with _pt.raises(ValueError):
        strip_dup_spans(docs, n=1)
    with _pt.raises(ValueError):
        strip_dup_spans(docs, min_docs=1)
    with _pt.raises(ValueError):
        strip_dup_spans(docs, gram_key="nope")


def test_strip_contaminated_spans_handcrafted(spark):
    from search_engine_spark.operators.curation import (
        strip_contaminated_spans)

    docs = _df(spark, [
        (1, "x a b c y"),        # one eval 3-gram inside
        (2, "a b c d"),          # overlapping eval grams coalesce: all cut
        (3, "u v w z"),          # clean
        (4, "a b c"),            # doc IS the leaked passage
    ])
    ev = spark.createDataFrame([("a b c",), ("b c d",)], "gram string")
    got = {r["doc_id"]: r for r in
           strip_contaminated_spans(docs, ev, n=3).collect()}
    assert got[1]["clean_text"] == "x y" and got[1]["n_removed"] == 3
    assert got[2]["clean_text"] == "" and got[2]["n_removed"] == 4
    assert got[3]["clean_text"] == "u v w z" and got[3]["n_removed"] == 0
    assert got[4]["clean_text"] == "" and got[4]["n_removed"] == 3


def test_strip_contaminated_no_broadcast_identical(spark):
    import pytest as _pt

    from search_engine_spark.operators.curation import (
        strip_contaminated_spans)

    docs = _df(spark, [(i, f"p{i} common leaked phrase q{i}")
                       for i in range(8)])
    ev = spark.createDataFrame([("common leaked phrase",)], "gram string")
    a = sorted(map(tuple, strip_contaminated_spans(docs, ev, n=3).collect()))
    b = sorted(map(tuple, strip_contaminated_spans(
        docs, ev, n=3, broadcast_eval=False).collect()))
    assert a == b and all(r[3] == 3 for r in a)
    with _pt.raises(ValueError):
        strip_contaminated_spans(docs, ev, n=1)
