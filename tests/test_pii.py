"""PII scrubbing (operators/pii.py): golden spec table (incl. the
overlap and dialect edge cases), count-vs-scrub consistency on the
synthetic-injection corpus, idempotence of the mask, rollup ≡ per-doc
recomputation, and the zero-shuffle plan shape."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from search_engine_spark.operators import pii as P  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(scope="module")
def sf_documents(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


# (input, scrubbed, n_email, n_ipv4, n_phone) — one row per rule plus
# the deliberate overlap/edge cases; counts are on the ORIGINAL text.
SPEC_CASES = [
    ("contact a.b-c%d+e@ex-ample.co.uk now", "contact <EMAIL> now", 1, 0, 0),
    # no range check on octets; a 4-digit tail breaks the \b match
    ("ip 10.3.45.7 and 999.999.999.999 and 1.2.3.4567",
     "ip <IP> and <IP> and 1.2.3.4567", 0, 2, 0),
    # dot and dash separators both count; 5-digit tail breaks \b
    ("call 555-014-0014 or 555.014.0014 x555-014-00145",
     "call <PHONE> or <PHONE> x555-014-00145", 0, 0, 2),
    # overlap: digit TLD is not an email, so the ipv4 rule wins
    ("user@192.168.1.1 mixed", "user@<IP> mixed", 0, 1, 0),
    # masks never re-match (idempotence seed case)
    ("<EMAIL> <IP> <PHONE> already", "<EMAIL> <IP> <PHONE> already", 0, 0, 0),
    ("edge.email@e.co", "<EMAIL>", 1, 0, 0),
    # a 3-group dotted number is a phone even after an ip-ish prefix
    ("4octets 1.123.456.7890 tail", "4octets 1.<PHONE> tail", 0, 0, 1),
    # 1-letter TLD is not an email
    ("a@b.c", "a@b.c", 0, 0, 0),
    ("", "", 0, 0, 0),
]


def test_spec_table(spark):
    df = spark.createDataFrame(
        [(i, s) for i, (s, *_rest) in enumerate(SPEC_CASES)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in P.scrub_pii(df).collect()}
    for i, (_s, want, ne, ni, np_) in enumerate(SPEC_CASES):
        r = got[i]
        assert r["scrubbed"] == want, f"case {i}"
        assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (ne, ni, np_), f"case {i}"


def test_spec_table_python_re_third_opinion():
    """The same table through Python's `re` — a third regex engine
    agreeing on the spec guards against leaning on a Java/RE2-shared
    quirk."""
    for s, want, ne, ni, np_ in SPEC_CASES:
        out = s
        counts = []
        for _name, pat, mask in P.PII_RULES:
            counts.append(len(re.findall(pat, s)))
            out = re.sub(pat, mask, out)
        assert out == want, s
        assert counts == [ne, ni, np_], s


def test_synthetic_injection_and_idempotence(spark, sf_documents):
    docs = P.synthetic_pii(sf_documents)
    s = P.scrub_pii(docs).select(
        "doc_id", "n_email", "n_ipv4", "n_phone", "scrubbed")
    base = P.scrub_pii(sf_documents).select(
        "doc_id", F.col("n_email").alias("be"), F.col("n_ipv4").alias("bi"),
        F.col("n_phone").alias("bp"))
    j = {r["doc_id"]: r for r in s.join(base, "doc_id").collect()}
    assert j
    for d, r in j.items():
        if d % 7 == 0:  # clean docs: injection is a no-op
            assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (
                r["be"], r["bi"], r["bp"])
        else:  # exactly one of each appended on top of the base text
            assert r["n_email"] == r["be"] + 1
            assert r["n_ipv4"] == r["bi"] + 1
            assert r["n_phone"] == r["bp"] + 1

    # scrubbing a scrubbed corpus is a no-op (masks never re-match)
    again = P.scrub_pii(s.select("doc_id", F.col("scrubbed").alias("text")))
    twice = {r["doc_id"]: r for r in again.collect()}
    for d, r in twice.items():
        assert r["scrubbed"] == j[d]["scrubbed"]
        assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (0, 0, 0)


def test_rollup_matches_per_doc(spark, sf_documents):
    docs = P.synthetic_pii(sf_documents)
    per = P.scrub_pii(docs).collect()
    want: dict = {}
    for r in per:
        a = want.setdefault(r["source"], [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += 1 if (r["n_email"] + r["n_ipv4"] + r["n_phone"]) > 0 else 0
        a[2] += r["n_email"]
        a[3] += r["n_ipv4"]
        a[4] += r["n_phone"]
    got = {r["source"]: [r["n_docs"], r["n_docs_with_pii"], r["tot_email"],
                         r["tot_ipv4"], r["tot_phone"]]
           for r in P.pii_rollup(docs).collect()}
    assert got == want


def test_scrub_plan_is_map_only(spark, sf_documents):
    plan = P.scrub_pii(P.synthetic_pii(sf_documents))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
