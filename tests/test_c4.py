"""C4 line cleaning (curation.c4_clean): golden per-rule table, the
synthetic-corpus branch toggle (doc_id%3 flips kept_doc), a Python
third-opinion recomputation, and the zero-shuffle plan shape."""

from __future__ import annotations

import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from search_engine_spark.operators import curation as CU  # noqa: E402


@pytest.fixture(scope="module")
def sf_documents(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


# (line, kept) — one per rule
RULE_CASES = [
    ("A perfectly normal sentence stays in.", True),
    ("Ends with a question mark?", True),
    ('He said "quoted."', True),
    ("  padded but fine, trimmed first.  ", True),   # trim before checks
    ("Too short.", False),                            # < 3 words
    ("no terminal punctuation here", False),
    ("Please enable JavaScript to continue browsing.", False),
    ("Classic Lorem Ipsum filler text sits here.", False),
    ("if (x) { return y; } works fine.", False),      # curly brace
    ("", False),
]


def _keep_py(line: str) -> bool:
    t = line.strip()
    return (bool(re.search(r'[.!?"]$', t))
            and len(re.split(r"\s+", t)) >= CU.C4_MIN_WORDS
            and not re.search(CU.C4_BAD_RE.replace("(?i)", ""), t,
                              flags=re.IGNORECASE)
            and "{" not in line)


def test_rule_table(spark):
    df = spark.createDataFrame(
        [(i, s) for i, (s, _k) in enumerate(RULE_CASES)],
        "doc_id long, text string")
    got = {r["doc_id"]: r["n_kept"] == 1
           for r in CU.c4_clean(df).collect()}
    for i, (line, want) in enumerate(RULE_CASES):
        assert got[i] == want, f"case {i}: {line!r}"
        assert _keep_py(line) == want, f"python re disagrees on {line!r}"


def test_synthetic_corpus(spark, sf_documents):
    rows = CU.c4_clean(CU.synthetic_c4(sf_documents)).collect()
    assert rows
    for r in rows:
        d = r["doc_id"]
        assert r["n_lines"] == 7
        # keepers: sentence 1, the body+'.', and the %3 switch line
        want_kept = 2 if d % 3 == 0 else 3
        assert r["n_kept"] == want_kept, d
        assert r["kept_doc"] == (want_kept >= CU.C4_MIN_KEPT)
        first = r["cleaned"].split("\n")[0]
        assert first == (f"This sentence number {d % 100} "
                         "is long enough to keep.")
        assert "javascript" not in r["cleaned"].lower()
        assert "{" not in r["cleaned"]


def test_plan_is_map_only(spark, sf_documents):
    plan = CU.c4_clean(CU.synthetic_c4(sf_documents))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
