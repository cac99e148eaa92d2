"""Table-driven unit tests for the tokenizer (N1) and every
normalization rule N2-N15 (SURVEY.md §2.7), plus stop-word filter F1
and the case/importance rules."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.textproc import (
    is_k_m_b,
    is_number,
    java_double_str,
    parse_doc,
    parse_tokens,
    tokenize,
    tokenize_spec,
)

SW = frozenset(["the", "a", "and", "is", "of", "in", "to", "at", "or", "between"])


def terms(text, stem=False, sw=SW):
    return {k: (v.tf, v.important) for k, v in parse_doc(text, sw, stem).items()}


def keys(text, stem=False, sw=SW):
    return set(parse_doc(text, sw, stem))


# ---- N1 tokenizer --------------------------------------------------------

TOKEN_CASES = [
    ("Hello, world! nice", ["Hello", "world", "nice"]),
    ("a 10,123 figure", ["a", "10,123", "figure"]),
    ("it's O'Brien's dog", ["it's", "O'Brien's", "dog"]),
    ("rock 'n roll", ["rock", "n", "roll"]),
    ("14:30 60:40 9:30", ["14:30", "60:40", "9", "30"]),  # ':' kept only in dd:dd
    ("x:y then 1:2", ["x", "y", "then", "1:2"]),  # ':' kept at text end (len guard)
    ("x:y then 1:2 ", ["x", "y", "then", "1", "2"]),
    ("45% of %45", ["45%", "of", "45"]),  # leading '%' on empty buffer splits
    ("win 3/4 of 0/3 a/b", ["win", "3/4", "of", "0", "3", "a", "b"]),
    ("the $450 deal costs $1", ["the", "$450", "deal", "costs", "$1"]),
    ("pay x$4 now", ["pay", "x", "4", "now"]),
    ("high-quality 10-15 - -x a- b-c-d-e", ["high-quality", "10-15", "x", "a", "b-c-d-e"]),
    ("U.S. A.M P.M ST. st.pete", ["U.S.", "A.M", "P.M", "ST.", "st.pete"]),
    ("end of line.", ["end", "of", "line."]),
    ("end. next", ["end", "next"]),
    ("4.5 and -3.2 but a.b", ["4.5", "and", "-3.2", "but", "a", "b"]),
    ("brackets [x] {y} (z)", ["brackets", "x", "y", "z"]),
    ("under_score new\nline", ["under", "score", "new", "line"]),
]


@pytest.mark.parametrize("text,want", TOKEN_CASES)
def test_tokenizer_table(text, want):
    assert tokenize(text) == want


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=200))
@settings(max_examples=300, deadline=None)
def test_tokenize_fast_path_matches_spec(text):
    assert tokenize(text) == tokenize_spec(text)


@given(st.text(max_size=120))
@settings(max_examples=150, deadline=None)
def test_tokenize_never_empty_tokens(text):
    assert all(tok for tok in tokenize(text))


# ---- N2: time ------------------------------------------------------------

def test_time_rules():
    assert "14:30 PM" in keys("at 14:30 sharp")
    assert "09:45 AM" in keys("at 09:45 am run")
    assert "10:15 PM" in keys("at 10:15 p.m. run")
    assert "00:10 AM" in keys("at 24:10 run")
    assert "11:59 AM" in keys("at 11:59 run")


# ---- N3: percent range -----------------------------------------------------

def test_percent_range():
    assert "60%-40%" in keys("a 60:40 split")
    assert "45%-55%" in keys("a 45:55 split")
    assert "50:17" in keys("a 50:17 thing")  # neither time nor 100-sum


# ---- N4: dash ranges --------------------------------------------------------

def test_dash_ranges():
    assert "10-15" in keys("pick 10-15 items")
    assert "high-quality" in keys("high-quality stuff")
    assert "HIGH-QUALITY" in keys("High-quality stuff")
    # 3 numeric parts fail isRange but survive via the word path
    assert "10-15-20" in keys("pick 10-15-20 items")
    # 3 word parts pass isRange
    assert "state-of-the" in keys("state-of-the art", sw=frozenset())


# ---- N5: percent -------------------------------------------------------------

def test_percent():
    assert "45%" in keys("grew 45% fast")
    assert "22%" in keys("grew 22 percent fast")
    assert "9%" in keys("grew 9 percentage points")


# ---- N6/N11: dates -------------------------------------------------------------

def test_dates():
    assert "05-14" in keys("on 14 May it rained")
    assert "05-07" in keys("May 7 was dry")
    assert "1994-06" in keys("June 1994 was wet")
    assert "10-03" in keys("3 October storm")
    assert "2001-12" in keys("Dec 2001 storm")
    # "Sep" is not in the reference month table
    assert "09-03" not in keys("3 Sep storm")


# ---- N7/N8: prices --------------------------------------------------------------

def test_price_below_million():
    assert "450 Dollars" in keys("the $450 deal")
    assert "55 Dollars" in keys("pay 55 dollars now")
    assert "22 3/4 Dollars" in keys("pay 22 3/4 dollars now")
    assert "4,000 Dollars" in keys("the $4,000 deal")


def test_price_million_and_up():
    assert "2 M Dollars" in keys("a $2,000,000 pact")
    assert "7 M Dollars" in keys("a $7000000 pact")
    assert "20 M Dollars" in keys("a 20 m dollars pact")
    assert "45000 M Dollars" in keys("a 45 bn dollars pact")
    assert "1500 M Dollars" in keys("lost 1.5 billion U.S. dollars today")
    assert "100 M Dollars" in keys("got 100 million U.S. dollars today")
    assert "1 M Dollars" in keys("paid 1,000,000 dollars cash")
    # the reference's order quirk: "$3 million" hits the <1M rule first
    got = keys("a $3 million pact")
    assert "3 Dollars" in got and "million" in got


# ---- N9: number scaling -----------------------------------------------------------

def test_number_scaling():
    assert "35K" in keys("sold 35 thousand units")
    assert "6M" in keys("sold 6 million units")
    assert "2B" in keys("sold 2 billion units")
    assert "7000B" in keys("sold 7 trillion units")
    assert "10.123K" in keys("sold 10,123 units")
    assert "1K" in keys("sold 1000 units")
    assert "5.5K" in keys("sold 5500 units")
    assert "22 3/4" in keys("rose 22 3/4 points")
    assert "3/4" in keys("rose 3/4 points")
    # "0/3" never tokenizes as one token (slash rule rejects leading 0)
    assert keys("score 0/3 points") == {"score", "0", "3", "points"}


def test_is_k_m_b():
    assert is_k_m_b("35") == "35"
    assert is_k_m_b("1000") == "1K"
    assert is_k_m_b("10,123") == "10.123K"
    assert is_k_m_b("2000000000000") == "2000B"


# ---- N10: between -------------------------------------------------------------------

def test_between():
    assert "Between 18 and 24" in keys("ages between 18 and 24 only")
    # lone lowercase "between" is dropped even without stop list
    assert keys("between the lines", sw=frozenset()) == {"the", "lines"}
    # capitalized Between with stop-worded "between" is stop-filtered
    assert "BETWEEN" not in keys("Between 18 and 24 only")


# ---- N12/number predicates ------------------------------------------------------------

def test_is_number():
    assert is_number("1,000") and is_number("4.5") and is_number("-3")
    assert not is_number("") and not is_number("a1") and not is_number("1_0")


# ---- java double rendering ---------------------------------------------------------------

def test_java_double_str():
    assert java_double_str(1500.0) == "1500.0"
    assert java_double_str(2e7) == "2.0E7"
    assert java_double_str(0.002) == "0.002"
    assert java_double_str(0.0005) == "5.0E-4"
    assert java_double_str(12345678.0) == "1.2345678E7"
    assert java_double_str(3.5) == "3.5"
    assert java_double_str(-1500.0) == "-1500.0"


@given(st.floats(allow_nan=False, allow_infinity=False, min_value=-1e18, max_value=1e18))
@settings(max_examples=300, deadline=None)
def test_java_double_str_roundtrip(x):
    assert float(java_double_str(x)) == x


# ---- N13/Q7: case folding & demotion ----------------------------------------------------

def test_case_demotion():
    # all-capitalized -> UPPER key
    assert "WORLD" in keys("World News Tonight", sw=frozenset())
    # one lowercase occurrence demotes, merging tf
    t = terms("World trade and world affairs")
    assert t["world"][0] == 2 and "WORLD" not in t
    # order independence
    t2 = terms("world trade and World affairs")
    assert t2["world"][0] == 2


# ---- N15: importance ---------------------------------------------------------------------

def test_importance_flag():
    filler = " ".join(f"w{i}" for i in range(40))
    t = terms(filler + " target")
    assert t["target"][1] is False
    t = terms("target " + filler)
    assert t["target"][1] is True
    # importance fixed by first occurrence
    t = terms("target " + filler + " target")
    assert t["target"] == (2, True)


# ---- F1: stop words -------------------------------------------------------------------------

def test_stop_words():
    assert "the" not in keys("the big thing")
    # consumed lookahead tokens skip stop filtering ("and" inside between-range)
    assert "Between 18 and 24" in keys("between 18 and 24")


# ---- stemming through the pipeline ----------------------------------------------------------

def test_stemmed_parse():
    t = keys("running quickly toward victories", stem=True, sw=frozenset())
    assert "run" in t and "victori" in t
    # capitalized word stems differently and keys UPPER
    t = keys("Apples apples", stem=True, sw=frozenset())
    assert t == {"APPLE", "appl"}


# ---- property: permutation invariance of doc-level final state -------------------------------

@given(st.lists(st.sampled_from(["World", "world", "trade", "Trade", "45%", "10-15"]), max_size=12))
@settings(max_examples=100, deadline=None)
def test_final_state_word_path_merges(tokens):
    d = parse_tokens(list(tokens), frozenset(), stem=False)
    lowered = [k.lower() for k in d]
    assert len(lowered) == len(set(lowered))  # one key per term_key
    assert sum(v.tf for v in d.values()) == len(tokens)
