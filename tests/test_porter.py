"""N14: Porter stemmer vs published vocabulary pairs."""

from search_engine_spark.porter import porter_stem

PAIRS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky", "relational": "relat",
    "conditional": "condit", "rational": "ration", "valency": "valenc",
    "hesitancy": "hesit", "digitizer": "digit", "conformably": "conform",
    "radically": "radic", "differently": "differ", "vilely": "vile",
    "analogously": "analog", "vietnamization": "vietnam", "predication": "predic",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous", "formality": "formal",
    "sensitivity": "sensit", "sensibility": "sensibl", "triplicate": "triplic",
    "formative": "form", "formalize": "formal", "electricity": "electr",
    "electrical": "electr", "hopeful": "hope", "goodness": "good",
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "communism": "commun", "activate": "activ", "angularity": "angular",
    "homologous": "homolog", "effective": "effect", "bowdlerize": "bowdler",
    "probate": "probat", "rate": "rate", "cease": "ceas", "controll": "control",
    "roll": "roll",
}


def test_published_pairs():
    for word, want in PAIRS.items():
        assert porter_stem(word) == want, word


def test_short_words_unchanged():
    for w in ("", "a", "ab", "is", "I"):
        assert porter_stem(w) == w


def test_uppercase_letters_are_consonants():
    # the reference stems pre-case-folding; uppercase vowels act as
    # consonants so capitalized words keep most suffixes
    assert porter_stem("Apples") == "Apple"
    assert porter_stem("apples") == "appl"
    assert porter_stem("WORLD") == "WORLD"


def test_non_letters_pass_through():
    assert porter_stem("10-15") == "10-15"
    assert porter_stem("9:30") == "9:30"
