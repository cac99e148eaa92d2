"""Deterministic synthetic corpus + query fixtures (FIXTURES.md).

Generates the ``pages`` table exactly in the BASELINE input-hint shape
``(url:string, warc_ts:timestamp, html:binary, text:string,
lang:string)``, with rule-trigger tokens injected so every parser
rule N1-N15 is exercised, plus the reference query set and stop-word
list.  Seeded — same args always produce the same corpus.  No
external data.
"""

from __future__ import annotations

import datetime as _dt
import random

# Zipfian-ish vocabulary of simple stems; head stems exercise df skew
# and salting, tail stems give the dictionary breadth.
_VOCAB_SIZE = 3000

STOP_WORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "for",
    "is", "are", "was", "were", "be", "been", "it", "its", "this",
    "that", "with", "as", "at", "by", "from", "but", "not", "they",
    "their", "have", "has", "had", "will", "would", "there", "which",
    "between",  # must be present: exercises the survival exception
)

# multi-token constructs that trigger the numeric/date rewrite rules
_RULE_SNIPPETS: tuple[str, ...] = (
    "14:30", "10:15 p.m.", "09:45 am", "24:10", "22:30",
    "45%", "22 percent", "9 percentage", "60:40", "45:55",
    "14 May", "June 1994", "May 7", "3 October", "Dec 2001",
    "$450", "$3 million", "$2,000,000", "20 m dollars", "45 bn dollars",
    "1.5 billion U.S. dollars", "100 million U.S. dollars", "55 dollars",
    "22 3/4 dollars", "10,123", "35 thousand", "7 trillion", "6 million",
    "1,000,000 dollars", "$7000000",
    "10-15", "high-quality", "state-of-the-art", "between 18 and 24",
    "22 3/4", "U.S. trade", "ST. louis", "O'Brien car",
    "World Bank", "World trade", "New York", "united nations",
)

_THEMES: tuple[tuple[str, ...], ...] = (
    ("world", "trade", "export", "import", "tariff", "economy", "market"),
    ("water", "river", "dam", "flood", "drought", "irrigation"),
    ("space", "rocket", "satellite", "orbit", "launch", "mission"),
    ("health", "vaccine", "virus", "hospital", "doctor", "medicine"),
    ("energy", "oil", "solar", "coal", "reactor", "pipeline"),
    ("football", "match", "league", "goal", "player", "stadium"),
)

LANGS = ("en", "fr", "de", "es", None)


def _vocab() -> list[str]:
    base = [
        "nation", "policy", "report", "growth", "price", "company",
        "government", "minister", "official", "percent", "record",
        "system", "project", "program", "service", "industry",
        "region", "village", "citizen", "student", "science",
    ]
    out = list(base)
    syll = ("ba", "co", "di", "fu", "ga", "he", "ji", "ko", "lu", "me",
            "na", "po", "qu", "ro", "su", "ta", "vi", "wo", "xe", "zu")
    n = 0
    while len(out) < _VOCAB_SIZE:
        a, b, c = syll[n % 20], syll[(n // 20) % 20], syll[(n // 400) % 20]
        out.append(a + b + c + ("s" if n % 3 == 0 else "ing" if n % 5 == 0 else ""))
        n += 1
    return out


def html_wrapper(text: str) -> bytes:
    """Deterministic html wrapper; ``extract_text`` must invert this
    byte-identically per url (the per-row invariant)."""
    return b"<html><body>" + text.encode("utf-8") + b"</body></html>"


def make_pages(n_docs: int = 1000, seed: int = 42) -> list[dict]:
    """Generate the synthetic ``pages`` corpus."""
    rng = random.Random(seed)
    vocab = _vocab()
    # Zipf ranks: probability ~ 1/rank.  Pre-accumulated: passing
    # ``weights=`` to rng.choices would rebuild the cumulative table
    # per call (~50x slower corpus generation, identical output).
    import itertools

    cum_weights = list(itertools.accumulate(1.0 / (r + 1) for r in range(len(vocab))))
    epoch = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)
    pages = []
    for d in range(n_docs):
        theme = _THEMES[d % len(_THEMES)]
        length = rng.randint(20, 600)
        words: list[str] = []
        while len(words) < length:
            roll = rng.random()
            if roll < 0.08:
                words.extend(_RULE_SNIPPETS[rng.randrange(len(_RULE_SNIPPETS))].split(" "))
            elif roll < 0.30:
                w = theme[rng.randrange(len(theme))]
                # mixed-case repeats exercise the demotion rule
                words.append(w.capitalize() if rng.random() < 0.25 else w)
            elif roll < 0.42:
                words.append(STOP_WORDS[rng.randrange(len(STOP_WORDS))])
            else:
                words.append(rng.choices(vocab, cum_weights=cum_weights)[0])
        text = " ".join(words) + "\n"
        url = f"https://example.org/{seed}/{d:07d}"
        pages.append(
            {
                "url": url,
                "warc_ts": epoch + _dt.timedelta(seconds=d),
                "html": html_wrapper(text),
                "text": text,
                "lang": LANGS[d % len(LANGS)],
            }
        )
    return pages


# ~20 queries: single/multi-term, stop-word-only, numeric/date/price
# terms, capitalized entities, out-of-dictionary terms, one with desc.
REFERENCE_QUERIES: tuple[tuple[str, str, str], ...] = (
    ("q01", "world trade", ""),
    ("q02", "water river flood", ""),
    ("q03", "space rocket launch", ""),
    ("q04", "vaccine hospital", ""),
    ("q05", "energy oil pipeline", ""),
    ("q06", "football league goal", ""),
    ("q07", "World Bank", ""),
    ("q08", "45%", ""),
    ("q09", "14 May", ""),
    ("q10", "$450", ""),
    ("q11", "35 thousand", ""),
    ("q12", "between 18 and 24", ""),
    ("q13", "high-quality", ""),
    ("q14", "trade", ""),
    ("q15", "the of and", ""),              # stop-word-only: empty result
    ("q16", "zzzunknownterm", ""),          # out-of-dictionary
    ("q17", "economy market growth", "the world economy and market growth"),
    ("q18", "10:15 p.m.", ""),
    ("q19", "New York minister", ""),
    ("q20", "U.S. trade tariff", ""),
)


def pages_schema_arrow():
    import pyarrow as pa

    return pa.schema(
        [
            pa.field("url", pa.string(), nullable=False),
            pa.field("warc_ts", pa.timestamp("us", tz="UTC"), nullable=False),
            pa.field("html", pa.binary()),
            pa.field("text", pa.string(), nullable=False),
            pa.field("lang", pa.string()),
        ]
    )


def write_pages_parquet(path: str, n_docs: int = 1000, seed: int = 42,
                        row_group_size: int = 4096) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pages = make_pages(n_docs, seed)
    table = pa.Table.from_pylist(pages, schema=pages_schema_arrow())
    # small row groups: pyarrow's 1M-row default would put the whole
    # corpus in ONE group — Spark splits parquet at row-group
    # boundaries, so a single group serializes every downstream scan
    # onto one core no matter the cluster size
    pq.write_table(table, path, row_group_size=row_group_size)
    return path
