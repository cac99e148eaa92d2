"""Single-node oracle: the reference engine's index/rank semantics as
plain Python, used only as the golden comparator for the Spark
pipeline (SURVEY.md §5.2).

Shares the per-document parse kernel with the Spark UDFs
(``textproc.parse_doc``) and independently re-implements the corpus
aggregation (Indexer.java:44-121 semantics), idf (Indexer.java:502-505),
and BM25 ranking (Ranker.java:23-63), with the documented determinism
fixes: only matching docs are scored (quirk Q2), ties break on
(score desc, url asc) (Q4), and the dictionary's display-case rule is
the order-independent ``bool_and(capitalized)`` form of the demotion
quirk (Q7).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from .textproc import parse_doc

K1 = 1.2
B = 0.75
BLEND_BM25 = 0.8
BLEND_BONUS = 0.2
TOP_K = 50


@dataclass
class DictEntry:
    display: str
    df: int = 0
    cf: int = 0
    capital: bool = True
    idf: float = 0.0


@dataclass
class DocStats:
    length: int = 0
    max_tf: int = 0
    unique_terms: int = 0
    entities: list[tuple[str, int]] = field(default_factory=list)


class OracleIndex:
    def __init__(self, stop_words: frozenset[str], stem: bool = True) -> None:
        self.stop_words = stop_words
        self.stem = stem
        self.dictionary: dict[str, DictEntry] = {}  # keyed by lower(term)
        self.doc_stats: dict[str, DocStats] = {}
        self.postings: dict[str, dict[str, tuple[int, bool]]] = {}
        self.n_docs = 0
        self.avgdl = 0.0

    # -- build ------------------------------------------------------------
    def add_document(self, url: str, text: str) -> None:
        terms = parse_doc(text, self.stop_words, self.stem)
        self.n_docs += 1
        # group the doc-level (possibly mixed-case rule) keys by term_key
        per_key: dict[str, tuple[str, int, bool, bool]] = {}
        stats = DocStats(unique_terms=len(terms))
        for doc_key, ts in terms.items():
            stats.length += ts.tf
            stats.max_tf = max(stats.max_tf, ts.tf)
            if doc_key[0].isupper():
                stats.entities.append((doc_key, ts.tf + (10 if ts.important else 0)))
            key = doc_key.lower()
            prev = per_key.get(key)
            if prev is None:
                per_key[key] = (doc_key, ts.tf, ts.important, doc_key[0].isupper())
            else:  # same term_key via different doc keys: merge (divergence note in textproc)
                new_cap = doc_key[0].isupper()
                disp = doc_key if (prev[3] and not new_cap) else prev[0]
                per_key[key] = (disp, prev[1] + ts.tf, prev[2] or ts.important, prev[3] and new_cap)
        self.doc_stats[url] = stats
        for key, (doc_key, tf, important, capital) in per_key.items():
            entry = self.dictionary.get(key)
            if entry is None:
                entry = DictEntry(display=doc_key, capital=capital)
                self.dictionary[key] = entry
            entry.df += 1
            entry.cf += tf
            if entry.capital and not capital:
                entry.capital = False
                entry.display = doc_key if not doc_key[0].isupper() else key
            self.postings.setdefault(key, {})[url] = (tf, important)

    def finalize(self) -> None:
        for entry in self.dictionary.values():
            entry.idf = math.log2(self.n_docs / entry.df)
        if self.doc_stats:
            self.avgdl = sum(s.length for s in self.doc_stats.values()) / len(self.doc_stats)

    def build(self, pages: list[dict]) -> None:
        for p in pages:
            self.add_document(p["url"], p["text"])
        self.finalize()

    # -- query ------------------------------------------------------------
    def parse_query(self, query: str) -> set[str]:
        """Title@desc split per Searcher.java:83-99; returns the union
        of title and desc term keys (lowered)."""
        if "@" in query:
            desc = query[query.index("@") + 1 :].lower()
            title = query[: query.index("@")].lower()
        else:
            desc, title = "", query
        keys = set(parse_doc(title, self.stop_words, self.stem))
        keys |= set(parse_doc(desc + " ", self.stop_words, self.stem))
        return {k.lower() for k in keys}

    def search(self, query: str, k: int = TOP_K) -> list[tuple[str, float]]:
        term_keys = self.parse_query(query)
        matched = [t for t in term_keys if t in self.dictionary]
        scores: dict[str, float] = {}
        bonuses: dict[str, float] = {}
        for t in matched:
            idf = self.dictionary[t].idf
            for url, (tf, important) in self.postings[t].items():
                length = self.doc_stats[url].length
                contrib = (K1 + 1.0) * tf * idf / (
                    tf + K1 * ((1.0 - B) + B * (length / self.avgdl))
                )
                scores[url] = scores.get(url, 0.0) + contrib
                bonuses[url] = bonuses.get(url, 0.0) + (1.2 if important else 1.0)
        blended = [
            (url, BLEND_BM25 * bm25 + BLEND_BONUS * bonuses[url])
            for url, bm25 in scores.items()
        ]
        blended.sort(key=lambda x: (-x[1], x[0]))
        return blended[:k]
