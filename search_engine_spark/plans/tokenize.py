"""Tokenize plan: pages -> per-(doc, term) rows via mapInPandas.

This is the UDTF-shaped flatMap of the build pipeline (one page row ->
many posting rows), Arrow-batched: the token-stream rules are
sequential *within* a document (<=3-token lookahead), so the kernel
loops per document but the Spark operator is vectorized across
documents (SURVEY.md §2.10).  Everything downstream of this operator
is pure built-in DataFrame ops.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..config import EngineConfig
from ..textproc import parse_doc

TOKENIZED_SCHEMA = (
    "url string, term string, term_key string, tf int, first_pos int, "
    "important boolean, capital boolean"
)
TOKENIZED_SCHEMA_POS = TOKENIZED_SCHEMA + ", positions array<int>"


def tokenize_pages(pages: DataFrame, cfg: EngineConfig) -> DataFrame:
    """pages(url, text, ...) -> (url, term, term_key, tf, first_pos,
    important, capital[, positions]) with doc-level case demotion
    already applied (term is the doc-canonical key, term_key its
    lowercase)."""
    stop_words = cfg.stop_set()
    stem = cfg.stem
    keep_positions = cfg.keep_positions

    def batch_fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            urls: list[str] = []
            terms: list[str] = []
            keys: list[str] = []
            tfs: list[int] = []
            first_pos: list[int] = []
            importants: list[bool] = []
            capitals: list[bool] = []
            positions: list[list[int]] = []
            for url, text in zip(pdf["url"], pdf["text"]):
                if text is None:
                    continue
                doc_terms = parse_doc(text, stop_words, stem)
                for doc_key, ts in doc_terms.items():
                    urls.append(url)
                    terms.append(doc_key)
                    keys.append(doc_key.lower())
                    tfs.append(ts.tf)
                    first_pos.append(ts.positions[0])
                    importants.append(ts.important)
                    capitals.append(doc_key[0].isupper())
                    if keep_positions:
                        positions.append(ts.positions)
            out = {
                "url": urls,
                "term": terms,
                "term_key": keys,
                "tf": pd.array(tfs, dtype="int32"),
                "first_pos": pd.array(first_pos, dtype="int32"),
                "important": importants,
                "capital": capitals,
            }
            if keep_positions:
                out["positions"] = positions
            yield pd.DataFrame(out)

    schema = TOKENIZED_SCHEMA_POS if keep_positions else TOKENIZED_SCHEMA
    return pages.select("url", "text").mapInPandas(batch_fn, schema=schema)
