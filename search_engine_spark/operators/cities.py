"""City dimension (S7/S8/S13) and query expansion (R5).

The reference enriches cities from a bundled REST-countries snapshot
(City.java:28-46, resources/city1.txt) with a geobytes HTTP fallback
per unknown city (City.java:96-137), and expands queries via the
Datamuse HTTP API (Searcher.java:335-373).  Network calls have no
place in a 10^12-doc batch job (non-deterministic, rate-limited), so
both become STATIC dimension tables — same join shape, no network:

- ``cities_dim``: (city, country, currency, population) rows; the
  caller supplies the snapshot (or uses the tiny built-in demo set).
  ``format_population`` reproduces City.java:146-165 exactly:
  numbers < 1000 verbatim, else /1e3|/1e6|/1e9, Math.round to two
  decimals, suffix K/M/B — including Java's ``double/100``
  stringification dropping a trailing zero (12.30 -> "12.3").
- ``expand_query_terms``: R5 with a synonyms dim instead of Datamuse:
  per query term, up to ``min(2*|q|, 100)`` expansion terms total,
  in synonym-rank order — the reference's cap logic
  (Searcher.java:346-349).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# a tiny deterministic snapshot standing in for resources/city1.txt;
# production would load the full REST-countries dump as parquet
_DEMO_CITIES: tuple[tuple[str, str, str, int], ...] = (
    ("london", "United Kingdom", "GBP", 67215293),
    ("paris", "France", "EUR", 67391582),
    ("york", "United Kingdom", "GBP", 67215293),
    ("tokyo", "Japan", "JPY", 125836021),
    ("lima", "Peru", "PEN", 32971854),
    ("hilo", "United States", "USD", 329484123),
)


def format_population(num: float | int) -> str:
    """City.java:146-165 byte-for-byte (Java prints 4.5 not 4.50)."""
    n = float(num)
    if n < 1000:
        return str(num)
    for bound, div, suffix in (
        (1_000_000, 1_000.0, "K"),
        (1_000_000_000, 1_000_000.0, "M"),
        (math.inf, 1_000_000_000.0, "B"),
    ):
        if n < bound:
            scaled = math.floor(n / div * 100 + 0.5) / 100  # Math.round semantics
            s = f"{scaled:.2f}".rstrip("0").rstrip(".")
            if "." not in s:
                s += ".0"  # Java double prints 67.0, not 67
            return s + suffix
    raise AssertionError


def cities_dim(spark: SparkSession,
               rows: list[tuple[str, str, str, int]] | None = None) -> DataFrame:
    data = rows if rows is not None else list(_DEMO_CITIES)
    df = spark.createDataFrame(
        data, "city string, country string, currency string, population long"
    )
    fmt = F.udf(format_population, "string")
    return df.withColumn("population_display", fmt(F.col("population")))


def enrich_city_docs(city_docs: DataFrame, dim: DataFrame) -> DataFrame:
    """(city, url) ⋈ broadcast dim — the S8 enrichment join."""
    return city_docs.join(F.broadcast(dim), "city", "left")


def expand_query_terms(query_terms: list[str], synonyms: DataFrame) -> list[str]:
    """R5 offline: synonyms(term, synonym, rank) -> up to
    min(2*|q|, 100) expansion terms across the whole query, rank
    order, driver-side (query terms are a handful of strings)."""
    if not query_terms:
        return []
    cap = min(2 * len(query_terms), 100)
    rows = (
        synonyms.filter(F.col("term").isin([t.lower() for t in query_terms]))
        .orderBy("rank", "synonym")
        .limit(cap)
        .collect()
    )
    return [r["synonym"] for r in rows]
