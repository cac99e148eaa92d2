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


def population_display_col(col) -> F.Column:
    """``format_population`` as a native (codegen) column expression —
    the row-at-a-time Python UDF this replaces is the banned slow
    path.  Identity with the Python reference rule is asserted in
    tests/test_cities.py.

    Formatting trick: scaled100 = round(n/div*100) as an exact
    integer; Java's trailing-zero-dropping stringification is then
    "%.2f" when the hundredths digit is non-zero, else "%.1f"
    (which prints both 12.3 and 67.0 correctly)."""
    n = col.cast("double")

    def fmt(div: float, suffix: str):
        scaled100 = F.floor(n / F.lit(div) * 100 + F.lit(0.5)).cast("long")
        value = scaled100.cast("double") / F.lit(100.0)
        s = F.when(scaled100 % 10 != 0, F.format_string("%.2f", value)) \
             .otherwise(F.format_string("%.1f", value))
        return F.concat(s, F.lit(suffix))

    return (
        F.when(n < 1000, col.cast("string"))
        .when(n < 1_000_000, fmt(1_000.0, "K"))
        .when(n < 1_000_000_000, fmt(1_000_000.0, "M"))
        .otherwise(fmt(1_000_000_000.0, "B"))
    )


def cities_dim(spark: SparkSession,
               rows: list[tuple[str, str, str, int]] | None = None) -> DataFrame:
    data = rows if rows is not None else list(_DEMO_CITIES)
    df = spark.createDataFrame(
        data, "city string, country string, currency string, population long"
    )
    return df.withColumn("population_display", population_display_col(F.col("population")))


def enrich_city_docs(city_docs: DataFrame, dim: DataFrame) -> DataFrame:
    """(city, url) ⋈ broadcast dim — the S8 enrichment join."""
    return city_docs.join(F.broadcast(dim), "city", "left")


# ---------------------------------------------------------------------------
# S13: persisted dimension sinks (ReadFile.java:173-206 writes the
# cities/languages maps to disk alongside the index; here they are
# parquet dims any later job can join without recomputation)

def write_cities_dim(dim: DataFrame, path: str) -> None:
    dim.coalesce(1).write.mode("overwrite").parquet(path)


def write_languages_dim(pages: DataFrame, path: str) -> None:
    """Distinct (lang, n_docs) from the corpus — the reference's
    language set (ReadFile.java:173-189) with a usable doc count."""
    (pages.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
     .coalesce(1).write.mode("overwrite").parquet(path))


def read_dim(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def make_city_docs(pages: DataFrame, cities: list[str] | None = None) -> DataFrame:
    """Synthesize the ``<F P=104>`` city-tag dimension (city, url) the
    reference reads per doc (ReadFile.java:99-120): our pages schema
    carries no tag field, so the stand-in tags each doc whose url hash
    selects a city — deterministic, corpus-independent of text
    content.  Production replaces this with the real tag extraction;
    every consumer (the search-time union, S8 enrichment) only sees
    the (city, url) shape."""
    names = cities if cities is not None else [c[0] for c in _DEMO_CITIES]
    arr = F.array(*[F.lit(c) for c in names])
    # ~1 in 4 docs carries a tag; which city is a stable url-hash
    # pick.  The city index must come from an INDEPENDENT hash: with
    # one hash h, the tag filter h%4==0 forces h%6 into {0,2,4}, so
    # half the 6-city dim (paris/tokyo/hilo) could never be tagged.
    h = F.abs(F.xxhash64("url"))
    h2 = F.abs(F.xxhash64(F.lit("city-pick"), F.col("url")))
    return (
        pages.select("url", h.alias("h"), h2.alias("h2"))
        .filter(F.col("h") % 4 == 0)
        .select(F.element_at(arr, (F.col("h2") % F.lit(len(names))).cast("int") + 1).alias("city"), "url")
    )


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
