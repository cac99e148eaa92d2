"""City dim (S7/S8/S13) and offline query expansion (R5)."""

from search_engine_spark.operators.cities import (
    cities_dim,
    enrich_city_docs,
    expand_query_terms,
    format_population,
)


def test_format_population_reference_rule():
    # City.java:146-165: <1000 verbatim; /1e3|/1e6|/1e9 with
    # Math.round(x*100)/100 and K/M/B suffix; Java double printing
    assert format_population(500) == "500"
    assert format_population(1234) == "1.23K"
    assert format_population(4500) == "4.5K"
    assert format_population(67000) == "67.0K"
    assert format_population(999999) == "1000.0K"
    assert format_population(67215293) == "67.22M"
    assert format_population(125836021) == "125.84M"
    assert format_population(1500000000) == "1.5B"


def test_cities_dim_and_enrich(spark):
    dim = cities_dim(spark)
    rows = {r["city"]: r for r in dim.collect()}
    assert rows["london"]["population_display"] == "67.22M"

    docs = spark.createDataFrame(
        [("london", "d1"), ("london", "d2"), ("unknowncity", "d3")],
        "city string, url string",
    )
    got = {(r["url"], r["country"]) for r in enrich_city_docs(docs, dim).collect()}
    assert got == {("d1", "United Kingdom"), ("d2", "United Kingdom"),
                   ("d3", None)}


def test_expand_query_terms_cap_and_order(spark):
    syn = spark.createDataFrame(
        [("trade", "commerce", 1), ("trade", "exchange", 2),
         ("trade", "barter", 3), ("world", "globe", 1),
         ("world", "earth", 2), ("other", "noise", 1)],
        "term string, synonym string, rank int",
    )
    # 2 terms -> cap 4, rank order with lexicographic tie-break
    got = expand_query_terms(["World", "trade"], syn)
    assert got == ["commerce", "globe", "earth", "exchange"]
    assert expand_query_terms([], syn) == []
