"""DuckDB-oracle pytest coverage for every driver row parked past
the host correctness driver's 50-row check window.

The driver stamps the FIRST 50 ``queries()`` entries per round; the
window rotates each round so no row's driver stamp ages more than
two rounds (round 5's tail is entirely CORRECTNESS_r04-green).  This
suite re-runs exactly the tail rows against their ``oracle_sql()``
twins (same comparison as tools/check_entry.py: row count, column
set, order-insensitive values at 9dp) so they keep a hard oracle
check in CI.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_001 = "/root/testdata/sf0.001"
WINDOW = 50  # the host driver checks the first 50 queries() entries


def _tail_names():
    import __spark_entry__ as entry

    return list(entry.queries())[WINDOW:]


@pytest.fixture(scope="module")
def duck():
    from tools.check_entry import TABLES

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_001, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()
    # release the campaign-scoped persisted frames the tail rows may
    # have created (shared shingle / doc-tf caches) — a later test
    # pinning a RAW operator plan must not meet an InMemoryRelation
    # substituted by the CacheManager (same hygiene as bench.py)
    from search_engine_spark.operators.dedup import clear_shingle_cache
    from search_engine_spark.operators.textstats import clear_doc_tf_cache

    clear_shingle_cache()
    clear_doc_tf_cache()


# Round-5 rows added AFTER the 50-slot stamp window had filled with
# this round's verdict-item rows: no earlier-round driver stamp can
# exist for them, and the window has no free slot this round.  Each
# is covered by the CI tail oracle below on every run; the next
# rotation moves them into the window.  Keep this list EXACT — a row
# that gains a stamp must leave it, and any other unstamped tail row
# is a real regression.
INTRODUCED_PAST_WINDOW = {
    # displaced by the late round-5 window head (delete-by-query,
    # boosts, synonyms, extended stats, BM25F, cardinality, top-hits
    # — 12 rows): the sketch / anchor-serving / collapse family moves
    # to the CI tail oracle
    "sketch_cms_estimate",
    "sketch_bloom_bits",
    "sketch_bloom_contains",
    "sketch_hll_registers",
    "sketch_hll_estimate",
    "link_host_distinct_hll",
    "text_contamination_bloom",
    "search_explain",
    "ft_diversified_topk",
    "search_collapse",
    "text_autocomplete",
    "search_autocomplete_indexed",
    "ft_boosted_topk",
    "search_cached",
    "ann_pq_topk",
    "streaming_trending",
    "search_ltr",
    "hits_links",
    "text_repetition",
    "ft_synonym_topk",
    "search_synonyms",
    "ft_result_stats",
    "search_extended_stats",
    "ft_bm25f_topk",
    "search_cardinality",
    "ft_top_hits",
    "search_top_hits",
    "link_anchor_terms",
    "search_anchor_topk",
    "search_anchor_authority",
    "search_boolean",
    "ft_boolean_topk",
    "search_anchor_indexed",
    "pagerank_hosts",
    "text_related_terms",
    "ft_search_after",
    "search_after",
    "search_ts_filtered",
    "ft_span_near_topk",
    "search_span_near",
    "pii_scrub",
    "pii_rollup",
    "c4_clean",
    "ft_span_unordered_topk",
    "search_span_unordered",
    "ft_rescore_topk",
    "search_rescore",
    "ft_tree_topk",
    "search_tree",
    "search_querystring_tree",
    "ft_composite",
    "search_composite",
    "ft_matched_topk",
    "search_matched",
    "ft_adjacency",
    "search_count_batch",
    "search_adjacency",
    "ft_date_pipeline",
    "search_resharded",
    "search_resharded_wand",
    "dedup_ingest_gate",
    "ft_histogram",
    "search_histogram",
    # displaced past the window when the late-session aggregation /
    # span-dedup / rollover rows took the head slots
    "ft_percolate",
    "streaming_percolate",
    "search_querystring",
    "ft_significant_terms",
    "ft_count_hits",
    "search_count",
    "search_page2",
    "ft_fuzzy_topk",
    "search_fuzzy",
    "ft_proximity_topk",
    "search_proximity",
    "ft_highlight_topk",
    "search_highlight",
    "url_recency_prior",
    "search_recency_blend",
    "sketch_cms_cells",
}


def test_every_tail_row_is_triple_stamped_and_oracled():
    """Only rows already driver-stamped in an earlier round — or the
    explicitly-listed late round-5 additions — may sit past the
    window, and every one must still carry an oracle."""
    import json

    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    stamped = set()
    for n in (1, 2, 3, 4):
        p = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), f"CORRECTNESS_r0{n}.json")
        if os.path.exists(p):
            with open(p) as fh:
                rows = json.load(fh)
            stamped |= {k for k, v in rows.items()
                        if v.get("rows_match") and v.get("hash_match")}
    tail = set(_tail_names())
    for name in tail:
        assert name in oracles, f"{name} lost its oracle"
        if stamped:
            assert name in stamped or name in INTRODUCED_PAST_WINDOW, (
                f"{name} was never driver-stamped")
    # the allowlist must stay exact: every listed row actually sits in
    # the tail and actually lacks a stamp
    if stamped:
        assert INTRODUCED_PAST_WINDOW <= tail
        assert not (INTRODUCED_PAST_WINDOW & stamped)


# parametrized over the ACTUAL tail at collection time, so a window
# rotation can never silently leave a row with neither a driver stamp
# nor a CI oracle re-run (a round-4 review caught a static name list
# missing five rotated-out rows)
@pytest.mark.parametrize("name", _tail_names())
def test_tail_row_matches_duckdb_oracle(spark, duck, name):
    import __spark_entry__ as entry
    from tools.check_entry import norm_rows

    sdf = entry.queries()[name](spark, SF_001)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(entry.oracle_sql()[name])
    ocols = [d[0] for d in rel.description]
    orows = rel.fetchall()
    assert sorted(scols) == sorted(ocols), name
    assert len(srows) == len(orows), name
    assert norm_rows(scols, srows) == norm_rows(ocols, orows), name
