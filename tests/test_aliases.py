"""Index aliases + rollover (aliases.py): the ILM lifecycle state
machine over federated members — rollover decisions, atomic state,
read path ≡ one merged index, and the refusal edges."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from search_engine_spark import aliases as AL
from search_engine_spark.config import EngineConfig
from search_engine_spark.indexer import build_index
from search_engine_spark.searcher import SearchEngine

CFG = EngineConfig(n_doc_shards=4, n_term_buckets=4, n_bucket_groups=2)
N = 120
QUERY = "nation policy report trade"


@pytest.fixture(scope="module")
def corpus(spark, fixture_pages_parquet):
    return spark.read.parquet(fixture_pages_parquet).limit(N)


@pytest.fixture(scope="module")
def rolled_alias(spark, corpus, tmp_path_factory):
    """Three url-disjoint batches through the alias with max_docs =
    N/2: build member-00000, append into it, roll to member-00001."""
    alias_dir = str(tmp_path_factory.mktemp("alias") / "a")
    AL.create_alias(alias_dir)
    batches = [corpus.filter(F.pmod(F.xxhash64("url"), F.lit(3)) == i)
               for i in range(3)]
    states = [AL.rollover_ingest(spark, alias_dir, b, N // 2, CFG)
              for b in batches]
    return alias_dir, batches, states


def test_lifecycle_decisions_and_state(rolled_alias):
    alias_dir, batches, states = rolled_alias
    assert [s["rolled"] for s in states] == [True, False, True]
    assert states[0]["ingested_into"] == "member-00000"
    assert states[1]["ingested_into"] == "member-00000"
    assert states[2]["ingested_into"] == "member-00001"
    st = AL.read_alias(alias_dir)
    assert st["members"] == ["member-00000", "member-00001"]
    assert st["write_index"] == "member-00001"
    stats = AL.alias_stats(alias_dir)
    assert stats["n_docs"] == N
    per = {r["member"]: r for r in stats["members"]}
    n0 = batches[0].count() + batches[1].count()
    assert per["member-00000"]["n_docs"] == n0
    assert per["member-00001"]["is_write_index"] \
        and not per["member-00000"]["is_write_index"]


def test_alias_search_equals_merged_index(spark, corpus, rolled_alias,
                                          tmp_path_factory):
    alias_dir, _, _ = rolled_alias
    full = str(tmp_path_factory.mktemp("full") / "ix")
    build_index(spark, corpus, full, CFG)
    eng = SearchEngine(spark, full, CFG)
    a = [(r["url"], round(r["score"], 9)) for r in
         AL.alias_search(spark, alias_dir, QUERY, 20, CFG).collect()]
    m = [(r["url"], round(r["score"], 9)) for r in
         eng.search(QUERY, 20).collect()]
    assert [u for u, _ in a] == [u for u, _ in m] and len(a) == 20
    for (_, sa), (_, sm) in zip(a, m):
        assert abs(sa - sm) < 1e-9


def test_create_and_read_refusals(spark, tmp_path):
    d = str(tmp_path / "a")
    AL.create_alias(d)
    with pytest.raises(ValueError):
        AL.create_alias(d)  # already exists
    with pytest.raises(ValueError):
        AL.create_alias(str(tmp_path / "b"), members=["no/slashes"])
    with pytest.raises(ValueError):
        AL.create_alias(str(tmp_path / "c"), members=["missing"])
    with pytest.raises(ValueError):
        AL.read_alias(str(tmp_path / "nowhere"))
    # corrupt state: write index not a member
    with open(os.path.join(d, AL.ALIAS_FILE), "w") as fh:
        json.dump({"members": [], "write_index": "ghost"}, fh)
    with pytest.raises(ValueError):
        AL.read_alias(d)


def test_rollover_validation(spark, corpus, tmp_path):
    d = str(tmp_path / "a")
    AL.create_alias(d)
    with pytest.raises(ValueError):
        AL.rollover_ingest(spark, d, corpus, 0, CFG)


def test_create_alias_over_existing_member(spark, corpus, tmp_path):
    """Adopting a pre-built index as the initial member: the next
    ingest appends into it while under the cap."""
    root = str(tmp_path / "a")
    os.makedirs(root)
    build_index(spark, corpus.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 0),
                os.path.join(root, "seed"), CFG)
    AL.create_alias(root, members=["seed"])
    st = AL.rollover_ingest(
        spark, root,
        corpus.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 1),
        max_docs=N * 2, cfg=CFG)
    assert not st["rolled"] and st["ingested_into"] == "seed"
    assert AL.alias_stats(root)["n_docs"] == N
