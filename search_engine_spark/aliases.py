"""Index aliases + rollover — the ES/ILM serving lifecycle over
federated members.

At 100 TB nobody serves one ever-growing index: the standard
Elasticsearch shape is an ALIAS that clients query, backed by a list
of member indexes of which exactly one is the WRITE index; when the
write index crosses a size condition the alias "rolls over" — a new
member becomes the write index and the full members list keeps
serving reads (ES ``_rollover`` + ``is_write_index``; Lucene-side it
is the MultiReader over immutable generations).  The repo already has
both halves: per-member builds/appends (`indexer.build_index`,
`incremental.add_documents`) and statistics-correct cross-member
queries (`federated.federated_search`).  This module is the thin,
crash-safe state machine that ties them into the lifecycle.

Layout: ``alias_dir/alias.json`` holds ``{"members": [relative
names], "write_index": name}``; member indexes live in subdirectories
of ``alias_dir``.  The state file is published atomically (scratch +
``os.replace``), and ONLY after the member build/append it describes
has completed — a crash mid-build leaves an unregistered directory
that the deterministic member naming re-enters (`build_index` is
resume-safe), never a torn alias.

Contract notes:
- crawl batches must be url-disjoint across members (the same
  contract `add_documents` enforces WITHIN a member); federation
  would otherwise double-count a url.  ES puts the same burden on
  the client (routing by document id).
- the rollover condition is checked BEFORE ingesting a batch (the
  ES ``_rollover`` call order): a write index at/over ``max_docs``
  rolls first, so a member can exceed ``max_docs`` by at most one
  batch — exactly ES's "conditions are checked at rollover time,
  not enforced as a cap".

Scale shape: `rollover_ingest` is O(batch) (segment append or fresh
member build over the batch only); `alias_search` is
`federated_search` — per-member pruned scans + a k-row heap merge,
with O(|query terms|) cross-member stat coordination.  The alias
state itself is a few hundred bytes of JSON, read without a Spark
job.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from .config import DEFAULT, EngineConfig
from .federated import federated_search
from .incremental import add_documents
from .indexer import build_index

ALIAS_FILE = "alias.json"


def _state_path(alias_dir: str) -> str:
    return os.path.join(alias_dir, ALIAS_FILE)


def _publish(alias_dir: str, state: dict) -> None:
    """Atomic alias-state publish: scratch file + os.replace, the
    side-car discipline every stored layout in the repo uses."""
    tmp = _state_path(alias_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(state, fh, indent=1, sort_keys=True)
    os.replace(tmp, _state_path(alias_dir))


def create_alias(alias_dir: str, members: list[str] | None = None) -> dict:
    """Initialise an alias directory.  ``members`` are EXISTING member
    index subdirectory names (relative to ``alias_dir``); the last one
    becomes the write index (ES: exactly one ``is_write_index``)."""
    os.makedirs(alias_dir, exist_ok=True)
    if os.path.exists(_state_path(alias_dir)):
        raise ValueError(f"alias already exists at {alias_dir}")
    members = list(members or [])
    for m in members:
        if os.sep in m:
            raise ValueError(f"member must be a relative name, got {m!r}")
        if not os.path.isdir(os.path.join(alias_dir, m)):
            raise ValueError(f"member index {m!r} not found under alias dir")
    state = {"members": members,
             "write_index": members[-1] if members else None}
    _publish(alias_dir, state)
    return state


def read_alias(alias_dir: str) -> dict:
    p = _state_path(alias_dir)
    if not os.path.exists(p):
        raise ValueError(f"no alias at {alias_dir}")
    with open(p) as fh:
        state = json.load(fh)
    if state.get("write_index") is not None \
            and state["write_index"] not in state.get("members", []):
        raise ValueError(f"corrupt alias state at {p}: write index "
                         f"{state['write_index']!r} not a member")
    return state


def member_dirs(alias_dir: str) -> list[str]:
    return [os.path.join(alias_dir, m)
            for m in read_alias(alias_dir)["members"]]


def _member_n_docs(alias_dir: str, member: str) -> int:
    meta_path = os.path.join(alias_dir, member, "meta.json")
    with open(meta_path) as fh:
        return int(json.load(fh)["n_docs"])


def rollover_ingest(spark: SparkSession, alias_dir: str, pages: DataFrame,
                    max_docs: int, cfg: EngineConfig = DEFAULT) -> dict:
    """Ingest a crawl batch THROUGH the alias: if the current write
    index already holds >= ``max_docs`` documents (or none exists),
    the alias rolls over — the batch builds a fresh member which
    becomes the write index; otherwise the batch segment-appends into
    the write index (O(batch) either way).  Returns the published
    alias state plus ``{"rolled": bool, "ingested_into": name}``.

    Crash safety: the member directory name is deterministic
    (``member-<ordinal>``), the build/append completes BEFORE the
    alias state references it, and `build_index` resumes a killed
    build — re-running the same ingest converges."""
    if max_docs < 1:
        raise ValueError("max_docs must be >= 1")
    state = read_alias(alias_dir)
    write = state["write_index"]
    roll = write is None or _member_n_docs(alias_dir, write) >= max_docs
    if roll:
        name = f"member-{len(state['members']):05d}"
        target = os.path.join(alias_dir, name)
        build_index(spark, pages, target, cfg)
        state = {"members": state["members"] + [name], "write_index": name}
        _publish(alias_dir, state)
    else:
        name = write
        add_documents(spark, pages, os.path.join(alias_dir, name), cfg)
    out = dict(state)
    out.update({"rolled": roll, "ingested_into": name})
    return out


def alias_search(spark: SparkSession, alias_dir: str, query: str,
                 k: int | None = None,
                 cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Query the alias: `federated_search` over every member — global
    collection statistics, rank-identical to one index built over the
    union corpus (the federated contract, driver-row-pinned)."""
    return federated_search(spark, member_dirs(alias_dir), query, k, cfg)


def alias_stats(alias_dir: str) -> dict:
    """Spark-free alias summary (the `index_admin.py stats` shape):
    per-member doc counts and the write-index marker."""
    state = read_alias(alias_dir)
    rows = [{"member": m, "n_docs": _member_n_docs(alias_dir, m),
             "is_write_index": m == state["write_index"]}
            for m in state["members"]]
    return {"alias_dir": alias_dir, "members": rows,
            "n_docs": sum(r["n_docs"] for r in rows)}
