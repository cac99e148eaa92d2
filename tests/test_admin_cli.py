"""End-to-end ops lifecycle through the CLIs: build -> add -> delete
-> compact -> query, each a fresh process (the shape a production
runbook drives)."""

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

from search_engine_spark.fixtures import make_pages, pages_schema_arrow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LAYOUT = ["--doc-shards", "4", "--term-buckets", "4", "--bucket-groups", "1"]


def _run(args, timeout=300):
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    r = subprocess.run([sys.executable] + args, capture_output=True,
                       text=True, cwd=REPO, env=env, timeout=timeout)
    assert r.returncode == 0, r.stderr[-4000:]
    return json.loads([ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1])


def test_admin_cli_lifecycle(tmp_path):
    pages = make_pages(240, seed=13)
    schema = pages_schema_arrow()
    base = str(tmp_path / "base.parquet")
    delta = str(tmp_path / "delta.parquet")
    pq.write_table(pa.Table.from_pylist(pages[:200], schema=schema), base)
    pq.write_table(pa.Table.from_pylist(pages[200:], schema=schema), delta)
    ix = str(tmp_path / "ix")

    out = _run(["build_index.py", "--input", base, "--out", ix] + LAYOUT)
    assert out["docs"] == 200

    out = _run(["index_admin.py", "add", "--index", ix, "--input", delta] + LAYOUT)
    assert out.get("n_docs") == 240 or out.get("docs") == 240
    assert _run(["index_admin.py", "stats", "--index", ix])["segments"] == [1]

    dead = [p["url"] for p in pages[:3]]
    out = _run(["index_admin.py", "delete", "--index", ix]
               + [a for u in dead for a in ("--url", u)] + LAYOUT)

    out = _run(["index_admin.py", "compact", "--index", ix] + LAYOUT)
    assert out.get("n_docs") == 237 or out.get("docs") == 237

    # stats is a pure metadata walk (no Spark) and must reflect the
    # compacted state: docs, zero tombstones, per-bucket rows/bytes
    stats = _run(["index_admin.py", "stats", "--index", ix])
    assert stats["n_docs"] == 237 and stats["tombstoned_urls"] == 0
    assert stats["segments"] == []          # compaction collapsed segment 1
    assert stats["dictionary_terms"] > 0 and stats["packed_posting_rows"] > 0
    assert len(stats["buckets"]) == 4
    assert stats["packed_bytes"] == sum(b["bytes"] for b in stats["buckets"].values())

    # query the mutated index from yet another process
    r = subprocess.run(
        [sys.executable, "query.py", "--index", ix, "--k", "5", "world trade"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"}, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-4000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("q1 ")]
    assert lines, "query over the compacted index must return results"
    assert not any(u in ln for ln in lines for u in dead)

    # boolean flags reach the engine: every hit must contain the
    # --must term's postings (membership asserted by the engine's own
    # pytest; here just that the CLI path runs and returns TREC lines)
    r = subprocess.run(
        [sys.executable, "query.py", "--index", ix, "--k", "5",
         "--must", "nation", "--must-not", "growth", "policy"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"}, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-4000:]
    assert [ln for ln in r.stdout.splitlines() if ln.startswith("q1 ")]

    # term-vector side-car + pseudo-relevance feedback through the CLI
    tv = str(tmp_path / "tv")
    out = _run(["index_admin.py", "termvectors", "--index", ix,
                "--out", tv] + LAYOUT)
    assert out["stamped"] is True
    r = subprocess.run(
        [sys.executable, "query.py", "--index", ix, "--k", "5",
         "--prf", tv, "world trade"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"}, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-4000:]
    assert [ln for ln in r.stdout.splitlines() if ln.startswith("q1 ")]

    # reshard in place (ES _shrink/_split), then query + matched
    # evidence through the NEW layout from fresh processes
    out = _run(["index_admin.py", "reshard", "--index", ix,
                "--to-shards", "3"] + LAYOUT)
    assert out["n_doc_shards"] == 3 and out["n_docs"] == 237
    r = subprocess.run(
        [sys.executable, "query.py", "--index", ix, "--k", "5",
         "--matched", "world trade"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"}, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-4000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("q1 ")]
    assert lines and all("[" in ln and ln.rstrip().endswith("]")
                         for ln in lines)


def test_alias_cli_lifecycle(tmp_path):
    """alias-create -> three alias-ingest batches (build, append,
    rollover) -> alias-stats -> query --alias, each a fresh process."""
    pages = make_pages(180, seed=29)
    schema = pages_schema_arrow()
    paths = []
    for i in range(3):
        p = str(tmp_path / f"b{i}.parquet")
        pq.write_table(
            pa.Table.from_pylist(pages[i * 60:(i + 1) * 60], schema=schema), p)
        paths.append(p)
    alias = str(tmp_path / "alias")

    out = _run(["index_admin.py", "alias-create", "--index", alias])
    assert out["members"] == [] and out["write_index"] is None

    # cap 90: batch0 builds member-00000 (60 docs), batch1 appends
    # (120 >= 90 only AFTER), batch2 rolls to member-00001
    ingest = ["index_admin.py", "alias-ingest", "--index", alias,
              "--max-docs", "90"] + LAYOUT
    outs = [_run(ingest + ["--input", p], timeout=420) for p in paths]
    assert [o["rolled"] for o in outs] == [True, False, True]
    assert outs[2]["write_index"] == "member-00001"

    stats = _run(["index_admin.py", "alias-stats", "--index", alias])
    assert stats["n_docs"] == 180
    per = {r["member"]: r["n_docs"] for r in stats["members"]}
    assert per == {"member-00000": 120, "member-00001": 60}

    r = subprocess.run(
        [sys.executable, "query.py", "--index", alias, "--alias",
         "--k", "5", "world trade"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"}, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-4000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("q1 ")]
    assert len(lines) == 5
