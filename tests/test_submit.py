"""The north-rule ship shape: ``spark-submit --py-files engine.zip``.

Stages the CLI drivers in a directory AWAY from the repo so the
``search_engine_spark`` package can only resolve from the zip shipped
via ``--py-files`` — the exact layout a cluster submit has (driver
script + zip, no repo checkout on the nodes)."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


def _run(args, cwd, timeout=420):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    return subprocess.run(args, capture_output=True, text=True,
                          cwd=cwd, env=env, timeout=timeout)


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_build_and_query(tmp_path, fixture_pages_parquet):
    zip_path = str(tmp_path / "engine.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_engine_zip.py"), zip_path],
        check=True, capture_output=True,
    )
    stage = tmp_path / "stage"
    stage.mkdir()
    for script in ("build_index.py", "query.py"):
        shutil.copy(os.path.join(REPO, script), stage / script)
    # the staged dir must NOT contain the package — the point of the test
    assert not (stage / "search_engine_spark").exists()

    ix = str(tmp_path / "ix")
    common = [SPARK_SUBMIT, "--master", "local[4]",
              "--conf", "spark.ui.enabled=false",
              "--py-files", zip_path]
    r = _run(common + [str(stage / "build_index.py"),
                       "--input", fixture_pages_parquet, "--out", ix,
                       "--doc-shards", "4", "--term-buckets", "4",
                       "--bucket-groups", "1"], cwd=str(stage))
    assert r.returncode == 0, r.stderr[-4000:]
    stats = json.loads(
        [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert stats["docs"] == 300
    assert os.path.exists(os.path.join(ix, "meta.json"))
    # the submitted master must WIN over the in-code local default:
    # build_index passed no --master, so get_spark had to inherit
    # spark-submit's local[4] rather than forcing local[$CPUS]
    assert stats["master"] == "local[4]"

    r = _run(common + [str(stage / "query.py"), "--index", ix, "--k", "5",
                       "world trade market"], cwd=str(stage))
    assert r.returncode == 0, r.stderr[-4000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("q1 ")]
    assert 1 <= len(lines) <= 5
    # TREC line shape: qid rank url score
    parts = lines[0].split()
    assert parts[1] == "1" and float(parts[3]) > 0
