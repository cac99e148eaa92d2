import os
import shutil
import tempfile

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # keep test JVM small


@pytest.fixture(scope="session")
def spark():
    from search_engine_spark.session import get_spark

    s = get_spark(app="tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmp_dir():
    d = tempfile.mkdtemp(prefix="se_spark_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def fixture_pages_parquet(tmp_path_factory):
    from search_engine_spark.fixtures import write_pages_parquet

    path = str(tmp_path_factory.mktemp("pages") / "pages.parquet")
    write_pages_parquet(path, n_docs=300, seed=42)
    return path


@pytest.fixture(scope="session")
def built_index(spark, fixture_pages_parquet, tmp_path_factory):
    """Build the index once per test session on the 300-doc fixture."""
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.indexer import build_index

    cfg = EngineConfig(n_doc_shards=8, n_term_buckets=8, n_bucket_groups=4)
    out = str(tmp_path_factory.mktemp("index"))
    pages = spark.read.parquet(fixture_pages_parquet)
    meta = build_index(spark, pages, out, cfg)
    return out, cfg, meta
