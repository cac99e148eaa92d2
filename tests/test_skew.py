"""Hot-term skew: the stage-A salted write must spread a pathological
head term across multiple files within its bucket partition — the
explicit skew control the north rule asks for (at cluster scale the
same salt keeps every write task busy instead of serializing the hot
bucket through one)."""

import datetime

from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.indexer import IndexPaths, build_index, read_lineage


def test_hot_term_salted_across_files(spark, tmp_dir):
    ts = datetime.datetime(2024, 1, 1)
    # every doc repeats one hot head term — the worst-case skew shape
    rows = [
        (f"http://h/{i}", ts, bytearray(b""),
         "hotterm " * 8 + f"filler{i % 97} more words", "en")
        for i in range(2000)
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    cfg = EngineConfig(n_doc_shards=4, n_term_buckets=2, n_bucket_groups=1)
    build_index(spark, pages, tmp_dir, cfg)

    raw = spark.read.parquet(IndexPaths(tmp_dir).postings_raw)
    hot = (
        raw.filter(F.col("term_key") == "hotterm")
        .select(F.input_file_name().alias("f"))
        .groupBy("f").count().collect()
    )
    assert hot, "hot term must exist in postings_raw"
    total = sum(r["count"] for r in hot)
    assert total == 2000
    # salt_mod = defaultParallelism(4) // n_term_buckets(2) = 2: the
    # hot term's rows must land in >= 2 files, none holding everything
    assert len(hot) >= 2
    assert max(r["count"] for r in hot) / total <= 0.8

    # lineage metrics: every pack row records its posting-row count
    # and byte size (the per-partition metrics resume/ops reports use)
    packs = [r for r in read_lineage(IndexPaths(tmp_dir)) if r["stage"] == "pack"]
    assert packs
    assert all(r.get("terms", 0) > 0 and r.get("bytes", 0) > 0 for r in packs)
