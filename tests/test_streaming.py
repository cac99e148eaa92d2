"""Structured Streaming: incremental ingest == batch build, and the
watermarked windowed aggregation agrees with its batch twin."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.fixtures import make_pages, pages_schema_arrow
from search_engine_spark.indexer import build_index, read_lineage, IndexPaths
from search_engine_spark.streaming.aggregates import windowed_event_counts
from search_engine_spark.streaming.ingest import refresh_index, stream_ingest

N_DOCS = 200


def _write_chunk(pages: list[dict], path: str) -> None:
    schema = pages_schema_arrow()
    table = pa.Table.from_pylist(pages, schema=schema)
    pq.write_table(table, path)


@pytest.fixture()
def cfg():
    return EngineConfig(n_doc_shards=4, n_term_buckets=4, n_bucket_groups=2)


def test_streamed_ingest_matches_batch_build(spark, tmp_dir, cfg):
    pages = make_pages(N_DOCS, seed=7)
    stream_dir = os.path.join(tmp_dir, "pages_stream")
    os.makedirs(stream_dir)
    ix_stream = os.path.join(tmp_dir, "ix_stream")
    ix_batch = os.path.join(tmp_dir, "ix_batch")

    # two arrivals: initial crawl + an incremental append
    _write_chunk(pages[:120], os.path.join(stream_dir, "chunk0.parquet"))
    stream_ingest(spark, stream_dir, ix_stream, cfg)
    refresh_index(spark, ix_stream, cfg)

    # an engine opened BEFORE the next refresh must serve the new
    # index after .refresh() (its cached frames freeze the parquet
    # file listing; refresh_index replaces the underlying files)
    from search_engine_spark.searcher import SearchEngine

    eng_held = SearchEngine(spark, ix_stream, cfg)
    eng_held.search("world trade", 5).collect()

    _write_chunk(pages[120:], os.path.join(stream_dir, "chunk1.parquet"))
    stream_ingest(spark, stream_dir, ix_stream, cfg)
    meta_s = refresh_index(spark, ix_stream, cfg)
    eng_held.refresh()
    assert eng_held.meta["n_docs"] == N_DOCS
    held_top = [(r["url"], round(r["score"], 9))
                for r in eng_held.search("world trade", 10).collect()]

    # one-shot batch build over the full corpus
    sdf = spark.createDataFrame(
        [(p["url"], p["warc_ts"], bytearray(p["html"]), p["text"], p["lang"])
         for p in pages],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    meta_b = build_index(spark, sdf, ix_batch, cfg, resume=False)

    assert meta_s["n_docs"] == meta_b["n_docs"] == N_DOCS
    assert abs(meta_s["avgdl"] - meta_b["avgdl"]) < 1e-9

    d_s = {(r["term_key"], r["df"], r["cf"])
           for r in spark.read.parquet(f"{ix_stream}/dictionary").collect()}
    d_b = {(r["term_key"], r["df"], r["cf"])
           for r in spark.read.parquet(f"{ix_batch}/dictionary").collect()}
    assert d_s == d_b

    # the search path over the streamed index matches the batch index
    top_s = [(r["url"], round(r["score"], 9))
             for r in SearchEngine(spark, ix_stream, cfg).search("world trade", 10).collect()]
    top_b = [(r["url"], round(r["score"], 9))
             for r in SearchEngine(spark, ix_batch, cfg).search("world trade", 10).collect()]
    assert top_s == top_b
    assert held_top == top_b, "refreshed held engine must serve the new index"

    # lineage kept one row per streamed epoch
    stages = [r["stage"] for r in read_lineage(IndexPaths(ix_stream))]
    assert stages.count("stream_batch") >= 2


def test_incremental_refresh_matches_batch_build(spark, tmp_dir, cfg):
    """refresh_incremental folds pending stream epochs into ONE
    segment (O(epochs) cost, no derived rebuild) and must answer
    exactly like the one-shot batch build; re-crawled urls are
    rejected; an already-folded epoch is never folded twice."""
    from search_engine_spark.searcher import SearchEngine
    from search_engine_spark.streaming.ingest import refresh_incremental
    from search_engine_spark.wand import wand_search

    pages = make_pages(N_DOCS, seed=9)
    stream_dir = os.path.join(tmp_dir, "pages_stream")
    os.makedirs(stream_dir)
    ix_stream = os.path.join(tmp_dir, "ix_stream")
    ix_batch = os.path.join(tmp_dir, "ix_batch")

    # initial crawl -> FULL refresh (cold start needs one)
    _write_chunk(pages[:100], os.path.join(stream_dir, "chunk0.parquet"))
    stream_ingest(spark, stream_dir, ix_stream, cfg)
    refresh_index(spark, ix_stream, cfg)

    # two later arrivals, two epochs, ONE incremental refresh
    _write_chunk(pages[100:150], os.path.join(stream_dir, "chunk1.parquet"))
    stream_ingest(spark, stream_dir, ix_stream, cfg)
    _write_chunk(pages[150:], os.path.join(stream_dir, "chunk2.parquet"))
    stream_ingest(spark, stream_dir, ix_stream, cfg)
    meta = refresh_incremental(spark, ix_stream, cfg)
    assert meta["n_docs"] == N_DOCS

    # the fold created real segments (multi-row (term, shard) keys)
    seg_rows = (
        spark.read.parquet(f"{ix_stream}/index")
        .groupBy("term_key", "shard").count().filter(F.col("count") > 1).count()
    )
    assert seg_rows > 0

    # exact vs one-shot batch build: dictionary and top-10
    sdf = spark.createDataFrame(
        [(p["url"], p["warc_ts"], bytearray(p["html"]), p["text"], p["lang"])
         for p in pages],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    build_index(spark, sdf, ix_batch, cfg, resume=False)
    d_s = {(r["term_key"], r["df"], r["cf"])
           for r in spark.read.parquet(f"{ix_stream}/dictionary").collect()}
    d_b = {(r["term_key"], r["df"], r["cf"])
           for r in spark.read.parquet(f"{ix_batch}/dictionary").collect()}
    assert d_s == d_b
    eng_s = SearchEngine(spark, ix_stream, cfg)
    top_s = [(r["url"], round(r["score"], 9))
             for r in eng_s.search("world trade", 10).collect()]
    top_b = [(r["url"], round(r["score"], 9))
             for r in SearchEngine(spark, ix_batch, cfg).search("world trade", 10).collect()]
    assert top_s == top_b
    # WAND stays exact on the stream-fed segmented index (bound_scale)
    top_w = [(r["url"], round(r["score"], 9))
             for r in wand_search(eng_s, "world trade", 10).collect()]
    assert top_w == top_s

    # idempotence: nothing pending -> no-op, no new segment row
    segs_before = [r for r in read_lineage(IndexPaths(ix_stream))
                   if r["stage"] == "segment"]
    meta2 = refresh_incremental(spark, ix_stream, cfg)
    assert meta2["n_docs"] == N_DOCS
    segs_after = [r for r in read_lineage(IndexPaths(ix_stream))
                  if r["stage"] == "segment"]
    assert len(segs_after) == len(segs_before) == 1

    # a layout mismatch is refused before touching anything
    with pytest.raises(ValueError, match="layout"):
        refresh_incremental(spark, ix_stream, EngineConfig(n_term_buckets=3))

    # a re-crawled url (new epoch, existing url) is rejected
    _write_chunk(pages[:5], os.path.join(stream_dir, "chunk3.parquet"))
    stream_ingest(spark, stream_dir, ix_stream, cfg)
    with pytest.raises(ValueError, match="re-crawled"):
        refresh_incremental(spark, ix_stream, cfg)


def test_windowed_counts_stream_equals_batch(spark, tmp_dir):
    events = spark.range(0, 500).select(
        F.col("id").alias("event_id"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(mins=(F.col("id") * 7) % 300)).alias("ts"),
        (F.col("id") % 13).alias("user_id"),
        F.concat(F.lit("type"), (F.col("id") % 3).cast("string")).alias("event_type"),
        (F.col("id") % 100 / 4.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    src = os.path.join(tmp_dir, "events")
    events.write.parquet(src)

    stream = (spark.readStream
              .schema("event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string")
              .parquet(src))
    q = (windowed_event_counts(stream)
         .writeStream.format("memory").queryName("win_counts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()

    got = {(str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
           for r in spark.sql("SELECT * FROM win_counts").collect()}
    want = {(str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
            for r in windowed_event_counts(spark.read.parquet(src)).collect()}
    assert got == want and len(want) > 3


def test_stateful_sessionize_stream_equals_batch(spark, tmp_dir):
    """applyInPandasWithState sessionization == the batch lag/running-
    sum twin.  Watermark mechanics: chunk0 holds the real events; two
    far-future sentinel chunks (excluded user) arrive in later micro-
    batches so the watermark passes every real session's end+gap and
    the timeout path flushes the per-user open sessions."""
    import datetime as dt

    from search_engine_spark.streaming.sessionize import (
        sessionize_batch,
        sessionize_stream,
    )

    gap_us = 30 * 60 * 1_000_000  # 30 min
    base = dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc)
    real = [
        (i,
         base + dt.timedelta(minutes=int((i * 7) % 300) + 70 * ((i * 3) % 4)),
         i % 5)
        for i in range(200)
    ]
    # a SECOND burst after the users' first sessions have been flushed
    # by timeout: session numbering must CONTINUE (k+1...), not restart
    # at 1 — the state keeps the counter after a timeout flush
    late = [
        (500 + i, base + dt.timedelta(days=2, minutes=5 * i), i % 3)
        for i in range(30)
    ]
    far1 = [(9001, base + dt.timedelta(days=1), 999)]
    far2 = [(9002, base + dt.timedelta(days=4), 999)]
    far3 = [(9003, base + dt.timedelta(days=5), 999)]

    src = os.path.join(tmp_dir, "events_stream")
    os.makedirs(src)
    ddl = "event_id long, ts timestamp, user_id long"
    for name, rows in (("c0", real), ("c1", far1), ("c2", late),
                       ("c3", far2), ("c4", far3)):
        spark.createDataFrame(rows, ddl).coalesce(1).write.parquet(
            os.path.join(src, name))

    stream = (spark.readStream.schema(ddl)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "*")))
    q = (sessionize_stream(stream, gap_us)
         .writeStream.format("memory").queryName("sess_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()

    got = {(r["user_id"], r["session"]): (r["n_events"], r["start_us"], r["end_us"])
           for r in spark.sql("SELECT * FROM sess_out").collect()
           if r["user_id"] != 999}
    want = {(r["user_id"], r["session"]): (r["n_events"], r["start_us"], r["end_us"])
            for r in sessionize_batch(
                spark.createDataFrame(real + late, ddl), gap_us).collect()}
    assert got == want and len(want) >= 10
    # users 0-2 had sessions in BOTH bursts: their late-burst sessions
    # must be numbered after the flushed early ones (no restart at 1)
    assert any(s > 1 for (u, s) in want if u in (0, 1, 2))


def test_streaming_dedup_equals_batch_keep_list(spark, tmp_dir):
    """applyInPandasWithState streaming dedup == batch min-doc keep
    list under ingest-ordered replay; duplicates spanning micro-batch
    boundaries are dropped exactly once."""
    from search_engine_spark.streaming.dedup import (
        dedup_batch_twin,
        dedup_stream,
    )

    ddl = "doc_id long, text string"
    # 3 ingest chunks; content c{i%7} repeats within AND across chunks
    chunks = [
        [(b * 100 + i, f"content c{(b * 100 + i) % 7} body") for i in range(20)]
        for b in range(3)
    ]
    src = os.path.join(tmp_dir, "docs_stream")
    os.makedirs(src)
    for b, rows in enumerate(chunks):
        spark.createDataFrame(rows, ddl).coalesce(1).write.parquet(
            os.path.join(src, f"c{b}"))

    stream = (spark.readStream.schema(ddl)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "*")))
    q = (dedup_stream(stream)
         .writeStream.format("memory").queryName("dedup_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()

    got = {(r["text_hash"], r["doc_id"])
           for r in spark.sql("SELECT * FROM dedup_out").collect()}
    allrows = [r for c in chunks for r in c]
    want = {(r["text_hash"], r["doc_id"])
            for r in dedup_batch_twin(spark.createDataFrame(allrows, ddl)).collect()}
    assert got == want
    assert len(got) == 7          # 7 distinct contents, 60 input rows


def test_streaming_percolate_equals_batch(spark, tmp_dir):
    """Stateless streaming percolation == batch percolation over
    chunked replay: the anchor join + broadcast containment gate
    needs no state, so matches land in the micro-batch their document
    arrives in — and the union over batches is exactly the batch
    operator's output.  Also pins the corpus-stats anchor variant
    producing the identical match set (anchors shrink candidates,
    never results)."""
    from search_engine_spark.operators.percolate import percolate
    from search_engine_spark.streaming.percolate import (
        percolate_stream, query_anchors)

    ddl = "doc_id long, text string"
    chunks = [
        [(b * 100 + i,
          f"alpha tok{(b * 100 + i) % 5} beta" + (" gamma" if i % 3 == 0 else ""))
         for i in range(15)]
        for b in range(3)
    ]
    queries = spark.createDataFrame(
        [("qa", "alpha"), ("qa", "gamma"), ("qb", "tok2"), ("qb", "beta"),
         ("qn", "zzz")],
        "query_id string, term string")
    src = os.path.join(tmp_dir, "perc_stream")
    os.makedirs(src)
    for b, rows in enumerate(chunks):
        spark.createDataFrame(rows, ddl).coalesce(1).write.parquet(
            os.path.join(src, f"c{b}"))

    stream = (spark.readStream.schema(ddl)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "*")))
    q = (percolate_stream(stream, queries)
         .writeStream.format("memory").queryName("perc_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()

    got = {(r["doc_id"], r["query_id"])
           for r in spark.sql("SELECT * FROM perc_out").collect()}
    allrows = [r for c in chunks for r in c]
    batch_docs = spark.createDataFrame(allrows, ddl)
    want = {(r["doc_id"], r["query_id"])
            for r in percolate(batch_docs, queries).collect()}
    assert got == want and want            # non-trivial match set
    assert not any(qid == "qn" for _, qid in got)

    # df-informed anchors (the batch presearcher's rule) change only
    # the candidate keying, never the match set
    anchored = percolate_stream(
        batch_docs, queries,
        anchors=query_anchors(queries, corpus_docs=batch_docs))
    got2 = {(r["doc_id"], r["query_id"]) for r in anchored.collect()}
    assert got2 == want


def test_trending_items_stream_equals_batch(spark, tmp_dir):
    """windowed_item_counts driven as a multi-micro-batch stream
    (maxFilesPerTrigger=1 over 3 files) agrees with the batch run,
    and the read-side top cut ranks (count desc, item asc)."""
    from search_engine_spark.streaming.aggregates import (
        top_items_per_window, windowed_item_counts)

    events = spark.range(0, 600).select(
        F.col("id").alias("event_id"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(mins=(F.col("id") * 7) % 240)).alias("ts"),
        (F.col("id") % 13).alias("user_id"),
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.concat(F.lit('{"k": '), ((F.col("id") * F.col("id")) % 7).cast("string"),
                 F.lit("}")).alias("props"),
    )
    src = os.path.join(tmp_dir, "trend_events")
    events.repartition(3).write.parquet(src)

    stream = (spark.readStream
              .schema("event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string")
              .option("maxFilesPerTrigger", 1)
              .parquet(src))
    q = (windowed_item_counts(stream)
         .writeStream.format("memory").queryName("trend_counts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()

    streamed = spark.sql("SELECT * FROM trend_counts")
    batch = windowed_item_counts(spark.read.parquet(src))
    key = lambda r: (str(r["window_start"]), r["item"])  # noqa: E731
    assert ({key(r): r["n"] for r in streamed.collect()}
            == {key(r): r["n"] for r in batch.collect()})

    top = top_items_per_window(streamed, 2).collect()
    want = top_items_per_window(batch, 2).collect()
    srt = lambda rows: sorted(  # noqa: E731
        (str(r["window_start"]), r["rank"], r["item"], r["n"]) for r in rows)
    assert srt(top) == srt(want)
    per_window = {}
    for r in top:
        per_window.setdefault(str(r["window_start"]), []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1))
               for v in per_window.values())
