"""ES pipeline aggregations (operators/pipelineagg.py): hand-computed
cumulative sum / derivative / trailing moving average on a tiny bucket
frame, plus bit-equality with the DuckDB twin SQL."""

from __future__ import annotations

import duckdb
import pytest

from search_engine_spark.operators import pipelineagg as PA

BUCKETS = [(0, 2), (1, 5), (2, 3), (3, 4)]


def _frame(spark):
    return spark.createDataFrame(BUCKETS, "t_bucket long, n_docs long")


def _rows(df):
    return [(r["t_bucket"], r["n_docs"], r["cum_docs"], r["delta_docs"],
             r["mavg_micro"]) for r in df.orderBy("t_bucket").collect()]


def test_hand_computed_cells(spark):
    got = _rows(PA.bucket_pipeline(_frame(spark), "t_bucket", window=3))
    want = [
        # (bucket, count, cum, delta, trailing-3 mavg on the 1e-6 grid)
        (0, 2, 2, None, 2_000_000),          # window {2}
        (1, 5, 7, 3, 3_500_000),             # {2,5}: (7e6+1)//2
        (2, 3, 10, -2, 3_333_333),           # {2,5,3}: (10e6+1)//3
        (3, 4, 14, 1, 4_000_000),            # {5,3,4}: (12e6+1)//3
    ]
    assert got == want


def test_window_one_degenerates_to_the_count(spark):
    got = _rows(PA.bucket_pipeline(_frame(spark), "t_bucket", window=1))
    for _, n, _, _, mavg in got:
        assert mavg == n * PA.MICRO


def test_duckdb_twin_is_bit_identical(spark):
    got = _rows(PA.bucket_pipeline(_frame(spark), "t_bucket", window=3))
    vals = ", ".join(f"({b}, {n})" for b, n in BUCKETS)
    sql = PA.duckdb_bucket_pipeline_sql(
        f"SELECT * FROM (VALUES {vals}) AS v(t_bucket, n_docs)",
        "t_bucket", window=3)
    want = [tuple(r) for r in duckdb.sql(
        f"SELECT * FROM ({sql}) ORDER BY t_bucket").fetchall()]
    assert got == want


def test_validation(spark):
    with pytest.raises(ValueError):
        PA.bucket_pipeline(_frame(spark), "t_bucket", window=0)


def test_bucket_stats_hand_computed_and_twin(spark):
    got = PA.bucket_stats(_frame(spark)).collect()[0]
    # counts 2,5,3,4: n=4 min=2 max=5 sum=14 avg=(14e6+2)//4=3_500_000
    assert (got["n_buckets"], got["min_docs"], got["max_docs"],
            got["sum_docs"], got["avg_micro"]) == (4, 2, 5, 14, 3_500_000)
    vals = ", ".join(f"({b}, {n})" for b, n in BUCKETS)
    sql = PA.duckdb_bucket_stats_sql(
        f"SELECT * FROM (VALUES {vals}) AS v(t_bucket, n_docs)")
    want = duckdb.sql(sql).fetchall()[0]
    assert tuple(got) == tuple(want)


def test_serial_diff_lags_and_selector_order(spark):
    rows = [(r["t_bucket"], r["n_docs"], r["sdiff_docs"]) for r in
            PA.serial_diff(_frame(spark), "t_bucket", lag=2)
            .orderBy("t_bucket").collect()]
    # lag 2 over counts 2,5,3,4: NULL, NULL, 3-2=1, 4-5=-1
    assert rows == [(0, 2, None), (1, 5, None), (2, 3, 1), (3, 4, -1)]
    # lag=1 degenerates to the derivative column of bucket_pipeline
    d1 = {r["t_bucket"]: r["sdiff_docs"] for r in
          PA.serial_diff(_frame(spark), "t_bucket", lag=1).collect()}
    der = {r["t_bucket"]: r["delta_docs"] for r in
           PA.bucket_pipeline(_frame(spark), "t_bucket").collect()}
    assert d1 == der
    # selector AFTER the diff: dropping the count-2 bucket must keep
    # bucket 2's lag built from it
    kept = [(r["t_bucket"], r["sdiff_docs"]) for r in
            PA.bucket_selector(
                PA.serial_diff(_frame(spark), "t_bucket", lag=2),
                min_count=3).orderBy("t_bucket").collect()]
    assert kept == [(1, None), (2, 1), (3, -1)]
    # twin bit-equality on the composed form
    vals = ", ".join(f"({b}, {n})" for b, n in BUCKETS)
    sql = PA.duckdb_serial_diff_sql(
        f"SELECT * FROM (VALUES {vals}) AS v(t_bucket, n_docs)",
        "t_bucket", lag=2, min_count=3)
    want = [tuple(r) for r in duckdb.sql(
        f"SELECT * FROM ({sql}) ORDER BY t_bucket").fetchall()]
    assert [(b, BUCKETS[b][1], d) for b, d in kept] == want


def test_sibling_validation(spark):
    with pytest.raises(ValueError):
        PA.serial_diff(_frame(spark), "t_bucket", lag=0)
    with pytest.raises(ValueError):
        PA.bucket_selector(_frame(spark), min_count=-1)
