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
