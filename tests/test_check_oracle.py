"""The local oracle-checker must catch fetched-dtype drift (r5 VERDICT #1).

The driver's hash stringifies values as fetched, so a DuckDB HUGEINT
(integer window sum) fetched as float64 renders '10.0' against Spark's
int64 '10' and fails the driver gate even when every value is equal.
check_oracle's value_hash normalizes floats, so it was blind to exactly
this class — dtype_mismatches is the hardening. This test PLANTS the
defect (an uncast integer window-sum in a scratch DuckDB query) and
asserts the checker now fails it.
"""

import duckdb
import pandas as pd

from tools.check_oracle import dtype_mismatches, value_hash


def _scratch_window_sum(cast: bool) -> pd.DataFrame:
    con = duckdb.connect()
    expr = "sum(v) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)"
    if cast:
        expr = f"({expr})::BIGINT"
    return con.execute(
        f"SELECT v, {expr} AS cum FROM (VALUES (1), (2), (3)) t(v)"
    ).fetchdf()


def test_planted_uncast_window_sum_is_flagged():
    spark_side = pd.DataFrame({"v": [1, 2, 3], "cum": [1, 3, 6]}).astype("int64")
    oracle = _scratch_window_sum(cast=False)
    # the planted defect: DuckDB HUGEINT fetches as float64
    assert oracle["cum"].dtype.kind == "f"
    # the old hash-only compare collides — this was the blindspot
    assert value_hash(spark_side) == value_hash(oracle)
    assert dtype_mismatches(spark_side, oracle) == ["cum"]


def test_cast_window_sum_passes():
    spark_side = pd.DataFrame({"v": [1, 2, 3], "cum": [1, 3, 6]}).astype("int64")
    oracle = _scratch_window_sum(cast=True)
    assert oracle["cum"].dtype.kind == "i"
    assert dtype_mismatches(spark_side, oracle) == []
    assert value_hash(spark_side) == value_hash(oracle)


def test_nullable_int_upcast_is_not_flagged():
    # pandas upcasts nullable ints to float64 on fetch — NaN-bearing float
    # vs int is fetch-layer ambiguity, not an oracle defect
    a = pd.DataFrame({"x": pd.Series([1.0, None, 3.0], dtype="float64")})
    b = pd.DataFrame({"x": pd.Series([1, 2, 3], dtype="int64")})
    assert dtype_mismatches(a, b) == []


def test_true_float_vs_int_without_nan_is_flagged_both_ways():
    a = pd.DataFrame({"x": pd.Series([1.0, 2.0], dtype="float64")})
    b = pd.DataFrame({"x": pd.Series([1, 2], dtype="int64")})
    assert dtype_mismatches(a, b) == ["x"]
    assert dtype_mismatches(b, a) == ["x"]
