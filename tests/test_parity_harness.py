"""The parity harness itself must CATCH mismatches — a comparator that
silently passes everything would make the whole oracle suite vacuous.
Pure-pandas tests (no Spark) of compare_frames' detection and its
deliberate insensitivities (row order, column order, int width, ns-vs-us
timestamps)."""

from __future__ import annotations

import pandas as pd

from binance_etl_clickhouse_spark.testing import compare_frames


def _f(**cols):
    return pd.DataFrame(cols)


def test_detects_value_mismatch():
    a = _f(k=[1, 2], v=[1.5, 2.5])
    b = _f(k=[1, 2], v=[1.5, 2.500001])
    assert compare_frames(a, b)


def test_detects_row_count_mismatch():
    assert compare_frames(_f(k=[1]), _f(k=[1, 2]))


def test_detects_column_set_mismatch():
    assert compare_frames(_f(k=[1]), _f(j=[1]))


def test_detects_null_vs_value():
    a = _f(k=[1, 2], v=[None, 2.0])
    b = _f(k=[1, 2], v=[1.0, 2.0])
    assert compare_frames(a, b)


def test_insensitive_to_row_and_column_order():
    a = _f(k=[2, 1], v=[2.5, 1.5])
    b = _f(v=[1.5, 2.5], k=[1, 2])[["v", "k"]]
    assert compare_frames(a, b) == []


def test_insensitive_to_int_width_and_ts_unit():
    a = pd.DataFrame(
        {
            "n": pd.array([1, 2], dtype="int32"),
            "t": pd.to_datetime(["2024-01-01", "2024-01-02"]).astype("datetime64[ns]"),
        }
    )
    b = pd.DataFrame(
        {
            "n": pd.array([1, 2], dtype="int64"),
            "t": pd.to_datetime(["2024-01-01", "2024-01-02"]).astype("datetime64[us]"),
        }
    )
    assert compare_frames(a, b) == []


def test_matching_nulls_pass():
    a = _f(k=[1, 2], v=[None, 2.0])
    b = _f(k=[1, 2], v=[None, 2.0])
    assert compare_frames(a, b) == []


def test_detects_int_vs_float_dtype_split():
    """The r2 driver failure mode: DuckDB HUGEINT -> float64 through
    fetchdf() while Spark emits int64. Values compare equal elementwise,
    but the driver's hash is dtype-sensitive — the harness must flag it."""
    a = pd.DataFrame({"n": pd.array([11901, 2], dtype="int64")})
    b = pd.DataFrame({"n": pd.array([11901.0, 2.0], dtype="float64")})
    problems = compare_frames(a, b)
    assert problems and "dtype-class" in problems[0]


def test_all_null_object_column_matches_any_class():
    a = pd.DataFrame({"v": pd.array([None, None], dtype="float64")})
    b = pd.DataFrame({"v": [None, None]})  # object dtype, all-null
    assert compare_frames(a, b) == []
