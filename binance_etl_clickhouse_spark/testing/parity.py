"""Local mirror of the driver's Spark-vs-DuckDB correctness compare.

The driver sorts columns by name, then hash-compares values order-
insensitively. This harness reproduces that locally (row-count + column
names + cell-exact comparison after canonical sorting) so oracle drift is
caught in ``pytest`` before the driver runs.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from binance_etl_clickhouse_spark.tables import TESTDATA_TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    """Run oracle SQL with the driver's view setup (each table a view)."""
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).fetchdf()


def spark_to_pandas(df: DataFrame) -> pd.DataFrame:
    return df.toPandas()


def _dtype_class(s: pd.Series) -> str:
    """Coarse dtype class used for the driver-typing gate.

    An all-null object column (e.g. DuckDB NULL literals) is 'null' and
    matches any class — there are no values for the hash to diverge on.
    """
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if s.dtype == object and s.isna().all():
        return "null"
    return "object"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            if s.isna().all():
                # all-null (e.g. DuckDB NULL literal) -> NaN so it compares
                # equal to an all-null typed column on the other side
                df[c] = np.full(len(s), np.nan)
            else:
                # decimals / HUGEINT fallbacks -> string canon
                df[c] = s.astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def compare_frames(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "query"
) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    problems: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(
            f"{name}: row count {len(spark_pdf)} (spark) != {len(oracle_pdf)} (oracle)"
        )
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"{name}: columns {s_cols} != {o_cols}")
        return problems
    if problems:
        return problems
    # Driver-exact typing gate (VERDICT r2 item 3): the driver's value hash is
    # dtype-sensitive, so an integer column on one side and a float column on
    # the other (DuckDB HUGEINT/DECIMAL -> float64 through fetchdf()) hash-
    # mismatches even when every value compares equal. _canon() deliberately
    # widens within a numeric class (int32->int64, float32->float64) because
    # the driver tolerates that; it must NOT paper over a cross-class split.
    for c in sorted(spark_pdf.columns):
        s_kind = _dtype_class(spark_pdf[c])
        o_kind = _dtype_class(oracle_pdf[c])
        if s_kind != o_kind and "null" not in (s_kind, o_kind):
            problems.append(
                f"{name}: column {c!r} dtype-class mismatch: spark={s_kind} "
                f"({spark_pdf[c].dtype}) vs oracle={o_kind} ({oracle_pdf[c].dtype}) "
                "— the driver hash is dtype-sensitive; cast the oracle "
                "(::BIGINT / ::DOUBLE) or the Spark column to agree"
            )
    if problems:
        return problems
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            eq = (av.values == bv.values) | (np.isnan(av.values) & np.isnan(bv.values))
        else:
            eq = (av.values == bv.values) | (pd.isna(av).values & pd.isna(bv).values)
        if not bool(np.all(eq)):
            bad = int(np.sum(~eq))
            i = int(np.argmax(~eq))
            problems.append(
                f"{name}: column {c!r} differs in {bad}/{len(a)} rows; "
                f"first diff row {i}: spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}"
            )
    return problems
