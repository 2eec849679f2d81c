"""Scalar function layer — SURVEY.md §2.9 (F1-F12), all JVM-side built-ins.

Every scalar the reference applies in pandas maps to a codegen'd
``pyspark.sql.functions`` expression; none needs a Python UDF. Reference
sites cited per function.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_ms_to_ts(col: Column | str) -> Column:
    """F1: epoch-milliseconds -> timestamp.

    ≙ ``pd.to_datetime(x, unit='ms')`` (reference
    crypto_data_pipeline_clickhouse.py:372-373, additional_data.py:117).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_millis(c.cast("long"))


def ts_to_epoch_ms(col: Column | str) -> Column:
    """F2: timestamp -> epoch ms ≙ ``int(pd.Timestamp(s).timestamp()*1000)``
    (reference crypto_data_pipeline_clickhouse.py:258-269)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(c)


def to_double_or_zero(col: Column | str) -> Column:
    """F4: tolerant numeric coercion with 0-default, NOT null.

    ≙ ``pd.to_numeric(errors='coerce').fillna(0)`` (additional_data.py:118-119,
    :239). The fillna(0) semantic is load-bearing: unparseable AND missing
    values both become 0.0.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.try_cast("double"), F.lit(0.0))


def month_bucket(col: Column | str) -> Column:
    """F7: calendar-month partition bucket ≙ ClickHouse ``toYYYYMM(ts)``
    (crypto_data_pipeline_clickhouse.py:570). Returns int like 202401."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyyMM").cast("int")


def extract_nested_filter(
    filters_col: Column | str, filter_type: str, field: str
) -> Column:
    """S1: pull one field out of an exchange-info style array<struct> filter
    list ≙ ``next(f for f in filters if f['filterType'] == X)[field]``
    (reference crypto_data_pipeline_clickhouse.py:118-137) as a pure
    expression: filter(array, pred) -> try_element_at(1) -> field. NULL when
    the filter type is absent (the reference's missing-filter case;
    try_element_at because Spark 4's ANSI mode makes element_at throw on
    empty arrays).
    """
    c = F.col(filters_col) if isinstance(filters_col, str) else filters_col
    matched = F.filter(c, lambda f: f["filterType"] == filter_type)
    return F.try_element_at(matched, F.lit(1))[field]
