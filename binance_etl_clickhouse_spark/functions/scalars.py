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
