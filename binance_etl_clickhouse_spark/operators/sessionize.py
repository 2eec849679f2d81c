"""Sessionization: split per-key event streams on inactivity gaps.

Classic composition (no UDF, two windows over ONE shuffle on the key):
lag(ts) -> gap > threshold flag -> running sum of flags = session index.
The streaming twin is ``session_window(ts, gap)`` (streaming/jobs.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """Add a per-key ``session_id`` (0-based) column."""
    w = Window.partitionBy(key).orderBy(ts_col, order_tiebreak)
    gap_s = F.expr(f"INTERVAL {gap}")
    new_sess = (
        F.when(F.col(ts_col) > F.lag(ts_col).over(w) + gap_s, 1)
        .otherwise(0)
    )
    run = Window.partitionBy(key).orderBy(ts_col, order_tiebreak).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("__new", new_sess).withColumn(
        "session_id", F.sum("__new").over(run)
    ).drop("__new")


def session_stats(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-session aggregates: span, event count, value sum."""
    s = sessionize(df, key=key, ts_col=ts_col, gap=gap)
    return s.groupBy(key, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )
