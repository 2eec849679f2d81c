"""Keep-last-per-key dedup — the ReplacingMergeTree emulation.

The single most load-bearing semantic in the reference (SURVEY.md A3/A4):

- in-flight: ``drop_duplicates(subset=['timestamp'], keep='last')`` after a
  sort, so the *latest-fetched* page wins for overlapping pagination
  (crypto_data_pipeline_clickhouse.py:293);
- at rest: every serving table is a ReplacingMergeTree whose background
  merges keep the newest row per ``ORDER BY`` key (:541, :567, :591, :603).

Spark tables don't dedup on write, so this is expressed as a window over the
key ordered by an explicit arrival-order column (``dropDuplicates`` alone
gives *arbitrary* winners — wrong semantic). At scale this is one shuffle on
the key; when the serving table is already bucketed/sorted by the key the
window runs without re-shuffling.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def keep_last(
    df: DataFrame,
    keys: Sequence[str],
    order_by: str | Sequence[str],
    *,
    drop_order_col: bool = False,
) -> DataFrame:
    """Keep exactly one row per ``keys``: the one with the greatest
    ``order_by`` value(s) (arrival order / version — ties broken arbitrarily
    but deterministically within a run by partition order).

    ≙ ``row_number() OVER (PARTITION BY keys ORDER BY order_by DESC) = 1``.
    """
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])
    out = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if drop_order_col:
        out = out.drop(*order_cols)
    return out


def keep_last_sql(
    table: str, keys: Sequence[str], order_by: str | Sequence[str], cols: Sequence[str]
) -> str:
    """ANSI-SQL twin of :func:`keep_last` (DuckDB-runnable oracle)."""
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    pk = ", ".join(keys)
    ob = ", ".join(f"{c} DESC" for c in order_cols)
    proj = ", ".join(cols)
    return (
        f"SELECT {proj} FROM ("
        f"SELECT *, row_number() OVER (PARTITION BY {pk} ORDER BY {ob}) AS __rn "
        f"FROM {table}) WHERE __rn = 1"
    )
