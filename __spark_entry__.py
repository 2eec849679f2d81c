"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The actual implementations live in ``binance_etl_clickhouse_spark``; this
module only adapts the registry to the driver's entry-point shape.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from binance_etl_clickhouse_spark.queries import oracle_sql_map, queries_map  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Composition: scan -> keep-last dedup per (user_id, event_type) (the
    ReplacingMergeTree semantic, SURVEY.md A3/A4) -> monthly event-time
    rollup (F7/T5) -> sort. Exercises scan, window, agg, and sort in one
    plan.
    """
    from pyspark.sql import functions as F

    from binance_etl_clickhouse_spark.functions.scalars import month_bucket
    from binance_etl_clickhouse_spark.operators.dedup import keep_last
    from binance_etl_clickhouse_spark.tables import load_table

    ev = load_table(spark, SMOKE_SF_DIR, "events")
    latest = keep_last(ev, ["user_id", "event_type"], ["ts", "event_id"])
    return (
        latest.groupBy(month_bucket("ts").alias("month"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_latest"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("month", "event_type")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    The driver runs its whole verification window sequentially in one
    plain session, so each builder is wrapped to clear the SQL cache
    first (stale CacheManager entries from earlier queries have NPE'd
    under memory pressure). Library users importing the registry
    directly get the UNWRAPPED builders — their session caches survive.
    """
    return queries_map(cache_hygiene=True)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable SQL twin for each SQL-expressible query."""
    return oracle_sql_map()
