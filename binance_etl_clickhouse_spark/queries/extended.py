"""Extended engine surface: pivot/unpivot, Pandas-UDF (Arrow) path, approx
aggregates, correlated-subquery shapes — generic capabilities the reference
delegates to its serving engine (SURVEY.md §2.5/§2.12), exposed here as
first-class queries.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.queries.registry import register
from binance_etl_clickhouse_spark.tables import load_table as _t

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


# ---------------------------------------------------------------------------
# Pivot: one column per event type. Oracle uses portable conditional
# aggregation producing identical column names.
# ---------------------------------------------------------------------------
@register(
    "pivot_event_counts",
    """
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'error')    AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events GROUP BY user_id
    """,
    survey_ref="§2.5 pivot",
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pv = ev.groupBy("user_id").pivot("event_type", EVENT_TYPES).agg(F.count(F.lit(1)))
    # pivot leaves null where a (user, type) never occurred; count semantics = 0
    return pv.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES]
    )


# ---------------------------------------------------------------------------
# Unpivot (melt): wide lineitem measures -> (measure, val) rows.
# ---------------------------------------------------------------------------
@register(
    "unpivot_lineitem_measures",
    """
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    """,
    survey_ref="§2.5 unpivot/stack",
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'quantity', l_quantity, 'extendedprice', l_extendedprice, "
            "'discount', l_discount) AS (measure, val)"
        ),
    )


# ---------------------------------------------------------------------------
# Pandas-UDF surface (§2.12): per-user z-score via applyInPandas (grouped
# map, Arrow-batched). Oracle: identical math with window functions
# (population stddev ≙ pandas ddof=0).
# ---------------------------------------------------------------------------
@register(
    "pandas_zscore_per_user",
    """
    SELECT event_id,
           round((value - avg(value) OVER w) / nullif(stddev_pop(value) OVER w, 0), 4)
             AS zscore
    FROM events
    WINDOW w AS (PARTITION BY user_id)
    """,
    survey_ref="§2.12 pandas UDF / applyInPandas",
)
def pandas_zscore_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["value"].std(ddof=0)
        z = (pdf["value"] - pdf["value"].mean()) / std if std > 0 else pd.Series(
            [None] * len(pdf), dtype="float64"
        )
        return pd.DataFrame({"event_id": pdf["event_id"], "zscore": z.round(4)})

    return ev.groupBy("user_id").applyInPandas(zscore, schema="event_id long, zscore double")


# ---------------------------------------------------------------------------
# Approximate aggregates (HLL / quantile sketches) — engine-specific
# estimators, so rows-only check; the exact twins are covered elsewhere.
# ---------------------------------------------------------------------------
@register(
    "approx_aggregates",
    None,
    survey_ref="§2.5 approx_count_distinct / percentile_approx sketches",
)
def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # one scalar column per quantile (NOT one array column: array cells are
    # unhashable in pandas and crash order-insensitive canonicalization —
    # and scalar columns are what a consumer joins/filters on anyway)
    return li.agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("p50_price"),
        F.percentile_approx("l_extendedprice", 0.95).alias("p95_price"),
        F.percentile_approx("l_extendedprice", 0.99).alias("p99_price"),
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery (decorrelated by Catalyst into a join):
# customers whose account balance exceeds their nation's average.
# ---------------------------------------------------------------------------
@register(
    "correlated_subquery_above_avg",
    """
    SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal FROM customer c
    WHERE c_acctbal > (
      SELECT avg(c2.c_acctbal) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey
    )
    """,
    survey_ref="§4 subquery decorrelation (Catalyst built-in)",
)
def correlated_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal FROM customer c
        WHERE c_acctbal > (
          SELECT avg(c2.c_acctbal) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey
        )
        """
    )


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters per bucket, driver-checkable edition: the event
# domain (|event_type| <= 8 = k) is smaller than the counter budget, so the
# one-pass MG summary provably never decrements and its lower bounds ARE
# the exact counts — giving the applyInPandas streaming pass a plain SQL
# oracle. The general (k < domain) behavior — retention, bounds, merge —
# is pinned in tests/test_sketches.py.
# ---------------------------------------------------------------------------
@register(
    "heavy_hitters_event_types",
    """
    SELECT CAST(user_id % 4 AS VARCHAR) AS bucket,
           event_type AS item,
           count(*)::BIGINT AS lower_count,
           0::BIGINT AS decremented,
           (sum(count(*)) OVER (PARTITION BY user_id % 4))::BIGINT AS n_rows
    FROM events
    GROUP BY user_id % 4, event_type
    """,
    survey_ref="sketches: Misra-Gries heavy hitters (exact when k covers domain)",
)
def heavy_hitters_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_clickhouse_spark.operators.sketches import misra_gries_summaries

    ev = _t(spark, sf_dir, "events")
    return misra_gries_summaries(
        ev.withColumn("bucket", (F.col("user_id") % 4).cast("string")),
        ["bucket"],
        "event_type",
        k=8,
    )
