"""Relational operator queries — SURVEY.md §2 core surface on testdata tables.

Each query pins one (or a small family of) operator(s) from the inventory,
mapped onto the driver's TPC-H-ish tables. Naming/rounding conventions for
oracle hash-parity:

- every computed column is aliased identically on both sides;
- double *aggregates* are rounded (2 dp for money-scale sums, 4-6 dp for
  rates/averages) because Spark and DuckDB may accumulate floating point in
  different orders; per-row arithmetic is left exact (IEEE ops on identical
  inputs are bitwise equal);
- integer sums are cast to BIGINT on the DuckDB side (DuckDB widens to
  HUGEINT, Spark keeps long).

Scale notes are in each docstring: what the plan does at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.functions.scalars import (
    epoch_ms_to_ts,
    month_bucket,
    to_double_or_zero,
    ts_to_epoch_ms,
)
from binance_etl_clickhouse_spark.operators.dedup import keep_last
from binance_etl_clickhouse_spark.queries.registry import register
from binance_etl_clickhouse_spark.tables import load_table as _t


# ---------------------------------------------------------------------------
# Aggregation surface (SURVEY §2.5) — TPC-H Q1 shape: scan → filter →
# groupBy(2 keys) → 8 aggregates → sort. At scale: partial (map-side) agg +
# single shuffle on 6 distinct groups; filter and 7-column pruning reach the
# parquet scan.
# ---------------------------------------------------------------------------
@register(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 6)                                        AS avg_qty,
           round(avg(l_extendedprice), 6)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey_ref="A2, §2.5 groupBy-agg",
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Projections + literal columns (P1/P2) ≙ the reference's 15-col select +
# exchange/type lit columns (crypto_data_pipeline_clickhouse.py:379-387).
# Column pruning reaches the scan: only 4 of 11 lineitem columns are read.
# ---------------------------------------------------------------------------
@register(
    "project_literals",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           'binance' AS exchange, 'SPOT' AS type
    FROM lineitem
    """,
    survey_ref="P1, P2",
)
def project_literals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        F.lit("binance").alias("exchange"),
        F.lit("SPOT").alias("type"),
    )


# ---------------------------------------------------------------------------
# Predicates (P3 equality, P4 range-on-time, P5 IN-list, P6 flag) — all
# pushed to the parquet scan by Catalyst (PushedFilters in .explain).
# ---------------------------------------------------------------------------
@register(
    "filter_eq_project",
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'O'",
    survey_ref="P3",
)
def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "filter_range_ts",
    """
    SELECT l_orderkey, l_linenumber, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-06-01' AND l_shipdate < TIMESTAMP '1997-09-01'
    """,
    survey_ref="P4 (delivery_date >= cutoff)",
)
def filter_range_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    sd = F.col("l_shipdate")
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (sd >= F.lit("1997-06-01").cast("timestamp"))
            & (sd < F.lit("1997-09-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_linenumber", "l_shipdate")
    )


@register(
    "filter_in_list",
    """
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    """,
    survey_ref="P5 (quote_asset IN ('USDT','USDC'))",
)
def filter_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@register(
    "distinct_where_flag",
    "SELECT DISTINCT o_orderpriority FROM orders WHERE o_orderstatus = 'F'",
    survey_ref="P6 + A1 (SELECT DISTINCT base_asset WHERE is_margin_trading_allowed=1)",
)
def distinct_where_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderpriority")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Anti-join vs a "completed" set (P7/J1) ≙ the progress-checkpoint skip
# (crypto_data_pipeline_clickhouse.py:339). The completed side is small →
# Catalyst picks BroadcastHashJoin(LeftAnti); no shuffle of the fact side.
# ---------------------------------------------------------------------------
@register(
    "anti_join_completed",
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM customer c
      WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING'
    )
    """,
    survey_ref="P7, J1",
)
def anti_join_completed(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    completed = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    return orders.join(F.broadcast(completed), "o_custkey", "left_anti").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@register(
    "semi_join_exists",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    """,
    survey_ref="§2.4 join surface (EXISTS)",
)
def semi_join_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    big = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.join(big, "c_custkey", "left_semi").select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# Dimension→fact broadcast join (J2) ≙ symbols-dimension driving the kline
# fetch, then enrichment. part is tiny vs lineitem → explicit broadcast();
# at 100 TB the fact side streams through without shuffling.
# ---------------------------------------------------------------------------
@register(
    "broadcast_dim_join",
    """
    SELECT p.p_brand, round(sum(l.l_quantity), 2) AS sum_qty,
           round(sum(l.l_extendedprice), 2) AS sum_price, count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    survey_ref="J2",
)
def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Keep-last dedup (A3/A4) — THE ReplacingMergeTree semantic. Key
# (user_id, event_type), arrival order (ts, event_id): newest wins.
# One shuffle on the key; at scale runs partition-local if the table is
# bucketed by the key (storage layer does this).
# ---------------------------------------------------------------------------
@register(
    "keep_last_dedup",
    """
    SELECT user_id, event_type, ts, event_id, value FROM (
      SELECT user_id, event_type, ts, event_id, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS __rn
      FROM events
    ) WHERE __rn = 1
    """,
    survey_ref="A3, A4, J3",
)
def keep_last_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return keep_last(ev, ["user_id", "event_type"], ["ts", "event_id"]).select(
        "user_id", "event_type", "ts", "event_id", "value"
    )


# ---------------------------------------------------------------------------
# Max-watermark per key (A5/T1) — resume offsets: next fetch starts at
# max(ts)+1 per symbol. Pure partial-aggregatable max → cheap at any scale.
# ---------------------------------------------------------------------------
@register(
    "max_watermark",
    "SELECT user_id, max(ts) AS last_ts, count(*) AS n_events FROM events GROUP BY user_id",
    survey_ref="A5, T1",
)
def max_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.max("ts").alias("last_ts"), F.count(F.lit(1)).alias("n_events"))
    )


# ---------------------------------------------------------------------------
# Window functions (§2.6): lag-delta (returns/diffs) and running sum.
# Ordering key (ts, event_id) is unique per partition → deterministic.
# ---------------------------------------------------------------------------
@register(
    "window_lag_delta",
    """
    SELECT event_id,
           value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
    FROM events
    """,
    survey_ref="§2.6 lag/lead",
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _t(spark, sf_dir, "events")
        .withColumn("delta", F.col("value") - F.lag("value").over(w))
        .select("event_id", "delta")
    )


@register(
    "window_running_sum",
    """
    SELECT event_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
             AS running_value
    FROM events
    """,
    survey_ref="§2.6 frames",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _t(spark, sf_dir, "events")
        .withColumn("running_value", F.round(F.sum("value").over(w), 4))
        .select("event_id", "running_value")
    )


# ---------------------------------------------------------------------------
# Top-K per group (§2.7) — rank window + filter; at scale Spark pushes a
# per-partition partial top-K before the shuffle when K is small (AQE).
# ---------------------------------------------------------------------------
@register(
    "topk_per_group",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    survey_ref="§2.7 top-k",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "orderby_limit_topn",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    survey_ref="O1, O3, O4",
)
def orderby_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Global sort + limit → Spark runs TakeOrderedAndProject (no full sort).
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Set operations (§2.8): page-union with overlap + dedup ≙ pd.concat of
# overlapping pagination pages (U1); intersect as generic capability.
# ---------------------------------------------------------------------------
@register(
    "union_pages_distinct",
    """
    SELECT DISTINCT event_id, ts, value FROM (
      SELECT event_id, ts, value FROM events WHERE ts < TIMESTAMP '2024-01-20'
      UNION ALL
      SELECT event_id, ts, value FROM events WHERE ts >= TIMESTAMP '2024-01-10'
    )
    """,
    survey_ref="U1, U2",
)
def union_pages_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "value")
    page1 = ev.filter(F.col("ts") < F.lit("2024-01-20").cast("timestamp"))
    page2 = ev.filter(F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
    return page1.unionByName(page2).distinct()


@register(
    "intersect_users",
    """
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'signup'
    """,
    survey_ref="§2.8 intersect",
)
def intersect_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "signup").select("user_id")
    return a.intersect(b)


# ---------------------------------------------------------------------------
# Scalar functions: epoch-ms round trip (F1/F2), month bucket (F7),
# least-capping (F9) ≙ min(end_time, delivery_date).
# ---------------------------------------------------------------------------
@register(
    "scalar_time_roundtrip",
    """
    SELECT event_id,
           epoch_ms(ts)                                   AS ts_ms,
           make_timestamp(epoch_ms(ts) * 1000)            AS ts_from_ms,
           CAST(strftime(ts, '%Y%m') AS INTEGER)          AS month,
           least(ts, TIMESTAMP '2024-01-15')              AS capped_ts
    FROM events
    """,
    survey_ref="F1, F2, F7, F8, F9",
)
def scalar_time_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        ts_to_epoch_ms("ts").alias("ts_ms"),
        epoch_ms_to_ts(ts_to_epoch_ms("ts")).alias("ts_from_ms"),
        month_bucket("ts").alias("month"),
        F.least(F.col("ts"), F.lit("2024-01-15").cast("timestamp")).alias("capped_ts"),
    )


@register(
    "month_bucket_agg",
    """
    SELECT CAST(strftime(l_shipdate, '%Y%m') AS INTEGER) AS month,
           round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n_items
    FROM lineitem GROUP BY 1
    """,
    survey_ref="F7 + monthly partitioning semantics",
)
def month_bucket_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy(month_bucket("l_shipdate").alias("month"))
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Tolerant numeric coercion with fill-0 (F4) — pd.to_numeric(coerce).fillna(0).
# A third of the rows get an unparseable string; they must come back 0.0,
# not NULL.
# ---------------------------------------------------------------------------
@register(
    "coerce_fill_zero",
    """
    SELECT event_id,
           coalesce(TRY_CAST(
             CASE WHEN event_id % 3 = 0 THEN 'n/a' ELSE CAST(value AS VARCHAR) END
             AS DOUBLE), 0.0) AS value_or_zero
    FROM events
    """,
    survey_ref="F3, F4, F5",
)
def coerce_fill_zero(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    raw = F.when(F.col("event_id") % 3 == 0, F.lit("n/a")).otherwise(
        F.col("value").cast("string")
    )
    return ev.select(
        "event_id", to_double_or_zero(raw).alias("value_or_zero")
    )


# ---------------------------------------------------------------------------
# Regex + JSON field extraction (F11/F12) over the events.props JSON string.
# ---------------------------------------------------------------------------
@register(
    "regexp_json_extract",
    r"""
    SELECT event_id,
           CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER) AS k_regex,
           CAST(json_extract_string(props, '$.k') AS INTEGER)      AS k_json
    FROM events
    """,
    survey_ref="F11, F12",
)
def regexp_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_extract(F.col("props"), r'"k": (\d+)', 1).cast("int").alias("k_regex"),
        F.get_json_object(F.col("props"), "$.k").cast("int").alias("k_json"),
    )


# ---------------------------------------------------------------------------
# VARIANT semi-structured path (Spark 4): parse the JSON string ONCE into
# the binary VARIANT encoding, then typed variant_get extraction — the
# modern replacement for per-access get_json_object re-parsing (each
# get_json_object call re-parses the string; variant parses once and
# field access is a binary offset lookup). Aggregates per event_type so
# the oracle compares the extraction end-to-end without a VARIANT column
# in the output schema (VARIANT has no cross-engine wire twin).
# ---------------------------------------------------------------------------
@register(
    "variant_extract_agg",
    """
    SELECT event_type,
           sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
           count(*)::BIGINT AS n
    FROM events GROUP BY event_type
    """,
    survey_ref="F12 modern surface: VARIANT parse-once + typed variant_get",
)
def variant_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return (
        ev.select("event_type", F.try_variant_get(v, "$.k", "bigint").alias("k"))
        .groupBy("event_type")
        .agg(F.sum("k").cast("long").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Array → string (F6) ≙ ','.join(underlyingSubType); split/slice/size on the
# documents text column.
# ---------------------------------------------------------------------------
@register(
    "array_join_slice",
    """
    SELECT doc_id,
           array_to_string(list_slice(string_split(text, ' '), 1, 3), ',') AS first3,
           len(string_split(text, ' ')) AS n_words
    FROM documents
    """,
    survey_ref="F6",
)
def array_join_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.array_join(F.slice(words, 1, 3), ",").alias("first3"),
        # long: DuckDB len() is BIGINT; avoid int32-vs-int64 schema drift
        F.size(words).cast("long").alias("n_words"),
    )


# ---------------------------------------------------------------------------
# Grouping sets (§2.5): rollup + cube — free from Catalyst, exposed as
# engine surface (the reference's engines provide them server-side).
# ---------------------------------------------------------------------------
@register(
    "rollup_orders",
    """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    survey_ref="§2.5 rollup",
)
def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "cube_events",
    """
    SELECT event_type, user_id % 10 AS user_bucket,
           count(*) AS n, round(sum(value), 2) AS total_value
    FROM events GROUP BY CUBE (event_type, user_id % 10)
    """,
    survey_ref="§2.5 cube",
)
def cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "user_bucket", F.col("user_id") % 10
    )
    return ev.cube("event_type", "user_bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Tumbling-window resample (T5): coarser bars from fine events via
# event-time window() — the kline-resampling extension flagged in SURVEY §7.
# ---------------------------------------------------------------------------
@register(
    "tumbling_resample_1h",
    """
    SELECT date_trunc('hour', ts) AS bucket_start, event_type,
           count(*) AS n, round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
    survey_ref="T5",
)
def tumbling_resample_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"), "event_type", "n", "total_value"
        )
    )


@register(
    "count_rows_per_type",
    "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
    survey_ref="A2",
)
def count_rows_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# Hopping (sliding) event-time window: 1h width, 15min slide — every event
# lands in width/slide = 4 overlapping windows. Spark's window() generates
# the replication JVM-side (no explode written by hand); the oracle derives
# the same 4 epoch-aligned starts per event arithmetically. The streaming
# twin is the same groupBy on readStream (T5's tumbling case generalized).
# ---------------------------------------------------------------------------
@register(
    "hopping_window_counts",
    """
    WITH hop AS (
      SELECT make_timestamp(((CAST(floor(epoch(ts) / 900) AS BIGINT) - i) * 900)
                            * 1000000) AS window_start,
             event_type, value
      FROM events, unnest(range(0, 4)) AS t(i)
    )
    SELECT window_start,
           window_start + INTERVAL 3600 SECOND AS window_end,
           event_type, count(*) AS n, round(sum(value), 2) AS total_value
    FROM hop GROUP BY 1, 2, 3
    """,
    survey_ref="T5 generalized: hopping window (width 1h, slide 15min)",
)
def hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Fixed-bin histogram (width_bucket semantics with literal bounds, so the
# whole pass is ONE scan + one small agg — no min/max pre-pass). Bin
# assignment is identical integer arithmetic in both engines.
# ---------------------------------------------------------------------------
_HIST_BIN_W = 5000.0


@register(
    "price_histogram_fixed_bins",
    f"""
    SELECT CAST(floor(l_extendedprice / {_HIST_BIN_W}) AS INTEGER) AS bin,
           CAST(floor(l_extendedprice / {_HIST_BIN_W}) AS INTEGER) * {_HIST_BIN_W}
             AS bin_lo,
           count(*) AS n_items,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem GROUP BY 1, 2
    """,
    survey_ref="§2.5 histogram / width_bucket aggregation",
)
def price_histogram_fixed_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    bin_col = F.floor(F.col("l_extendedprice") / F.lit(_HIST_BIN_W)).cast("int")
    return (
        li.groupBy(
            bin_col.alias("bin"),
            (bin_col * F.lit(_HIST_BIN_W)).alias("bin_lo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# Equi-depth histogram: B buckets holding ~equal ROW counts, derived from
# the cumulative frequency of DISTINCT values (whole value-groups never
# split across buckets — deterministic, unlike ntile's tie splitting).
# Scale shape: the heavy lift is the partial-aggregatable groupBy(value);
# the global-order window then runs over |distinct values| rows only
# (l_quantity: ~50), not the table. Identical rank arithmetic both engines.
# ---------------------------------------------------------------------------
_EQD_B = 8


@register(
    "equi_depth_histogram",
    f"""
    WITH vc AS (
      SELECT l_quantity AS val, count(*) AS cnt FROM lineitem GROUP BY 1
    ),
    ranked AS (
      SELECT val, cnt,
             coalesce(sum(cnt) OVER (
               ORDER BY val ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cum_prev,
             sum(cnt) OVER () AS total
      FROM vc
    )
    SELECT CAST(floor(cum_prev * {_EQD_B} / total) AS INT) AS bucket,
           min(val) AS lo, max(val) AS hi,
           CAST(sum(cnt) AS BIGINT) AS n_rows
    FROM ranked GROUP BY 1
    """,
    survey_ref="§2.5 equi-depth histogram (quantile bucketing)",
)
def equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    vc = li.groupBy(F.col("l_quantity").alias("val")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    prev = Window.orderBy("val").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vc.select(
        "val",
        "cnt",
        F.coalesce(F.sum("cnt").over(prev), F.lit(0)).alias("cum_prev"),
        F.sum("cnt").over(Window.partitionBy()).alias("total"),
    )
    bucket = F.floor(F.col("cum_prev") * _EQD_B / F.col("total")).cast("int")
    return ranked.groupBy(bucket.alias("bucket")).agg(
        F.min("val").alias("lo"),
        F.max("val").alias("hi"),
        F.sum("cnt").alias("n_rows"),
    )
