"""Business/marketing analytics: association rules, RFM segmentation,
multi-touch attribution.

Training-data-pipeline extension (the reference's analytics surface is
ClickHouse SQL over OHLCV tables — ``crypto_data_pipeline_clickhouse.py:
326-333`` — with none of these shapes): market-basket rules and attribution
are the canonical "wide fact, bounded fan-out" OLAP workloads, and their
Spark plans exercise exactly the scale patterns the rest of the repo pins —
per-key bounded self-joins, distinct-value-domain windows instead of global
sorts, and broadcastable one-row anchors.

Scale notes (100 TB lens):
- ``assoc_rules_copurchase``: pair generation fans out only within one
  order (carts are bounded), the rule-statistics joins key on single items
  (item-count frame is ~|parts|, shuffles as an equi-join, AQE broadcasts
  it at test scale), and the 1-row order-count anchor is an explicit
  ``F.broadcast``. No global sort anywhere.
- ``rfm_customer_segments``: quintile scores come from cumulative counts
  over the DISTINCT VALUE DOMAIN of each measure (recency days, order
  counts, coarsened monetary buckets), the same trick as
  ``equi_depth_histogram`` — the global-order window runs over ~thousands
  of distinct values, never over the customer table itself; scores join
  back as tiny broadcastable maps. ``ntile`` over all customers (the
  textbook formulation) would be a single-task sort at scale and splits
  tied values nondeterministically; whole-value-group bucketing does
  neither.
- attribution: last-touch is one window pass (partitioned by user — no
  global sort); linear credit is a per-user range join whose fan-out is
  bounded by touches-per-user within the lookback window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.operators import graph
from binance_etl_clickhouse_spark.queries.registry import register
from binance_etl_clickhouse_spark.tables import load_table as _t

# --------------------------------------------------------------------------
# Association rules over per-order part baskets
# --------------------------------------------------------------------------
_MIN_PAIR = 3  # min co-occurrence count for a rule to surface


@register(
    "assoc_rules_copurchase",
    f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    n AS (SELECT count(DISTINCT o)::DOUBLE AS n_orders FROM items),
    item_cnt AS (SELECT p, count(*)::BIGINT AS cnt FROM items GROUP BY p),
    pairs AS (
      SELECT a.p AS src, b.p AS dst, count(*)::BIGINT AS w
      FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p
      HAVING count(*) >= {_MIN_PAIR}
    ),
    rules AS (
      SELECT src AS antecedent, dst AS consequent, w FROM pairs
      UNION ALL
      SELECT dst AS antecedent, src AS consequent, w FROM pairs
    )
    SELECT r.antecedent, r.consequent, r.w AS pair_cnt,
           round(r.w / n.n_orders, 6) AS support,
           round(r.w::DOUBLE / ca.cnt, 6) AS confidence,
           round(r.w * n.n_orders / (ca.cnt * cb.cnt), 6) AS lift
    FROM rules r
    JOIN item_cnt ca ON ca.p = r.antecedent
    JOIN item_cnt cb ON cb.p = r.consequent
    CROSS JOIN n
    """,
    survey_ref="market-basket association rules (support / confidence / lift)",
)
def assoc_rules_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    n = items.agg(F.countDistinct("o").cast("double").alias("n_orders"))
    item_cnt = items.groupBy("p").agg(F.count("*").cast("long").alias("cnt"))
    pairs = graph.copurchase_edges(li).filter(F.col("w") >= _MIN_PAIR)
    rules = pairs.select(
        F.col("src").alias("antecedent"), F.col("dst").alias("consequent"), "w"
    ).unionAll(
        pairs.select(
            F.col("dst").alias("antecedent"), F.col("src").alias("consequent"), "w"
        )
    )
    ca = item_cnt.select(F.col("p").alias("antecedent"), F.col("cnt").alias("a_cnt"))
    cb = item_cnt.select(F.col("p").alias("consequent"), F.col("cnt").alias("b_cnt"))
    return (
        rules.join(ca, "antecedent")
        .join(cb, "consequent")
        .crossJoin(F.broadcast(n))
        .select(
            "antecedent",
            "consequent",
            F.col("w").alias("pair_cnt"),
            F.round(F.col("w") / F.col("n_orders"), 6).alias("support"),
            F.round(F.col("w") / F.col("a_cnt"), 6).alias("confidence"),
            F.round(
                F.col("w") * F.col("n_orders") / (F.col("a_cnt") * F.col("b_cnt")), 6
            ).alias("lift"),
        )
    )


# --------------------------------------------------------------------------
# RFM segmentation with value-domain quintiles
# --------------------------------------------------------------------------
_RFM_Q = 5


def _quintile_map(vals: DataFrame, col: str) -> DataFrame:
    """(value -> bucket 0..4) from cumulative counts over the distinct value
    domain, whole value-groups never split (deterministic across engines)."""
    vc = vals.groupBy(col).agg(F.count("*").alias("cnt"))
    prev = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
    ranked = vc.select(
        col,
        F.coalesce(F.sum("cnt").over(prev), F.lit(0)).alias("cum_prev"),
        F.sum("cnt").over(Window.partitionBy()).alias("total"),
    )
    return ranked.select(
        col,
        F.floor(F.col("cum_prev") * _RFM_Q / F.col("total"))
        .cast("int")
        .alias("bucket"),
    )


def _rfm_quintile_cte(src: str, col: str) -> str:
    return f"""(
      SELECT {col},
             CAST(floor(coalesce(sum(cnt) OVER (
               ORDER BY {col} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) * {_RFM_Q} / (sum(cnt) OVER ())) AS INT) AS bucket
      FROM (SELECT {col}, count(*) AS cnt FROM {src} GROUP BY 1)
    )"""


@register(
    "rfm_customer_segments",
    f"""
    WITH anchor AS (SELECT max(o_orderdate) AS mx FROM orders),
    rfm AS (
      SELECT o_custkey AS c_custkey,
             datediff('day', max(o_orderdate), any_value(anchor.mx)) AS recency_days,
             count(*)::BIGINT AS frequency,
             round(sum(o_totalprice), 2) AS monetary,
             CAST(floor(sum(o_totalprice) / 100) AS BIGINT) AS mbucket
      FROM orders CROSS JOIN anchor
      GROUP BY o_custkey
    ),
    rq AS {_rfm_quintile_cte("rfm", "recency_days")},
    fq AS {_rfm_quintile_cte("rfm", "frequency")},
    mq AS {_rfm_quintile_cte("rfm", "mbucket")}
    SELECT rfm.c_custkey, rfm.recency_days, rfm.frequency, rfm.monetary,
           ({_RFM_Q} - rq.bucket) AS r_score,
           (fq.bucket + 1) AS f_score,
           (mq.bucket + 1) AS m_score,
           CAST({_RFM_Q} - rq.bucket AS VARCHAR) || CAST(fq.bucket + 1 AS VARCHAR)
             || CAST(mq.bucket + 1 AS VARCHAR) AS segment
    FROM rfm
    JOIN rq ON rq.recency_days = rfm.recency_days
    JOIN fq ON fq.frequency = rfm.frequency
    JOIN mq ON mq.mbucket = rfm.mbucket
    """,
    survey_ref="RFM segmentation (value-domain quintiles, no global customer sort)",
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate").alias("mx"))
    rfm = (
        orders.crossJoin(F.broadcast(anchor))
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.datediff(F.any_value("mx"), F.max("o_orderdate")).alias("recency_days"),
            F.count("*").cast("long").alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
            F.floor(F.sum("o_totalprice") / 100).cast("long").alias("mbucket"),
        )
    )
    rq = _quintile_map(rfm, "recency_days").withColumnRenamed("bucket", "rb")
    fq = _quintile_map(rfm, "frequency").withColumnRenamed("bucket", "fb")
    mq = _quintile_map(rfm, "mbucket").withColumnRenamed("bucket", "mb")
    r_score = (F.lit(_RFM_Q) - F.col("rb")).cast("int")
    f_score = (F.col("fb") + 1).cast("int")
    m_score = (F.col("mb") + 1).cast("int")
    return (
        rfm.join(F.broadcast(rq), "recency_days")
        .join(F.broadcast(fq), "frequency")
        .join(F.broadcast(mq), "mbucket")
        .select(
            "c_custkey",
            "recency_days",
            "frequency",
            "monetary",
            r_score.alias("r_score"),
            f_score.alias("f_score"),
            m_score.alias("m_score"),
            F.concat(
                r_score.cast("string"), f_score.cast("string"), m_score.cast("string")
            ).alias("segment"),
        )
    )


# --------------------------------------------------------------------------
# Multi-touch attribution over the event stream
# --------------------------------------------------------------------------
_TOUCH_TYPES = ("click", "view")
_LOOKBACK_DAYS = 7


@register(
    "attribution_last_touch",
    f"""
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN event_type IN {_TOUCH_TYPES} THEN ts END AS touch_ts,
             CASE WHEN event_type IN {_TOUCH_TYPES} THEN event_type END AS touch_type
      FROM events
    ),
    lasted AS (
      SELECT user_id, ts, event_type, value,
             last_value(touch_ts IGNORE NULLS) OVER w AS lt_ts,
             last_value(touch_type IGNORE NULLS) OVER w AS lt_type
      FROM tagged
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT CASE WHEN lt_ts IS NOT NULL
                 AND lt_ts >= ts - INTERVAL {_LOOKBACK_DAYS} DAY
                THEN lt_type ELSE 'direct' END AS channel,
           count(*)::BIGINT AS n_purchases,
           round(sum(value), 2) AS attributed_value
    FROM lasted
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
    survey_ref="last-touch attribution (one user-partitioned window pass)",
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    is_touch = F.col("event_type").isin(*_TOUCH_TYPES)
    tagged = ev.select(
        "user_id",
        "ts",
        "event_type",
        "value",
        F.when(is_touch, F.col("ts")).alias("touch_ts"),
        F.when(is_touch, F.col("event_type")).alias("touch_type"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lasted = tagged.select(
        "user_id",
        "ts",
        "event_type",
        "value",
        F.last("touch_ts", ignorenulls=True).over(w).alias("lt_ts"),
        F.last("touch_type", ignorenulls=True).over(w).alias("lt_type"),
    )
    in_window = F.col("lt_ts").isNotNull() & (
        F.col("lt_ts") >= F.col("ts") - F.expr(f"INTERVAL {_LOOKBACK_DAYS} DAY")
    )
    return (
        lasted.filter(F.col("event_type") == "purchase")
        .groupBy(F.when(in_window, F.col("lt_type")).otherwise("direct").alias("channel"))
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("attributed_value"),
        )
    )


@register(
    "attribution_linear",
    f"""
    WITH purchases AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT user_id, ts, event_type FROM events
      WHERE event_type IN {_TOUCH_TYPES}
    ),
    joined AS (
      SELECT p.event_id, p.value, t.event_type AS touch_type
      FROM purchases p
      LEFT JOIN touches t
        ON t.user_id = p.user_id
       AND t.ts < p.ts
       AND t.ts >= p.ts - INTERVAL {_LOOKBACK_DAYS} DAY
    ),
    credited AS (
      SELECT coalesce(touch_type, 'direct') AS channel,
             value / count(*) OVER (PARTITION BY event_id) AS credit
      FROM joined
    )
    SELECT channel, count(*)::BIGINT AS n_credits,
           round(sum(credit), 2) AS attributed_value
    FROM credited
    GROUP BY channel
    """,
    survey_ref="linear multi-touch attribution (bounded per-user range join)",
)
def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    touches = ev.filter(F.col("event_type").isin(*_TOUCH_TYPES)).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("touch_type"),
    )
    joined = purchases.join(
        touches,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("t_ts") < F.col("ts"))
        & (F.col("t_ts") >= F.col("ts") - F.expr(f"INTERVAL {_LOOKBACK_DAYS} DAY")),
        "left",
    )
    per_purchase = Window.partitionBy("event_id")
    credited = joined.select(
        F.coalesce(F.col("touch_type"), F.lit("direct")).alias("channel"),
        (F.col("value") / F.count("*").over(per_purchase)).alias("credit"),
    )
    return credited.groupBy("channel").agg(
        F.count("*").cast("long").alias("n_credits"),
        F.round(F.sum("credit"), 2).alias("attributed_value"),
    )
