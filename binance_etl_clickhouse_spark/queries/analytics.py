"""Analytics extension queries (SURVEY.md §7): as-of join, OHLC resampling,
sessionization — the operators the reference's schema exists to serve but
delegates to its serving engine. Oracles use the identical window
constructions so semantics (tie-breaks, gap boundaries) are pinned exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.operators.asof import asof_join
from binance_etl_clickhouse_spark.operators.sessionize import session_stats
from binance_etl_clickhouse_spark.queries.registry import register
from binance_etl_clickhouse_spark.tables import load_table as _t


# ---------------------------------------------------------------------------
# As-of join: each purchase gets the most recent prior-or-equal click value
# of the same user. One shuffle on user_id (union-window construction).
# ---------------------------------------------------------------------------
@register(
    "asof_join_purchase_click",
    """
    WITH l AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ),
    r AS (
      SELECT user_id, ts AS rts, value AS rvalue FROM events WHERE event_type = 'click'
    ),
    merged AS (
      SELECT user_id, ts AS __ts, 1 AS __side, event_id, ts, value,
             NULL::DOUBLE AS rv
      FROM l
      UNION ALL
      SELECT user_id, rts, 0, NULL, NULL, NULL, rvalue FROM r
    ),
    wv AS (
      SELECT *,
             last_value(rv IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY __ts, __side
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS click_value_asof
      FROM merged
    )
    SELECT event_id, user_id, ts, value, click_value_asof FROM wv WHERE __side = 1
    """,
    survey_ref="§2.4/§7 as-of join (klines<->funding alignment shape)",
)
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    return asof_join(left, right, on="ts", by=["user_id"], value_cols=["click_value"])


# ---------------------------------------------------------------------------
# Forward as-of: each purchase gets the EARLIEST same-or-later click value
# of the same user (the "next event" alignment: kline -> next funding
# settlement). Same union-window construction, frame reversed.
# ---------------------------------------------------------------------------
@register(
    "asof_forward_purchase_click",
    """
    WITH l AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ),
    r AS (
      SELECT user_id, ts AS rts, value AS rvalue FROM events WHERE event_type = 'click'
    ),
    merged AS (
      SELECT user_id, ts AS __ts, 0 AS __side, event_id, ts, value,
             NULL::DOUBLE AS rv
      FROM l
      UNION ALL
      SELECT user_id, rts, 1, NULL, NULL, NULL, rvalue FROM r
    ),
    wv AS (
      SELECT *,
             first_value(rv IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY __ts, __side
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
             ) AS click_value_next
      FROM merged
    )
    SELECT event_id, user_id, ts, value, click_value_next FROM wv WHERE __side = 0
    """,
    survey_ref="§2.4/§7 as-of join, forward direction (next-event alignment)",
)
def asof_forward_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value_next")
    )
    return asof_join(
        left, right, on="ts", by=["user_id"],
        value_cols=["click_value_next"], direction="forward", suffix="",
    )


# ---------------------------------------------------------------------------
# Nearest as-of: each purchase gets the click closest in absolute time
# (ties prefer backward — pandas merge_asof semantics). The oracle mirrors
# the double-window construction and carries (rts, rvalue) as ONE struct
# per side so a NULL payload can never mix rows (same whole-row rule as
# the engine's struct carry).
# ---------------------------------------------------------------------------
@register(
    "asof_nearest_purchase_click",
    """
    WITH l AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ),
    r AS (
      SELECT user_id, ts AS rts, value AS rvalue FROM events WHERE event_type = 'click'
    ),
    merged AS (
      SELECT user_id, ts AS __ts, 1 AS ord_b, 0 AS ord_f, event_id, ts, value,
             NULL AS rrow
      FROM l
      UNION ALL
      SELECT user_id, rts, 0, 1, NULL, NULL, NULL, {'t': rts, 'v': rvalue} FROM r
    ),
    wv AS (
      SELECT *,
             last_value(rrow IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY __ts, ord_b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS vb,
             first_value(rrow IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY __ts, ord_f
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
             ) AS vf
      FROM merged
    ),
    pick AS (
      SELECT *,
             CASE WHEN vb IS NULL THEN vf
                  WHEN vf IS NULL THEN vb
                  WHEN (epoch(ts) - epoch((vb).t)) <= (epoch((vf).t) - epoch(ts))
                    THEN vb
                  ELSE vf
             END AS vn
      FROM wv WHERE event_id IS NOT NULL
    )
    SELECT event_id, user_id, ts, value, (vn).v AS click_value_near FROM pick
    """,
    survey_ref="§2.4/§7 as-of join, nearest direction (pandas merge_asof parity)",
)
def asof_nearest_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value_near")
    )
    return asof_join(
        left, right, on="ts", by=["user_id"],
        value_cols=["click_value_near"], direction="nearest", suffix="",
    )


# ---------------------------------------------------------------------------
# OHLC resample of the per-user value series into hourly bars with explicit
# row_number endpoints (deterministic tie-break (ts, event_id) in BOTH
# engines; DuckDB's arg_min can't take composite keys).
# ---------------------------------------------------------------------------
@register(
    "resample_ohlc_hourly",
    """
    WITH b AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket_start, ts, event_id, value,
             row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT user_id, bucket_start,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high, min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           round(sum(value), 4) AS volume, count(*) AS n_events
    FROM b GROUP BY user_id, bucket_start
    """,
    survey_ref="T5/§7 OHLC bar resampling",
)
def resample_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bucket = F.date_trunc("hour", F.col("ts"))
    wa = Window.partitionBy("user_id", bucket).orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id", bucket).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    b = ev.select(
        "user_id",
        bucket.alias("bucket_start"),
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return b.groupBy("user_id", "bucket_start").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.round(F.sum("value"), 4).alias("volume"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Sessionization: 30-minute inactivity gap, per-session stats.
# ---------------------------------------------------------------------------
@register(
    "sessionization_stats",
    """
    WITH g AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                           + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ),
    s AS (
      SELECT user_id, ts, value,
             CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
      FROM g
    )
    SELECT user_id, session_id,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events, round(sum(value), 4) AS total_value
    FROM s GROUP BY user_id, session_id
    """,
    survey_ref="§7 sessionization (lag + gap cumsum)",
)
def sessionization_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_stats(_t(spark, sf_dir, "events"), gap="30 minutes")


# ---------------------------------------------------------------------------
# Range join: overlapping price bands x orders, via the bin-bucketed
# construction (operators/rangejoin.py) — an equi-join Catalyst can shuffle,
# never a BroadcastNestedLoopJoin. Each order lands in exactly 2 of the 20
# overlapping bands.
# ---------------------------------------------------------------------------
@register(
    "range_join_price_bands",
    """
    WITH bands AS (
      SELECT i AS band_id, i * 25000.0 AS lo, i * 25000.0 + 50000.0 AS hi
      FROM range(0, 20) t(i)
    )
    SELECT band_id, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
    FROM bands b
    JOIN orders o ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY band_id
    """,
    survey_ref="§2.4/§7 range join (bin-bucketed, no nested loop)",
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_clickhouse_spark.operators.rangejoin import range_join

    bands = spark.range(0, 20).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 25000.0).alias("lo"),
        (F.col("id") * 25000.0 + 50000.0).alias("hi"),
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    joined = range_join(
        orders, bands, "o_totalprice", "lo", "hi", bin_width=25000.0, closed="left"
    )
    return joined.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Gap-filled hourly series with LOCF: dense per-user hourly grid, missing
# buckets carry the last observed hourly sum forward (TimescaleDB
# time_bucket_gapfill + locf shape; for klines: synthesize missing bars).
# The hourly sum is rounded BEFORE the fill so carried values are bit-equal
# across engines.
# ---------------------------------------------------------------------------
@register(
    "gapfill_hourly_locf",
    """
    WITH agg AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket_start,
             round(sum(value), 2) AS v
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT user_id, min(bucket_start) AS h0, max(bucket_start) AS h1
      FROM agg GROUP BY 1
    ), grid AS (
      SELECT b.user_id, g.g AS bucket_start
      FROM bounds b, unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS g(g)
    ), j AS (
      SELECT g.user_id, g.bucket_start, a.v
      FROM grid g
      LEFT JOIN agg a ON a.user_id = g.user_id AND a.bucket_start = g.bucket_start
    )
    SELECT user_id, bucket_start,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bucket_start
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS v,
           CAST(v IS NULL AS INT) AS is_gap
    FROM j
    """,
    survey_ref="T5/§7 gap-filled resample (time_bucket_gapfill + locf shape)",
)
def gapfill_hourly_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_clickhouse_spark.operators.resample import gapfill_locf

    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("bucket_start")
    ).agg(F.round(F.sum("value"), 2).alias("v"))
    return gapfill_locf(
        agg, ts_col="bucket_start", by=("user_id",), value_cols=("v",)
    ).select("user_id", "bucket_start", "v", "is_gap")


# ---------------------------------------------------------------------------
# Rolling cross-series correlation: click vs purchase hourly volumes over a
# trailing 7-day RANGE frame — the klines-domain "rolling correlation of two
# symbols" shape. Frame is keyed on an epoch-hour long so both engines see
# the identical RANGE semantics; windows need >= 2 points (Spark yields NaN
# where DuckDB yields NULL on degenerate windows — mapped explicitly).
# ---------------------------------------------------------------------------
@register(
    "rolling_corr_click_purchase",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hour,
             round(sum(CASE WHEN event_type = 'click' THEN value ELSE 0 END), 4) AS x,
             round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 4) AS y
      FROM events GROUP BY 1
    ), h AS (
      SELECT hour, x, y,
             CAST(epoch(hour) / 3600 AS BIGINT) AS hour_idx
      FROM hourly
    ), s AS (
      SELECT hour,
             count(*)   OVER w AS n,
             sum(x)     OVER w AS sx,
             sum(y)     OVER w AS sy,
             sum(x * y) OVER w AS sxy,
             sum(x * x) OVER w AS sxx,
             sum(y * y) OVER w AS syy
      FROM h
      WINDOW w AS (ORDER BY hour_idx RANGE BETWEEN 167 PRECEDING AND CURRENT ROW)
    ), c AS (
      SELECT hour, n,
             (sxy - sx * sy / n)
               / nullif(sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 0) AS r
      FROM s
    )
    SELECT hour, round(r, 6) AS corr_7d FROM c WHERE n >= 2 AND r IS NOT NULL
    """,
    survey_ref="§2.6/§7 rolling cross-series correlation (RANGE frame)",
)
def rolling_corr_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = ev.groupBy(hour.alias("hour")).agg(
        F.round(
            F.sum(F.when(F.col("event_type") == "click", F.col("value")).otherwise(0.0)), 4
        ).alias("x"),
        F.round(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)),
            4,
        ).alias("y"),
    )
    h = hourly.withColumn(
        "hour_idx", (F.unix_timestamp("hour") / 3600).cast("long")
    )
    # corr from explicit window moments with a null-guarded denominator:
    # ANSI-mode corr() throws DIVIDE_BY_ZERO on degenerate (n=1 /
    # zero-variance) trailing windows, and this way both engines evaluate
    # the bit-identical formula. One global series -> one unpartitioned
    # window is fine (hours, not rows); per-symbol-pair at scale this
    # partitions by the pair key.
    w = Window.orderBy("hour_idx").rangeBetween(-167, 0)
    x, y = F.col("x"), F.col("y")
    s = h.select(
        "hour",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(x).over(w).alias("sx"),
        F.sum(y).over(w).alias("sy"),
        F.sum(x * y).over(w).alias("sxy"),
        F.sum(x * x).over(w).alias("sxx"),
        F.sum(y * y).over(w).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    denom = F.nullif(F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), F.lit(0.0))
    r = (sxy - sx * sy / n) / denom
    return (
        s.withColumn("r", r)
        .filter((n >= 2) & F.col("r").isNotNull())
        .select("hour", F.round("r", 6).alias("corr_7d"))
    )


# ---------------------------------------------------------------------------
# Ordered funnel + cohort retention — the two event-analytics passes the
# serving warehouse answers with dedicated combinators (ClickHouse
# windowFunnel / retention); here they are ordinary user-keyed plans.
# ---------------------------------------------------------------------------
_FUNNEL_STAGES = ["signup", "click", "purchase"]
#: conversion window (windowFunnel cap): next stage within 24h of the prior
_FUNNEL_WITHIN_S = 86400


@register(
    "funnel_signup_click_purchase",
    f"""
    WITH s0 AS (
      SELECT user_id, min(ts) AS t_prev FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    s1 AS (
      SELECT e.user_id, min(e.ts) AS t_prev
      FROM events e JOIN s0 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s0.t_prev
        AND e.ts <= s0.t_prev + INTERVAL {_FUNNEL_WITHIN_S} SECOND
      GROUP BY e.user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t_prev
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s1.t_prev
        AND e.ts <= s1.t_prev + INTERVAL {_FUNNEL_WITHIN_S} SECOND
      GROUP BY e.user_id
    ),
    counts AS (
      SELECT 0 AS stage_idx, 'signup' AS stage, count(*)::BIGINT AS n_users FROM s0
      UNION ALL
      SELECT 1, 'click', count(*)::BIGINT FROM s1
      UNION ALL
      SELECT 2, 'purchase', count(*)::BIGINT FROM s2
    )
    SELECT stage_idx, stage, n_users,
           CASE WHEN lag(n_users) OVER (ORDER BY stage_idx) > 0
                THEN round(n_users / lag(n_users) OVER (ORDER BY stage_idx), 6)
           END AS conv_from_prev,
           CASE WHEN first_value(n_users) OVER (
                  ORDER BY stage_idx
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) > 0
                THEN round(n_users / first_value(n_users) OVER (
                       ORDER BY stage_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
           END AS conv_from_first
    FROM counts
    """,
    survey_ref="event analytics: strictly-ordered funnel (windowFunnel shape)",
)
def funnel_signup_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_clickhouse_spark.operators.funnel import funnel_stages

    return funnel_stages(
        _t(spark, sf_dir, "events"), _FUNNEL_STAGES, within_seconds=_FUNNEL_WITHIN_S
    )


@register(
    "cohort_retention_daily",
    """
    WITH active AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS active_date FROM events
    ),
    first AS (
      SELECT user_id, min(active_date) AS cohort_date FROM active GROUP BY user_id
    ),
    sizes AS (
      SELECT cohort_date, count(*)::BIGINT AS n_cohort FROM first GROUP BY cohort_date
    ),
    activity AS (
      SELECT f.cohort_date,
             CAST(date_diff('day', f.cohort_date, a.active_date) AS INTEGER)
               AS day_offset,
             count(*)::BIGINT AS n_active
      FROM active a JOIN first f USING (user_id)
      GROUP BY 1, 2
    )
    SELECT a.cohort_date, a.day_offset, a.n_active, s.n_cohort,
           round(a.n_active / s.n_cohort, 6) AS retention_rate
    FROM activity a JOIN sizes s USING (cohort_date)
    """,
    survey_ref="event analytics: day-cohort retention matrix (retention shape)",
)
def cohort_retention_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_clickhouse_spark.operators.funnel import cohort_retention

    return cohort_retention(_t(spark, sf_dir, "events"))


@register(
    "funnel_conversion_lags",
    f"""
    WITH s0 AS (
      SELECT user_id, min(ts) AS t_cur FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    s1 AS (
      SELECT e.user_id, min(e.ts) AS t_cur, min(s0.t_cur) AS t_prev
      FROM events e JOIN s0 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s0.t_cur
        AND e.ts <= s0.t_cur + INTERVAL {_FUNNEL_WITHIN_S} SECOND
      GROUP BY e.user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t_cur, min(s1.t_cur) AS t_prev
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s1.t_cur
        AND e.ts <= s1.t_cur + INTERVAL {_FUNNEL_WITHIN_S} SECOND
      GROUP BY e.user_id
    ),
    lag1 AS (SELECT epoch_us(t_cur - t_prev) / 1000000.0 AS lag_s FROM s1),
    lag2 AS (SELECT epoch_us(t_cur - t_prev) / 1000000.0 AS lag_s FROM s2)
    SELECT 1 AS stage_idx, 'click' AS stage, count(*)::BIGINT AS n_users,
           round(avg(lag_s), 6) AS avg_lag_s, round(median(lag_s), 6) AS med_lag_s
    FROM lag1
    UNION ALL
    SELECT 2, 'purchase', count(*)::BIGINT, round(avg(lag_s), 6),
           round(median(lag_s), 6)
    FROM lag2
    """,
    survey_ref="event analytics: per-stage funnel conversion lag (avg/median)",
)
def funnel_conversion_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_clickhouse_spark.operators.funnel import funnel_stage_lags

    return funnel_stage_lags(
        _t(spark, sf_dir, "events"), _FUNNEL_STAGES, within_seconds=_FUNNEL_WITHIN_S
    )


@register(
    "cohort_retention_weekly",
    """
    WITH active AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_date FROM events
    ),
    first AS (
      SELECT user_id, min(active_date) AS cohort_date FROM active GROUP BY user_id
    ),
    sizes AS (
      SELECT cohort_date, count(*)::BIGINT AS n_cohort FROM first GROUP BY cohort_date
    ),
    activity AS (
      SELECT f.cohort_date,
             CAST(date_diff('day', f.cohort_date, a.active_date) // 7 AS INTEGER)
               AS week_offset,
             count(*)::BIGINT AS n_active
      FROM active a JOIN first f USING (user_id)
      GROUP BY 1, 2
    )
    SELECT a.cohort_date, a.week_offset, a.n_active, s.n_cohort,
           round(a.n_active / s.n_cohort, 6) AS retention_rate
    FROM activity a JOIN sizes s USING (cohort_date)
    """,
    survey_ref="event analytics: week-cohort retention matrix",
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_clickhouse_spark.operators.funnel import cohort_retention

    return cohort_retention(_t(spark, sf_dir, "events"), granularity="week")


# ---------------------------------------------------------------------------
# Interval×interval overlap join: purchase attention windows vs error
# windows, as a binned equi-join (operators/rangejoin.interval_overlap_join)
# — no BroadcastNestedLoopJoin, one canonical collision per overlapping
# pair (first-shared-bin residual), shuffled on the bin key so it shards at
# 100 TB. The oracle states the plain overlap predicate.
# ---------------------------------------------------------------------------
_OVL_BIN_MS = 5 * 60_000  # ~ the interval length scale (1-7 min windows)


@register(
    "interval_overlap_pairs",
    """
    WITH a AS (
      SELECT event_id AS a_id,
             epoch_ms(ts) AS a_lo,
             epoch_ms(ts) + (1 + event_id % 7) * 60000 AS a_hi
      FROM events WHERE event_type = 'purchase'
    ),
    b AS (
      SELECT event_id AS b_id,
             epoch_ms(ts) AS b_lo,
             epoch_ms(ts) + (1 + event_id % 5) * 60000 AS b_hi
      FROM events WHERE event_type = 'error'
    )
    SELECT a_id, b_id, a_lo, b_lo
    FROM a JOIN b ON a_lo <= b_hi AND b_lo <= a_hi
    """,
    survey_ref="§2.4 range join (interval×interval overlap, binned equi-join)",
)
def interval_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_clickhouse_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    ev = _t(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts"))

    def windows(etype: str, mod: int, prefix: str) -> DataFrame:
        lo = ms
        hi = ms + (F.lit(1) + F.col("event_id") % mod) * F.lit(60_000)
        return ev.filter(F.col("event_type") == etype).select(
            F.col("event_id").alias(f"{prefix}_id"),
            lo.alias(f"{prefix}_lo"),
            hi.alias(f"{prefix}_hi"),
        )

    pairs = interval_overlap_join(
        windows("purchase", 7, "a"),
        windows("error", 5, "b"),
        "a_lo",
        "a_hi",
        "b_lo",
        "b_hi",
        bin_width=_OVL_BIN_MS,
    )
    return pairs.select("a_id", "b_id", "a_lo", "b_lo")


# ---------------------------------------------------------------------------
# EWMA smoothing + anomaly flags per user. The smoother is the bounded-
# history form: weighted mean of the W preceding values with geometric
# weights lambda^(age-1) — identical arithmetic in both engines. The Spark
# side joins current rows to predecessors through a BANDED self-join
# (each predecessor replicated into its row-block and the next, equi-join
# on (user, block)), so per-join-key fan-out is <= 2W rows no matter how
# long a user's history grows — the shape that survives a 100 TB event
# log. The oracle uses the naive range self-join; the hash match cross-
# validates the banding.
# ---------------------------------------------------------------------------
_EWMA_W, _EWMA_LAMBDA, _EWMA_THRESH = 8, 0.7, 80.0


@register(
    "ewma_anomaly_events",
    f"""
    WITH e AS (
      SELECT event_id, user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    j AS (
      SELECT a.event_id, a.user_id, a.value,
             sum(pow({_EWMA_LAMBDA}, a.rn - b.rn - 1) * b.value) AS swv,
             sum(pow({_EWMA_LAMBDA}, a.rn - b.rn - 1)) AS sw
      FROM e a LEFT JOIN e b
        ON a.user_id = b.user_id AND a.rn - b.rn BETWEEN 1 AND {_EWMA_W}
      GROUP BY a.event_id, a.user_id, a.value
    )
    SELECT event_id, user_id, value,
           round(swv / sw, 6) AS ewma,
           round(abs(value - swv / sw), 6) AS score,
           coalesce(abs(value - swv / sw) > {_EWMA_THRESH}, false) AS is_anomaly
    FROM j
    """,
    survey_ref="time series: EWMA smoothing + anomaly flags (banded history join)",
)
def ewma_anomaly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.withColumn("rn", F.row_number().over(w)).drop("ts")
    a = r.withColumn("blk", (F.col("rn") / _EWMA_W).cast("long"))
    # each predecessor row serves its own block and the next one
    b = (
        r.select(
            "user_id",
            F.col("rn").alias("brn"),
            F.col("value").alias("bval"),
            F.explode(
                F.array(
                    (F.col("rn") / _EWMA_W).cast("long"),
                    (F.col("rn") / _EWMA_W).cast("long") + 1,
                )
            ).alias("blk"),
        )
    )
    diff = F.col("rn") - F.col("brn")
    j = a.join(b, ["user_id", "blk"], "left").withColumn(
        "ok", diff.between(1, _EWMA_W)
    )
    wgt = F.when(F.col("ok"), F.pow(F.lit(_EWMA_LAMBDA), diff - 1))
    g = j.groupBy("event_id", "user_id", "value").agg(
        F.sum(wgt * F.col("bval")).alias("swv"),
        F.sum(wgt).alias("sw"),
    )
    ewma_raw = F.col("swv") / F.col("sw")
    return g.select(
        "event_id",
        "user_id",
        "value",
        F.round(ewma_raw, 6).alias("ewma"),
        F.round(F.abs(F.col("value") - ewma_raw), 6).alias("score"),
        F.coalesce(
            F.abs(F.col("value") - ewma_raw) > _EWMA_THRESH, F.lit(False)
        ).alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# Native session windows (F.session_window): per-user activity sessions
# with a 30-minute inactivity gap. The oracle recomputes sessions with the
# classic formulation — lag-gap flags + running-sum session ids — so the
# driver hash cross-validates Spark's built-in session-window operator
# against the textbook SQL construction (boundary semantics: a gap of
# EXACTLY the timeout starts a new session — Spark sessions are half-open
# [start, prev_ts + gap)). The same groupBy runs unchanged under
# Structured Streaming with a watermark (streaming/jobs.py patterns).
# ---------------------------------------------------------------------------
@register(
    "session_window_agg",
    """
    WITH o AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
      SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*)::BIGINT AS n_events,
           round(sum(value), 4) AS sum_value
    FROM s GROUP BY user_id, sid
    """,
    survey_ref="streaming/batch: native session windows vs gap-merge oracle",
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Time-decayed trending scores: per event type, a half-life-weighted count
# anchored at the corpus max timestamp (deterministic t_ref, no wall
# clock). The decayed sum is a single map-side-combinable aggregation —
# the streaming-friendly "trending now" statistic (each element's weight
# depends only on its own timestamp and the fixed anchor, so partial
# aggregation is exact).
# ---------------------------------------------------------------------------
_TREND_HALFLIFE_H = 6.0


@register(
    "trending_decayed_counts",
    f"""
    WITH r AS (SELECT max(ts) AS t_ref FROM events)
    SELECT event_type,
           count(*)::BIGINT AS n_events,
           round(sum(pow(0.5, (epoch(r.t_ref) - epoch(ts)) / {3600.0 * _TREND_HALFLIFE_H})), 6)
             AS decayed_count
    FROM events CROSS JOIN r
    GROUP BY event_type
    """,
    survey_ref="analytics: exponential time-decayed trending counts",
)
def trending_decayed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    t_ref = ev.agg(F.max("ts")).first()[0]
    decay = F.pow(
        F.lit(0.5),
        (F.lit(t_ref).cast("timestamp").cast("double") - F.col("ts").cast("double"))
        / F.lit(3600.0 * _TREND_HALFLIFE_H),
    )
    return ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.round(F.sum(decay), 6).alias("decayed_count"),
    )
