"""Wide scalar-function + conditional-aggregation coverage: string, date,
and null-handling families, plus CASE-WHEN aggregates (TPC-H Q6/Q12/Q14
shapes). All single-pass projections/aggregations — codegen'd, no shuffle
beyond the final agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.queries.registry import register
from binance_etl_clickhouse_spark.tables import load_table as _t


@register(
    "tpch_q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1996-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    survey_ref="§2.5 selective filter + agg (TPC-H Q6 shape)",
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "conditional_agg_priority_mix",
    """
    SELECT l_linestatus,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT
             AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT
             AS low_line_count,
           round(100.0 * sum(CASE WHEN o_orderpriority = '1-URGENT'
                                  THEN l_extendedprice ELSE 0 END)
                 / sum(l_extendedprice), 4) AS urgent_revenue_pct
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_linestatus
    """,
    survey_ref="§2.5 conditional aggregation (TPC-H Q12/Q14 shape)",
)
def conditional_agg_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    urgent_rev = F.when(
        F.col("o_orderpriority") == "1-URGENT", F.col("l_extendedprice")
    ).otherwise(0.0)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
            F.round(
                100.0 * F.sum(urgent_rev) / F.sum("l_extendedprice"), 4
            ).alias("urgent_revenue_pct"),
        )
    )


@register(
    "string_function_family",
    """
    SELECT c_custkey,
           upper(c_name)                            AS name_upper,
           lower(c_mktsegment)                      AS seg_lower,
           length(c_name)                           AS name_len,
           substr(c_name, 1, 8)                     AS name_prefix,
           replace(c_name, '#', '-')                AS name_dashed,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           concat_ws('|', c_mktsegment, c_name)     AS seg_name,
           CAST(contains(c_name, '1') AS INTEGER)   AS has_one,
           reverse(c_mktsegment)                    AS seg_rev
    FROM customer
    """,
    survey_ref="§2.9 string function family",
)
def string_function_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dashed"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
        F.contains(F.col("c_name"), F.lit("1")).cast("int").alias("has_one"),
        F.reverse(F.col("c_mktsegment")).alias("seg_rev"),
    )


@register(
    "date_function_family",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)       AS yr,
           CAST(month(o_orderdate) AS INTEGER)      AS mon,
           CAST(dayofmonth(o_orderdate) AS INTEGER) AS dom,
           CAST(extract(quarter FROM o_orderdate) AS INTEGER) AS qtr,
           date_trunc('month', o_orderdate)         AS month_start,
           last_day(o_orderdate)                    AS month_end,
           o_orderdate + INTERVAL 30 DAY            AS due_date,
           CAST(datediff('day', o_orderdate, TIMESTAMP '1999-01-01') AS BIGINT)
             AS days_to_cutoff
    FROM orders
    """,
    survey_ref="§2.9 date/time function family",
)
def date_function_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        # Spark's last_day returns DATE; cast back for timestamp parity
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.datediff(F.lit("1999-01-01").cast("timestamp"), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_cutoff"),
    )


@register(
    "null_semantics_family",
    """
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'REDACTED') AS seg_or_redacted,
           CAST(c_acctbal IS NOT DISTINCT FROM 0.0 AS INTEGER)    AS is_exactly_zero,
           CAST(c_acctbal IS NULL AS INTEGER)                     AS bal_is_null,
           ifnull(try_cast(c_name AS DOUBLE), -1.0)               AS name_as_num
    FROM customer
    """,
    survey_ref="§2.9 null semantics (nullif/coalesce/null-safe equality)",
)
def null_semantics_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("REDACTED")
        ).alias("seg_or_redacted"),
        F.col("c_acctbal").eqNullSafe(F.lit(0.0)).cast("int").alias("is_exactly_zero"),
        F.isnull("c_acctbal").cast("int").alias("bal_is_null"),
        F.coalesce(F.col("c_name").try_cast("double"), F.lit(-1.0)).alias("name_as_num"),
    )


@register(
    "except_users",
    """
    SELECT user_id FROM events WHERE event_type = 'purchase'
    EXCEPT
    SELECT user_id FROM events
    WHERE event_type = 'signup' AND ts < TIMESTAMP '2024-01-03'
    """,
    survey_ref="§2.8 except",
)
def except_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the signup side is time-bounded so the difference is non-empty at
    # sf0.01 (otherwise every purchaser has signed up -> a trivially-matching
    # 0-row result that can't falsify anything)
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(
        (F.col("event_type") == "signup")
        & (F.col("ts") < F.lit("2024-01-03").cast("timestamp"))
    ).select("user_id")
    return a.subtract(b)  # set EXCEPT (distinct semantics)


@register(
    "stats_family",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6)        AS median_value,
           round(quantile_cont(value, 0.9), 6)        AS p90_value,
           round(stddev_samp(value), 6)               AS sd_value,
           round(var_samp(value), 6)                  AS var_value,
           round(corr(value, CAST(user_id AS DOUBLE)), 6)       AS corr_user,
           round(covar_samp(value, CAST(user_id AS DOUBLE)), 6) AS covar_user
    FROM events GROUP BY event_type
    """,
    survey_ref="§2.5 exact percentiles + moments (median/stddev/corr)",
)
def stats_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    uid = F.col("user_id").cast("double")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("median_value"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90_value"),
        F.round(F.stddev_samp("value"), 6).alias("sd_value"),
        F.round(F.var_samp("value"), 6).alias("var_value"),
        F.round(F.corr(F.col("value"), uid), 6).alias("corr_user"),
        F.round(F.covar_samp(F.col("value"), uid), 6).alias("covar_user"),
    )


@register(
    "scalar_subquery_above_global_avg",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    """,
    survey_ref="§4 uncorrelated scalar subquery",
)
def scalar_subquery_above_global_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS totalprice FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        """
    )


@register(
    "array_function_family",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(toks))[1:5], ',') AS first5_sorted,
           CAST(list_contains(toks, 'spark') AS INTEGER)             AS has_spark,
           CAST(coalesce(list_position(toks, 'data'), 0) AS BIGINT)  AS data_pos,
           list_min(toks)                                            AS min_tok,
           list_max(toks)                                            AS max_tok
    FROM w
    """,
    survey_ref="§2.9 array function family",
)
def array_function_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.array_join(F.slice(F.sort_array(F.array_distinct(toks)), 1, 5), ",").alias(
            "first5_sorted"
        ),
        F.array_contains(toks, "spark").cast("int").alias("has_spark"),
        # Spark's array_position already yields 0 when absent; DuckDB's
        # list_position yields NULL -> coalesce on the oracle side
        F.array_position(toks, "data").cast("long").alias("data_pos"),
        F.array_min(toks).alias("min_tok"),
        F.array_max(toks).alias("max_tok"),
    )


# ---------------------------------------------------------------------------
# Map function family: build a per-user event_type -> count map
# (map_from_entries over a sorted entry list for determinism), then probe it
# with try_element_at (ANSI-safe missing-key lookup), size, map_keys. The
# oracle computes the same scalars without a map type — what is pinned is
# the values, the Spark side is what exercises the map surface.
# ---------------------------------------------------------------------------
@register(
    "map_function_family",
    """
    SELECT user_id,
           CAST(count(DISTINCT event_type) AS INTEGER) AS n_types,
           CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN 1 END), 0)
                AS BIGINT) AS n_clicks,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_csv
    FROM events GROUP BY user_id
    """,
    survey_ref="§2.9 map function family (map_from_entries/try_element_at/map_keys)",
)
def map_function_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("m")
    )
    return m.select(
        "user_id",
        F.size("m").alias("n_types"),
        F.coalesce(F.try_element_at("m", F.lit("click")), F.lit(0))
        .cast("long")
        .alias("n_clicks"),
        F.array_join(F.map_keys("m"), ",").alias("types_csv"),
    )


# ---------------------------------------------------------------------------
# Winsorization: clip each value into its group's [p05, p95] band — the
# standard outlier treatment before training-statistics aggregation. The
# percentile bounds are rounded BEFORE clipping so boundary decisions are
# bit-identical across engines; the bounds frame is tiny and broadcast.
# ---------------------------------------------------------------------------
@register(
    "winsorize_per_type",
    """
    WITH b AS (
      SELECT event_type,
             round(quantile_cont(value, 0.05), 6) AS lo,
             round(quantile_cont(value, 0.95), 6) AS hi
      FROM events GROUP BY 1
    )
    SELECT e.event_id, e.event_type,
           round(least(greatest(e.value, b.lo), b.hi), 6) AS value_winsorized,
           CAST(e.value < b.lo OR e.value > b.hi AS INT) AS clipped
    FROM events e JOIN b USING (event_type)
    """,
    survey_ref="§2.5 per-group percentile bounds + clip (outlier winsorization)",
)
def winsorize_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    b = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.05)), 6).alias("lo"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("hi"),
    )
    j = ev.join(F.broadcast(b), "event_type")
    clipped = (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))
    return j.select(
        "event_id",
        "event_type",
        F.round(F.least(F.greatest("value", F.col("lo")), F.col("hi")), 6).alias(
            "value_winsorized"
        ),
        clipped.cast("int").alias("clipped"),
    )


# ---------------------------------------------------------------------------
# MAD-based robust outlier detection: |0.6745 * (v - median) / MAD| > 3.5
# (the Iglewicz–Hoaglin modified z-score). Median and MAD are EXACT
# percentiles — two tiny per-type aggregations broadcast back against the
# events scan; degenerate MAD=0 groups flag nothing (z undefined -> 0).
# The robust twin of winsorize_per_type: that one clips into a fixed
# percentile band, this one scores distance in MAD units.
# ---------------------------------------------------------------------------
@register(
    "mad_outlier_per_type",
    """
    WITH med AS (
      SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
      FROM events GROUP BY 1
    ),
    mad AS (
      SELECT e.event_type,
             round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
      FROM events e JOIN med m USING (event_type) GROUP BY 1
    )
    SELECT e.event_id, e.event_type, m.med, d.mad,
           round(CASE WHEN d.mad > 0
                      THEN 0.6745 * (e.value - m.med) / d.mad
                      ELSE 0 END, 6) AS robust_z,
           abs(CASE WHEN d.mad > 0
                    THEN 0.6745 * (e.value - m.med) / d.mad
                    ELSE 0 END) > 3.5 AS is_outlier
    FROM events e JOIN med m USING (event_type) JOIN mad d USING (event_type)
    """,
    survey_ref=(
        "§2.5 robust statistics: MAD modified z-score outlier flags "
        "(exact-percentile, per-group)"
    ),
)
def mad_outlier_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("med")
    )
    with_med = ev.join(F.broadcast(med), "event_type")
    mad = with_med.groupBy("event_type").agg(
        F.round(
            F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)), 6
        ).alias("mad")
    )
    z_raw = F.when(
        F.col("mad") > 0,
        F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad"),
    ).otherwise(F.lit(0.0))
    return with_med.join(F.broadcast(mad), "event_type").select(
        "event_id",
        "event_type",
        "med",
        "mad",
        F.round(z_raw, 6).alias("robust_z"),
        (F.abs(z_raw) > 3.5).alias("is_outlier"),
    )


# ---------------------------------------------------------------------------
# ClickHouse URL function family (r8): domain / firstSignificantSubdomain /
# topLevelDomain / port / path / extractURLParameter / fragment /
# cutQueryStringAndFragment over per-doc synthesized URLs (the corpus has
# none). The Spark side runs the VERBATIM ClickHouse names — SQL-UDF shims
# over parse_url (engine.CLICKHOUSE_COMPAT_FUNCTIONS) — while the oracle
# re-derives every part with INDEPENDENT DuckDB regexes over the same
# strings, so Java-URI parsing is pinned against a second parser, not
# against itself. Hostnames use '-' (underscores make Java URI's getHost
# return null — registry-based authority).
# ---------------------------------------------------------------------------

_URL_BUILD_CH = """
concat('https://',
       CASE WHEN doc_id % 4 = 0 THEN 'www.' ELSE '' END,
       replace(lower(source), '_', '-'),
       CASE WHEN doc_id % 3 = 0 THEN '.example.com.tr'
            WHEN doc_id % 3 = 1 THEN '.example.net'
            ELSE '.shop.io' END,
       CASE WHEN doc_id % 5 = 0 THEN ':8443' ELSE '' END,
       '/p/', CAST(doc_id AS STRING),
       CASE WHEN doc_id % 2 = 0
            THEN concat('?q=doc', CAST(doc_id AS STRING), '&lang=', lang)
            ELSE '' END,
       CASE WHEN doc_id % 7 = 0 THEN '#sec2' ELSE '' END)
"""

_URL_ORACLE = r"""
WITH urls AS (
  SELECT doc_id,
         'https://'
         || CASE WHEN doc_id % 4 = 0 THEN 'www.' ELSE '' END
         || replace(lower(source), '_', '-')
         || CASE WHEN doc_id % 3 = 0 THEN '.example.com.tr'
                 WHEN doc_id % 3 = 1 THEN '.example.net'
                 ELSE '.shop.io' END
         || CASE WHEN doc_id % 5 = 0 THEN ':8443' ELSE '' END
         || '/p/' || CAST(doc_id AS VARCHAR)
         || CASE WHEN doc_id % 2 = 0
                 THEN '?q=doc' || CAST(doc_id AS VARCHAR) || '&lang=' || lang
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0 THEN '#sec2' ELSE '' END AS u
  FROM documents
),
parts AS (
  SELECT doc_id, u,
         regexp_extract(u, 'https://([^/:?#]+)', 1) AS host
  FROM urls
)
SELECT doc_id,
       host,
       coalesce(regexp_extract(host, '\.([^.]+)$', 1), '') AS tld,
       CASE WHEN len(string_split(host, '.')) >= 3
             AND string_split(host, '.')[len(string_split(host, '.')) - 1]
                 IN ('com', 'net', 'org', 'co')
            THEN string_split(host, '.')[len(string_split(host, '.')) - 2]
            ELSE string_split(host, '.')[len(string_split(host, '.')) - 1]
       END AS fsd,
       CAST(coalesce(try_cast(regexp_extract(u, 'https://[^/?#]*:(\d+)', 1)
                              AS INT), 0) AS INT) AS prt,
       coalesce(regexp_extract(u, 'https://[^/?#]+(/[^?#]*)', 1), '') AS pth,
       coalesce(regexp_extract(u, '[?&]q=([^&#]*)', 1), '') AS qparam,
       coalesce(regexp_extract(u, '#(.*)$', 1), '') AS frag,
       regexp_replace(u, '[?#].*$', '') AS cut_all
FROM parts
"""


@register(
    "url_function_family",
    _URL_ORACLE,
    survey_ref=(
        "S8 dialect: ClickHouse URL function family (domain, "
        "firstSignificantSubdomain, topLevelDomain, port, path, "
        "extractURLParameter, fragment, cutQueryStringAndFragment) runs "
        "verbatim via parse_url SQL-UDF shims, pinned against an "
        "independent DuckDB regex parser"
    ),
)
def url_function_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_clickhouse_spark.engine import AnalyticsEngine
    from binance_etl_clickhouse_spark.tables import register_views

    register_views(spark, sf_dir)
    eng = AnalyticsEngine(spark, verbose=False)
    eng.register_clickhouse_compat()
    return eng.sql(
        f"""
        SELECT doc_id,
               domain(u) AS host,
               topLevelDomain(u) AS tld,
               firstSignificantSubdomain(u) AS fsd,
               port(u) AS prt,
               path(u) AS pth,
               extractURLParameter(u, 'q') AS qparam,
               fragment(u) AS frag,
               cutQueryStringAndFragment(u) AS cut_all
        FROM (SELECT doc_id, {_URL_BUILD_CH} AS u FROM documents) t
        """,
        dialect="clickhouse",
    )


# ---------------------------------------------------------------------------
# r9 scalar widening as a driver-checkable query: the OrNull/OrZero cast
# fallbacks, interval constructors, week/month date helpers, substring
# counting, bit counting and float classification run VERBATIM through
# the ClickHouse dialect over `orders`, value-hash oracled against the
# equivalent DuckDB expressions (try_cast exists in both engines with the
# same NULL-on-malformed contract; both clamp month adds at month end;
# both anchor date_trunc('week') on Monday).
# ---------------------------------------------------------------------------
_SCALAR_FB_CH_SQL = """
SELECT o_orderkey,
       toInt64OrNull(o_orderpriority) AS prio_num,
       toInt32OrZero(substring(o_orderpriority, 1, 1)) AS prio_digit,
       toStartOfDay(toDateOrNull(o_orderstatus)) AS status_date,
       toStartOfDay(toDateOrZero(o_orderstatus)) AS status_date0,
       toStartOfDay(toMonday(o_orderdate)) AS week_monday,
       toStartOfDay(toLastDayOfMonth(o_orderdate)) AS month_end,
       o_orderdate + toIntervalDay(10) AS plus_10d,
       o_orderdate + toIntervalMonth(1) AS plus_1m,
       timeSlot(o_orderdate + toIntervalMinute(44)) AS slot,
       toInt64(countSubstrings(o_orderpriority, 'E')) AS n_e,
       toInt32(bitCount(o_orderkey)) AS bits,
       toInt8(isFinite(o_totalprice)) AS fin
FROM orders
"""

_SCALAR_FB_ORACLE = """
SELECT o_orderkey,
       try_cast(o_orderpriority AS BIGINT) AS prio_num,
       CAST(coalesce(try_cast(substring(o_orderpriority, 1, 1) AS INTEGER),
                     0) AS INTEGER) AS prio_digit,
       CAST(try_cast(o_orderstatus AS DATE) AS TIMESTAMP) AS status_date,
       CAST(coalesce(try_cast(o_orderstatus AS DATE), DATE '1970-01-01')
            AS TIMESTAMP) AS status_date0,
       date_trunc('week', o_orderdate) AS week_monday,
       CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
       o_orderdate + INTERVAL 10 DAY AS plus_10d,
       o_orderdate + INTERVAL 1 MONTH AS plus_1m,
       o_orderdate + INTERVAL 30 MINUTE AS slot,
       CAST(length(o_orderpriority)
            - length(replace(o_orderpriority, 'E', '')) AS BIGINT) AS n_e,
       CAST(bit_count(o_orderkey) AS INTEGER) AS bits,
       CAST(isfinite(o_totalprice) AS TINYINT) AS fin
FROM orders
"""


@register(
    "scalar_fallback_family",
    _SCALAR_FB_ORACLE,
    survey_ref=(
        "S8 dialect (r9): OrNull/OrZero cast fallbacks, toInterval* "
        "constructors, toMonday/toLastDayOfMonth/timeSlot, "
        "countSubstrings, bitCount and isFinite run verbatim, value-hash "
        "oracled against the equivalent DuckDB expressions"
    ),
)
def scalar_fallback_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_clickhouse_spark.engine import AnalyticsEngine
    from binance_etl_clickhouse_spark.tables import register_views

    register_views(spark, sf_dir)
    eng = AnalyticsEngine(spark, verbose=False)
    eng.register_clickhouse_compat()
    return eng.sql(_SCALAR_FB_CH_SQL, dialect="clickhouse")


# ---------------------------------------------------------------------------
# r10 scalar widening as a driver-checkable query: dateTrunc, toISOWeek,
# monthName, age (complete units — the complement of dateDiff's boundary
# crossings), timestampAdd/Sub and the emptyArray<T> constructors run
# VERBATIM over `orders`, value-hash oracled against the equivalent
# DuckDB expressions (isoweek/monthname exist natively there; complete
# days recompute from epoch seconds). age is probed on 'day'/'hour'
# units, which are duration-exact in both engines — the month unit's CH
# month-end clamp edge is a documented divergence (dialect.py).
# ---------------------------------------------------------------------------
_SCALAR_R10_CH_SQL = """
SELECT o_orderkey,
       dateTrunc('month', o_orderdate) AS mon_start,
       toInt32(toISOWeek(o_orderdate)) AS iso_wk,
       monthName(o_orderdate) AS mon_name,
       toInt64(age('day', o_orderdate,
                   o_orderdate + toIntervalHour(o_orderkey % 100))) AS age_d,
       toInt64(age('hour', o_orderdate,
                   o_orderdate + toIntervalMinute(o_orderkey % 500))) AS age_h,
       timestampAdd(o_orderdate, INTERVAL 3 DAY) AS plus3d,
       timestampSub(o_orderdate, INTERVAL 2 HOUR) AS minus2h,
       arrayStringConcat(emptyArrayString(), ',') AS ea
FROM orders
"""

_SCALAR_R10_ORACLE = """
SELECT o_orderkey,
       date_trunc('month', o_orderdate) AS mon_start,
       CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_wk,
       monthname(o_orderdate) AS mon_name,
       CAST(date_diff('second', o_orderdate,
                      o_orderdate + to_hours(o_orderkey % 100))
            // 86400 AS BIGINT) AS age_d,
       CAST(date_diff('second', o_orderdate,
                      o_orderdate + to_minutes(o_orderkey % 500))
            // 3600 AS BIGINT) AS age_h,
       o_orderdate + INTERVAL 3 DAY AS plus3d,
       o_orderdate - INTERVAL 2 HOUR AS minus2h,
       '' AS ea
FROM orders
"""


@register(
    "scalar_r10_family",
    _SCALAR_R10_ORACLE,
    survey_ref=(
        "S8 dialect (r10): dateTrunc, toISOWeek, monthName, age "
        "(complete-unit diff), timestampAdd/Sub, emptyArray<T> run "
        "verbatim, value-hash oracled against the equivalent DuckDB "
        "expressions"
    ),
)
def scalar_r10_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_clickhouse_spark.engine import AnalyticsEngine
    from binance_etl_clickhouse_spark.tables import register_views

    register_views(spark, sf_dir)
    eng = AnalyticsEngine(spark, verbose=False)
    eng.register_clickhouse_compat()
    return eng.sql(_SCALAR_R10_CH_SQL, dialect="clickhouse")
