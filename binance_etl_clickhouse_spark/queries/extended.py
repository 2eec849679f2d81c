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


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection: 64 -> 16 dims with a
# deterministic Rademacher matrix (md5-parity signs shared with the
# oracle's inlined literals). Zero-shuffle projection; the dimensionality
# pre-pass for every downstream pairwise/ANN operator.
# ---------------------------------------------------------------------------
def _jl_oracle() -> str:
    from binance_etl_clickhouse_spark.operators.similarity import jl_matrix

    cols = ", ".join(
        f"round(list_inner_product(v, {row!r}), 6) AS p{j:02d}"
        for j, row in enumerate(jl_matrix(16, 64))
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT vec_id, {cols} FROM e
    """


@register(
    "jl_random_projection",
    _jl_oracle(),
    survey_ref="embeddings: Johnson-Lindenstrauss random projection (64->16)",
)
def jl_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_clickhouse_spark.operators.similarity import jl_project

    return jl_project(_t(spark, sf_dir, "embeddings"), k=16, dim=64)


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov statistic: click vs purchase value
# distributions. D = sup_t |F_click(t) - F_purchase(t)| evaluated over the
# pooled sample with RANGE cumulative windows (peers of a tied value count
# together on both engines). One sort-shuffle over the pooled values.
# ---------------------------------------------------------------------------
@register(
    "ks_test_click_vs_purchase",
    """
    WITH pooled AS (
      SELECT value, CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_x
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    n AS (
      SELECT sum(is_x)::DOUBLE AS nx, sum(1 - is_x)::DOUBLE AS ny FROM pooled
    ),
    cum AS (
      SELECT value,
             sum(is_x) OVER w AS cx,
             sum(1 - is_x) OVER w AS cy
      FROM pooled
      WINDOW w AS (ORDER BY value RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT max(n.nx)::BIGINT AS n_click, max(n.ny)::BIGINT AS n_purchase,
           round(max(abs(cum.cx / n.nx - cum.cy / n.ny)), 6) AS ks_stat
    FROM cum CROSS JOIN n
    """,
    survey_ref="analytics: two-sample Kolmogorov-Smirnov distribution test",
)
def ks_test_click_vs_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    pooled = ev.select(
        "value",
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_x"),
    )
    w = Window.orderBy("value").rangeBetween(Window.unboundedPreceding, 0)
    cum = pooled.select(
        F.sum("is_x").over(w).alias("cx"),
        F.sum(1 - F.col("is_x")).over(w).alias("cy"),
    )
    n = pooled.agg(
        F.sum("is_x").cast("double").alias("nx"),
        F.sum(1 - F.col("is_x")).cast("double").alias("ny"),
    )
    return (
        cum.crossJoin(F.broadcast(n))
        .agg(
            F.max("nx").cast("long").alias("n_click"),
            F.max("ny").cast("long").alias("n_purchase"),
            F.round(
                F.max(F.abs(F.col("cx") / F.col("nx") - F.col("cy") / F.col("ny"))), 6
            ).alias("ks_stat"),
        )
    )


# ---------------------------------------------------------------------------
# Behavioral event-sequence trigrams: per-user time-ordered event-type
# trigrams counted corpus-wide — the "session n-gram" mining pass (funnel
# discovery, bot-pattern detection). Two leads + one groupBy; the window
# partitions by user so no global sort.
# ---------------------------------------------------------------------------
@register(
    "event_sequence_trigrams",
    """
    WITH o AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || '>' || e2 || '>' || e3 AS trigram,
           count(*)::BIGINT AS n
    FROM o WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY 1
    """,
    survey_ref="analytics: per-user event-sequence trigram mining",
)
def event_sequence_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        o.filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("trigram")
        )
        .groupBy("trigram")
        .agg(F.count("*").cast("long").alias("n"))
    )


# ---------------------------------------------------------------------------
# One-pass column profiler over lineitem's measures: null rate, exact
# distinct, min/max/mean per column in a SINGLE aggregation (Spark plans
# the multi-count-distinct via Expand — one scan, not one per column),
# then unpivoted to a row per column. The data-quality pass every ingest
# runs; at 100 TB swap exact distincts for approx_count_distinct.
# ---------------------------------------------------------------------------
_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@register(
    "profile_lineitem_columns",
    " UNION ALL ".join(
        f"""
    SELECT '{c}' AS column_name, count(*)::BIGINT AS n_rows,
           (count(*) - count({c}))::BIGINT AS n_null,
           count(DISTINCT {c})::BIGINT AS n_distinct,
           round(min({c}), 6) AS min_val, round(max({c}), 6) AS max_val,
           round(avg({c}), 6) AS mean_val
    FROM lineitem
    """
        for c in _PROFILE_COLS
    ),
    survey_ref="data quality: one-pass multi-column profile (Expand-planned)",
)
def profile_lineitem_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count("*").cast("long").alias(f"{c}__n"),
            (F.count("*") - F.count(c)).cast("long").alias(f"{c}__null"),
            F.count_distinct(F.col(c)).cast("long").alias(f"{c}__dist"),
            F.round(F.min(c), 6).alias(f"{c}__min"),
            F.round(F.max(c), 6).alias(f"{c}__max"),
            F.round(F.avg(c), 6).alias(f"{c}__mean"),
        ]
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__null, {c}__dist, {c}__min, {c}__max, {c}__mean"
        for c in _PROFILE_COLS
    )
    return one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(column_name, n_rows, n_null, n_distinct, min_val, max_val, mean_val)"
    )


# ---------------------------------------------------------------------------
# Verbatim ClickHouse-DDL round trip (r8): the dialect_ddl surface driven as
# a registered query — CREATE TABLE ... ReplacingMergeTree through
# engine.sql(dialect="clickhouse"), three clickhouse-driver-idiom inserts
# (one with a same-key duplicate INSIDE the block, one superseding a key
# across batches, one adding a second month), serve the keep-last snapshot.
# The oracle replays the identical insert history as a VALUES table with
# explicit (batch, row-in-block) order and the same last-wins window.
# ---------------------------------------------------------------------------
#: (batch, rowi, symbol, ts, close) — the full insert history; keep-last per
#: (symbol, ts) ordered by (batch, rowi) yields the served snapshot
_DDL_RT_HISTORY: list[tuple[int, int, str, str, float]] = [
    (1, 0, "BTCUSDT", "2024-01-01 00:00:00", 100.0),
    (1, 1, "BTCUSDT", "2024-01-01 00:00:00", 101.0),  # in-block dup: wins
    (1, 2, "ETHUSDT", "2024-01-01 00:00:00", 10.0),
    (2, 0, "BTCUSDT", "2024-01-01 00:00:00", 102.0),  # cross-batch: wins
    (2, 1, "ETHUSDT", "2024-02-01 00:00:00", 11.0),  # second month dir
    (3, 0, "XRPUSDT", "2024-02-01 00:00:00", 1.0),
]


def _ddl_rt_oracle() -> str:
    vals = ", ".join(
        f"({b}, {i}, '{s}', TIMESTAMP '{t}', {c})"
        for b, i, s, t, c in _DDL_RT_HISTORY
    )
    return f"""
    WITH history(batch, rowi, symbol, ts, close) AS (VALUES {vals})
    SELECT symbol, ts, close::DOUBLE AS close FROM (
      SELECT symbol, ts, close,
             row_number() OVER (PARTITION BY symbol, ts
                                ORDER BY batch DESC, rowi DESC) AS rn
      FROM history
    ) WHERE rn = 1
    """


@register(
    "ddl_verbatim_roundtrip",
    _ddl_rt_oracle(),
    survey_ref=(
        "S8 DDL surface: ClickHouse CREATE TABLE/INSERT run verbatim, "
        "served snapshot = ReplacingMergeTree keep-last (in-block last-wins "
        "+ cross-batch supersede + month partitioning), value-hash oracled"
    ),
)
def ddl_verbatim_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EAGER by nature (like the unrolled trainers): building it provisions
    a scratch table through the verbatim-DDL path and replays the fixed
    insert history, so the returned frame IS the served snapshot. Input is
    the literal history, not the sf tables — identical at every sf."""
    import tempfile

    from binance_etl_clickhouse_spark.engine import AnalyticsEngine

    eng = AnalyticsEngine(
        spark, verbose=False, ddl_root=tempfile.mkdtemp(prefix="ddl_rt_")
    )
    eng.sql(
        """CREATE TABLE rt.klines (
            symbol LowCardinality(String),
            ts DateTime,
            close Float64
        )
        ENGINE = ReplacingMergeTree()
        ORDER BY (symbol, ts)
        PARTITION BY toYYYYMM(ts)""",
        dialect="clickhouse",
    )
    batches: dict[int, list[dict]] = {}
    for b, _i, s, t, c in _DDL_RT_HISTORY:
        batches.setdefault(b, []).append(
            {"symbol": s, "ts": pd.Timestamp(t), "close": c}
        )
    for b in sorted(batches):
        eng.sql(
            "INSERT INTO rt.klines (symbol, ts, close) VALUES",
            args=batches[b],
            dialect="clickhouse",
        )
    return eng.sql(
        "SELECT symbol, ts, close FROM rt.klines", dialect="clickhouse"
    )


# ---------------------------------------------------------------------------
# Verbatim DDL MUTATION round trip (r9): ALTER MODIFY COLUMN type widen +
# ADD INDEX + OPTIMIZE ... DEDUPLICATE, driven end-to-end through
# engine.sql(dialect="clickhouse") on a scratch table. Pre-MODIFY batches
# keep their Int32 bytes and serve through the explicit widened read
# schema; the post-MODIFY batch carries a value past int32; DEDUPLICATE
# drops full-row duplicates at compaction (survivor identity is moot for
# identical rows, so DISTINCT is the exact oracle). Input is the literal
# history — identical at every sf.
# ---------------------------------------------------------------------------
_DDL_MUT_HISTORY: list[list[tuple[str, int]]] = [
    [("a", 1), ("a", 1), ("a", 2), ("b", 9)],   # batch 1 (Int32 bytes)
    [("c", 2**40), ("a", 1)],                    # batch 2 (post-widen)
]


def _ddl_mut_oracle() -> str:
    vals = ", ".join(
        f"('{k}', {v})" for batch in _DDL_MUT_HISTORY for k, v in batch
    )
    return f"""
    WITH history(k, v) AS (VALUES {vals})
    SELECT DISTINCT k, v::BIGINT AS v FROM history
    """


@register(
    "ddl_mutation_roundtrip",
    _ddl_mut_oracle(),
    survey_ref=(
        "S8 DDL surface (r9): ALTER MODIFY COLUMN Int32->Int64 widen "
        "(metadata-only, scan-level upcast of old bytes) + ADD INDEX "
        "minmax (real zone-map sidecar) + OPTIMIZE DEDUPLICATE "
        "(full-row drop at compaction) run verbatim, value-hash oracled"
    ),
)
def ddl_mutation_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EAGER like ddl_verbatim_roundtrip: building it provisions a scratch
    table, replays the fixed history around the MODIFY, and runs the
    maintenance ops; the returned frame is the post-OPTIMIZE snapshot."""
    import tempfile

    from binance_etl_clickhouse_spark.engine import AnalyticsEngine

    eng = AnalyticsEngine(
        spark, verbose=False, ddl_root=tempfile.mkdtemp(prefix="ddl_mut_")
    )
    eng.sql(
        """CREATE TABLE mt.rows (k String, v Int32)
        ENGINE = MergeTree ORDER BY k""",
        dialect="clickhouse",
    )
    eng.sql(
        "INSERT INTO mt.rows (k, v) VALUES",
        args=[{"k": k, "v": v} for k, v in _DDL_MUT_HISTORY[0]],
        dialect="clickhouse",
    )
    eng.sql("ALTER TABLE mt.rows MODIFY COLUMN v Int64", dialect="clickhouse")
    eng.sql(
        "INSERT INTO mt.rows (k, v) VALUES",
        args=[{"k": k, "v": v} for k, v in _DDL_MUT_HISTORY[1]],
        dialect="clickhouse",
    )
    eng.sql(
        "ALTER TABLE mt.rows ADD INDEX v_idx v TYPE minmax GRANULARITY 4",
        dialect="clickhouse",
    )
    eng.sql("OPTIMIZE TABLE mt.rows DEDUPLICATE", dialect="clickhouse")
    return eng.sql("SELECT k, v FROM rows", dialect="clickhouse")


# ---------------------------------------------------------------------------
# SHOW CREATE TABLE round trip (r10, r9 verdict item 6): the reconstructed
# CREATE statement is not just text — it must re-provision a table with
# IDENTICAL engine semantics. A ReplacingMergeTree(ver) table with the
# full clause surface (version column, month partition, PK prefix, a
# DEFAULT) is created, SHOW CREATE is re-run through a second catalog,
# and the SAME insert history replays against the re-provisioned table;
# the served snapshot is hashed. If the reconstruction dropped the
# version column, the keep-MAX-version semantics would break and the
# hash would catch it.
# ---------------------------------------------------------------------------
#: (symbol, ts, close, ver) — versions unique per key, so the served
#: winner is exactly max(ver) regardless of insert order
_SHOWCR_HISTORY: list[tuple[str, str, float, int]] = [
    ("BTCUSDT", "2024-01-01 00:00:00", 100.0, 3),
    ("BTCUSDT", "2024-01-01 00:00:00", 101.0, 7),  # higher ver: wins
    ("BTCUSDT", "2024-01-01 00:00:00", 99.0, 5),   # lower ver, LATER insert: loses
    ("ETHUSDT", "2024-01-01 00:00:00", 10.0, 1),
    ("ETHUSDT", "2024-02-01 00:00:00", 11.0, 2),   # second month dir
]


def _showcr_oracle() -> str:
    vals = ", ".join(
        f"('{s}', TIMESTAMP '{t}', {c}, {v})" for s, t, c, v in _SHOWCR_HISTORY
    )
    return f"""
    WITH history(symbol, ts, close, ver) AS (VALUES {vals})
    SELECT symbol, ts, close, ver FROM (
      SELECT *, row_number() OVER (PARTITION BY symbol, ts
                                   ORDER BY ver DESC) AS rn
      FROM history
    ) WHERE rn = 1
    """


@register(
    "show_create_verbatim_roundtrip",
    _showcr_oracle(),
    survey_ref=(
        "S8 DDL surface (r10): SHOW CREATE TABLE reconstruction "
        "re-provisions through a second catalog with identical "
        "ReplacingMergeTree(ver) semantics — the replayed history serves "
        "the same max-version snapshot, value-hash oracled"
    ),
)
def show_create_verbatim_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EAGER like ddl_verbatim_roundtrip: provisions a scratch table, runs
    SHOW CREATE, re-provisions a SECOND scratch catalog from the emitted
    statement, and replays the fixed history there. Input is the literal
    history — identical at every sf."""
    import tempfile

    from binance_etl_clickhouse_spark.engine import AnalyticsEngine

    eng = AnalyticsEngine(
        spark, verbose=False, ddl_root=tempfile.mkdtemp(prefix="ddl_sc1_")
    )
    eng.sql(
        """CREATE TABLE sc.kl (
            symbol String,
            ts DateTime,
            close Float64 DEFAULT 0.0,
            ver Int64
        ) ENGINE = ReplacingMergeTree(ver)
        PARTITION BY toYYYYMM(ts)
        PRIMARY KEY (symbol)
        ORDER BY (symbol, ts)""",
        dialect="clickhouse",
    )
    stmt = eng.sql("SHOW CREATE TABLE sc.kl", dialect="clickhouse").collect()[
        0
    ].statement
    eng2 = AnalyticsEngine(
        spark, verbose=False, ddl_root=tempfile.mkdtemp(prefix="ddl_sc2_")
    )
    eng2.sql(stmt.replace("sc.kl", "sc2.kl2"), dialect="clickhouse")
    eng2.sql(
        "INSERT INTO sc2.kl2 (symbol, ts, close, ver) VALUES",
        args=[
            {"symbol": s, "ts": pd.Timestamp(t), "close": c, "ver": v}
            for s, t, c, v in _SHOWCR_HISTORY
        ],
        dialect="clickhouse",
    )
    return eng2.sql(
        "SELECT symbol, ts, close, ver FROM kl2", dialect="clickhouse"
    )


# ---------------------------------------------------------------------------
# ENGINE = Null -> MV staging flow (r10, r9 verdict item 6): ClickHouse's
# canonical streaming-aggregation idiom — a Null staging table stores
# nothing, but every inserted block fires the SummingMergeTree MV, which
# accumulates per-block partial sums merged on read. The result frame is
# the MV's served state UNION the (empty) staging table's row count as a
# sentinel row, so the hash pins BOTH halves of the contract.
# ---------------------------------------------------------------------------
_NULLMV_BLOCKS: list[list[tuple[str, int]]] = [
    [("a", 1), ("a", 2), ("b", 5)],
    [("a", 10)],
    [("b", -3), ("c", 7)],
]


def _nullmv_oracle() -> str:
    vals = ", ".join(
        f"('{k}', {v})" for block in _NULLMV_BLOCKS for k, v in block
    )
    return f"""
    WITH history(k, v) AS (VALUES {vals})
    SELECT k, SUM(v)::BIGINT AS v FROM history GROUP BY k
    UNION ALL
    SELECT '__raw_rows__' AS k, 0::BIGINT AS v
    """


@register(
    "null_engine_mv_staging",
    _nullmv_oracle(),
    survey_ref=(
        "S8 DDL surface (r10): ENGINE = Null staging -> SummingMergeTree "
        "MV — per-block insert triggers aggregate while the staging table "
        "serves empty; both halves value-hash oracled"
    ),
)
def null_engine_mv_staging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EAGER like ddl_verbatim_roundtrip: provisions the Null table + MV
    and replays the fixed blocks. Input is the literal history —
    identical at every sf."""
    import tempfile

    from binance_etl_clickhouse_spark.engine import AnalyticsEngine

    eng = AnalyticsEngine(
        spark, verbose=False, ddl_root=tempfile.mkdtemp(prefix="ddl_nmv_")
    )
    eng.sql(
        "CREATE TABLE st.raw (k String, v Int64) ENGINE = Null",
        dialect="clickhouse",
    )
    eng.sql(
        """CREATE MATERIALIZED VIEW st.sums
        ENGINE = SummingMergeTree ORDER BY (k)
        AS SELECT k, sum(v) AS v FROM st.raw GROUP BY k""",
        dialect="clickhouse",
    )
    for block in _NULLMV_BLOCKS:
        eng.sql(
            "INSERT INTO st.raw (k, v) VALUES",
            args=[{"k": k, "v": v} for k, v in block],
            dialect="clickhouse",
        )
    return eng.sql(
        """SELECT k, v FROM sums
           UNION ALL
           SELECT '__raw_rows__' AS k, count(*) AS v FROM raw""",
        dialect="clickhouse",
    )


# ---------------------------------------------------------------------------
# system.* introspection (r10): system.tables / system.columns /
# system.parts queried VERBATIM over a scratch catalog with a fixed DDL
# history (two engines, a TO-form MV, a plain view, one two-month insert).
# The oracle is the independently-derived expectation: engines from the
# DDL, column counts from the declared schemas, part rows from the insert
# block (per-month split for the partitioned table; the MV trigger's
# per-key partials for its SummingMergeTree target).
# ---------------------------------------------------------------------------


def _sys_introspect_oracle() -> str:
    return """
    SELECT * FROM (VALUES
      ('kl',  'ReplacingMergeTree', 4::BIGINT, 2::BIGINT),
      ('agg', 'SummingMergeTree',   2::BIGINT, 2::BIGINT),
      ('mv',  'MaterializedView',   0::BIGINT, 0::BIGINT),
      ('v',   'View',               0::BIGINT, 0::BIGINT)
    ) AS t(name, engine, n_cols, part_rows)
    """


@register(
    "system_tables_introspection",
    _sys_introspect_oracle(),
    survey_ref=(
        "S8 introspection (r10): system.tables/columns/parts served as "
        "live catalog views (parts rows from parquet footers, O(files) "
        "metadata), joined verbatim and value-hash oracled"
    ),
)
def system_tables_introspection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EAGER like ddl_verbatim_roundtrip: provisions a scratch catalog and
    reads its system tables back. Input is the literal DDL history —
    identical at every sf."""
    import tempfile

    from binance_etl_clickhouse_spark.engine import AnalyticsEngine

    eng = AnalyticsEngine(
        spark, verbose=False, ddl_root=tempfile.mkdtemp(prefix="ddl_sys_")
    )
    eng.sql("CREATE DATABASE IF NOT EXISTS db1", dialect="clickhouse")
    eng.sql(
        """CREATE TABLE db1.kl (
            symbol String, ts DateTime, close Float64, ver Int64
        ) ENGINE = ReplacingMergeTree(ver)
        PARTITION BY toYYYYMM(ts)
        PRIMARY KEY (symbol) ORDER BY (symbol, ts)""",
        dialect="clickhouse",
    )
    eng.sql(
        "CREATE TABLE db1.agg (k String, v Int64) "
        "ENGINE = SummingMergeTree ORDER BY (k)",
        dialect="clickhouse",
    )
    eng.sql(
        "CREATE MATERIALIZED VIEW db1.mv TO db1.agg AS "
        "SELECT symbol AS k, toInt64(close) AS v FROM db1.kl",
        dialect="clickhouse",
    )
    eng.sql("CREATE VIEW db1.v AS SELECT symbol FROM db1.kl", dialect="clickhouse")
    eng.sql(
        "INSERT INTO db1.kl VALUES "
        "('BTC', toDateTime('2024-01-01 00:00:00'), 10.5, 1), "
        "('ETH', toDateTime('2024-02-01 00:00:00'), 2.5, 1)",
        dialect="clickhouse",
    )
    return eng.sql(
        """SELECT t.name AS name, t.engine AS engine,
                  coalesce(c.n_cols, 0) AS n_cols,
                  coalesce(p.part_rows, 0) AS part_rows
           FROM system.tables t
           LEFT JOIN (SELECT table, count(*) AS n_cols
                      FROM system.columns GROUP BY table) c
             ON t.name = c.table
           LEFT JOIN (SELECT table, sum(rows) AS part_rows
                      FROM system.parts GROUP BY table) p
             ON t.name = p.table""",
        dialect="clickhouse",
    )


# ---------------------------------------------------------------------------
# Verbatim Enum8 + Map(K,V) column types (r10, r9 verdict items 4+5): a
# scratch table declares an Enum8 market column and a Map(String, Int64)
# feature column; the insert history exercises every coercion rule — enum
# names, integer enum codes (map to their names), NULL/absent enum (first
# declared value), dict-valued map inserts, absent map (empty). The read
# query extracts scalars (m[key] access, sorted-key concat) so the hash
# compares plain columns; the oracle recomputes every rule independently
# in DuckDB (CASE for the code->name table, native MAP extraction).
# ---------------------------------------------------------------------------
#: (doc_id, market_input_or_None, counts_dict_or_None)
_ENUM_MAP_HISTORY: list[tuple[int, object, dict | None]] = [
    (1, "spot", {"a": 3, "b": 1}),
    (2, 2, {"a": 7}),          # integer code -> 'perp'
    (3, "margin", {}),
    (4, None, None),           # enum default 'spot', map default {}
    (5, 5, {"b": -2, "c": 0}),  # code -> 'margin'
]


def _enum_map_oracle() -> str:
    def _m(c):
        if c is None:
            return "NULL"
        if not c:
            return "MAP {}::MAP(VARCHAR, BIGINT)"
        body = ", ".join(f"'{k}': {v}" for k, v in c.items())
        return f"MAP {{{body}}}"

    vals = ", ".join(
        f"({i}, {'NULL' if mk is None else repr(str(mk))}, {_m(c)})"
        for i, mk, c in _ENUM_MAP_HISTORY
    )
    return f"""
    WITH history(doc_id, market_raw, m) AS (VALUES {vals}),
    filled AS (
      SELECT doc_id,
             coalesce(m, MAP {{}}::MAP(VARCHAR, BIGINT)) AS m,
             CASE WHEN market_raw IS NULL THEN 'spot'
                  WHEN market_raw = '1' THEN 'spot'
                  WHEN market_raw = '2' THEN 'perp'
                  WHEN market_raw = '5' THEN 'margin'
                  ELSE market_raw END AS market
      FROM history
    )
    SELECT doc_id, market,
           m['a'][1]::BIGINT AS a,
           m['b'][1]::BIGINT AS b,
           coalesce(array_to_string(list_sort(map_keys(m)), ','), '') AS keys_csv
    FROM filled
    """


@register(
    "enum_map_ddl_roundtrip",
    _enum_map_oracle(),
    survey_ref=(
        "S8 DDL surface (r10): Enum8 (name/code inserts, out-of-set "
        "refusal, first-value default) + Map(String, Int64) (dict inserts, "
        "m[key] access, empty default) declared in verbatim CREATE TABLE, "
        "value-hash oracled"
    ),
)
def enum_map_ddl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EAGER like ddl_verbatim_roundtrip: building it provisions a scratch
    table through the verbatim-DDL path and replays the fixed insert
    history. Input is the literal history — identical at every sf."""
    import tempfile

    from binance_etl_clickhouse_spark.engine import AnalyticsEngine

    eng = AnalyticsEngine(
        spark, verbose=False, ddl_root=tempfile.mkdtemp(prefix="ddl_em_")
    )
    eng.sql(
        """CREATE TABLE em.feats (
            doc_id Int64,
            market Enum8('spot' = 1, 'perp' = 2, 'margin' = 5),
            counts Map(String, Int64)
        ) ENGINE = MergeTree ORDER BY (doc_id)""",
        dialect="clickhouse",
    )
    rows = []
    for doc_id, market, counts in _ENUM_MAP_HISTORY:
        r: dict = {"doc_id": doc_id}
        if market is not None:
            r["market"] = market
        if counts is not None:
            r["counts"] = counts
        rows.append(r)
    eng.sql("INSERT INTO em.feats VALUES", args=rows, dialect="clickhouse")
    return eng.sql(
        """SELECT doc_id, market,
                  counts['a'] AS a, counts['b'] AS b,
                  arrayStringConcat(arraySort(mapKeys(counts)), ',') AS keys_csv
           FROM em.feats""",
        dialect="clickhouse",
    )


# ---------------------------------------------------------------------------
# Verbatim ClickHouse ASOF JOIN (r8): the dialect's point-in-time join
# surface driven as a registered query. The ClickHouse text runs unchanged
# through engine.sql(dialect="clickhouse") — translated into the union +
# keyed-window + last(ignorenulls) derived table (ONE shuffle on the
# equality key; dialect.py _rewrite_asof_join) — and the oracle is DuckDB's
# NATIVE ASOF JOIN on the identical query shape, so the semantics are
# pinned engine-to-engine, not against a hand-rewritten twin. The right
# side pre-aggregates to one row per (user_id, ts): both engines pick an
# arbitrary candidate among exact ties, so uniqueness is what makes the
# value-hash comparable.
# ---------------------------------------------------------------------------
_ASOF_CH_SQL = """
SELECT p.event_id AS purchase_id,
       p.user_id  AS user_id,
       p.ts       AS purchase_ts,
       c.ts       AS click_ts,
       c.value    AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS value FROM events
                WHERE event_type = 'click' GROUP BY user_id, ts) c
ON p.user_id = c.user_id AND p.ts >= c.ts
"""


@register(
    "asof_join_verbatim_sql",
    _ASOF_CH_SQL,  # DuckDB parses the ClickHouse ASOF JOIN text natively
    survey_ref=(
        "S8 dialect: ClickHouse ASOF [LEFT] JOIN runs verbatim — union-tag "
        "+ one keyed window + last(ignorenulls), single shuffle, oracled "
        "against DuckDB's native ASOF JOIN"
    ),
)
def asof_join_verbatim_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_clickhouse_spark.engine import AnalyticsEngine
    from binance_etl_clickhouse_spark.tables import register_views

    register_views(spark, sf_dir)
    return AnalyticsEngine(spark, verbose=False).sql(
        _ASOF_CH_SQL, dialect="clickhouse"
    )


# ---------------------------------------------------------------------------
# Verbatim windowFunnel / sequenceMatch (r8): the ordered event-chain
# aggregates run unchanged through the dialect, translated into pure
# aggregate() folds over array_sort(collect_list(...)) — no UDF, no shuffle
# beyond the GROUP BY (dialect.py _window_funnel_expr/_sequence_match_expr).
#
# The windowFunnel oracle uses the chain-EXISTS equivalence of the CH
# algorithm (default mode): level >= k iff a chain e1 <= e2 <= ... <= ek
# exists with every element within the window of the FIRST — provable by
# induction because the stored chain-start timestamps are monotone
# non-decreasing over processing, so any feasible chain is eventually
# found. The sequenceMatch '(?1).*(?2).*(?3)' pattern is a pure ordered
# subsequence — EXISTS over a 3-way self-join. Events carry unique
# microsecond timestamps per user (no ties), so both sides are
# deterministic.
# ---------------------------------------------------------------------------
_FUNNEL_CH_SQL = """
SELECT user_id,
       windowFunnel(86400)(ts, event_type = 'view', event_type = 'click',
                           event_type = 'purchase') AS funnel_level
FROM events GROUP BY user_id
"""

_FUNNEL_ORACLE = """
WITH e AS (SELECT user_id, ts, event_type FROM events),
l1 AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'view'),
l2 AS (SELECT DISTINCT a.user_id
       FROM e a JOIN e b ON b.user_id = a.user_id
       WHERE a.event_type = 'view' AND b.event_type = 'click'
         AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 86400 SECOND),
l3 AS (SELECT DISTINCT a.user_id
       FROM e a JOIN e b ON b.user_id = a.user_id
                JOIN e c ON c.user_id = a.user_id
       WHERE a.event_type = 'view' AND b.event_type = 'click'
         AND c.event_type = 'purchase'
         AND b.ts >= a.ts AND c.ts >= b.ts
         AND c.ts <= a.ts + INTERVAL 86400 SECOND)
SELECT u.user_id AS user_id,
       CAST(CASE WHEN l3.user_id IS NOT NULL THEN 3
                 WHEN l2.user_id IS NOT NULL THEN 2
                 WHEN l1.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS INT) AS funnel_level
FROM (SELECT DISTINCT user_id FROM e) u
LEFT JOIN l1 ON l1.user_id = u.user_id
LEFT JOIN l2 ON l2.user_id = u.user_id
LEFT JOIN l3 ON l3.user_id = u.user_id
"""


@register(
    "windowfunnel_verbatim_sql",
    _FUNNEL_ORACLE,
    survey_ref=(
        "S8 dialect: ClickHouse windowFunnel(W)(ts, c1..cN) runs verbatim "
        "as an aggregate() fold replicating the CH chain algorithm, "
        "oracled via the chain-EXISTS equivalence"
    ),
)
def windowfunnel_verbatim_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_clickhouse_spark.engine import AnalyticsEngine
    from binance_etl_clickhouse_spark.tables import register_views

    register_views(spark, sf_dir)
    return AnalyticsEngine(spark, verbose=False).sql(
        _FUNNEL_CH_SQL, dialect="clickhouse"
    )


#: first-week slice — over the full range every user eventually completes
#: the chain (all-1 result proves nothing); the slice splits ~60/40
_SEQMATCH_CH_SQL = """
SELECT user_id,
       sequenceMatch('(?1).*(?2).*(?3)')(ts, event_type = 'signup',
                                         event_type = 'click',
                                         event_type = 'purchase')
           AS seq_matched
FROM (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-08 00:00:00')
GROUP BY user_id
"""

_SEQMATCH_ORACLE = """
WITH e AS (SELECT user_id, ts, event_type FROM events
           WHERE ts < TIMESTAMP '2024-01-08 00:00:00'),
hit AS (SELECT DISTINCT a.user_id
        FROM e a JOIN e b ON b.user_id = a.user_id
                 JOIN e c ON c.user_id = a.user_id
        WHERE a.event_type = 'signup' AND b.event_type = 'click'
          AND c.event_type = 'purchase'
          AND b.ts >= a.ts AND c.ts >= b.ts)
SELECT u.user_id AS user_id,
       CAST(CASE WHEN hit.user_id IS NOT NULL THEN 1 ELSE 0 END AS INT)
           AS seq_matched
FROM (SELECT DISTINCT user_id FROM e) u
LEFT JOIN hit ON hit.user_id = u.user_id
"""


@register(
    "sequencematch_verbatim_sql",
    _SEQMATCH_ORACLE,
    survey_ref=(
        "S8 dialect: ClickHouse sequenceMatch('(?N)'/'.*' patterns) runs "
        "verbatim as a boolean-DP aggregate() fold, oracled as an ordered "
        "subsequence EXISTS"
    ),
)
def sequencematch_verbatim_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_clickhouse_spark.engine import AnalyticsEngine
    from binance_etl_clickhouse_spark.tables import register_views

    register_views(spark, sf_dir)
    return AnalyticsEngine(spark, verbose=False).sql(
        _SEQMATCH_CH_SQL, dialect="clickhouse"
    )


# ---------------------------------------------------------------------------
# Verbatim WITH TOTALS + ANY JOIN (r8): the remaining ClickHouse query-shape
# surface. WITH TOTALS surfaces the out-of-band totals block as the
# GROUPING SETS grand-total row (group column NULL); ANY LEFT JOIN dedupes
# the right side to ONE row per key before joining — min over the packed
# row-struct, deterministic inside ClickHouse's pick-any contract — which
# the oracle replicates as row_number over the same column order (event_id
# is unique, so lexicographic min == min event_id).
# ---------------------------------------------------------------------------
_TOTALS_CH_SQL = """
SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
FROM events GROUP BY event_type WITH TOTALS
"""

_TOTALS_ORACLE = """
SELECT event_type, count(*) AS n,
       round(sum(value), 2)::DOUBLE AS total_value
FROM events GROUP BY GROUPING SETS ((event_type), ())
"""


@register(
    "with_totals_verbatim_sql",
    _TOTALS_ORACLE,
    survey_ref=(
        "S8 dialect: GROUP BY ... WITH TOTALS runs verbatim as GROUPING "
        "SETS ((cols), ()) — the totals block as the NULL-key grand-total "
        "row"
    ),
)
def with_totals_verbatim_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_clickhouse_spark.engine import AnalyticsEngine
    from binance_etl_clickhouse_spark.tables import register_views

    register_views(spark, sf_dir)
    return AnalyticsEngine(spark, verbose=False).sql(
        _TOTALS_CH_SQL, dialect="clickhouse"
    )


_ANY_JOIN_CH_SQL = """
SELECT p.event_id AS purchase_id, s.event_id AS signup_event, s.ts AS signup_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ANY LEFT JOIN (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'signup') s
ON p.user_id = s.user_id
"""

_ANY_JOIN_ORACLE = """
SELECT p.event_id AS purchase_id, s.event_id AS signup_event, s.ts AS signup_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (
  SELECT user_id, event_id, ts FROM (
    SELECT user_id, event_id, ts,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY user_id, event_id, ts) AS rn
    FROM events WHERE event_type = 'signup') WHERE rn = 1) s
ON p.user_id = s.user_id
"""


@register(
    "any_join_verbatim_sql",
    _ANY_JOIN_ORACLE,
    survey_ref=(
        "S8 dialect: ClickHouse ANY LEFT JOIN runs verbatim — right side "
        "deduped to one row per key (deterministic min-struct pick) before "
        "a plain join"
    ),
)
def any_join_verbatim_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_clickhouse_spark.engine import AnalyticsEngine
    from binance_etl_clickhouse_spark.tables import register_views

    register_views(spark, sf_dir)
    return AnalyticsEngine(spark, verbose=False).sql(
        _ANY_JOIN_CH_SQL, dialect="clickhouse"
    )


# ---------------------------------------------------------------------------
# Verbatim MATERIALIZED VIEW round trip (r8): CREATE MATERIALIZED VIEW ...
# ENGINE = SummingMergeTree through the dialect, three insert blocks fired
# through the trigger (per-block partial aggregates in the view's storage),
# served state = merge-on-read collapse. The oracle replays the identical
# history as one global GROUP BY — equal because sum/count are additive
# over any block partition of the rows.
# ---------------------------------------------------------------------------
_MV_RT_BLOCKS: list[list[tuple[str, str, float]]] = [
    [("BTC", "2024-01-01 01:00:00", 1.5), ("BTC", "2024-01-01 02:00:00", 2.5)],
    [("BTC", "2024-01-01 03:00:00", 3.0), ("ETH", "2024-01-02 01:00:00", 5.0)],
    [("BTC", "2024-01-02 09:00:00", 7.0), ("ETH", "2024-01-02 10:00:00", 1.0)],
]


def _mv_rt_oracle() -> str:
    vals = ", ".join(
        f"('{s}', TIMESTAMP '{t}', {v})"
        for block in _MV_RT_BLOCKS
        for s, t, v in block
    )
    return f"""
    WITH history(symbol, ts, vol) AS (VALUES {vals})
    SELECT symbol, date_trunc('day', ts) AS day,
           round(sum(vol), 2)::DOUBLE AS vol, count(*)::BIGINT AS n
    FROM history GROUP BY symbol, day
    """


@register(
    "mv_verbatim_roundtrip",
    _mv_rt_oracle(),
    survey_ref=(
        "S8 DDL surface: CREATE MATERIALIZED VIEW ... SummingMergeTree runs "
        "verbatim — per-block insert trigger + merge-on-read collapse equals "
        "the global GROUP BY, value-hash oracled"
    ),
)
def mv_verbatim_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EAGER by nature (like ddl_verbatim_roundtrip): building it provisions
    scratch tables and replays the fixed insert history through the MV
    trigger; the returned frame is the view's served (merge-on-read) state.
    Input is the literal history — identical at every sf."""
    import tempfile

    from binance_etl_clickhouse_spark.engine import AnalyticsEngine

    eng = AnalyticsEngine(
        spark, verbose=False, ddl_root=tempfile.mkdtemp(prefix="mv_rt_")
    )
    eng.register_clickhouse_compat()
    eng.sql(
        """CREATE TABLE mvrt.klines (symbol String, ts DateTime, vol Float64)
        ENGINE = MergeTree ORDER BY (symbol, ts)""",
        dialect="clickhouse",
    )
    eng.sql(
        """CREATE MATERIALIZED VIEW mvrt.daily
        ENGINE = SummingMergeTree ORDER BY (symbol, day)
        AS SELECT symbol, toStartOfDay(ts) AS day,
                  round(sum(vol), 2) AS vol, count() AS n
        FROM mvrt.klines GROUP BY symbol, day""",
        dialect="clickhouse",
    )
    for block in _MV_RT_BLOCKS:
        eng.sql(
            "INSERT INTO mvrt.klines (symbol, ts, vol) VALUES",
            args=[
                {"symbol": s, "ts": pd.Timestamp(t), "vol": v}
                for s, t, v in block
            ],
            dialect="clickhouse",
        )
    return eng.sql(
        "SELECT symbol, day, vol, n FROM mvrt.daily", dialect="clickhouse"
    )


# ---------------------------------------------------------------------------
# Verbatim ARRAY JOIN clause (r8): ClickHouse's unnest clause runs unchanged
# through the dialect — rewritten into a LATERAL VIEW posexplode derived
# table aliased back to the FROM alias (dialect.py _rewrite_array_join).
# The query zips TWO items (the element plus arrayEnumerate's 1-based
# position), exactly the CH idiom, and aggregates over the unnested rows.
# Oracle: DuckDB's positional multi-unnest of the same shape. The ORDER BY
# (cnt DESC, word, lang) is a total order over the (lang, word) output
# keys, so the LIMIT cut is deterministic on both engines.
# Reference anchor: the delegated SQL surface (utils_clickhouse.py:36-43);
# capability extension beyond the reference's own queries.
# ---------------------------------------------------------------------------
_ARRAY_JOIN_CH_SQL = """
SELECT lang, w AS word, count() AS cnt, toInt64(min(i)) AS first_pos
FROM (SELECT lang, splitByChar(' ', text) AS words FROM documents) d
ARRAY JOIN words AS w, arrayEnumerate(words) AS i
WHERE length(w) >= 6
GROUP BY lang, w
ORDER BY cnt DESC, word, lang
LIMIT 100
"""

_ARRAY_JOIN_ORACLE = """
SELECT lang, w AS word, count(*) AS cnt, CAST(min(i) AS BIGINT) AS first_pos
FROM (
  SELECT lang, unnest(words) AS w, unnest(range(1, len(words) + 1)) AS i
  FROM (SELECT lang, string_split(text, ' ') AS words FROM documents) d0
) d
WHERE length(w) >= 6
GROUP BY lang, w
ORDER BY cnt DESC, word, lang
LIMIT 100
"""


@register(
    "array_join_verbatim_sql",
    _ARRAY_JOIN_ORACLE,
    survey_ref=(
        "S8 dialect: ClickHouse ARRAY JOIN clause runs verbatim — LATERAL "
        "VIEW posexplode derived table, positional multi-item zip with "
        "arrayEnumerate, oracled against DuckDB's positional multi-unnest"
    ),
)
def array_join_verbatim_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_clickhouse_spark.engine import AnalyticsEngine
    from binance_etl_clickhouse_spark.tables import register_views

    register_views(spark, sf_dir)
    eng = AnalyticsEngine(spark, verbose=False)
    eng.register_clickhouse_compat()
    return eng.sql(_ARRAY_JOIN_CH_SQL, dialect="clickhouse")


# ---------------------------------------------------------------------------
# Verbatim ORDER BY ... WITH FILL (r8): ClickHouse's gap-fill clause runs
# unchanged through the dialect — per-row lead() + exploded per-gap
# sequence with the step re-anchored at every original row (FillingTransform
# semantics), struct-pack blanking on generated rows, INTERPOLATE = LOCF
# (dialect.py _rewrite_with_fill). Hour-truncated keys step by exactly
# INTERVAL 1 HOUR, so the re-anchored fill equals the global hourly grid and
# a DuckDB generate_series spine + IGNORE NULLS window is an exact oracle.
# Reference anchor: the delegated SQL surface (utils_clickhouse.py:36-43);
# capability extension beyond the reference's own queries.
# ---------------------------------------------------------------------------
_WITH_FILL_CH_SQL = """
SELECT h, cnt, cnt AS cnt_locf
FROM (SELECT toStartOfHour(ts) AS h, count() AS cnt
      FROM events WHERE event_type = 'signup' GROUP BY h) hourly
ORDER BY h WITH FILL STEP INTERVAL 1 HOUR INTERPOLATE (cnt_locf)
"""

_WITH_FILL_ORACLE = """
WITH agg AS (
  SELECT date_trunc('hour', ts) AS h, count(*) AS cnt
  FROM events WHERE event_type = 'signup' GROUP BY 1
),
grid AS (
  SELECT unnest(generate_series((SELECT min(h) FROM agg),
                                (SELECT max(h) FROM agg),
                                INTERVAL 1 HOUR)) AS h
)
SELECT g.h AS h, a.cnt AS cnt,
       last_value(a.cnt IGNORE NULLS) OVER (
         ORDER BY g.h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS cnt_locf
FROM grid g LEFT JOIN agg a ON a.h = g.h
ORDER BY h
"""


@register(
    "with_fill_verbatim_sql",
    _WITH_FILL_ORACLE,
    survey_ref=(
        "S8 dialect: ClickHouse ORDER BY ... WITH FILL STEP INTERPOLATE "
        "runs verbatim — re-anchored per-gap sequence explode + struct-pack "
        "blanking + LOCF carry, oracled against a DuckDB grid spine"
    ),
)
def with_fill_verbatim_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_clickhouse_spark.engine import AnalyticsEngine
    from binance_etl_clickhouse_spark.tables import register_views

    register_views(spark, sf_dir)
    eng = AnalyticsEngine(spark, verbose=False)
    eng.register_clickhouse_compat()
    return eng.sql(_WITH_FILL_CH_SQL, dialect="clickhouse")


# ---------------------------------------------------------------------------
# Verbatim CREATE DICTIONARY + dictGet (r8): ClickHouse's RAM-dictionary
# lookup surface runs unchanged — CREATE DICTIONARY records key/attr/source
# metadata and every dictGet/dictHas call rewrites into a correlated
# aggregated scalar subquery that Catalyst plans as a BROADCAST left outer
# join (dialect_ddl.rewrite_dict_functions): the lookup distributes instead
# of pinning a hash table into every node's RAM. Keys are shifted (+20) so
# the query exercises both the hit path and the declared-DEFAULT miss path.
# Oracle: the equivalent DuckDB LEFT JOIN + coalesce.
# ---------------------------------------------------------------------------
_DICT_CH_DDL = """
CREATE DICTIONARY nation_dict (
    n_nationkey Int32,
    n_name String DEFAULT 'unknown',
    n_regionkey Int32
) PRIMARY KEY n_nationkey
SOURCE(CLICKHOUSE(TABLE 'nation'))
LAYOUT(HASHED())
LIFETIME(MIN 0 MAX 300)
"""

_DICT_CH_SQL = """
SELECT dictGet('nation_dict', 'n_name', c_nationkey + 20) AS nation,
       count() AS cnt,
       sum(toInt64(dictHas('nation_dict', c_nationkey + 20))) AS hits
FROM customer
GROUP BY nation
ORDER BY nation
"""

_DICT_ORACLE = """
SELECT coalesce(n.n_name, 'unknown') AS nation,
       count(*) AS cnt,
       CAST(sum(CAST(n.n_nationkey IS NOT NULL AS BIGINT)) AS BIGINT) AS hits
FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey + 20
GROUP BY nation
ORDER BY nation
"""


@register(
    "dictionary_verbatim_sql",
    _DICT_ORACLE,
    survey_ref=(
        "S8 DDL surface: CREATE DICTIONARY + dictGet/dictHas run verbatim "
        "— correlated aggregated lookup subqueries planned as broadcast "
        "left-outer joins, declared DEFAULT on miss, oracled against the "
        "equivalent DuckDB join"
    ),
)
def dictionary_verbatim_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EAGER at build like the other DDL round trips: building it registers
    the dictionary in a scratch catalog; the returned frame is plan-only."""
    import tempfile

    from binance_etl_clickhouse_spark.engine import AnalyticsEngine
    from binance_etl_clickhouse_spark.tables import register_views

    register_views(spark, sf_dir)
    eng = AnalyticsEngine(
        spark, verbose=False, ddl_root=tempfile.mkdtemp(prefix="dict_rt_")
    )
    eng.register_clickhouse_compat()
    eng.sql(_DICT_CH_DDL, dialect="clickhouse")
    return eng.sql(_DICT_CH_SQL, dialect="clickhouse")


# ---------------------------------------------------------------------------
# Verbatim sequenceMatch with (?t op N) TIME conditions (r8; == and
# multi-condition bands r9): the single-bound form rides the per-prefix
# earliest/latest completion-time DP; '(?t==N)' and '(?t>a)(?t<=b)' band
# gaps additionally track the feeding prefix's full completion-time SET
# (dialect.py _sequence_match_expr). The == / band columns run over
# hour-truncated timestamps so exact gaps actually occur in the data
# (raw event gaps are near-unique). Oracle: the direct EXISTS pair with
# the same constraint (a time gap permits any events between, so no
# interruption rule applies); the anchors sit in strictly earlier hour
# buckets, so same-bucket tie order cannot affect any column.
# ---------------------------------------------------------------------------
_SEQ_TIME_CH_SQL = """
SELECT user_id,
       sequenceMatch('(?1)(?t<=14400)(?2)')(ts, event_type = 'signup',
                                            event_type = 'click')
           AS matched,
       sequenceMatch('(?1)(?t==3600)(?2)')(toStartOfHour(ts),
                                           event_type = 'signup',
                                           event_type = 'click')
           AS matched_eq,
       sequenceMatch('(?1)(?t>3600)(?t<=10800)(?2)')(toStartOfHour(ts),
                                                     event_type = 'signup',
                                                     event_type = 'click')
           AS matched_band
FROM events GROUP BY user_id
"""

_SEQ_TIME_ORACLE = """
WITH e AS (SELECT user_id, ts, date_trunc('hour', ts) AS h, event_type
           FROM events)
SELECT u.user_id AS user_id,
       CAST(CASE WHEN EXISTS (
         SELECT 1 FROM e a, e b
         WHERE a.user_id = u.user_id AND b.user_id = u.user_id
           AND a.event_type = 'signup' AND b.event_type = 'click'
           AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 14400 SECOND
       ) THEN 1 ELSE 0 END AS INT) AS matched,
       CAST(CASE WHEN EXISTS (
         SELECT 1 FROM e a, e b
         WHERE a.user_id = u.user_id AND b.user_id = u.user_id
           AND a.event_type = 'signup' AND b.event_type = 'click'
           AND b.h = a.h + INTERVAL 3600 SECOND
       ) THEN 1 ELSE 0 END AS INT) AS matched_eq,
       CAST(CASE WHEN EXISTS (
         SELECT 1 FROM e a, e b
         WHERE a.user_id = u.user_id AND b.user_id = u.user_id
           AND a.event_type = 'signup' AND b.event_type = 'click'
           AND b.h > a.h + INTERVAL 3600 SECOND
           AND b.h <= a.h + INTERVAL 10800 SECOND
       ) THEN 1 ELSE 0 END AS INT) AS matched_band
FROM (SELECT DISTINCT user_id FROM e) u
"""


@register(
    "sequencematch_time_verbatim_sql",
    _SEQ_TIME_ORACLE,
    survey_ref=(
        "S8 dialect: sequenceMatch time-condition gaps run verbatim — "
        "(?t<=N) via the earliest/latest completion-time DP, (?t==N) and "
        "(?t>a)(?t<=b) bands via the completion-time set (r9), all "
        "oracled against direct EXISTS window pairs"
    ),
)
def sequencematch_time_verbatim_sql(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from binance_etl_clickhouse_spark.engine import AnalyticsEngine
    from binance_etl_clickhouse_spark.tables import register_views

    register_views(spark, sf_dir)
    eng = AnalyticsEngine(spark, verbose=False)
    eng.register_clickhouse_compat()  # toStartOfHour shim
    return eng.sql(_SEQ_TIME_CH_SQL, dialect="clickhouse")


# ---------------------------------------------------------------------------
# Verbatim WITH FILL with a SORTING PREFIX (r9): per-group independent
# gap fill — ClickHouse's use_with_fill_by_sorting_prefix semantics — as
# a registered query. Per order-priority, the month-index series of order
# counts fills its gaps with NULL-count rows; each priority group fills
# between ITS OWN min and max month only (a global fill would bridge
# group boundaries). Oracle: per-group generate_series spine LEFT JOINed
# back — the direct relational statement of the same semantics.
# ---------------------------------------------------------------------------
_WFP_CH_SQL = """
SELECT prio, mi, cnt FROM (
  SELECT o_orderpriority AS prio,
         toInt64(toYear(o_orderdate) * 12 + toMonth(o_orderdate)) AS mi,
         count() AS cnt
  FROM orders GROUP BY prio, mi
) ORDER BY prio, mi WITH FILL
"""

_WFP_ORACLE = """
WITH base AS (
  SELECT o_orderpriority AS prio,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS mi,
         count(*)::BIGINT AS cnt
  FROM orders GROUP BY 1, 2
),
bounds AS (SELECT prio, min(mi) AS lo, max(mi) AS hi FROM base GROUP BY prio),
spine AS (SELECT prio, unnest(range(lo, hi + 1)) AS mi FROM bounds)
SELECT s.prio AS prio, CAST(s.mi AS BIGINT) AS mi, b.cnt AS cnt
FROM spine s LEFT JOIN base b ON s.prio = b.prio AND s.mi = b.mi
"""


@register(
    "with_fill_prefix_verbatim_sql",
    _WFP_ORACLE,
    survey_ref=(
        "S8 dialect (r9): ORDER BY <prefix>, x WITH FILL runs verbatim — "
        "per-sorting-prefix independent gap fill (partitioned windows, "
        "prefix keys carried into generated rows), oracled against the "
        "per-group generate_series spine"
    ),
)
def with_fill_prefix_verbatim_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_clickhouse_spark.engine import AnalyticsEngine
    from binance_etl_clickhouse_spark.tables import register_views

    register_views(spark, sf_dir)
    eng = AnalyticsEngine(spark, verbose=False)
    eng.register_clickhouse_compat()
    return eng.sql(_WFP_CH_SQL, dialect="clickhouse")


# ---------------------------------------------------------------------------
# Verbatim plain CREATE VIEW (r9): the query-time macro view surface as a
# registered query — create a view over `orders` through the dialect,
# then read THROUGH the view (the returned frame selects from the view
# name, so the driver hash covers registration + re-analysis + read).
# ---------------------------------------------------------------------------
_PLAIN_VIEW_ORACLE = """
SELECT o_orderpriority AS prio,
       count(*)::BIGINT AS n,
       round(avg(o_totalprice), 4) AS avg_price
FROM orders WHERE o_orderstatus = 'F'
GROUP BY prio
"""


@register(
    "plain_view_verbatim_sql",
    _PLAIN_VIEW_ORACLE,
    survey_ref=(
        "S8 DDL surface (r9): plain CREATE VIEW runs verbatim — "
        "query-time macro registered and read through the dialect, "
        "value-hash oracled against the inlined SELECT"
    ),
)
def plain_view_verbatim_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EAGER like the other DDL round trips: building it creates the view
    in a scratch catalog; the returned frame reads THROUGH it."""
    import tempfile

    from binance_etl_clickhouse_spark.engine import AnalyticsEngine
    from binance_etl_clickhouse_spark.tables import register_views

    register_views(spark, sf_dir)
    eng = AnalyticsEngine(
        spark, verbose=False, ddl_root=tempfile.mkdtemp(prefix="pview_rt_")
    )
    eng.register_clickhouse_compat()
    eng.sql(
        """CREATE OR REPLACE VIEW finished_orders AS
        SELECT o_orderpriority AS prio, o_totalprice
        FROM orders WHERE o_orderstatus = 'F'""",
        dialect="clickhouse",
    )
    return eng.sql(
        """SELECT prio, count() AS n,
                  round(avg(o_totalprice), 4) AS avg_price
        FROM finished_orders GROUP BY prio""",
        dialect="clickhouse",
    )


# ---------------------------------------------------------------------------
# Verbatim PREWHERE + WHERE (r11, r10 verdict item 2): ClickHouse's most
# common hand-optimization — PREWHERE p WHERE w, conditions ANDed — runs
# verbatim through the dialect (merged into ONE WHERE; previously emitted
# the invalid double-WHERE). FINAL + GROUP BY ride along so the merge is
# exercised in its real clause neighborhood.
# Reference anchor: the delegated SQL surface (app/src/utils_clickhouse.py:
# 36-43) accepts arbitrary hand-written ClickHouse queries.
# ---------------------------------------------------------------------------
_PREWHERE_WHERE_ORACLE = """
SELECT o_orderpriority AS prio,
       count(*)::BIGINT AS n,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
WHERE o_totalprice > 1000 AND o_orderstatus = 'F'
GROUP BY prio
"""


@register(
    "prewhere_where_verbatim_sql",
    _PREWHERE_WHERE_ORACLE,
    survey_ref=(
        "S8 dialect (r11): PREWHERE p WHERE w (valid ClickHouse — the "
        "conditions AND together) runs verbatim, merged into one WHERE "
        "per SELECT scope; with FINAL and GROUP BY in the same statement"
    ),
)
def prewhere_where_verbatim_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_clickhouse_spark.engine import AnalyticsEngine
    from binance_etl_clickhouse_spark.tables import register_views

    register_views(spark, sf_dir)
    eng = AnalyticsEngine(spark, verbose=False)
    eng.register_clickhouse_compat()
    return eng.sql(
        """SELECT o_orderpriority AS prio, count() AS n,
                  round(sum(o_totalprice), 2) AS total_price
        FROM orders FINAL
        PREWHERE o_totalprice > 1000
        WHERE o_orderstatus = 'F'
        GROUP BY prio""",
        dialect="clickhouse",
    )


# ---------------------------------------------------------------------------
# Verbatim CTE + nested SETTINGS (r11, r10 verdict item 7): the next
# highest-frequency real-migration shape after PREWHERE — WITH ... AS
# (SELECT ... SETTINGS ...) with a trailing statement-level SETTINGS,
# PREWHERE inside the CTE body, and a dim join on the outer SELECT. The
# SETTINGS tails strip per scope (each parenthesized subquery recurses
# through the translator), never eating a join or group key.
# ---------------------------------------------------------------------------
_CTE_SETTINGS_ORACLE = """
SELECT c_mktsegment AS seg,
       count(*)::BIGINT AS n,
       round(avg(o_totalprice), 4) AS avg_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderstatus = 'O'
GROUP BY seg
"""


@register(
    "cte_settings_verbatim_sql",
    _CTE_SETTINGS_ORACLE,
    survey_ref=(
        "S8 dialect (r11): WITH <name> AS (SELECT ... SETTINGS ...) CTE "
        "+ statement-level SETTINGS tail + PREWHERE inside the CTE body "
        "run verbatim — per-scope clause strips through subquery "
        "recursion"
    ),
)
def cte_settings_verbatim_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_clickhouse_spark.engine import AnalyticsEngine
    from binance_etl_clickhouse_spark.tables import register_views

    register_views(spark, sf_dir)
    eng = AnalyticsEngine(spark, verbose=False)
    eng.register_clickhouse_compat()
    return eng.sql(
        """WITH open_orders AS (
            SELECT o_custkey, o_totalprice
            FROM orders
            PREWHERE o_orderstatus = 'O'
            SETTINGS max_threads = 8
        )
        SELECT c.c_mktsegment AS seg, count() AS n,
               round(avg(f.o_totalprice), 4) AS avg_price
        FROM open_orders f
        INNER JOIN customer c ON f.o_custkey = c.c_custkey
        GROUP BY seg
        SETTINGS max_memory_usage = 100000000""",
        dialect="clickhouse",
    )


# ---------------------------------------------------------------------------
# Verbatim bracket subscripts (r11): ClickHouse array subscripts are
# 1-BASED with negative-from-end — Spark's native a[i] is 0-based, so the
# dialect rewrites base[i] -> try_element_at(base, i) (and [a, b]
# literals -> array()). Before this pass the bracket passed through and
# returned the WRONG ELEMENT silently. DuckDB's list indexing is 1-based
# with negative-from-end too, so the oracle spells the same brackets.
# ---------------------------------------------------------------------------
_BRACKET_ORACLE = """
SELECT vec_id,
       round(embedding[1]::DOUBLE, 6) AS e_first,
       round(embedding[-1]::DOUBLE, 6) AS e_last
FROM embeddings
WHERE (vec_id % 20) = 0
"""


@register(
    "bracket_subscript_verbatim_sql",
    _BRACKET_ORACLE,
    survey_ref=(
        "S8 dialect (r11): bracket array subscripts run verbatim with the "
        "ClickHouse 1-based/negative-from-end contract (base[i] -> "
        "try_element_at) — previously Spark's 0-based subscript returned "
        "the wrong element silently"
    ),
)
def bracket_subscript_verbatim_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_clickhouse_spark.engine import AnalyticsEngine
    from binance_etl_clickhouse_spark.tables import register_views

    register_views(spark, sf_dir)
    eng = AnalyticsEngine(spark, verbose=False)
    eng.register_clickhouse_compat()
    return eng.sql(
        """SELECT vec_id,
                  round(toFloat64(embedding[1]), 6) AS e_first,
                  round(toFloat64(embedding[-1]), 6) AS e_last
        FROM embeddings WHERE (vec_id % 20) = 0""",
        dialect="clickhouse",
    )


# ---------------------------------------------------------------------------
# AggregatingMergeTree round trip (r11): the classic CH two-stage pattern —
# AggregateFunction(f, T) columns, partial-state blocks via INSERT SELECT
# ... fooState(...) GROUP BY, finals via fooMerge(...) GROUP BY. States are
# transparent partials here (value / (sum,count) struct / array), the
# read-side collapse merges per key, and the -Merge read must equal the
# oracle's ONE-SHOT aggregation over the same rows.
# ---------------------------------------------------------------------------
_AGG_MT_ORACLE = """
SELECT o_orderpriority AS prio,
       count(*)::BIGINT AS n,
       round(sum(o_totalprice), 2) AS total,
       round(avg(o_totalprice), 4) AS avg_price
FROM orders
GROUP BY prio
"""


@register(
    "aggregating_mt_roundtrip",
    _AGG_MT_ORACLE,
    survey_ref=(
        "K5/S8 (r11): ENGINE = AggregatingMergeTree + AggregateFunction "
        "columns — two partial-state INSERT SELECT blocks, -Merge read "
        "equals the one-shot aggregation (driver hash-checked)"
    ),
)
def aggregating_mt_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from binance_etl_clickhouse_spark.engine import AnalyticsEngine
    from binance_etl_clickhouse_spark.tables import register_views

    register_views(spark, sf_dir)
    eng = AnalyticsEngine(
        spark, verbose=False, ddl_root=tempfile.mkdtemp(prefix="aggmt_rt_")
    )
    eng.register_clickhouse_compat()
    eng.sql(
        """CREATE TABLE agg_prio (
            prio String,
            n AggregateFunction(count, UInt64),
            total AggregateFunction(sum, Float64),
            avg_price AggregateFunction(avg, Float64)
        ) ENGINE = AggregatingMergeTree ORDER BY (prio)""",
        dialect="clickhouse",
    )
    for pred in ("o_orderkey % 2 = 0", "o_orderkey % 2 = 1"):
        eng.sql(
            f"""INSERT INTO agg_prio
            SELECT o_orderpriority AS prio,
                   countState(o_totalprice) AS n,
                   sumState(o_totalprice) AS total,
                   avgState(o_totalprice) AS avg_price
            FROM orders WHERE {pred} GROUP BY prio""",
            dialect="clickhouse",
        )
    return eng.sql(
        """SELECT prio, countMerge(n) AS n,
                  round(sumMerge(total), 2) AS total,
                  round(avgMerge(avg_price), 4) AS avg_price
        FROM agg_prio GROUP BY prio""",
        dialect="clickhouse",
    )
