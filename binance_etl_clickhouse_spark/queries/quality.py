"""Data-quality expectation queries (dbt-test / Deequ-style checks).

Training-data-pipeline extension (the reference validates only
mechanically — response-schema asserts in ``utils_clickhouse.py`` — with
no declarative data-quality layer): every production ingest gates on
expectation suites — value-range rules, key uniqueness, referential
integrity, freshness — and at 100 TB each check must be a single scan
with map-side partial aggregation, never a per-rule pass.

Scale notes:
- ``dq_expectations_lineitem``: ALL rules evaluate in ONE scan — each rule
  is a 0/1 conditional aggregate column, and the per-rule output rows come
  from unpivoting the 1-row aggregate (a driver-free constant-sized
  ``stack``), not from re-scanning per rule.
- ``dq_referential_orphans``: each FK edge is a LEFT JOIN + null-count —
  the dimension side is broadcastable; counting nulls instead of
  anti-join-then-count folds existence-check and metric into one
  aggregate and never materializes the orphan rows.
- ``dq_uniqueness_keys``: per-table key profile via count vs count
  distinct in one partial-aggregated pass per table; the per-table 1-row
  results union into the report frame (constant rows, no shuffle).
- ``dq_freshness_event_types``: per-type max(ts) is a tiny frame; the
  global-max anchor joins back as an explicit 1-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.queries.registry import register
from binance_etl_clickhouse_spark.tables import load_table as _t

# --------------------------------------------------------------------------
# Value-range / not-null / accepted-values expectations over lineitem
# --------------------------------------------------------------------------
#: rule name -> Spark boolean expression (violation = NOT rule)
_LINEITEM_RULES: dict[str, str] = {
    "quantity_in_1_50": "l_quantity >= 1 AND l_quantity <= 50",
    "extendedprice_positive": "l_extendedprice > 0",
    "discount_in_0_1": "l_discount >= 0 AND l_discount <= 1",
    "tax_nonnegative": "l_tax >= 0",
    "returnflag_accepted": "l_returnflag IN ('A', 'N', 'R')",
    "linestatus_accepted": "l_linestatus IN ('O', 'F')",
    "shipdate_not_null": "l_shipdate IS NOT NULL",
    "linenumber_in_1_7": "l_linenumber >= 1 AND l_linenumber <= 7",
}


@register(
    "dq_expectations_lineitem",
    "\nUNION ALL\n".join(
        f"""SELECT '{rule}' AS rule,
           sum(CASE WHEN NOT ({cond}) OR ({cond}) IS NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_violations,
           round(sum(CASE WHEN NOT ({cond}) OR ({cond}) IS NULL THEN 1 ELSE 0 END)
                 / count(*)::DOUBLE, 6) AS violation_rate
    FROM lineitem"""
        for rule, cond in _LINEITEM_RULES.items()
    ),
    survey_ref="data quality: declarative expectation suite, one-scan conditional aggregates",
)
def dq_expectations_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # one scan: each rule is a conditional-agg column; NULL rule results
    # (null inputs) count as violations, matching dbt/Deequ semantics
    aggs = [
        F.sum(
            F.when(F.expr(cond).isNull() | ~F.expr(cond), 1).otherwise(0)
        ).cast("long").alias(f"v_{i}")
        for i, cond in enumerate(_LINEITEM_RULES.values())
    ]
    one = li.agg(F.count("*").alias("n"), *aggs)
    stack_args = ", ".join(
        f"'{rule}', v_{i}" for i, rule in enumerate(_LINEITEM_RULES)
    )
    return one.select(
        F.expr(
            f"stack({len(_LINEITEM_RULES)}, {stack_args}) AS (rule, n_violations)"
        ),
        F.col("n"),
    ).select(
        "rule",
        "n_violations",
        F.round(F.col("n_violations") / F.col("n").cast("double"), 6).alias(
            "violation_rate"
        ),
    )


# --------------------------------------------------------------------------
# Referential integrity: orphan counts per FK edge
# --------------------------------------------------------------------------
_FK_EDGES = [
    # (name, child table, child key, parent table, parent key)
    ("lineitem_orderkey_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem_partkey_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem_suppkey_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders_custkey_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer_nationkey_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
]


@register(
    "dq_referential_orphans",
    "\nUNION ALL\n".join(
        f"""SELECT '{name}' AS fk, count(*)::BIGINT AS n_child_rows,
           sum(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_orphans
    FROM {child} c LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p
      ON c.{ck} = p.{pk}"""
        for name, child, ck, parent, pk in _FK_EDGES
    ),
    survey_ref="data quality: referential-integrity orphan counts (broadcast dim left joins)",
)
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = []
    for name, child, ck, parent, pk in _FK_EDGES:
        c = _t(spark, sf_dir, child)
        p = _t(spark, sf_dir, parent).select(pk).distinct()
        frames.append(
            c.join(F.broadcast(p), c[ck] == p[pk], "left").agg(
                F.lit(name).alias("fk"),
                F.count("*").cast("long").alias("n_child_rows"),
                F.sum(F.when(p[pk].isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_orphans"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


# --------------------------------------------------------------------------
# Key uniqueness profile per table
# --------------------------------------------------------------------------
_KEYS = [
    ("part", "p_partkey"),
    ("supplier", "s_suppkey"),
    ("customer", "c_custkey"),
    ("orders", "o_orderkey"),
    ("events", "event_id"),
    ("documents", "doc_id"),
]


@register(
    "dq_uniqueness_keys",
    "\nUNION ALL\n".join(
        f"""SELECT '{table}' AS tbl, '{key}' AS key_col,
           count(*)::BIGINT AS n_rows,
           count(DISTINCT {key})::BIGINT AS n_distinct,
           (count(*) - count(DISTINCT {key}))::BIGINT AS n_dup_rows
    FROM {table}"""
        for table, key in _KEYS
    ),
    survey_ref="data quality: primary-key uniqueness profile (one partial-agg pass per table)",
)
def dq_uniqueness_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = []
    for table, key in _KEYS:
        frames.append(
            _t(spark, sf_dir, table).agg(
                F.lit(table).alias("tbl"),
                F.lit(key).alias("key_col"),
                F.count("*").cast("long").alias("n_rows"),
                F.countDistinct(key).cast("long").alias("n_distinct"),
                (F.count("*") - F.countDistinct(key))
                .cast("long")
                .alias("n_dup_rows"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


# --------------------------------------------------------------------------
# Freshness: per-event-type lag behind the newest event
# --------------------------------------------------------------------------
@register(
    "dq_freshness_event_types",
    """
    WITH per AS (
      SELECT event_type, max(ts) AS latest, count(*)::BIGINT AS n_events
      FROM events GROUP BY event_type
    ),
    anchor AS (SELECT max(latest) AS global_latest FROM per)
    SELECT event_type, latest, n_events,
           ((epoch_ms(global_latest) - epoch_ms(latest)) // 60000)::BIGINT
             AS lag_minutes
    FROM per CROSS JOIN anchor
    """,
    survey_ref="data quality: per-source freshness lag vs the newest event (1-row broadcast anchor)",
)
def dq_freshness_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.max("ts").alias("latest"),
            F.count("*").cast("long").alias("n_events"),
        )
    )
    anchor = per.agg(F.max("latest").alias("global_latest"))
    return per.crossJoin(F.broadcast(anchor)).select(
        "event_type",
        "latest",
        "n_events",
        F.floor(
            (F.unix_millis("global_latest") - F.unix_millis("latest"))
            / F.lit(60000)
        )
        .cast("long")
        .alias("lag_minutes"),
    )


# --------------------------------------------------------------------------
# Numeric profile: pairwise Pearson correlation matrix in ONE scan
# --------------------------------------------------------------------------
_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_CORR_PAIRS = [
    (a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1 :]
]


def _corr_oracle() -> str:
    moments = ["count(*)::DOUBLE AS n"]
    for c in _CORR_COLS:
        moments += [f"sum({c}) AS s_{c}", f"sum({c} * {c}) AS ss_{c}"]
    for a, b in _CORR_PAIRS:
        moments.append(f"sum({a} * {b}) AS sp_{a}_{b}")
    rows = []
    for a, b in _CORR_PAIRS:
        rows.append(
            f"""SELECT '{a}' AS col_x, '{b}' AS col_y,
           round((sp_{a}_{b} - s_{a} * s_{b} / n)
                 / nullif(sqrt((ss_{a} - s_{a} * s_{a} / n)
                               * (ss_{b} - s_{b} * s_{b} / n)), 0), 6) AS corr
    FROM m"""
        )
    body = "\nUNION ALL\n".join(rows)
    return f"""
    WITH m AS (SELECT {", ".join(moments)} FROM lineitem)
    {body}
    """


@register(
    "profile_numeric_correlations",
    _corr_oracle(),
    survey_ref="data quality: pairwise Pearson correlation matrix from one-scan moment sums",
)
def profile_numeric_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairwise correlations from ONE partial-aggregated scan: the
    2d + d(d-1)/2 moment sums reduce map-side (row-count-independent
    driver traffic), and the d(d-1)/2 output rows unpivot from the 1-row
    moment frame — the same formula text as the oracle, so both engines
    evaluate identical arithmetic (ANSI corr() would throw on a
    zero-variance column; the explicit form null-guards it)."""
    li = _t(spark, sf_dir, "lineitem")
    aggs = [F.count("*").cast("double").alias("n")]
    for c in _CORR_COLS:
        aggs += [
            F.sum(c).alias(f"s_{c}"),
            F.sum(F.col(c) * F.col(c)).alias(f"ss_{c}"),
        ]
    for a, b in _CORR_PAIRS:
        aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"sp_{a}_{b}"))
    m = li.agg(*aggs)
    outs = []
    for a, b in _CORR_PAIRS:
        num = F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}") / F.col("n")
        den = F.sqrt(
            (F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}") / F.col("n"))
            * (F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}") / F.col("n"))
        )
        outs.append(
            m.select(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                F.round(num / F.when(den != 0, den), 6).alias("corr"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ---------------------------------------------------------------------------
# Population-stability-index drift between two document sources: the
# monitoring statistic a continuously-ingesting corpus pipeline tracks to
# detect a source's length/quality distribution shifting release-to-release
# (PSI > 0.25 ≈ "retrain/investigate" in the scorecard tradition).
# PSI = Σ (p_b − q_b) · ln(p_b / q_b) over fixed n_chars bins, with
# +0.5 Laplace smoothing per bin so empty bins stay finite and the
# statistic is symmetric-in-smoothing across both sources.
# One scan, two conditional aggregates per bin — never a per-source pass.
# ---------------------------------------------------------------------------
_PSI_BIN = 100  # n_chars bin width
_PSI_A, _PSI_B = "src0", "src1"  # deterministic source pair


@register(
    "psi_source_drift",
    f"""
    WITH binned AS (
      SELECT CAST(floor(n_chars / {_PSI_BIN}) AS BIGINT) AS bin,
             count(CASE WHEN source = '{_PSI_A}' THEN 1 END)::BIGINT AS n_a,
             count(CASE WHEN source = '{_PSI_B}' THEN 1 END)::BIGINT AS n_b
      FROM documents
      WHERE source IN ('{_PSI_A}', '{_PSI_B}')
      GROUP BY 1
    ),
    tot AS (
      SELECT sum(n_a) AS ta, sum(n_b) AS tb, count(*) AS nb FROM binned
    ),
    probs AS (
      SELECT bin, n_a, n_b,
             (n_a + 0.5) / (t.ta + 0.5 * t.nb) AS p,
             (n_b + 0.5) / (t.tb + 0.5 * t.nb) AS q
      FROM binned, tot t
    )
    SELECT bin, n_a, n_b,
           round((p - q) * ln(p / q), 6) AS psi_contrib
    FROM probs
    """,
    survey_ref="data quality: population-stability-index drift between sources (per-bin contributions, one scan)",
)
def psi_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(
        F.col("source").isin(_PSI_A, _PSI_B)
    )
    binned = docs.groupBy(
        F.floor(F.col("n_chars") / _PSI_BIN).cast("long").alias("bin")
    ).agg(
        F.count(F.when(F.col("source") == _PSI_A, 1)).cast("long").alias("n_a"),
        F.count(F.when(F.col("source") == _PSI_B, 1)).cast("long").alias("n_b"),
    )
    tot = binned.agg(
        F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb"), F.count(F.lit(1)).alias("nb")
    )
    p = (F.col("n_a") + 0.5) / (F.col("ta") + 0.5 * F.col("nb"))
    q = (F.col("n_b") + 0.5) / (F.col("tb") + 0.5 * F.col("nb"))
    return binned.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_a",
        "n_b",
        F.round((p - q) * F.log(p / q), 6).alias("psi_contrib"),
    )
