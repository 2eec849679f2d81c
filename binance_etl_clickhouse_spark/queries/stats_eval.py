"""Statistical testing, drift/changepoint detection, and model-eval shapes.

Training-data-pipeline extension (the reference computes no inferential
statistics — its aggregation surface ends at ClickHouse GROUP BY,
``crypto_data_pipeline_clickhouse.py:326-333``): A/B tests, independence
tests, sequential changepoint detection and score-calibration audits are
the standard quality-monitoring layer on top of a large event/corpus
pipeline.

Scale notes (100 TB lens):
- Every query reduces the raw table with a partial-aggregatable groupBy
  FIRST; windows/joins then run over the aggregated domain (event types x
  days/hours, 20 sources, 10 score bins) — never over raw rows.
- ``cusum_changepoint_daily`` computes the recursive CUSUM
  ``S_i = max(0, S_{i-1} + d_i)`` *without* a sequential scan, via the
  prefix-sum identity ``S_i = P_i - min(0, min_{j<=i} P_j)`` — two ordered
  window passes per event_type partition, embarrassingly parallel across
  types.
- ``source_budget_waterfill`` solves ``sum_s min(c_s, T) = B`` for the
  uniform cap T with one ordered window over the per-source aggregate
  (|sources| rows): the first ascending index where the candidate cap
  ``(B - cum_prev)/remaining`` drops to or below the source's own count is
  the exact water level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.queries.registry import register
from binance_etl_clickhouse_spark.tables import load_table as _t

# --------------------------------------------------------------------------
# Chi-square independence: event_type x user cohort
# --------------------------------------------------------------------------


@register(
    "chi2_event_cohort_independence",
    """
    WITH cells AS (
      SELECT event_type, user_id % 2 AS cohort, count(*)::DOUBLE AS obs
      FROM events GROUP BY 1, 2
    ),
    rows_ AS (SELECT event_type, sum(obs) AS row_tot FROM cells GROUP BY 1),
    cols_ AS (SELECT cohort, sum(obs) AS col_tot FROM cells GROUP BY 1),
    tot AS (SELECT sum(obs) AS n FROM cells)
    SELECT round(sum(pow(c.obs - r.row_tot * co.col_tot / t.n, 2)
                     / (r.row_tot * co.col_tot / t.n)), 6) AS chi2,
           CAST((count(DISTINCT c.event_type) - 1)
                * (count(DISTINCT c.cohort) - 1) AS BIGINT) AS dof
    FROM cells c
    JOIN rows_ r ON r.event_type = c.event_type
    JOIN cols_ co ON co.cohort = c.cohort
    CROSS JOIN tot t
    """,
    survey_ref="chi-square independence test over a contingency aggregate",
)
def chi2_event_cohort_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", (F.col("user_id") % 2).alias("cohort")
    ).agg(F.count("*").cast("double").alias("obs"))
    rows = cells.groupBy("event_type").agg(F.sum("obs").alias("row_tot"))
    cols = cells.groupBy("cohort").agg(F.sum("obs").alias("col_tot"))
    tot = cells.agg(F.sum("obs").alias("n"))
    exp = F.col("row_tot") * F.col("col_tot") / F.col("n")
    return (
        cells.join(F.broadcast(rows), "event_type")
        .join(F.broadcast(cols), "cohort")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.round(F.sum(F.pow(F.col("obs") - exp, 2) / exp), 6).alias("chi2"),
            (
                (F.countDistinct("event_type") - 1) * (F.countDistinct("cohort") - 1)
            )
            .cast("long")
            .alias("dof"),
        )
    )


# --------------------------------------------------------------------------
# Two-proportion z-test: click->purchase conversion, cohort A vs B
# --------------------------------------------------------------------------


@register(
    "ab_conversion_ztest",
    """
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS cohort,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id
    ),
    per_cohort AS (
      SELECT cohort, count(*)::DOUBLE AS n, sum(converted)::DOUBLE AS x
      FROM per_user GROUP BY cohort
    ),
    wide AS (
      SELECT max(CASE WHEN cohort = 0 THEN n END) AS n_a,
             max(CASE WHEN cohort = 0 THEN x END) AS x_a,
             max(CASE WHEN cohort = 1 THEN n END) AS n_b,
             max(CASE WHEN cohort = 1 THEN x END) AS x_b
      FROM per_cohort
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(x_a AS BIGINT) AS x_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(x_b AS BIGINT) AS x_b,
           round(x_a / n_a, 6) AS p_a,
           round(x_b / n_b, 6) AS p_b,
           CASE WHEN x_a + x_b > 0 AND x_a + x_b < n_a + n_b THEN
             round((x_a / n_a - x_b / n_b)
                   / sqrt(((x_a + x_b) / (n_a + n_b))
                          * (1 - (x_a + x_b) / (n_a + n_b))
                          * (1 / n_a + 1 / n_b)), 6)
           END AS z_stat
    FROM wide
    """,
    survey_ref="two-proportion z-test (A/B conversion, pooled SE)",
)
def ab_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "converted"
        )
    )
    per_cohort = per_user.groupBy((F.col("user_id") % 2).alias("cohort")).agg(
        F.count("*").cast("double").alias("n"),
        F.sum("converted").cast("double").alias("x"),
    )
    wide = per_cohort.agg(
        F.max(F.when(F.col("cohort") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("cohort") == 0, F.col("x"))).alias("x_a"),
        F.max(F.when(F.col("cohort") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("cohort") == 1, F.col("x"))).alias("x_b"),
    )
    p_pool = (F.col("x_a") + F.col("x_b")) / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(p_pool * (1 - p_pool) * (1 / F.col("n_a") + 1 / F.col("n_b")))
    x_tot = F.col("x_a") + F.col("x_b")
    # SE degenerates to 0 when every user (or none) converted — the
    # conditional keeps ANSI division happy and both engines emit NULL there
    guarded_z = F.when(
        (x_tot > 0) & (x_tot < F.col("n_a") + F.col("n_b")),
        F.round(
            (F.col("x_a") / F.col("n_a") - F.col("x_b") / F.col("n_b")) / se, 6
        ),
    )
    return wide.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("x_a").cast("long").alias("x_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("x_b").cast("long").alias("x_b"),
        F.round(F.col("x_a") / F.col("n_a"), 6).alias("p_a"),
        F.round(F.col("x_b") / F.col("n_b"), 6).alias("p_b"),
        guarded_z.alias("z_stat"),
    )


# --------------------------------------------------------------------------
# CUSUM changepoint over daily event counts
# --------------------------------------------------------------------------
_CUSUM_K_STD = 0.5  # slack, in per-type count-stddevs
_CUSUM_H_STD = 4.0  # alarm threshold, in per-type count-stddevs


@register(
    "cusum_changepoint_daily",
    f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day, count(*)::DOUBLE AS cnt
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type, day, cnt,
             avg(cnt) OVER (PARTITION BY event_type) AS mu,
             stddev_samp(cnt) OVER (PARTITION BY event_type) AS sd
      FROM daily
    ),
    pref AS (
      SELECT event_type, day, cnt, sd,
             sum(cnt - mu - {_CUSUM_K_STD} * sd) OVER w AS p
      FROM stats
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day,
           round(p - least(0, min(p) OVER w), 6) AS cusum,
           (p - least(0, min(p) OVER w)) > {_CUSUM_H_STD} * sd AS alarm
    FROM pref
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    survey_ref="CUSUM changepoint detection (prefix-sum identity, no sequential scan)",
)
def cusum_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").cast("double").alias("cnt"))
    per_type = Window.partitionBy("event_type")
    stats = daily.select(
        "event_type",
        "day",
        "cnt",
        F.avg("cnt").over(per_type).alias("mu"),
        F.stddev_samp("cnt").over(per_type).alias("sd"),
    )
    run = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pref = stats.select(
        "event_type",
        "day",
        "sd",
        F.sum(F.col("cnt") - F.col("mu") - _CUSUM_K_STD * F.col("sd"))
        .over(run)
        .alias("p"),
    )
    cusum = F.col("p") - F.least(F.lit(0.0), F.min("p").over(run))
    return pref.select(
        "event_type",
        "day",
        F.round(cusum, 6).alias("cusum"),
        (cusum > _CUSUM_H_STD * F.col("sd")).alias("alarm"),
    )


# --------------------------------------------------------------------------
# Score calibration (reliability diagram) over embedding-derived scores
# --------------------------------------------------------------------------
_CAL_BINS = 10


@register(
    "score_calibration_bins",
    f"""
    WITH scored AS (
      SELECT 1.0 / (1.0 + exp(-3.0 * embedding[1]::DOUBLE)) AS score,
             label % 2 AS pos
      FROM embeddings
    )
    SELECT CAST(least(floor(score * {_CAL_BINS}), {_CAL_BINS} - 1) AS INT) AS bin,
           count(*)::BIGINT AS n,
           round(avg(score), 6) AS mean_score,
           round(avg(pos::DOUBLE), 6) AS frac_positive
    FROM scored
    GROUP BY 1
    """,
    survey_ref="model-calibration reliability bins (fixed-width, no global sort)",
)
def score_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    score = 1.0 / (1.0 + F.exp(-3.0 * F.col("embedding")[0].cast("double")))
    scored = emb.select(
        score.alias("score"), (F.col("label") % 2).alias("pos")
    )
    bin_ = F.least(
        F.floor(F.col("score") * _CAL_BINS), F.lit(_CAL_BINS - 1)
    ).cast("int")
    return scored.groupBy(bin_.alias("bin")).agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.avg("score"), 6).alias("mean_score"),
        F.round(F.avg(F.col("pos").cast("double")), 6).alias("frac_positive"),
    )


# --------------------------------------------------------------------------
# Seasonal (hour-of-day) profile anomalies
# --------------------------------------------------------------------------
_SEAS_Z = 2.0


@register(
    "seasonal_hourly_anomaly",
    f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(extract(hour FROM ts) AS INT) AS hour, count(*)::DOUBLE AS cnt
      FROM events GROUP BY 1, 2, 3
    ),
    prof AS (
      SELECT event_type, day, hour, cnt,
             avg(cnt) OVER w AS mu, stddev_samp(cnt) OVER w AS sd
      FROM hourly
      WINDOW w AS (PARTITION BY event_type, hour)
    )
    SELECT event_type, day, hour, CAST(cnt AS BIGINT) AS cnt,
           round((cnt - mu) / sd, 6) AS z
    FROM prof
    WHERE sd > 0 AND abs((cnt - mu) / sd) > {_SEAS_Z}
    """,
    survey_ref="seasonal hour-of-day profile anomalies (z vs per-slot profile)",
)
def seasonal_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.hour("ts").alias("hour"),
    ).agg(F.count("*").cast("double").alias("cnt"))
    w = Window.partitionBy("event_type", "hour")
    prof = hourly.select(
        "event_type",
        "day",
        "hour",
        "cnt",
        F.avg("cnt").over(w).alias("mu"),
        F.stddev_samp("cnt").over(w).alias("sd"),
    )
    z = (F.col("cnt") - F.col("mu")) / F.col("sd")
    return prof.filter((F.col("sd") > 0) & (F.abs(z) > _SEAS_Z)).select(
        "event_type",
        "day",
        "hour",
        F.col("cnt").cast("long").alias("cnt"),
        F.round(z, 6).alias("z"),
    )


# --------------------------------------------------------------------------
# Water-filling token-budget allocation across sources (UniMax-style)
# --------------------------------------------------------------------------
_BUDGET_FRAC = 0.5  # allocate half the corpus' total chars


@register(
    "source_budget_waterfill",
    f"""
    WITH per_source AS (
      SELECT source, sum(n_chars)::DOUBLE AS c FROM documents GROUP BY source
    ),
    budget AS (SELECT sum(c) * {_BUDGET_FRAC} AS b FROM per_source),
    ranked AS (
      SELECT source, c,
             coalesce(sum(c) OVER (ORDER BY c, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev,
             count(*) OVER () - row_number() OVER (ORDER BY c, source) + 1 AS remaining
      FROM per_source
    ),
    cap AS (
      SELECT min((b - cum_prev) / remaining) FILTER (
               WHERE (b - cum_prev) / remaining <= c) AS t
      FROM ranked CROSS JOIN budget
    )
    SELECT r.source, CAST(r.c AS BIGINT) AS total_chars,
           round(CASE WHEN cap.t IS NULL THEN r.c
                      ELSE least(r.c, cap.t) END, 2) AS alloc_chars
    FROM ranked r CROSS JOIN cap
    """,
    survey_ref="UniMax-style water-filling budget allocation per source",
)
def source_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.sum("n_chars").cast("double").alias("c")
    )
    budget = per_source.agg((F.sum("c") * _BUDGET_FRAC).alias("b"))
    order = Window.orderBy("c", "source")
    prev = order.rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_source.crossJoin(F.broadcast(budget)).select(
        "source",
        "c",
        "b",
        F.coalesce(F.sum("c").over(prev), F.lit(0.0)).alias("cum_prev"),
        (
            F.count("*").over(Window.partitionBy())
            - F.row_number().over(order)
            + 1
        ).alias("remaining"),
    )
    cand = (F.col("b") - F.col("cum_prev")) / F.col("remaining")
    cap = ranked.agg(F.min(F.when(cand <= F.col("c"), cand)).alias("t"))
    return ranked.crossJoin(F.broadcast(cap)).select(
        "source",
        F.col("c").cast("long").alias("total_chars"),
        F.round(
            F.when(F.col("t").isNull(), F.col("c")).otherwise(
                F.least(F.col("c"), F.col("t"))
            ),
            2,
        ).alias("alloc_chars"),
    )


# --------------------------------------------------------------------------
# Kaplan-Meier survival: click -> purchase conversion time, stratified
# --------------------------------------------------------------------------
_MS_DAY = 86_400_000


@register(
    "kaplan_meier_click_to_purchase",
    f"""
    WITH clicks AS (
      SELECT user_id, min(ts) AS t0 FROM events
      WHERE event_type = 'click' GROUP BY user_id
    ),
    purch AS (
      SELECT e.user_id, min(e.ts) AS tp
      FROM events e JOIN clicks c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.t0
      GROUP BY e.user_id
    ),
    last_ AS (
      SELECT e.user_id, max(e.ts) AS tl
      FROM events e JOIN clicks c ON c.user_id = e.user_id
      GROUP BY e.user_id
    ),
    subj AS (
      SELECT c.user_id % 2 AS cohort,
             ((epoch_ms(coalesce(p.tp, l.tl)) - epoch_ms(c.t0)) // {_MS_DAY})::BIGINT
               AS t,
             CASE WHEN p.tp IS NULL THEN 0 ELSE 1 END AS observed
      FROM clicks c
      JOIN last_ l ON l.user_id = c.user_id
      LEFT JOIN purch p ON p.user_id = c.user_id
    ),
    tab AS (
      SELECT cohort, t, sum(observed)::BIGINT AS n_event,
             sum(1 - observed)::BIGINT AS n_censored
      FROM subj GROUP BY cohort, t
    ),
    risk AS (
      SELECT cohort, t, n_event, n_censored,
             (sum(n_event + n_censored) OVER (PARTITION BY cohort)
              - coalesce(sum(n_event + n_censored) OVER w_prev, 0))::BIGINT
               AS n_at_risk
      FROM tab
      WINDOW w_prev AS (PARTITION BY cohort ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT cohort::BIGINT AS cohort, t AS duration_days, n_event, n_censored,
           n_at_risk,
           CASE WHEN max(CASE WHEN n_event >= n_at_risk THEN 1 ELSE 0 END)
                     OVER w_cum = 1
                THEN 0.0
                ELSE round(exp(sum(CASE WHEN n_event > 0 AND n_event < n_at_risk
                                        THEN ln(1 - n_event / n_at_risk::DOUBLE)
                                        ELSE 0.0 END) OVER w_cum), 6)
           END AS survival
    FROM risk
    WINDOW w_cum AS (PARTITION BY cohort ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    survey_ref="Kaplan-Meier survival estimator: click->purchase conversion time, right-censored, stratified per cohort",
)
def kaplan_meier_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified Kaplan-Meier over click->purchase conversion durations.

    Subjects = users with a click; event = first purchase at or after the
    first click; users without one are right-censored at their last event.
    The estimator runs entirely on the per-(cohort, duration) life table —
    ordered windows PARTITIONED by cohort over at most one row per distinct
    duration, never over subjects — so the shuffled frame is tiny and the
    per-cohort scans parallelize. ``S(t)`` uses the exp-sum-log product
    identity with an explicit risk-set-exhausted flag (Spark's ``log(0)``
    is NULL, DuckDB's is -inf; the flag makes both sides an exact 0.0).
    """
    ev = _t(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    joined = ev.join(clicks, "user_id")
    purch = (
        joined.filter(
            (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("t0"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    last = joined.groupBy("user_id").agg(F.max("ts").alias("tl"))
    subj = (
        clicks.join(last, "user_id")
        .join(purch, "user_id", "left")
        .select(
            (F.col("user_id") % 2).cast("long").alias("cohort"),
            F.floor(
                (
                    F.unix_millis(F.coalesce("tp", "tl"))
                    - F.unix_millis("t0")
                )
                / F.lit(_MS_DAY)
            )
            .cast("long")
            .alias("t"),
            F.when(F.col("tp").isNull(), 0).otherwise(1).alias("observed"),
        )
    )
    tab = subj.groupBy("cohort", "t").agg(
        F.sum("observed").cast("long").alias("n_event"),
        F.sum(1 - F.col("observed")).cast("long").alias("n_censored"),
    )
    w_prev = (
        Window.partitionBy("cohort")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy("cohort")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = tab.withColumn(
        "n_at_risk",
        (
            F.sum(F.col("n_event") + F.col("n_censored")).over(
                Window.partitionBy("cohort")
            )
            - F.coalesce(
                F.sum(F.col("n_event") + F.col("n_censored")).over(w_prev),
                F.lit(0),
            )
        ).cast("long"),
    )
    exhausted = F.max(
        F.when(F.col("n_event") >= F.col("n_at_risk"), 1).otherwise(0)
    ).over(w_cum)
    log_s = F.sum(
        F.when(
            (F.col("n_event") > 0) & (F.col("n_event") < F.col("n_at_risk")),
            F.log(1 - F.col("n_event") / F.col("n_at_risk").cast("double")),
        ).otherwise(0.0)
    ).over(w_cum)
    return risk.select(
        "cohort",
        F.col("t").alias("duration_days"),
        "n_event",
        "n_censored",
        "n_at_risk",
        F.when(exhausted == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(log_s), 6))
        .alias("survival"),
    )


# --------------------------------------------------------------------------
# Mann-Whitney U: rank-sum test, click vs purchase event values
# --------------------------------------------------------------------------
@register(
    "mann_whitney_click_vs_purchase",
    """
    WITH vals AS (
      SELECT event_type AS grp, value AS v FROM events
      WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
    ),
    gv AS (SELECT grp, v, count(*)::BIGINT AS cnt FROM vals GROUP BY grp, v),
    dom AS (
      SELECT v, sum(cnt)::BIGINT AS t,
             coalesce(sum(sum(cnt)) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
               AS cum_prev
      FROM gv GROUP BY v
    ),
    ranked AS (
      SELECT gv.grp, gv.cnt, dom.cum_prev + (dom.t + 1) / 2.0 AS avg_rank
      FROM gv JOIN dom ON dom.v = gv.v
    ),
    grp_agg AS (
      SELECT sum(CASE WHEN grp = 'click' THEN cnt * avg_rank ELSE 0 END) AS r_a,
             sum(CASE WHEN grp = 'click' THEN cnt ELSE 0 END)::BIGINT AS n_a,
             sum(CASE WHEN grp = 'purchase' THEN cnt ELSE 0 END)::BIGINT AS n_b
      FROM ranked
    ),
    tie_agg AS (
      SELECT sum(t * t * t - t)::DOUBLE AS tie_sum, sum(t)::BIGINT AS n
      FROM dom
    )
    SELECT n_a AS n_click, n_b AS n_purchase,
           round(r_a - n_a * (n_a + 1) / 2.0, 6) AS u_stat,
           round((r_a - n_a * (n_a + 1) / 2.0 - n_a * n_b / 2.0)
                 / sqrt(n_a::DOUBLE * n_b / 12.0
                        * ((n + 1) - tie_sum / (n::DOUBLE * (n - 1)))), 6)
             AS z_score
    FROM grp_agg CROSS JOIN tie_agg
    """,
    survey_ref="Mann-Whitney U rank-sum test with tie correction (value-domain average ranks)",
)
def mann_whitney_click_vs_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample rank test without a global sort: average ranks come from
    cumulative counts over the DISTINCT VALUE DOMAIN (the repo's
    equi-depth-histogram trick), so the only ordered window runs over
    ~|distinct values| rows; the two 1-row aggregates (group rank sums,
    tie correction) meet in an audited 1x1 broadcast cross join."""
    ev = _t(spark, sf_dir, "events")
    vals = ev.filter(
        F.col("event_type").isin("click", "purchase") & F.col("value").isNotNull()
    ).select(F.col("event_type").alias("grp"), F.col("value").alias("v"))
    gv = vals.groupBy("grp", "v").agg(F.count("*").cast("long").alias("cnt"))
    w_prev = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    dom = (
        gv.groupBy("v")
        .agg(F.sum("cnt").cast("long").alias("t"))
        .select(
            "v",
            "t",
            F.coalesce(F.sum("t").over(w_prev), F.lit(0)).cast("long").alias("cum_prev"),
        )
    )
    ranked = gv.join(dom, "v").select(
        "grp", "cnt", (F.col("cum_prev") + (F.col("t") + 1) / 2.0).alias("avg_rank")
    )
    grp_agg = ranked.agg(
        F.sum(F.when(F.col("grp") == "click", F.col("cnt") * F.col("avg_rank")).otherwise(0.0)).alias("r_a"),
        F.sum(F.when(F.col("grp") == "click", F.col("cnt")).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("grp") == "purchase", F.col("cnt")).otherwise(0)).cast("long").alias("n_b"),
    )
    tie_agg = dom.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).cast("double").alias("tie_sum"),
        F.sum("t").cast("long").alias("n"),
    )
    u = F.col("r_a") - F.col("n_a") * (F.col("n_a") + 1) / 2.0
    var = (
        F.col("n_a").cast("double") * F.col("n_b") / 12.0
        * (
            (F.col("n") + 1)
            - F.col("tie_sum") / (F.col("n").cast("double") * (F.col("n") - 1))
        )
    )
    return grp_agg.crossJoin(F.broadcast(tie_agg)).select(
        F.col("n_a").alias("n_click"),
        F.col("n_b").alias("n_purchase"),
        F.round(u, 6).alias("u_stat"),
        F.round((u - F.col("n_a") * F.col("n_b") / 2.0) / F.sqrt(var), 6).alias("z_score"),
    )


# --------------------------------------------------------------------------
# Log-rank test: compare the two cohorts' click->purchase survival curves
# --------------------------------------------------------------------------
@register(
    "logrank_cohort_survival",
    f"""
    WITH clicks AS (
      SELECT user_id, min(ts) AS t0 FROM events
      WHERE event_type = 'click' GROUP BY user_id
    ),
    purch AS (
      SELECT e.user_id, min(e.ts) AS tp
      FROM events e JOIN clicks c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.t0
      GROUP BY e.user_id
    ),
    last_ AS (
      SELECT e.user_id, max(e.ts) AS tl
      FROM events e JOIN clicks c ON c.user_id = e.user_id
      GROUP BY e.user_id
    ),
    subj AS (
      SELECT (c.user_id % 2)::BIGINT AS cohort,
             ((epoch_ms(coalesce(p.tp, l.tl)) - epoch_ms(c.t0)) // {_MS_DAY})::BIGINT
               AS t,
             CASE WHEN p.tp IS NULL THEN 0 ELSE 1 END AS observed
      FROM clicks c
      JOIN last_ l ON l.user_id = c.user_id
      LEFT JOIN purch p ON p.user_id = c.user_id
    ),
    tab AS (
      SELECT cohort, t, sum(observed)::BIGINT AS d,
             sum(1 - observed)::BIGINT AS c
      FROM subj GROUP BY cohort, t
    ),
    totals AS (SELECT cohort, count(*)::BIGINT AS n_subj FROM subj GROUP BY cohort),
    grid AS (
      SELECT tt.t, tot.cohort, tot.n_subj FROM (SELECT DISTINCT t FROM tab) tt
      CROSS JOIN totals tot
    ),
    filled AS (
      SELECT g.t, g.cohort, g.n_subj,
             coalesce(tab.d, 0) AS d, coalesce(tab.c, 0) AS c
      FROM grid g LEFT JOIN tab ON tab.cohort = g.cohort AND tab.t = g.t
    ),
    risk AS (
      SELECT t, cohort, d,
             (n_subj - coalesce(sum(d + c) OVER (PARTITION BY cohort ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::BIGINT
               AS at_risk
      FROM filled
    ),
    per_t AS (
      SELECT t,
             sum(CASE WHEN cohort = 1 THEN d ELSE 0 END)::DOUBLE AS d1,
             sum(d)::DOUBLE AS dt,
             sum(CASE WHEN cohort = 1 THEN at_risk ELSE 0 END)::DOUBLE AS n1,
             sum(at_risk)::DOUBLE AS nt
      FROM risk GROUP BY t HAVING sum(d) > 0
    )
    SELECT round(sum(d1), 6) AS observed_1,
           round(sum(dt * n1 / nt), 6) AS expected_1,
           round(pow(sum(d1) - sum(dt * n1 / nt), 2)
                 / sum(dt * (n1 / nt) * (1 - n1 / nt)
                       * CASE WHEN nt > 1 THEN (nt - dt) / (nt - 1) ELSE 0 END),
                 6) AS chi2
    FROM per_t
    """,
    survey_ref="log-rank test: two-cohort survival-curve comparison over the pooled life table",
)
def logrank_cohort_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank statistic over the pooled (cohort x event-time) life table.

    The per-time risk sets come from the same value-domain windows as the
    Kaplan-Meier query; the cohort x time grid is an audited tiny cross
    join (|distinct durations| x 2 rows) so missing (cohort, t) cells
    become explicit zero-event rows before the cumulative window."""
    ev = _t(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    joined = ev.join(clicks, "user_id")
    purch = (
        joined.filter(
            (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("t0"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    last = joined.groupBy("user_id").agg(F.max("ts").alias("tl"))
    subj = (
        clicks.join(last, "user_id")
        .join(purch, "user_id", "left")
        .select(
            (F.col("user_id") % 2).cast("long").alias("cohort"),
            F.floor(
                (F.unix_millis(F.coalesce("tp", "tl")) - F.unix_millis("t0"))
                / F.lit(_MS_DAY)
            )
            .cast("long")
            .alias("t"),
            F.when(F.col("tp").isNull(), 0).otherwise(1).alias("observed"),
        )
    )
    tab = subj.groupBy("cohort", "t").agg(
        F.sum("observed").cast("long").alias("d"),
        F.sum(1 - F.col("observed")).cast("long").alias("c"),
    )
    totals = subj.groupBy("cohort").agg(F.count("*").cast("long").alias("n_subj"))
    grid = tab.select("t").distinct().crossJoin(F.broadcast(totals))
    filled = grid.join(tab, ["cohort", "t"], "left").select(
        "t",
        "cohort",
        "n_subj",
        F.coalesce("d", F.lit(0)).alias("d"),
        F.coalesce("c", F.lit(0)).alias("c"),
    )
    w_prev = (
        Window.partitionBy("cohort")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = filled.select(
        "t",
        "cohort",
        "d",
        (
            F.col("n_subj")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0))
        )
        .cast("long")
        .alias("at_risk"),
    )
    per_t = (
        risk.groupBy("t")
        .agg(
            F.sum(F.when(F.col("cohort") == 1, F.col("d")).otherwise(0))
            .cast("double")
            .alias("d1"),
            F.sum("d").cast("double").alias("dt"),
            F.sum(F.when(F.col("cohort") == 1, F.col("at_risk")).otherwise(0))
            .cast("double")
            .alias("n1"),
            F.sum("at_risk").cast("double").alias("nt"),
        )
        .filter(F.col("dt") > 0)
    )
    frac = F.col("n1") / F.col("nt")
    var_term = (
        F.col("dt")
        * frac
        * (1 - frac)
        * F.when(
            F.col("nt") > 1, (F.col("nt") - F.col("dt")) / (F.col("nt") - 1)
        ).otherwise(0.0)
    )
    return per_t.agg(
        F.round(F.sum("d1"), 6).alias("observed_1"),
        F.round(F.sum(F.col("dt") * frac), 6).alias("expected_1"),
        F.round(
            F.pow(F.sum("d1") - F.sum(F.col("dt") * frac), 2) / F.sum(var_term), 6
        ).alias("chi2"),
    )
