"""Ordered-funnel and cohort-retention analytics over an event stream.

The two classic event-analytics passes a warehouse user runs on a table
shaped like ``events`` (ClickHouse ships ``windowFunnel`` / ``retention``
aggregate combinators for exactly these; the reference's serving store
delegates them there). Both are plain DataFrame plans here:

- :func:`funnel_stages` — strictly-ordered funnel: a user converts to stage
  *i* iff their earliest qualifying stage-*i* event is strictly later than
  their earliest qualifying stage-*(i-1)* event (the ``windowFunnel(strict
  order)`` semantic, without the time-window cap).
- :func:`cohort_retention` — day-granular cohort × offset retention matrix
  (users grouped by first-activity date; retention(d) = share of the cohort
  active exactly *d* days later).

Scale shape: every join is on the user key against a per-user aggregate
(one row per user — orders of magnitude smaller than the event stream), so
each stage is a shuffle on ``user_id`` that AQE can plan as a broadcast when
the converted-user set is small. Per-stage survivor frames are combined with
one union + groupBy, not per-stage ``count()`` jobs, so the whole funnel is
ONE Spark job. The only window runs over the stage-count frame (``len(
stages)`` rows) — trivially tiny by construction.

Cross-engine determinism: counts are exact integers; rates are rounded at
6 dp before output (summation-order ULPs cannot reorder anything — there is
no ordering on rates).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_stages(
    df: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """(stage_idx, stage, n_users, conv_from_prev, conv_from_first).

    Stage 0 admits every user with at least one ``stages[0]`` event; stage i
    admits the subset whose earliest qualifying stage-i event STRICTLY
    follows their stage-(i-1) entry time — and, when ``within_seconds`` is
    set, falls inside that conversion window (the ``windowFunnel`` cap).
    Equal timestamps do not convert (strict order).
    """
    if len(stages) < 2:
        raise ValueError("a funnel needs at least two stages")
    entered = (
        df.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_prev"))
    )
    survivor_frames = [entered]
    for stage in stages[1:]:
        qualifies = F.col(ts_col) > F.col("t_prev")
        if within_seconds is not None:
            cap = F.col("t_prev") + F.expr(f"INTERVAL {int(within_seconds)} SECONDS")
            qualifies = qualifies & (F.col(ts_col) <= cap)
        entered = (
            df.filter(F.col(type_col) == stage)
            .join(survivor_frames[-1].select(user_col, "t_prev"), user_col)
            .filter(qualifies)
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("t_prev"))
        )
        survivor_frames.append(entered)
    # aggregate each survivor frame to its OWN one-row count before the
    # union: a global agg emits n_users=0 even over an empty frame, so a
    # stage nobody reached still yields a row — matching the SQL form
    # (scalar count() per stage CTE) instead of silently vanishing
    tagged = [
        f.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(i).cast("int").alias("stage_idx"),
            F.lit(stages[i]).alias("stage"),
            F.col("n_users"),
        )
        for i, f in enumerate(survivor_frames)
    ]
    counts = reduce(DataFrame.unionByName, tagged)
    # stage-count frame has exactly len(stages) rows — a global window here
    # is a deliberate single-partition pass over a constant-size frame
    w = Window.orderBy("stage_idx").rowsBetween(Window.unboundedPreceding, 0)
    prev_n = F.lag("n_users", 1).over(Window.orderBy("stage_idx"))
    first_n = F.first("n_users").over(w)
    # guard the ratios: a 0-user predecessor must give NULL in BOTH engines
    # (unguarded, Spark yields null but DuckDB integer-divides by zero)
    return counts.select(
        "stage_idx",
        "stage",
        "n_users",
        F.when(prev_n > 0, F.round(F.col("n_users") / prev_n, 6)).alias(
            "conv_from_prev"
        ),
        F.when(first_n > 0, F.round(F.col("n_users") / first_n, 6)).alias(
            "conv_from_first"
        ),
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    granularity: str = "day",
) -> DataFrame:
    """(cohort_date, day_offset|week_offset, n_active, n_cohort,
    retention_rate).

    cohort_date = a user's first active calendar period (``granularity`` =
    'day' or 'week'); a (cohort, offset) row counts the cohort's users
    active exactly that many periods after it. Offset 0 always covers the
    full cohort (rate 1.0). The offset division is exact: both dates are
    truncated to the period boundary, so datediff is a multiple of the
    period length.

    The activity frame is pre-collapsed to distinct (user, date) BEFORE any
    join — at 100 TB that drops the event stream to at most users × days
    rows, and every later stage works on that reduced key set.

    ``cohort_date`` stays a midnight TIMESTAMP (date_trunc), not a DATE —
    both engines and the driver canonicalizer agree on timestamp values,
    while Spark DATE surfaces as ``datetime.date`` vs DuckDB's datetime64.
    """
    period_days = {"day": 1, "week": 7}
    if granularity not in period_days:
        raise ValueError(f"granularity must be one of {sorted(period_days)}")
    offset_col = f"{granularity}_offset"
    active = df.select(
        F.col(user_col), F.date_trunc(granularity, F.col(ts_col)).alias("active_date")
    ).distinct()
    first = active.groupBy(user_col).agg(F.min("active_date").alias("cohort_date"))
    cohort_sizes = first.groupBy("cohort_date").agg(
        F.count(F.lit(1)).cast("long").alias("n_cohort")
    )
    offset = (
        F.datediff(F.col("active_date"), F.col("cohort_date"))
        / F.lit(period_days[granularity])
    ).cast("int")
    activity = (
        active.join(first, user_col)
        .groupBy("cohort_date", offset.alias(offset_col))
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    return activity.join(F.broadcast(cohort_sizes), "cohort_date").select(
        "cohort_date",
        F.col(offset_col).cast("int").alias(offset_col),
        "n_active",
        "n_cohort",
        F.round(F.col("n_active") / F.col("n_cohort"), 6).alias("retention_rate"),
    )


def funnel_stage_lags(
    df: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """(stage_idx, stage, n_users, avg_lag_s, med_lag_s): time-to-convert
    between consecutive funnel stages, over the SAME survivor semantics as
    :func:`funnel_stages` (strict order, optional conversion window).

    Each stage's frame keeps both its own entry time and the predecessor's,
    so the lag is a per-user projection; stats aggregate per stage (rows
    start at stage 1 — stage 0 has no predecessor). Lags are exact
    microsecond differences expressed in seconds; avg/median rounded at
    6 dp (summation-order/interpolation ULPs).
    """
    if len(stages) < 2:
        raise ValueError("a funnel needs at least two stages")
    entered = (
        df.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_cur"))
    )
    out_frames = []
    for i, stage in enumerate(stages[1:], start=1):
        prev = entered.select(user_col, F.col("t_cur").alias("t_prev"))
        qualifies = F.col(ts_col) > F.col("t_prev")
        if within_seconds is not None:
            cap = F.col("t_prev") + F.expr(f"INTERVAL {int(within_seconds)} SECONDS")
            qualifies = qualifies & (F.col(ts_col) <= cap)
        entered = (
            df.filter(F.col(type_col) == stage)
            .join(prev, user_col)
            .filter(qualifies)
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("t_cur"), F.min("t_prev").alias("t_prev"))
        )
        lag_s = (
            F.unix_micros(F.col("t_cur")) - F.unix_micros(F.col("t_prev"))
        ) / F.lit(1_000_000.0)
        out_frames.append(
            entered.agg(
                F.count(F.lit(1)).cast("long").alias("n_users"),
                F.round(F.avg(lag_s), 6).alias("avg_lag_s"),
                F.round(F.median(lag_s), 6).alias("med_lag_s"),
            ).select(
                F.lit(i).cast("int").alias("stage_idx"),
                F.lit(stage).alias("stage"),
                "n_users",
                "avg_lag_s",
                "med_lag_s",
            )
        )
        entered = entered.select(user_col, "t_cur")
    return reduce(DataFrame.unionByName, out_frames)
