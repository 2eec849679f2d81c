"""Bar resampling: coarser OHLCV bars from fine bars (SURVEY.md T5/§7).

Klines ARE pre-aggregated tumbling windows (computed by the exchange); the
engine extension recomputes coarser intervals locally: event-time tumbling
``window()`` + order-aware endpoints. ``min_by/max_by`` pick open/close
JVM-side in one mergeable aggregation — a single shuffle on
(symbol, bucket), partial-aggregated map-side, which is exactly the shape
that scales: at 100 TB each executor pre-folds its parquet split before any
exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resample_ohlcv(
    klines: DataFrame,
    target: str = "1 day",
    ts_col: str = "timestamp",
    by: tuple[str, ...] = ("symbol", "type"),
) -> DataFrame:
    """Fine bars -> coarser OHLCV bars.

    open/close = first/last by bar open-time (min_by/max_by — bar open times
    are unique per (by, bucket), so endpoints are deterministic);
    high/low/volume fold associatively.
    """
    w = F.window(F.col(ts_col), target)
    return (
        klines.groupBy(*by, w.alias("w"))
        .agg(
            F.min_by("open", ts_col).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", ts_col).alias("close"),
            F.sum("volume").alias("volume"),
            F.sum("quote_volume").alias("quote_volume"),
            F.sum("trades_count").alias("trades_count"),
            F.count(F.lit(1)).alias("n_bars"),
        )
        .select(*by, F.col("w.start").alias("bucket_start"), *[
            c for c in [
                "open", "high", "low", "close", "volume", "quote_volume",
                "trades_count", "n_bars",
            ]
        ])
    )


def gapfill_locf(
    bars: DataFrame,
    ts_col: str,
    by: tuple[str, ...],
    value_cols: tuple[str, ...],
    step: str = "1 hour",
) -> DataFrame:
    """Dense per-key time grid with last-observation-carried-forward fill
    (the TimescaleDB ``time_bucket_gapfill`` + ``locf`` shape; for klines:
    re-materialize missing bars from the most recent observed bar).

    ``bars`` must already be bucketed to the grid step (one row per
    (by, ts_col)). Missing buckets between each key's min and max are
    generated with ``sequence`` + ``explode`` — a per-key projection whose
    output is bounded by keys x buckets, never a cross join — then values
    forward-fill via ``last(ignorenulls)`` over the ordered key partition.
    ``is_gap`` = 1 marks synthesized rows.

    Scale: one shuffle for the bounds agg (partial map-side), one for the
    grid<-bars left join and window, both keyed ``by`` — skewed keys cost
    no more than the underlying series length, and the fill frame is a
    running (streaming) frame, never a re-sort per row.
    """
    bounds = bars.groupBy(*by).agg(
        F.min(ts_col).alias("__h0"), F.max(ts_col).alias("__h1")
    )
    grid = bounds.select(
        *by,
        F.explode(
            F.sequence(F.col("__h0"), F.col("__h1"), F.expr(f"interval {step}"))
        ).alias(ts_col),
    )
    joined = grid.join(bars, [*by, ts_col], "left")
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*by)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    probe = value_cols[0]
    out = joined.withColumn("is_gap", F.col(probe).isNull().cast("int"))
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out
