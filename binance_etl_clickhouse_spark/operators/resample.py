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
