"""ETL cleaning transforms — the reference's per-symbol pandas chain, set-based.

``process_symbol`` (reference crypto_data_pipeline_clickhouse.py:353-410) runs
per symbol in a thread; here the identical transform is ONE declarative plan
over all symbols at once — Catalyst fuses the casts/projections into a single
whole-stage-codegen pass, and the keep-last dedup is the only shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.functions.scalars import (
    epoch_ms_to_ts,
    to_double_or_zero,
)
from binance_etl_clickhouse_spark.operators.dedup import keep_last
from binance_etl_clickhouse_spark.schemas import KLINES

_OHLCV_COLS = [
    "open",
    "high",
    "low",
    "close",
    "volume",
    "quote_volume",
    "taker_buy_volume",
    "taker_buy_quote_volume",
]


def clean_klines(
    raw: DataFrame, market_type: str, interval: str, exchange: str = "binance"
) -> DataFrame:
    """Raw 12-field kline pages (+ symbol, src_order) -> serving KLINES rows.

    Mirrors reference :293-295 and :372-387, in order:
    1. keep-last dedup per (symbol, timestamp) on src_order (A3 — the
       overlapping-page resolution; last-fetched page wins);
    2. epoch-ms -> timestamp casts (F1, :372-373);
    3. string -> double casts on the 8 OHLCV columns (F3, :375-377);
    4. literal exchange/type/interval columns (P2, :379-381);
    5. 15-column projection in serving order, raw `ignore` dropped (P1,
       :383-387).
    """
    deduped = keep_last(raw, ["symbol", "timestamp"], "src_order")
    cleaned = (
        deduped.withColumn("timestamp", epoch_ms_to_ts("timestamp"))
        .withColumn("close_time", epoch_ms_to_ts("close_time"))
        .withColumn("exchange", F.lit(exchange))
        .withColumn("type", F.lit(market_type))
        .withColumn("interval", F.lit(interval))
        .withColumn("trades_count", F.col("trades_count").cast("long"))
    )
    for c in _OHLCV_COLS:
        cleaned = cleaned.withColumn(c, F.col(c).cast("double"))
    return cleaned.select(*[f.name for f in KLINES.fields])


def clean_funding_rates(raw: DataFrame, exchange: str = "binance") -> DataFrame:
    """Raw funding pages -> serving FUNDING_RATES rows.

    Mirrors additional_data.py:88, :117-122: keep-last per (symbol,
    fundingTime), ms->ts, and the tolerant-coerce-to-0 numeric semantics (F4)
    on fundingRate/markPrice.
    """
    deduped = keep_last(raw, ["symbol", "fundingTime"], "src_order")
    return deduped.select(
        "symbol",
        F.lit(exchange).alias("exchange"),
        F.lit("PERPETUAL").alias("type"),
        epoch_ms_to_ts("fundingTime").alias("fundingTime"),
        to_double_or_zero("fundingRate").alias("fundingRate"),
        to_double_or_zero("markPrice").alias("markPrice"),
    )


def clean_margin_rates(raw: DataFrame, exchange: str = "binance") -> DataFrame:
    """Raw margin-rate pages -> serving MARGIN_RATES rows
    (additional_data.py:207-209, :238-242)."""
    deduped = keep_last(raw, ["asset", "timestamp"], "src_order")
    return deduped.select(
        "asset",
        F.lit(exchange).alias("exchange"),
        F.lit("MARGIN").alias("type"),
        epoch_ms_to_ts("timestamp").alias("timestamp"),
        to_double_or_zero("dailyInterestRate").alias("dailyInterestRate"),
        F.lit(0).alias("vipLevel"),
    )
