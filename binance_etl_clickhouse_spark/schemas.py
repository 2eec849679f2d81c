"""Fixed serving schemas — Spark StructTypes for every reference table.

Derived from the reference DDL constants (see SURVEY.md §1.2; reference
`app/src/crypto_data_pipeline_clickhouse.py:444-518` and
`run_pipeline.py:65-73`). Type mapping decisions:

- ``LowCardinality(String)`` -> StringType (parquet dictionary encoding is
  automatic and gives the identical storage effect).
- ``DateTime`` (second precision, UTC) -> TimestampType. Deliberate
  deviation: writers KEEP millisecond precision (e.g. ``close_time`` ends in
  .999, straight from the API) — the reference's DDL rounds to seconds only
  because ClickHouse ``DateTime`` can't hold ms. Anything exported back to a
  second-precision layout (INTERVAL_TABLE_SUFFIX path) must apply
  ``date_trunc('second', ...)`` at that export boundary.
- ``Float64`` -> DoubleType (README's Decimal64(8) claim is wrong; the DDL
  uses Float64 — SURVEY.md §1.2).
- ``UInt32`` -> LongType (no unsigned type in Spark; int would overflow).
- ``UInt8`` bool-as-int -> IntegerType 0/1, keeping oracle-SQL parity.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


S, D, I, L, TS = (
    T.StringType(),
    T.DoubleType(),
    T.IntegerType(),
    T.LongType(),
    T.TimestampType(),
)

# ---------------------------------------------------------------------------
# klines: ONE table with `interval` as a column instead of the reference's
# table-per-interval trick (SURVEY.md §1.4) — partition pruning on
# (type, interval, month) replaces the table split.
# Columns: crypto_data_pipeline_clickhouse.py:444-460.
# ---------------------------------------------------------------------------
KLINES = T.StructType(
    [
        _f("symbol", S, False),
        _f("exchange", S, False),
        _f("type", S, False),  # SPOT | PERPETUAL
        _f("interval", S, False),  # 1m | 1h | ...
        _f("timestamp", TS, False),  # bar open time
        _f("close_time", TS),
        _f("open", D),
        _f("high", D),
        _f("low", D),
        _f("close", D),
        _f("volume", D),
        _f("quote_volume", D),
        _f("trades_count", L),  # UInt32 in reference
        _f("taker_buy_volume", D),
        _f("taker_buy_quote_volume", D),
    ]
)
# ORDER BY key (:569) — the reference's per-(market,interval) table split
# contributes (type) to row identity; with klines unified into one table the
# dedup key must carry it explicitly.
KLINES_PK = ["symbol", "type", "interval", "timestamp"]

# Raw 12-element kline API page (strings + epoch-ms longs) before cleaning
# (crypto_data_pipeline_clickhouse.py:238-242).
KLINES_RAW = T.StructType(
    [
        _f("timestamp", L, False),  # epoch ms
        _f("open", S),
        _f("high", S),
        _f("low", S),
        _f("close", S),
        _f("volume", S),
        _f("close_time", L),  # epoch ms
        _f("quote_volume", S),
        _f("trades_count", L),
        _f("taker_buy_volume", S),
        _f("taker_buy_quote_volume", S),
        _f("ignore", S),
    ]
)

# Spot symbol dimension (crypto_data_pipeline_clickhouse.py:462-479).
SPOT_SYMBOLS = T.StructType(
    [
        _f("symbol", S, False),
        _f("base_asset", S),
        _f("quote_asset", S),
        _f("exchange", S, False),
        _f("type", S),
        _f("status", S),
        _f("is_spot_trading_allowed", I),  # UInt8 0/1
        _f("is_margin_trading_allowed", I),
        _f("base_precision", I),
        _f("quote_precision", I),
        _f("min_price", D),
        _f("max_price", D),
        _f("tick_size", D),
        _f("min_qty", D),
        _f("max_qty", D),
        _f("step_size", D),
    ]
)
SPOT_SYMBOLS_PK = ["symbol", "exchange"]  # :543

# Perp symbol dimension (crypto_data_pipeline_clickhouse.py:481-500).
PERP_SYMBOLS = T.StructType(
    [
        _f("symbol", S, False),
        _f("base_asset", S),
        _f("quote_asset", S),
        _f("margin_asset", S),
        _f("exchange", S, False),
        _f("type", S),
        _f("underlyingSubType", S),  # comma-joined array (:165)
        _f("status", S),
        _f("onboard_date", TS),
        _f("delivery_date", TS),
        _f("price_precision", I),
        _f("quantity_precision", I),
        _f("min_price", D),
        _f("max_price", D),
        _f("tick_size", D),
        _f("min_qty", D),
        _f("max_qty", D),
        _f("step_size", D),
    ]
)
PERP_SYMBOLS_PK = ["symbol", "exchange"]  # :552

# Funding rates fact (crypto_data_pipeline_clickhouse.py:502-509).
FUNDING_RATES = T.StructType(
    [
        _f("symbol", S, False),
        _f("exchange", S, False),
        _f("type", S),
        _f("fundingTime", TS, False),
        _f("fundingRate", D),
        _f("markPrice", D),
    ]
)
FUNDING_RATES_PK = ["symbol", "exchange", "fundingTime"]  # :591

# Margin rates fact (crypto_data_pipeline_clickhouse.py:511-518).
MARGIN_RATES = T.StructType(
    [
        _f("asset", S, False),
        _f("exchange", S, False),
        _f("type", S),
        _f("timestamp", TS, False),
        _f("dailyInterestRate", D),
        _f("vipLevel", I),
    ]
)
MARGIN_RATES_PK = ["asset", "exchange", "timestamp"]  # :603

# Ops log (run_pipeline.py:65-73).
PIPELINE_LOGS = T.StructType(
    [
        _f("timestamp", TS, False),
        _f("status", S, False),  # success | failure
        _f("comment", S),
    ]
)

# Progress checkpoint: the `completed` set from progress.json
# (crypto_data_pipeline_clickhouse.py:317-322) as a one-column table that
# drives the anti-join skip (P7).
PROGRESS = T.StructType([_f("symbol", S, False)])

#: month partition column added by the storage layer ≙ toYYYYMM(ts) (:570)
MONTH_COL = "month"

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "klines": KLINES,
    "spot_symbols": SPOT_SYMBOLS,
    "perp_symbols": PERP_SYMBOLS,
    "funding_rates": FUNDING_RATES,
    "margin_rates": MARGIN_RATES,
    "pipeline_logs": PIPELINE_LOGS,
    "progress": PROGRESS,
}

TABLE_KEYS: dict[str, list[str]] = {
    "klines": KLINES_PK,
    "spot_symbols": SPOT_SYMBOLS_PK,
    "perp_symbols": PERP_SYMBOLS_PK,
    "funding_rates": FUNDING_RATES_PK,
    "margin_rates": MARGIN_RATES_PK,
}

#: event-time column per fact table (orders merges/pruning/watermarks)
TABLE_TIME: dict[str, str] = {
    "klines": "timestamp",
    "funding_rates": "fundingTime",
    "margin_rates": "timestamp",
    "pipeline_logs": "timestamp",
}
