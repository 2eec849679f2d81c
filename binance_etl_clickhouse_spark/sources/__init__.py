from binance_etl_clickhouse_spark.sources.synthetic import (  # noqa: F401
    synthetic_klines_raw,
    synthetic_perp_symbols,
    synthetic_spot_symbols,
)
