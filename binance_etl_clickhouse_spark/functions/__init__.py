from binance_etl_clickhouse_spark.functions.scalars import (  # noqa: F401
    epoch_ms_to_ts,
    month_bucket,
    to_double_or_zero,
    ts_to_epoch_ms,
)
