from binance_etl_clickhouse_spark.streaming.jobs import (  # noqa: F401
    stream_ingest_staging,
    stream_resample_bars,
)
