from binance_etl_clickhouse_spark.operators.dedup import (  # noqa: F401
    keep_last,
    keep_last_sql,
)
