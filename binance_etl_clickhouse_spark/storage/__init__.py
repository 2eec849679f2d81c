from binance_etl_clickhouse_spark.storage.table import ServingTable  # noqa: F401
