from binance_etl_clickhouse_spark.testing.parity import (  # noqa: F401
    compare_frames,
    run_oracle,
    spark_to_pandas,
)
