"""Python Data Source API: spark.read.format("binance_klines")."""

from __future__ import annotations

from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.operators.etl import clean_klines
from binance_etl_clickhouse_spark.sources.datasource import BinanceKlinesDataSource

START = 1704067200000


def _register(spark):
    spark.dataSource.register(BinanceKlinesDataSource)


def test_datasource_reads_symbols(spark):
    _register(spark)
    df = (
        spark.read.format("binance_klines")
        .option("symbols", "SYM000USDT,SYM001USDT")
        .option("start_ms", START)
        .option("end_ms", START + 49 * 3_600_000)
        .option("interval", "1h")
        .load()
    )
    assert df.count() == 2 * 50
    assert df.select("symbol").distinct().count() == 2
    # the raw scan feeds the standard cleaning chain unchanged
    cleaned = clean_klines(df.drop("fetch_error"), "SPOT", "1h")
    assert cleaned.count() == 100


def test_datasource_shard_partitioning(spark):
    _register(spark)
    df = (
        spark.read.format("binance_klines")
        .option("symbols", "SYM000USDT")
        .option("start_ms", START)
        .option("end_ms", START + 99 * 3_600_000)
        .option("interval", "1h")
        .option("shard_ms", 25 * 3_600_000)  # 4 shards
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100
    assert df.select("timestamp").distinct().count() == 100  # no overlap dups


def test_datasource_filter_pushes_into_plan(spark):
    _register(spark)
    df = (
        spark.read.format("binance_klines")
        .option("symbols", "SYM000USDT,SYM001USDT,SYM002USDT")
        .option("start_ms", START)
        .option("end_ms", START + 9 * 3_600_000)
        .load()
    )
    one = df.filter(F.col("symbol") == "SYM001USDT")
    assert one.count() == 10
