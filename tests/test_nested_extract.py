"""S1 nested exchange-info filter extraction (array<struct> -> typed cols)."""

from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.functions.scalars import extract_nested_filter


def test_extract_nested_filter(spark):
    rows = [
        ("BTCUSDT", [{"filterType": "PRICE_FILTER", "minPrice": "0.01", "maxPrice": "1000000"},
                     {"filterType": "LOT_SIZE", "minQty": "0.001"}]),
        ("NOFILT", [{"filterType": "LOT_SIZE", "minQty": "1"}]),
    ]
    df = spark.createDataFrame(
        rows,
        "symbol string, filters array<struct<filterType:string,minPrice:string,maxPrice:string,minQty:string>>",
    )
    out = df.select(
        "symbol",
        extract_nested_filter("filters", "PRICE_FILTER", "minPrice").cast("double").alias("min_price"),
        extract_nested_filter("filters", "LOT_SIZE", "minQty").cast("double").alias("min_qty"),
    ).collect()
    by = {r.symbol: r for r in out}
    assert by["BTCUSDT"].min_price == 0.01 and by["BTCUSDT"].min_qty == 0.001
    assert by["NOFILT"].min_price is None and by["NOFILT"].min_qty == 1.0
