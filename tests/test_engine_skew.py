"""AnalyticsEngine SQL passthrough + skew utilities + config loading."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.engine import AnalyticsEngine
from binance_etl_clickhouse_spark.operators.skew import salted_count, salted_join
from binance_etl_clickhouse_spark.pipeline import (
    INTERVAL_TABLE_SUFFIX,
    Pipeline,
    PipelineConfig,
)


def test_engine_sql_over_pipeline_tables(spark, tmp_path):
    cfg = PipelineConfig(
        intervals=["1h"], end_ms=1704067200000 + 47 * 3_600_000,
        n_spot_symbols=4, n_perp_symbols=2, fetch_partitions=2,
    )
    p = Pipeline(spark, str(tmp_path / "db"), cfg)
    p.update_all()
    eng = AnalyticsEngine(spark, verbose=False)
    eng.register_pipeline_tables(p)
    out = eng.sql_pandas(
        "SELECT symbol, count(*) AS n FROM bn_klines WHERE type = 'SPOT' GROUP BY symbol"
    )
    assert set(out["n"]) == {48}
    # parameterized query — values bound, not spliced
    one = eng.sql(
        "SELECT count(*) AS n FROM bn_klines WHERE symbol = :sym",
        args={"sym": "SYM000USDT"},
    ).first()
    assert one.n > 0


def test_salted_join_equals_plain_join(spark):
    big = spark.range(10000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    small = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], ["k", "name"])
    plain = big.join(small, "k").groupBy("name").count()
    salted = salted_join(big, small, "k").groupBy("name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_count_equals_plain_count(spark):
    df = spark.range(9999).select((F.col("id") % 2).alias("k"))
    plain = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    salted = {r.k: r.n for r in salted_count(df, "k").collect()}
    assert plain == salted


def test_config_from_json(tmp_path):
    path = tmp_path / "config.json"
    path.write_text(json.dumps({
        "intervals": ["1m", "1h"], "quote_assets": ["USDT"],
        "n_spot_symbols": 3, "unknown_key": 42,
    }))
    cfg = PipelineConfig.from_json(str(path))
    assert cfg.intervals == ["1m", "1h"]
    assert cfg.quote_assets == ["USDT"]
    assert cfg.n_spot_symbols == 3
    assert INTERVAL_TABLE_SUFFIX["1m"] == "1min"  # F10 mapping retained
