"""Mergeable HLL sketch state (operators/sketches.py).

No cross-engine oracle exists for DataSketches estimates, so these pin the
properties that make the pattern trustworthy instead: relative error vs
exact distinct, merge consistency (union of per-bucket states == sketch of
the raw rows), and incremental maintenance through RollupTable refresh.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from binance_etl_clickhouse_spark.operators.etl import clean_klines
from binance_etl_clickhouse_spark.operators.sketches import (
    hll_estimate,
    hll_merge,
    hll_state,
    merge_distinct_over,
)
from binance_etl_clickhouse_spark.schemas import KLINES_PK
from binance_etl_clickhouse_spark.sources.synthetic import synthetic_klines_raw
from binance_etl_clickhouse_spark.storage import RollupTable, ServingTable
from binance_etl_clickhouse_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_hll_rollup_accuracy_and_merge(spark):
    ev = load_table(spark, SF, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket"), "event_type"
    ).agg(hll_state("user_id").alias("users_hll"))
    assert isinstance(hourly.schema["users_hll"].dataType, BinaryType)

    est = {
        r.event_type: r.approx_distinct
        for r in merge_distinct_over(hourly, "users_hll", ["event_type"]).collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact) and exact
    for t, n in exact.items():
        assert abs(est[t] - n) <= max(2, 0.05 * n), (t, est[t], n)

    # merge consistency: union of per-bucket states == one sketch over raw
    merged = hourly.agg(hll_estimate(hll_merge("users_hll")).alias("e")).first()["e"]
    direct = ev.agg(hll_estimate(hll_state("user_id")).alias("e")).first()["e"]
    assert merged == direct


def test_hll_state_survives_parquet_and_range_merge(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    path = str(tmp_path / "hourly_sketch")
    ev.groupBy(F.date_trunc("hour", "ts").alias("bucket")).agg(
        hll_state("user_id").alias("users_hll")
    ).write.parquet(path)
    back = spark.read.parquet(path)
    # arbitrary bucket subset (first half of the hours) still merges
    cut = back.select(F.min("bucket"), F.max("bucket")).first()
    mid = cut[0] + (cut[1] - cut[0]) / 2
    sub = back.filter(F.col("bucket") <= F.lit(mid))
    est = merge_distinct_over(sub, "users_hll").first()["approx_distinct"]
    exact = ev.filter(F.date_trunc("hour", "ts") <= F.lit(mid)).agg(
        F.countDistinct("user_id")
    ).first()[0]
    assert abs(est - exact) <= max(2, 0.05 * exact)


def test_rollup_table_maintains_sketch_column_incrementally(spark, tmp_path):
    serving = ServingTable(
        path=str(tmp_path / "klines"),
        keys=KLINES_PK,
        time_col="timestamp",
        sort_cols=["symbol", "type", "interval", "timestamp"],
    )
    rollup = RollupTable(
        path=str(tmp_path / "klines_daily"),
        source=serving,
        granularity="day",
        group_cols=[],
        aggs=lambda: [
            F.count(F.lit(1)).alias("n_bars"),
            hll_state("symbol").alias("symbols_hll"),
        ],
    )
    first = clean_klines(
        synthetic_klines_raw(spark, n_symbols=6, bars_per_symbol=400),
        market_type="SPOT",
        interval="1h",
    )
    serving.append(first, ingest_seq=1)
    rollup.refresh(spark)

    # second ingest: new symbols, later bars -> touches a later month too
    second = clean_klines(
        synthetic_klines_raw(spark, n_symbols=10, bars_per_symbol=900),
        market_type="SPOT",
        interval="1h",
    )
    serving.append(second, ingest_seq=2)
    months = rollup.refresh(spark)
    assert months  # incremental refresh saw the new ingest

    est = merge_distinct_over(
        rollup.read(spark), "symbols_hll"
    ).first()["approx_distinct"]
    exact = serving.read(spark).agg(F.countDistinct("symbol")).first()[0]
    # 10 symbols: lgK=12 sketch is exact at this cardinality
    assert est == exact
