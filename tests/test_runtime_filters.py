"""Runtime filtering at the plan level: dynamic partition pruning over the
serving tables' month layout, and runtime bloom-filter injection on shuffle
joins.

These are the two optimizer features that turn "join then filter" into
"filter the scan itself" at 100 TB:

- DPP: when a month-partitioned fact joins a dimension whose filter selects
  a few months, the subquery result prunes the fact's PARTITION DIRS at
  runtime — the scan never opens the other months' files. No code changes
  needed; the month=yyyyMM layout ServingTable writes is what enables it.
- Runtime bloom filter: when both join sides are too big to broadcast, the
  optimizer builds a bloom filter over the small side's join keys and
  pushes `might_contain` into the big side's scan, cutting shuffle volume
  to ~the matching rows. Fires by default once the application side
  exceeds 10 GB (`...bloomFilter.applicationSideScanSizeThreshold`) — the
  test models that regime by lowering the threshold at test scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.operators.etl import clean_klines
from binance_etl_clickhouse_spark.schemas import KLINES_PK
from binance_etl_clickhouse_spark.sources.synthetic import synthetic_klines_raw
from binance_etl_clickhouse_spark.storage import ServingTable


@pytest.fixture()
def serving(spark, tmp_path):
    t = ServingTable(
        path=str(tmp_path / "klines"),
        keys=KLINES_PK,
        time_col="timestamp",
        sort_cols=["symbol", "type", "interval", "timestamp"],
    )
    # ~3 months of hourly bars -> several month=yyyyMM partition dirs
    t.append(
        clean_klines(
            synthetic_klines_raw(spark, n_symbols=4, bars_per_symbol=1700),
            market_type="SPOT",
            interval="1h",
        ),
        ingest_seq=1,
    )
    return t


def test_dpp_prunes_serving_table_months(spark, serving, tmp_path):
    months = serving.read_raw(spark).select("month").distinct().collect()
    assert len(months) >= 2  # layout actually spans months

    # dimension parquet: month attributes, filter selects exactly one month.
    # Parquet-backed (not an in-memory literal frame) so Catalyst cannot
    # constant-fold the filter into a static IN list — the pruning must be
    # the runtime DPP subquery.
    dim_path = str(tmp_path / "month_dim")
    spark.createDataFrame(
        [(int(m.month), "keep" if i == 0 else "skip") for i, m in enumerate(sorted(months))],
        "month int, tag string",
    ).write.parquet(dim_path)
    dim = spark.read.parquet(dim_path).filter(F.col("tag") == "keep")

    j = serving.read_raw(spark).join(dim, "month")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:3000]


def test_runtime_bloom_filter_injects_on_shuffle_join(spark, tmp_path):
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        # model the 100 TB regime: application side over the size threshold,
        # dimension side over the broadcast threshold
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        fact_path = str(tmp_path / "fact")
        spark.range(0, 200000).select(
            (F.col("id") % 50000).alias("k"), F.rand(7).alias("x")
        ).write.parquet(fact_path)
        dim_path = str(tmp_path / "dim")
        spark.range(0, 50000).select(
            F.col("id").alias("k"), F.rand(3).alias("y")
        ).write.parquet(dim_path)

        sel = spark.read.parquet(dim_path).filter(F.col("y") < 0.001)
        j = spark.read.parquet(fact_path).join(sel, "k")
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan.lower(), plan[:3000]

        # default config sanity: the feature is ON out of the box — at real
        # scale it fires with no tuning at all
        assert (
            spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
            == "true"
        )
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
