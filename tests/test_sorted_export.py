"""Globally-ordered export: range-partitioned plan, non-overlapping files in
name order, footer stats tight enough to range-prune the artifact."""

from __future__ import annotations

import os

from binance_etl_clickhouse_spark.storage import zonemap as zm
from binance_etl_clickhouse_spark.storage.export import (
    sorted_arrangement,
    sorted_export,
)
from binance_etl_clickhouse_spark.tables import load_table


def test_sorted_export_is_one_global_order(spark, tmp_path):
    df = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    path = str(tmp_path / "ordered")
    sorted_export(df, path, ["l_shipdate", "l_orderkey"], n_files=6)

    # the plan distributes: range partitioning, never a single-task sort
    plan = (
        sorted_arrangement(df, ["l_shipdate", "l_orderkey"], 6)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan.lower()

    files = zm.data_files(path)
    assert len(files) == 6
    # per-file [min,max] on the leading key must be non-overlapping in
    # file-name order (footer truth — exactly what a range read would prune on)
    bounds = []
    for rel in files:  # data_files() is sorted -> part number order
        b = zm._file_bounds(os.path.join(path, rel), ["l_shipdate"])
        assert b is not None
        bounds.append(b["l_shipdate"])
    for (lo_a, hi_a), (lo_b, hi_b) in zip(bounds, bounds[1:]):
        assert hi_a <= lo_b

    # nothing lost, nothing duplicated
    out = spark.read.parquet(path)
    assert out.count() == df.count()

    # replaying files in name order IS the global order
    prev_max = None
    for rel in files:
        pdf = (
            spark.read.parquet(os.path.join(path, rel))
            .select("l_shipdate")
            .toPandas()["l_shipdate"]
        )
        assert pdf.is_monotonic_increasing
        if prev_max is not None and len(pdf):
            assert prev_max <= pdf.iloc[0]
        if len(pdf):
            prev_max = pdf.iloc[-1]
