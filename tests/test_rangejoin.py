"""Bin-bucketed range join: exact nested-loop semantics, equi-join plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.operators.rangejoin import range_join


def _points(spark):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0, 1, 5, 10, 13, 27, 99, 100])],
        "pid long, p double",
    )


def _intervals(spark):
    # mixes: shorter than bin, longer than bin, overlapping, degenerate
    rows = [
        (0, 0.0, 3.0),
        (1, 2.0, 30.0),
        (2, 10.0, 10.0),
        (3, 90.0, 120.0),
        (4, 5.0, 6.0),
    ]
    return spark.createDataFrame(rows, "iid long, lo double, hi double")


@pytest.mark.parametrize("closed", ["both", "left"])
@pytest.mark.parametrize("bin_width", [1.0, 7.0, 1000.0])
def test_matches_nested_loop_semantics(spark, closed, bin_width):
    pts, ivs = _points(spark), _intervals(spark)
    got = {
        (r.pid, r.iid)
        for r in range_join(pts, ivs, "p", "lo", "hi", bin_width, closed).collect()
    }
    upper = (F.col("p") <= F.col("hi")) if closed == "both" else (F.col("p") < F.col("hi"))
    want = {
        (r.pid, r.iid)
        for r in pts.crossJoin(ivs).filter((F.col("p") >= F.col("lo")) & upper).collect()
    }
    assert got == want


def test_boundary_point_both_vs_left(spark):
    pts = _points(spark).filter(F.col("p") == 10.0)
    ivs = _intervals(spark).filter(F.col("iid") == 2)  # [10, 10]
    assert range_join(pts, ivs, "p", "lo", "hi", 4.0, "both").count() == 1
    assert range_join(pts, ivs, "p", "lo", "hi", 4.0, "left").count() == 0


def test_no_nested_loop_in_plan(spark):
    pts, ivs = _points(spark), _intervals(spark)
    plan = (
        range_join(pts, ivs, "p", "lo", "hi", 8.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan  # it is still a real join, on the bin key


def test_rejects_bad_args(spark):
    pts, ivs = _points(spark), _intervals(spark)
    with pytest.raises(ValueError):
        range_join(pts, ivs, "p", "lo", "hi", 0.0)
    with pytest.raises(ValueError):
        range_join(pts, ivs, "p", "lo", "hi", 1.0, closed="right")
