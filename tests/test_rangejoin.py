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


# --- interval x interval overlap ------------------------------------------


def _spans_a(spark):
    rows = [
        (0, 0.0, 3.0),
        (1, 2.0, 30.0),
        (2, 10.0, 10.0),
        (3, 90.0, 120.0),
        (4, 5.0, 6.0),
    ]
    return spark.createDataFrame(rows, "aid long, a_lo double, a_hi double")


def _spans_b(spark):
    rows = [
        (0, 1.0, 1.5),     # inside a0, a1 via overlap
        (1, 29.0, 95.0),   # bridges a1 and a3, many bins long
        (2, 10.0, 10.0),   # degenerate on a2's point
        (3, 200.0, 210.0), # no overlap
    ]
    return spark.createDataFrame(rows, "bid long, b_lo double, b_hi double")


@pytest.mark.parametrize("bin_width", [1.0, 7.0, 1000.0])
def test_interval_overlap_matches_nested_loop(spark, bin_width):
    from binance_etl_clickhouse_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    a, b = _spans_a(spark), _spans_b(spark)
    got = [
        (r.aid, r.bid)
        for r in interval_overlap_join(
            a, b, "a_lo", "a_hi", "b_lo", "b_hi", bin_width
        ).collect()
    ]
    want = {
        (r.aid, r.bid)
        for r in a.crossJoin(b)
        .filter((F.col("a_lo") <= F.col("b_hi")) & (F.col("b_lo") <= F.col("a_hi")))
        .collect()
    }
    # exactly-once: no duplicate pairs even when a pair shares many bins
    assert len(got) == len(set(got))
    assert set(got) == want


def test_interval_overlap_plan_has_no_nested_loop(spark):
    from binance_etl_clickhouse_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    plan = interval_overlap_join(
        _spans_a(spark), _spans_b(spark), "a_lo", "a_hi", "b_lo", "b_hi", 7.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
