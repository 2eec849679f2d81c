"""Projection routing (ClickHouse projections / AggregatingMergeTree
auto-routing analogue): a covered aggregate answers from the rollup's
mergeable states and equals the raw-snapshot computation exactly; uncovered
requests fall back; the routed plan scans ONLY the rollup files and prunes
its month partitions on a time range."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.operators.etl import clean_klines
from binance_etl_clickhouse_spark.schemas import KLINES_PK
from binance_etl_clickhouse_spark.sources.synthetic import synthetic_klines_raw
from binance_etl_clickhouse_spark.storage import ServingTable
from binance_etl_clickhouse_spark.storage.projection import Metric, Projection

METRICS = [
    Metric("n_bars", "count"),
    Metric("volume", "sum", "volume"),
    Metric("high", "max", "high"),
    Metric("low", "min", "low"),
    Metric("avg_close", "avg", "close"),
    Metric("n_symbols", "uniq", "symbol"),
]


def _setup(spark, tmp_path) -> Projection:
    serving = ServingTable(
        path=str(tmp_path / "klines"),
        keys=KLINES_PK,
        time_col="timestamp",
        sort_cols=["symbol", "type", "interval", "timestamp"],
    )
    raw = synthetic_klines_raw(spark, n_symbols=3, bars_per_symbol=800)
    serving.append(clean_klines(raw, market_type="SPOT", interval="1h"), ingest_seq=1)
    proj = Projection(
        path=str(tmp_path / "klines_hourly_proj"),
        source=serving,
        granularity="hour",
        group_cols=["symbol"],
        metrics=METRICS,
    )
    proj.refresh(spark)
    return proj


def _frames_equal(a, b, float_cols=()):
    a = a.toPandas().sort_values(sorted(a.columns), ignore_index=True)
    b = b.toPandas().sort_values(sorted(b.columns), ignore_index=True)
    pd.testing.assert_frame_equal(
        a[sorted(a.columns)], b[sorted(b.columns)], check_dtype=False
    )


def test_routed_answer_equals_direct_all_kinds(spark, tmp_path):
    proj = _setup(spark, tmp_path)
    names = [m.name for m in METRICS]
    for grain in ("hour", "day", "month"):
        got, routed = proj.route(spark, grain, ["symbol"], names)
        assert routed
        want = proj.compute_direct(spark, grain, ["symbol"], names)
        _frames_equal(got, want)


def test_group_subset_and_coarser_grain_covered(spark, tmp_path):
    proj = _setup(spark, tmp_path)
    # global (no group cols) weekly buckets from hourly states
    got, routed = proj.route(spark, "week", [], ["n_bars", "volume", "avg_close"])
    assert routed
    want = proj.compute_direct(spark, "week", [], ["n_bars", "volume", "avg_close"])
    _frames_equal(got, want)


def test_uncovered_requests_fall_back_to_raw(spark, tmp_path):
    proj = _setup(spark, tmp_path)
    # finer grain than stored
    assert not proj.covers("minute", ["symbol"], ["n_bars"])
    # group col the projection doesn't carry
    assert not proj.covers("day", ["type"], ["n_bars"])
    # unknown metric
    assert not proj.covers("day", ["symbol"], ["p99_close"])
    got, routed = proj.route(spark, "minute", ["symbol"], ["n_bars"])
    assert not routed
    assert got.count() > 0


def test_routed_plan_scans_only_the_rollup(spark, tmp_path):
    proj = _setup(spark, tmp_path)
    df, routed = proj.route(spark, "day", ["symbol"], ["n_bars", "volume"])
    assert routed
    files = df.inputFiles()
    assert files and all("klines_hourly_proj" in f for f in files)
    # the raw serving table must not appear in any scan of the routed plan
    assert not any("/klines/" in f and "proj" not in f for f in files)


def test_time_range_prunes_rollup_month_partitions(spark, tmp_path):
    import datetime as dt

    proj = _setup(spark, tmp_path)
    start, end = dt.datetime(2024, 2, 1), dt.datetime(2024, 3, 1)
    got = proj.answer(spark, "day", ["symbol"], ["n_bars"], start=start, end=end)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "month" in plan
    want = proj.compute_direct(spark, "day", ["symbol"], ["n_bars"], start=start, end=end)
    _frames_equal(got, want)


def test_incremental_refresh_keeps_answers_exact(spark, tmp_path):
    proj = _setup(spark, tmp_path)
    # second ingest touches later months only; refresh then re-answer
    raw = synthetic_klines_raw(spark, n_symbols=3, bars_per_symbol=1200)
    proj.table.source.append(
        clean_klines(raw, market_type="SPOT", interval="1h"), ingest_seq=2
    )
    proj.refresh(spark)
    names = [m.name for m in METRICS]
    got, routed = proj.route(spark, "day", ["symbol"], names)
    assert routed
    want = proj.compute_direct(spark, "day", ["symbol"], names)
    _frames_equal(got, want)


def test_stored_grain_must_nest_in_month(spark, tmp_path):
    import pytest

    serving = ServingTable(
        path=str(tmp_path / "k2"),
        keys=KLINES_PK,
        time_col="timestamp",
        sort_cols=["symbol"],
    )
    with pytest.raises(ValueError, match="STORED granularity"):
        Projection(
            path=str(tmp_path / "p2"),
            source=serving,
            granularity="week",
            group_cols=[],
            metrics=[Metric("n", "count")],
        )


def test_projection_refreshes_per_streaming_epoch(spark, tmp_path):
    """Materialized-view-on-insert for PROJECTIONS: Projection duck-types
    RollupTable.refresh, so streaming ingest keeps it warm per epoch and a
    routed answer immediately serves the streamed data."""
    from binance_etl_clickhouse_spark.schemas import KLINES
    from binance_etl_clickhouse_spark.streaming.jobs import stream_ingest_staging

    serving = ServingTable(
        path=str(tmp_path / "serving"),
        keys=KLINES_PK,
        time_col="timestamp",
        sort_cols=["symbol", "type", "interval", "timestamp"],
    )
    proj = Projection(
        path=str(tmp_path / "proj"),
        source=serving,
        granularity="day",
        group_cols=["symbol"],
        metrics=[Metric("n_bars", "count"), Metric("volume", "sum", "volume")],
    )
    staging = str(tmp_path / "staging")
    raw = synthetic_klines_raw(spark, n_symbols=2, bars_per_symbol=48, overlap_bars=0)
    clean_klines(raw, market_type="SPOT", interval="1h").write.mode("append").parquet(
        staging
    )
    q = stream_ingest_staging(
        spark,
        staging,
        KLINES,
        serving,
        checkpoint_dir=str(tmp_path / "ckpt"),
        rollups=[proj],
    )
    q.awaitTermination(120)
    got, routed = proj.route(spark, "day", ["symbol"], ["n_bars", "volume"])
    assert routed
    want = proj.compute_direct(spark, "day", ["symbol"], ["n_bars", "volume"])
    _frames_equal(got, want)
    assert got.count() == 2 * 2  # 2 symbols x 2 days


def test_unaligned_bounds_fall_back_not_silently_truncate(spark, tmp_path):
    """start/end off the stored hourly bucket boundary must NOT route to
    the rollup (which can only include/exclude whole buckets — the edge
    bucket's partial rows would silently vanish): route() falls back to
    the raw snapshot and still returns the exact answer; answer() raises."""
    import datetime as dt

    import pytest

    proj = _setup(spark, tmp_path)
    start = dt.datetime(2024, 1, 5, 12, 30)  # mid-bucket for an hourly store
    got, routed = proj.route(spark, "day", ["symbol"], ["n_bars"], start=start)
    assert routed is False
    want = proj.compute_direct(spark, "day", ["symbol"], ["n_bars"], start=start)
    _frames_equal(got, want)
    with pytest.raises(ValueError, match="align"):
        proj.answer(spark, "day", ["symbol"], ["n_bars"], start=start)
    # aligned bounds still route
    _, routed2 = proj.route(
        spark, "day", ["symbol"], ["n_bars"], start=dt.datetime(2024, 1, 5, 12)
    )
    assert routed2 is True
