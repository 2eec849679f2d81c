"""Zone-map sparse index + snapshot (as-of) reads.

The sparse-PK read shape: per-file [min, max] key bounds prune files
driver-side before any task is scheduled (ClickHouse index_granularity
analogue at file granularity), and reads stay correct when the sidecar is
missing or stale. Snapshot reads reconstruct the table as of any ingest_seq
from the version column alone.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.operators.etl import clean_klines
from binance_etl_clickhouse_spark.schemas import KLINES_PK
from binance_etl_clickhouse_spark.sources.synthetic import synthetic_klines_raw
from binance_etl_clickhouse_spark.storage import ServingTable
from binance_etl_clickhouse_spark.storage import zonemap as zm


def _table(tmp_path) -> ServingTable:
    return ServingTable(
        path=str(tmp_path / "klines"),
        keys=KLINES_PK,
        time_col="timestamp",
        sort_cols=["symbol", "type", "interval", "timestamp"],
    )


def _clean(spark, **kw):
    raw = synthetic_klines_raw(spark, **kw)
    return clean_klines(raw, market_type="SPOT", interval="1h")


def _rows(df):
    return sorted(
        (r.symbol, r.timestamp, r.volume)
        for r in df.select("symbol", "timestamp", "volume").collect()
    )


def test_zonemap_prunes_point_lookup_and_matches_full_scan(spark, tmp_path):
    t = _table(tmp_path)
    # one append per symbol -> each file spans exactly one symbol, so a
    # point lookup must prune to that symbol's files only
    full = _clean(spark, n_symbols=4, bars_per_symbol=48)
    syms = [r.symbol for r in full.select("symbol").distinct().collect()]
    for i, s in enumerate(sorted(syms)):
        t.append(full.filter(F.col("symbol") == s), ingest_seq=i + 1)
    t.build_zonemap()

    target = sorted(syms)[0]
    sidecar = zm.read_zonemap(t.path)
    assert sidecar is not None and len(sidecar["files"]) == len(
        zm.data_files(t.path)
    )
    pruned = zm.prune_files(sidecar, t.path, {"symbol": ("eq", target)})
    assert pruned is not None
    assert 0 < len(pruned) < len(sidecar["files"])  # actually pruned

    got = t.read_pruned(spark, {"symbol": ("eq", target)})
    want = t.read(spark).filter(F.col("symbol") == target)
    assert _rows(got) == _rows(want)
    # month partition column survives the file-list read path
    assert "month" in got.columns


def test_zonemap_time_range_prune(spark, tmp_path):
    t = _table(tmp_path)
    t.append(_clean(spark, n_symbols=2, bars_per_symbol=48), ingest_seq=1)
    t.build_zonemap()
    from datetime import datetime, timezone

    lo = datetime(2024, 1, 2, tzinfo=timezone.utc)
    got = t.read_pruned(
        spark, {"timestamp": ("between", lo, None)}, dedup=False
    )
    want = t.read_raw(spark).filter(F.col("timestamp") >= lo)
    assert got.count() == want.count() > 0


def test_zonemap_incremental_append_maintenance(spark, tmp_path):
    t = _table(tmp_path)
    b = _clean(spark, n_symbols=2, bars_per_symbol=48)
    t.append(b, ingest_seq=1)
    t.build_zonemap()
    n0 = len(zm.read_zonemap(t.path)["files"])
    # appending with a live sidecar folds ONLY the new files in
    t.append(b.withColumn("volume", F.col("volume") + 1.0), ingest_seq=2)
    sidecar = zm.read_zonemap(t.path)
    assert len(sidecar["files"]) == len(zm.data_files(t.path)) > n0
    # still prunable and correct after the append
    sym = b.select("symbol").first().symbol
    got = t.read_pruned(spark, {"symbol": ("eq", sym)})
    want = t.read(spark).filter(F.col("symbol") == sym)
    assert _rows(got) == _rows(want)


def test_zonemap_stale_falls_back_to_full_scan(spark, tmp_path):
    t = _table(tmp_path)
    t.append(_clean(spark, n_symbols=2, bars_per_symbol=48), ingest_seq=1)
    t.build_zonemap()
    sidecar = zm.read_zonemap(t.path)
    # simulate an out-of-band write the sidecar never saw: drop one entry
    victim = next(iter(sidecar["files"]))
    del sidecar["files"][victim]
    zm.write_zonemap(t.path, sidecar)
    sym = sorted(r.symbol for r in t.read(spark).select("symbol").distinct().collect())[0]
    assert zm.prune_files(zm.read_zonemap(t.path), t.path, {"symbol": ("eq", sym)}) is None
    got = t.read_pruned(spark, {"symbol": ("eq", sym)})  # falls back, stays correct
    want = t.read(spark).filter(F.col("symbol") == sym)
    assert _rows(got) == _rows(want)


def test_zonemap_survives_compaction(spark, tmp_path):
    t = _table(tmp_path)
    b = _clean(spark, n_symbols=3, bars_per_symbol=48)
    t.append(b, ingest_seq=1)
    t.append(b.withColumn("volume", F.col("volume") * 2), ingest_seq=2)
    t.build_zonemap()
    t.compact(spark)
    sidecar = zm.read_zonemap(t.path)
    assert sidecar is not None
    assert sorted(sidecar["files"]) == zm.data_files(t.path)
    sym = b.select("symbol").first().symbol
    got = t.read_pruned(spark, {"symbol": ("eq", sym)})
    want = t.read(spark).filter(F.col("symbol") == sym)
    assert _rows(got) == _rows(want)


def test_no_match_prunes_to_empty_without_scan(spark, tmp_path):
    t = _table(tmp_path)
    t.append(_clean(spark, n_symbols=2, bars_per_symbol=48), ingest_seq=1)
    t.build_zonemap()
    sidecar = zm.read_zonemap(t.path)
    assert zm.prune_files(sidecar, t.path, {"symbol": ("eq", "ZZZ_NONE")}) == []
    assert t.read_pruned(spark, {"symbol": ("eq", "ZZZ_NONE")}).count() == 0


def test_snapshot_as_of_seq(spark, tmp_path):
    t = _table(tmp_path)
    b1 = _clean(spark, n_symbols=2, bars_per_symbol=48)
    t.append(b1, ingest_seq=1)
    snap1_rows = _rows(t.read(spark))
    # seq 2 rewrites 20 keys with new volumes
    t.append(b1.withColumn("volume", F.col("volume") + 10000.0).limit(20), ingest_seq=2)
    # current snapshot sees the rewrite; the as-of-1 snapshot does not
    assert _rows(t.read(spark, as_of_seq=1)) == snap1_rows
    cur = t.read(spark)
    assert cur.filter(F.col("volume") > 10000.0).count() == 20
    assert _rows(t.read(spark, as_of_seq=t.max_ingest_seq(spark))) == _rows(cur)


def test_max_watermark_answers_from_footer_stats(spark, tmp_path):
    """With a fresh zone map the global watermark plans NO file scan — the
    result is a driver-built local relation, yet matches the Spark agg."""
    t = _table(tmp_path)
    t.append(_clean(spark, n_symbols=2, bars_per_symbol=48), ingest_seq=1)
    t.build_zonemap()
    # append AFTER the build: the sidecar must fold the new files in and the
    # fast path must see the newer watermark
    t.append(
        _clean(spark, n_symbols=2, bars_per_symbol=60), ingest_seq=2
    )
    fast = t.max_watermark(spark)
    slow = t.max_watermark(spark, use_stats=False)
    assert fast.collect() == slow.collect()
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "parquet" not in plan.lower(), plan


def test_max_watermark_stale_sidecar_falls_back(spark, tmp_path):
    t = _table(tmp_path)
    t.append(_clean(spark, n_symbols=2, bars_per_symbol=48), ingest_seq=1)
    t.build_zonemap()
    sidecar = zm.read_zonemap(t.path)
    victim = next(iter(sidecar["files"]))
    del sidecar["files"][victim]
    zm.write_zonemap(t.path, sidecar)
    assert t.stats_max("timestamp") is None
    fast = t.max_watermark(spark)  # falls back to the scan, stays correct
    assert fast.collect() == t.max_watermark(spark, use_stats=False).collect()
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "parquet" in plan.lower()


def test_read_pruned_rejects_unknown_op_even_without_sidecar(spark, tmp_path):
    """The op check must not depend on whether build_zonemap ever ran:
    without it, a typo'd op silently returned the UNFILTERED table when no
    sidecar existed (the residual-filter loop only knows eq/between)."""
    import pytest

    t = _table(tmp_path)  # note: no build_zonemap call
    t.append(_clean(spark, n_symbols=2, bars_per_symbol=24), ingest_seq=1)
    with pytest.raises(ValueError, match="unsupported predicate op"):
        t.read_pruned(spark, {"symbol": ("lt", "SYM1")})
