"""Incremental materialized rollup (continuous-aggregate analogue).

Pins the three load-bearing properties: a refresh reproduces the full
aggregate, an incremental refresh recomputes ONLY months touched by new
ingest (untouched partition files are not rewritten), and refresh with no
new data is a no-op.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.operators.etl import clean_klines
from binance_etl_clickhouse_spark.schemas import KLINES_PK
from binance_etl_clickhouse_spark.sources.synthetic import synthetic_klines_raw
from binance_etl_clickhouse_spark.storage import RollupTable, ServingTable


def _tables(tmp_path) -> tuple[ServingTable, RollupTable]:
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
        group_cols=["symbol"],
        aggs=lambda: [
            F.count(F.lit(1)).alias("n_bars"),
            F.round(F.sum("volume"), 4).alias("volume"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
        ],
    )
    return serving, rollup


def _clean(spark, **kw):
    # 1h bars from 2024-01-01; 800 bars ≈ 33 days -> spans Jan + Feb months
    raw = synthetic_klines_raw(spark, **kw)
    return clean_klines(raw, market_type="SPOT", interval="1h")


def _expected(serving, spark):
    return (
        serving.read(spark)
        .groupBy(F.date_trunc("day", "timestamp").alias("bucket"), "symbol")
        .agg(
            F.count(F.lit(1)).alias("n_bars"),
            F.round(F.sum("volume"), 4).alias("volume"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
        )
    )


def _month_files(path: str) -> dict[str, float]:
    out = {}
    for d in os.listdir(path):
        if not d.startswith("month="):
            continue
        for f in os.listdir(os.path.join(path, d)):
            if f.endswith(".parquet"):
                out[f"{d}/{f}"] = os.path.getmtime(os.path.join(path, d, f))
    return out


def test_rollup_initial_refresh_matches_full_agg(spark, tmp_path):
    serving, rollup = _tables(tmp_path)
    serving.append(_clean(spark, n_symbols=2, bars_per_symbol=800), ingest_seq=1)

    months = rollup.refresh(spark)
    assert months == [202401, 202402]

    got = rollup.read(spark).drop("month")
    exp = _expected(serving, spark)
    assert got.exceptAll(exp).isEmpty() and exp.exceptAll(got).isEmpty()


def test_rollup_incremental_refresh_touches_only_new_months(spark, tmp_path):
    serving, rollup = _tables(tmp_path)
    serving.append(_clean(spark, n_symbols=2, bars_per_symbol=800), ingest_seq=1)
    rollup.refresh(spark)
    before = _month_files(rollup.path)

    # re-ingest a slice of February bars with corrected volumes (keep-last
    # upsert) — only month 202402 may be recomputed
    feb = (
        _clean(spark, n_symbols=2, bars_per_symbol=800)
        .filter(F.month("timestamp") == 2)
        .withColumn("volume", F.col("volume") + 5000.0)
    )
    serving.append(feb, ingest_seq=2)
    months = rollup.refresh(spark)
    assert months == [202402]

    after = _month_files(rollup.path)
    jan_before = {k: v for k, v in before.items() if k.startswith("month=202401/")}
    jan_after = {k: v for k, v in after.items() if k.startswith("month=202401/")}
    assert jan_before == jan_after, "untouched month was rewritten"
    assert {k for k in after if k.startswith("month=202402/")} != {
        k for k in before if k.startswith("month=202402/")
    } or any(
        after[k] != before.get(k) for k in after if k.startswith("month=202402/")
    ), "touched month was not rewritten"

    # corrected volumes visible; whole table still matches full recompute
    got = rollup.read(spark).drop("month")
    exp = _expected(serving, spark)
    assert got.exceptAll(exp).isEmpty() and exp.exceptAll(got).isEmpty()


def test_rollup_refresh_noop_when_no_new_data(spark, tmp_path):
    serving, rollup = _tables(tmp_path)
    serving.append(_clean(spark, n_symbols=1, bars_per_symbol=100), ingest_seq=1)
    assert rollup.refresh(spark) == [202401]
    before = _month_files(rollup.path)
    assert rollup.refresh(spark) == []
    assert _month_files(rollup.path) == before


def test_rollup_expire_independent_of_source(spark, tmp_path):
    """Retention split: expiring old months from the rollup leaves the
    source intact, and a no-new-data refresh does not resurrect them."""
    t, r = _tables(tmp_path)
    t.append(_clean(spark, n_symbols=2, bars_per_symbol=800), ingest_seq=1)
    r.refresh(spark)
    months = sorted(
        x.month for x in r.read(spark).select("month").distinct().collect()
    )
    assert len(months) >= 2
    dropped = r.expire(before_month=months[-1])
    assert dropped == months[:-1]
    left = sorted(x.month for x in r.read(spark).select("month").distinct().collect())
    assert left == [months[-1]]
    # source untouched; a no-new-data refresh must not resurrect old months
    src_months = sorted(
        x.month for x in t.read_raw(spark).select("month").distinct().collect()
    )
    assert src_months == months
    assert r.refresh(spark) == []
    still = sorted(x.month for x in r.read(spark).select("month").distinct().collect())
    assert still == [months[-1]]


def test_expire_all_months_keeps_refresh_state(spark, tmp_path):
    """Whole-rollup expiry must not lose last_seq: without the preserved
    meta the next refresh would see -1 and resurrect every deliberately
    dropped month from raw."""
    serving, rollup = _tables(tmp_path)
    serving.append(_clean(spark, n_symbols=2, bars_per_symbol=100), ingest_seq=1)
    rollup.refresh(spark)
    last_seq = rollup._meta()["last_seq"]
    months = sorted(
        int(d.split("=")[1])
        for d in __import__("os").listdir(rollup.path)
        if d.startswith("month=")
    )
    dropped = rollup.expire(months[-1] + 1)  # cutoff above newest -> drop all
    assert dropped == months
    assert rollup._meta()["last_seq"] == last_seq
    # no new ingest since last_seq -> refresh recomputes nothing
    assert rollup.refresh(spark) == []
