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
    kll_merge_states,
    kll_quantile,
    kll_state,
    merge_distinct_over,
    merge_quantiles_over,
    sketch_retention_adjacent,
    theta_estimate,
    theta_intersect_states,
    theta_state,
    theta_union_states,
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


def test_kll_rollup_quantiles_merge_and_roundtrip(spark, tmp_path):
    """Per-day KLL states answer range quantile queries after a fold-merge.

    At this scale (1000 values < k=2048) the sketch is in its exact regime:
    merged quantiles must EQUAL exact percentiles, and the fold of per-day
    states must equal the sketch built over the raw rows.
    """
    ev = load_table(spark, SF, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("bucket")).agg(
        kll_state("value").alias("value_kll")
    )
    assert isinstance(daily.schema["value_kll"].dataType, BinaryType)

    path = str(tmp_path / "daily_kll")
    daily.write.parquet(path)
    back = spark.read.parquet(path)

    got = merge_quantiles_over(back, "value_kll", qs=(0.5, 0.95, 0.99)).first()
    # DataSketches KLL quantile definition (rank-select) differs from SQL
    # interpolating percentile(); compare against the non-interpolating form.
    exact = ev.selectExpr(
        "percentile_disc(0.5) WITHIN GROUP (ORDER BY cast(value as double)) as p50",
        "percentile_disc(0.95) WITHIN GROUP (ORDER BY cast(value as double)) as p95",
        "percentile_disc(0.99) WITHIN GROUP (ORDER BY cast(value as double)) as p99",
    ).first()
    for name in ("p50", "p95", "p99"):
        # exact regime: tolerance only guards the rank-definition half-step
        assert abs(got[name] - exact[name]) <= 0.05 * abs(exact[name]) + 1e-9, (
            name, got[name], exact[name],
        )

    # merge consistency: fold of per-bucket states == sketch over raw rows
    merged_p50 = back.agg(kll_merge_states("value_kll").alias("m")).select(
        kll_quantile("m", 0.5).alias("q")
    ).first()["q"]
    direct_p50 = ev.agg(kll_state("value").alias("m")).select(
        kll_quantile("m", 0.5).alias("q")
    ).first()["q"]
    assert merged_p50 == direct_p50

    # range query: merged first-half states == exact quantile over that range
    cut = back.select(F.min("bucket"), F.max("bucket")).first()
    mid = cut[0] + (cut[1] - cut[0]) / 2
    got_half = merge_quantiles_over(
        back.filter(F.col("bucket") <= F.lit(mid)), "value_kll", qs=(0.5,)
    ).first()["p50"]
    exact_half = (
        ev.filter(F.date_trunc("day", "ts") <= F.lit(mid))
        .selectExpr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY cast(value as double)) as p"
        )
        .first()["p"]
    )
    assert abs(got_half - exact_half) <= 0.05 * abs(exact_half) + 1e-9


def test_theta_set_algebra_union_intersect_difference(spark, tmp_path):
    """Theta states support union AND intersection/difference at query time.

    15 users < 4096 nominal entries -> theta is exact here, so estimates
    must match exact set counts computed from the raw rows.
    """
    ev = load_table(spark, SF, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("bucket")).agg(
        theta_state("user_id").alias("users_theta")
    )
    path = str(tmp_path / "daily_theta")
    daily.write.parquet(path)
    back = spark.read.parquet(path)

    # union across all buckets == global distinct
    got_union = back.agg(
        theta_estimate(theta_union_states("users_theta")).cast("long").alias("u")
    ).first()["u"]
    exact_union = ev.agg(F.countDistinct("user_id")).first()[0]
    assert got_union == exact_union

    # intersection across all buckets == users active EVERY day
    got_inter = back.agg(
        theta_estimate(theta_intersect_states("users_theta")).cast("long").alias("i")
    ).first()["i"]
    per_day = ev.groupBy(F.date_trunc("day", "ts").alias("d"), "user_id").count()
    n_days = per_day.select("d").distinct().count()
    exact_inter = (
        per_day.groupBy("user_id")
        .agg(F.countDistinct("d").alias("nd"))
        .filter(F.col("nd") == n_days)
        .count()
    )
    assert got_inter == exact_inter

    # adjacent-bucket retention/churn from states only vs exact self-join
    got = {
        r.bucket: (r.n_bucket, r.retained, r.churned)
        for r in sketch_retention_adjacent(back, "bucket", "users_theta").collect()
    }
    days = sorted(got)
    ud = ev.select(
        F.date_trunc("day", "ts").alias("d"), "user_id"
    ).distinct().cache()
    try:
        for d in days:
            cur = {r.user_id for r in ud.filter(F.col("d") == F.lit(d)).collect()}
            nxt_day = min(x for x in [r.d for r in ud.select("d").distinct().collect()] if x > d)
            nxt = {r.user_id for r in ud.filter(F.col("d") == F.lit(nxt_day)).collect()}
            assert got[d] == (len(cur), len(cur & nxt), len(cur - nxt)), d
    finally:
        ud.unpersist()


def test_cms_frequency_state_merge_and_point_query(spark, tmp_path):
    """Per-day CMS states merged over a bucket range answer point frequency
    queries; eps=0.001 over 1000 rows -> estimates equal exact counts."""
    from binance_etl_clickhouse_spark.operators.sketches import (
        cms_point_estimates,
        cms_state,
    )

    ev = load_table(spark, SF, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("bucket")).agg(
        cms_state("event_type").alias("types_cms"),
        cms_state("user_id").alias("users_cms"),
    )
    path = str(tmp_path / "daily_cms")
    daily.write.parquet(path)
    back = spark.read.parquet(path)

    exact_types = {
        r.event_type: r["count"] for r in ev.groupBy("event_type").count().collect()
    }
    got = cms_point_estimates(spark, back, "types_cms", list(exact_types))
    assert got == exact_types

    # long-typed column: items hash as longs
    exact_users = {
        r.user_id: r["count"] for r in ev.groupBy("user_id").count().limit(5).collect()
    }
    got_u = cms_point_estimates(spark, back, "users_cms", list(exact_users))
    assert got_u == exact_users

    # range query: first half of the buckets only
    cut = back.select(F.min("bucket"), F.max("bucket")).first()
    mid = cut[0] + (cut[1] - cut[0]) / 2
    got_half = cms_point_estimates(
        spark, back.filter(F.col("bucket") <= F.lit(mid)), "types_cms", ["click"]
    )
    exact_half = (
        ev.filter(F.date_trunc("day", "ts") <= F.lit(mid))
        .filter(F.col("event_type") == "click")
        .count()
    )
    assert got_half["click"] == exact_half


def test_kll_range_merge_over_empty_range_returns_null(spark):
    """A quantile range-query over a period with no buckets must return
    NULL (SQL-natural), not throw INVALID_ARRAY_INDEX_IN_ELEMENT_AT under
    ANSI mode."""
    from pyspark.sql import functions as F

    from binance_etl_clickhouse_spark.operators.sketches import (
        kll_merge_states,
        kll_quantile,
        kll_state,
    )

    df = spark.range(100).select(F.col("id").cast("double").alias("v"))
    states = df.agg(kll_state("v").alias("s")).filter(F.lit(False))  # empty
    out = states.agg(kll_merge_states("s").alias("m")).select(
        kll_quantile("m", 0.5).alias("p50")
    ).collect()
    assert out[0]["p50"] is None


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters: retention + count bounds + mergeability
# ---------------------------------------------------------------------------


def test_misra_gries_retention_bounds_and_merge(spark):
    from binance_etl_clickhouse_spark.operators.sketches import (
        merge_mg_summaries,
        misra_gries_summaries,
    )

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    k = 8
    summaries = misra_gries_summaries(
        ev.withColumn("bucket", (F.col("user_id") % 4).cast("string")),
        ["bucket"],
        "event_type",
        k=k,
    )
    pdf = summaries.toPandas()
    exact = (
        ev.withColumn("bucket", (F.col("user_id") % 4).cast("string"))
        .groupBy("bucket", "event_type")
        .count()
        .toPandas()
    )
    for bucket, grp in pdf.groupby("bucket"):
        n = int(grp["n_rows"].iloc[0])
        dec = int(grp["decremented"].iloc[0])
        ex = exact[exact.bucket == bucket].set_index("event_type")["count"]
        # (a) every true heavy hitter with freq > n/(k+1) must be retained
        for item, true_ct in ex.items():
            if true_ct > n / (k + 1):
                assert item in set(grp["item"]), f"{bucket}: lost heavy hitter {item}"
        # (b) per-item bounds: lower <= true <= lower + decremented
        for _, row in grp.iterrows():
            true_ct = int(ex.get(row["item"], 0))
            assert row["lower_count"] <= true_ct <= row["lower_count"] + dec

    # (c) merged summaries behave like one summary over the union: every
    # global heavy hitter above the merged threshold survives the merge
    merged = merge_mg_summaries(summaries, k=k).toPandas()
    n_total = ev.count()
    global_exact = ev.groupBy("event_type").count().toPandas().set_index("event_type")[
        "count"
    ]
    # merged guarantee is weaker (trim offset adds error); use 2x threshold
    for item, true_ct in global_exact.items():
        if true_ct > 2 * n_total / (k + 1):
            assert item in set(merged["item"]), f"merge lost global hitter {item}"
    # merged lower bounds never exceed true counts
    for _, row in merged.iterrows():
        assert row["lower_count"] <= int(global_exact.get(row["item"], 0))


def test_misra_gries_exactness_when_k_covers_domain(spark):
    """With k >= |domain| the MG pass never decrements: counts are exact."""
    from binance_etl_clickhouse_spark.operators.sketches import misra_gries_summaries

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    s = misra_gries_summaries(
        ev.withColumn("b", F.lit("all")), ["b"], "event_type", k=64
    ).toPandas()
    assert (s["decremented"] == 0).all()
    exact = ev.groupBy("event_type").count().toPandas().set_index("event_type")["count"]
    got = s.set_index("item")["lower_count"]
    assert sorted(got.index) == sorted(exact.index)
    for item in exact.index:
        assert int(got[item]) == int(exact[item])
