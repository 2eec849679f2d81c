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


def test_observe_metrics_ride_ingest(spark, tmp_path):
    cfg = PipelineConfig(
        intervals=["1h"], end_ms=1704067200000 + 23 * 3_600_000,
        n_spot_symbols=4, n_perp_symbols=2, fetch_partitions=2,
    )
    p = Pipeline(spark, str(tmp_path / "db"), cfg)
    p.update_symbols()
    p.update_klines("SPOT", "1h")
    # A2: counts observed on the write job itself, no second scan
    assert p.last_ingest_metrics == {"rows": 48, "symbols": 2}


def test_progress_clear_after_load(spark, tmp_path):
    from binance_etl_clickhouse_spark.storage.state import ProgressTable

    pt = ProgressTable(str(tmp_path / "progress"))
    syms = spark.createDataFrame([("A",), ("B",)], ["symbol"])
    pt.mark_done(syms)
    assert pt.read(spark).count() == 2
    pt.clear()  # K3: reset checkpoint after successful serving load
    assert pt.read(spark).count() == 0
    assert pt.pending(syms, spark).count() == 2


def test_jdbc_sink_dry_run_configures_writer(spark):
    from binance_etl_clickhouse_spark.sinks import write_jdbc

    df = spark.range(5)
    writer = write_jdbc(
        df, url="jdbc:postgresql://db:5432/x", table="t",
        num_partitions=4, options={"user": "u"}, dry_run=True,
    )
    assert writer is not None  # configured plan returned, nothing executed


def test_clickhouse_compat_functions(spark):
    """Reference-flavored SQL (toYYYYMM & friends) runs verbatim; each compat
    function matches its native-Spark twin and inlines as a JVM expression
    (no Python UDF node in the plan)."""
    from binance_etl_clickhouse_spark.engine import AnalyticsEngine, register_clickhouse_compat

    register_clickhouse_compat(spark)
    eng = AnalyticsEngine(spark, verbose=False)
    eng.register_testdata("/root/testdata/sf0.001")
    got = eng.sql(
        """
        SELECT toYYYYMM(ts) AS m, toStartOfHour(ts) AS h,
               toUnixTimestamp(ts) AS u, toDateTime(toUnixTimestamp(ts)) AS rt,
               intDiv(user_id, 7) AS d
        FROM events ORDER BY u LIMIT 100
        """
    )
    want = eng.sql(
        """
        SELECT CAST(date_format(ts, 'yyyyMM') AS INT) AS m, date_trunc('hour', ts) AS h,
               unix_timestamp(ts) AS u, timestamp_seconds(unix_timestamp(ts)) AS rt,
               user_id DIV 7 AS d
        FROM events ORDER BY u LIMIT 100
        """
    )
    assert got.collect() == want.collect()
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_clickhouse_intdiv_floors_negative_operands(spark):
    """ClickHouse intDiv floors (rounds toward -inf); Spark DIV truncates —
    the shim must floor: intDiv(-7, 2) = -4, not -3."""
    from binance_etl_clickhouse_spark.engine import register_clickhouse_compat

    register_clickhouse_compat(spark)
    row = spark.sql(
        "SELECT intDiv(-7, 2) a, intDiv(7, -2) b, intDiv(-7, -2) c, "
        "intDiv(7, 2) d, intDiv(-6, 2) e"
    ).first()
    assert (row.a, row.b, row.c, row.d, row.e) == (-4, -4, 3, 3, -3)


def test_clickhouse_compat_string_and_token_functions(spark):
    """hasToken / splitByChar / toYYYYMMDD & friends match their native-Spark
    twins and stay JVM-side (SQL UDFs inline — no Python eval node)."""
    from binance_etl_clickhouse_spark.engine import AnalyticsEngine, register_clickhouse_compat

    register_clickhouse_compat(spark)
    eng = AnalyticsEngine(spark, verbose=False)
    eng.register_testdata("/root/testdata/sf0.001")
    got = eng.sql(
        """
        SELECT doc_id,
               hasToken(text, 'the') AS h,
               hasTokenCaseInsensitive(text, 'THE') AS hc,
               splitByChar(' ', text)[0] AS first_tok,
               lengthUTF8(text) AS n
        FROM documents ORDER BY doc_id LIMIT 50
        """
    )
    want = eng.sql(
        """
        SELECT doc_id,
               array_contains(split(text, ' '), 'the') AS h,
               array_contains(split(lower(text), ' '), 'the') AS hc,
               split(text, ' ')[0] AS first_tok,
               length(text) AS n
        FROM documents ORDER BY doc_id LIMIT 50
        """
    )
    assert got.collect() == want.collect()
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # splitByChar must treat the separator literally, not as a regex
    row = eng.sql("SELECT splitByChar('|', 'a|b|c') AS parts").first()
    assert row.parts == ["a", "b", "c"]
    # ISO week start is Monday-anchored in both engines
    row = eng.sql(
        "SELECT toStartOfISOWeek(TIMESTAMP '2024-03-07 10:00:00') AS w, "
        "toYYYYMMDD(TIMESTAMP '2024-03-07 10:00:00') AS d"
    ).first()
    assert str(row.w) == "2024-03-04 00:00:00" and row.d == 20240307


def test_salted_join_rejects_outer_joins(spark):
    """Right/full outer would emit up to n_salts null-extended copies per
    unmatched small row — rejected loudly instead."""
    import pytest

    from binance_etl_clickhouse_spark.operators.skew import salted_join

    big = spark.range(10).withColumnRenamed("id", "k")
    small = spark.range(3).withColumnRenamed("id", "k")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="inner/left"):
            salted_join(big, small, "k", how=how)
