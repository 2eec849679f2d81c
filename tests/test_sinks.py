"""K2 — columnar DB insert, proven against a REAL database.

The reference inserts numpy column blocks into ClickHouse
(utils_clickhouse.py:46-57). No ClickHouse exists offline, but Spark
bundles embedded Derby, so the same ``write_jdbc`` path executes a genuine
JDBC INSERT and the read-back is value-compared row by row.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.operators.etl import clean_klines
from binance_etl_clickhouse_spark.sinks import read_jdbc, write_jdbc
from binance_etl_clickhouse_spark.sources.synthetic import synthetic_klines_raw

DERBY = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def _derby_url(tmp_path) -> str:
    return f"jdbc:derby:{tmp_path}/derby_db;create=true"


def test_jdbc_round_trip_klines(spark, tmp_path):
    """A real pipeline batch: write_jdbc INSERT -> read_jdbc -> exact match."""
    raw = synthetic_klines_raw(spark, n_symbols=2, bars_per_symbol=48, overlap_bars=0)
    batch = clean_klines(raw, market_type="SPOT", interval="1h")
    url = _derby_url(tmp_path)
    write_jdbc(batch, url, "klines", mode="overwrite", batch_size=500, options=DERBY)

    back = read_jdbc(spark, url, "klines", options=DERBY)
    assert set(back.columns) == set(batch.columns)
    cols = sorted(batch.columns)
    sent = sorted(map(tuple, batch.select(*cols).collect()))
    got = sorted(map(tuple, back.select(*cols).collect()))
    assert got == sent  # values, types, and timestamps survive the round trip


def test_jdbc_append_mode_accumulates(spark, tmp_path):
    url = _derby_url(tmp_path)
    df = spark.range(10).select(F.col("id"), (F.col("id") * 2.5).alias("v"))
    write_jdbc(df, url, "t_acc", mode="overwrite", options=DERBY)
    write_jdbc(df, url, "t_acc", mode="append", options=DERBY)
    back = read_jdbc(spark, url, "t_acc", options=DERBY)
    assert back.count() == 20
    assert back.agg(F.sum("v")).first()[0] == 2 * sum(i * 2.5 for i in range(10))


def test_jdbc_num_partitions_caps_connections(spark, tmp_path):
    # numPartitions is the write-side connection budget; with embedded Derby
    # (single-process DB) the coalesced write must still land every row
    url = _derby_url(tmp_path)
    df = spark.range(100).repartition(16).select(F.col("id"))
    write_jdbc(df, url, "t_np", mode="overwrite", num_partitions=2, options=DERBY)
    assert read_jdbc(spark, url, "t_np", options=DERBY).count() == 100


def test_stream_to_jdbc_exactly_once_on_replay(spark, tmp_path):
    """Streamed micro-batches land in Derby; a replayed epoch (crash
    recovery re-delivery) must overwrite its own rows, not duplicate them."""
    from binance_etl_clickhouse_spark.sinks import stream_to_jdbc

    url = _derby_url(tmp_path)
    staging = str(tmp_path / "staging")
    df = spark.range(40).select(F.col("id"), (F.col("id") * 1.5).alias("v"))
    df.write.parquet(staging)
    src = spark.readStream.schema(df.schema).parquet(staging)
    q = stream_to_jdbc(
        src,
        url,
        "t_stream",
        checkpoint_dir=str(tmp_path / "ckpt"),
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    q.awaitTermination(120)
    back = read_jdbc(spark, url, "t_stream", options=DERBY)
    assert back.count() == 40
    epochs = [r.EPOCH_ID for r in back.select("EPOCH_ID").distinct().collect()]
    assert len(epochs) >= 1

    # simulate at-least-once replay: restart from a WIPED checkpoint so the
    # same files re-deliver under the same epoch ids -> delete+insert must
    # leave the table unchanged in size
    import shutil

    shutil.rmtree(str(tmp_path / "ckpt"))
    q2 = stream_to_jdbc(
        src,
        url,
        "t_stream",
        checkpoint_dir=str(tmp_path / "ckpt"),
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    q2.awaitTermination(120)
    back2 = read_jdbc(spark, url, "t_stream", options=DERBY)
    assert back2.count() == 40  # no duplicates
    assert back2.agg(F.sum("v")).first()[0] == sum(i * 1.5 for i in range(40))
