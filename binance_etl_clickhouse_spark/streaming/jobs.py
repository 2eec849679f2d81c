"""Structured Streaming jobs — the stream-native replacement for the
reference's ``while True: run; sleep(3600)`` scheduler (run_pipeline.py:83-96,
SURVEY.md T3).

- ``--once``            ≙ ``trigger(availableNow=True)``
- continuous hourly     ≙ ``trigger(processingTime='1 hour')``
- progress.json         ≙ ``checkpointLocation`` offsets (T2)
- keep-last re-ingest   ≙ ``dropDuplicatesWithinWatermark`` in-stream +
                          the serving table's version dedup at rest (T4)

The staging parquet directory doubles as the stream source: each ingest
batch the fetch layer lands becomes a micro-batch here, so batch and
streaming modes share the storage layer unchanged (foreachBatch appends
through ServingTable with the epoch id as the version stamp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from binance_etl_clickhouse_spark.storage.table import ServingTable


def stream_ingest_staging(
    spark: SparkSession,
    staging_dir: str,
    schema: T.StructType,
    table: ServingTable,
    checkpoint_dir: str,
    dedup_keys: list[str] | None = None,
    watermark: tuple[str, str] | None = None,
    available_now: bool = True,
    processing_time: str = "1 hour",
) -> StreamingQuery:
    """staging parquet stream -> (optional in-stream dedup) -> serving table.

    ``watermark=(ts_col, delay)`` + ``dedup_keys`` enables
    ``dropDuplicatesWithinWatermark`` — duplicate (late/re-fetched) rows
    arriving within the delay are dropped in-stream; anything older is
    handled by the table's version dedup at read (idempotent upsert, T4).
    """
    src = spark.readStream.schema(schema).parquet(staging_dir)
    if watermark is not None:
        src = src.withWatermark(*watermark)
        if dedup_keys:
            src = src.dropDuplicatesWithinWatermark(dedup_keys)

    def sink(batch: DataFrame, epoch_id: int) -> None:
        if not batch.isEmpty():
            table.append(batch, ingest_seq=epoch_id + 1)

    writer = src.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def stream_resample_bars(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_len: str = "1 hour",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling aggregation with a watermark (late data beyond
    the delay is finalized out) — the streaming twin of resample/T5."""
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_len).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(F.col("w.start").alias("bucket_start"), key_col, "n", "total_value")
    )
