"""External sinks — K2's columnar DB insert, Spark-side.

The reference pushes numpy column blocks over ClickHouse's native protocol
(utils_clickhouse.py:46-57). In Spark the serving write is the parquet
ServingTable (storage/table.py); when an external DB is the destination the
same DataFrame goes through the JDBC batch writer below, or — exactly-once —
through ``foreachBatch`` in the streaming layer.

No ClickHouse (or its JDBC driver jar) exists in this environment, but the
writer is exercised against a REAL database offline: Spark bundles embedded
Derby, and the round-trip test (tests/test_sinks.py) inserts a pipeline
batch through ``write_jdbc`` and hash-compares the ``read_jdbc`` read-back.
``dry_run`` additionally exposes the fully-configured writer for option
inspection without a database.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    num_partitions: int | None = None,
    options: dict[str, str] | None = None,
    dry_run: bool = False,
):
    """Columnar batch insert into an external DB (≙ clickhouse_insert, K2).

    ``batchsize`` controls rows per round trip (the numpy-columnar-block
    analogue); ``numPartitions`` caps concurrent connections — at cluster
    scale this is the write-side connection budget, the same role the
    reference's insert-thread count played.
    """
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    writer = writer.option("batchsize", str(batch_size))
    if num_partitions is not None:
        writer = writer.option("numPartitions", str(num_partitions))
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer = writer.mode(mode)
    if dry_run:
        return writer
    writer.save()
    return None


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Read an external DB table back (the verification half of K2; at
    cluster scale add partitionColumn/lowerBound/upperBound to parallelize
    the scan instead of single-connection reads)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load()
