"""External sinks — K2's columnar DB insert, Spark-side.

The reference pushes numpy column blocks over ClickHouse's native protocol
(utils_clickhouse.py:46-57). In Spark the serving write is the parquet
ServingTable (storage/table.py); when an external DB is the destination the
same DataFrame goes through the JDBC batch writer below, or — exactly-once —
through ``foreachBatch`` in the streaming layer.

No database (or JDBC driver jar) exists in this environment, so
``write_jdbc`` is a thin, clearly-gated configuration seam: it builds the
writer and either executes or returns the fully-configured plan for
inspection (``dry_run``), keeping the option surface testable offline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


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
