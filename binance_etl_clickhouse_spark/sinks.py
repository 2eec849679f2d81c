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


#: error-message fragments (lowercased) that mean "the target table does not
#: exist yet" across common JDBC dialects — Derby/Postgres, MySQL, H2,
#: SQL Server. Only this failure is benign on the epoch DELETE (first epoch:
#: the append creates the table); anything else must abort the batch.
MISSING_TABLE_MARKERS = (
    "does not exist",
    "doesn't exist",
    "not found",
    "invalid object name",
)


def stream_to_jdbc(
    src: DataFrame,
    url: str,
    table: str,
    checkpoint_dir: str,
    driver: str | None = None,
    batch_size: int = 10_000,
    available_now: bool = True,
    processing_time: str = "1 hour",
    identifier_quote: str = '"',
    missing_table_markers: tuple[str, ...] = MISSING_TABLE_MARKERS,
):
    """Exactly-once streaming JDBC sink (K2 for streams).

    ``foreachBatch`` stamps every micro-batch with its epoch id, DELETEs any
    rows of that epoch already in the table, then appends — so an epoch
    replayed after a crash mid-write (Spark's at-least-once contract for
    foreachBatch) overwrites its own partial output instead of duplicating
    it. Delete+insert keyed on the epoch is the standard idempotent-sink
    recipe for DBs without MERGE.

    The DELETE runs on the driver over a plain JDBC connection (one
    statement per epoch — negligible next to the batch insert); the insert
    itself is the distributed ``write_jdbc`` path.

    Dialect knobs: Spark's JDBC writer creates the ``epoch_id`` column as an
    exact-case quoted identifier, so the DELETE must quote it the way the
    target DB quotes identifiers — ``identifier_quote`` defaults to the ANSI
    double quote (Derby/Postgres/H2); pass a backtick for default-mode MySQL
    (whose double quote means a string literal — the DELETE would match
    nothing and replays would duplicate). ``missing_table_markers`` is the
    benign first-epoch failure sniff, matched case-insensitively.
    """
    from pyspark.sql import functions as F

    opts = {"driver": driver} if driver else {}
    qi = identifier_quote

    def _delete_epoch(spark_session, epoch_id: int) -> None:
        jvm = spark_session._jvm
        if driver:
            jvm.java.lang.Class.forName(driver)
        conn = jvm.java.sql.DriverManager.getConnection(url)
        try:
            st = conn.createStatement()
            try:
                st.executeUpdate(
                    f"DELETE FROM {table} WHERE {qi}epoch_id{qi} = {int(epoch_id)}"
                )
            finally:
                st.close()
        finally:
            conn.close()

    def sink(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        stamped = batch.withColumn("epoch_id", F.lit(int(epoch_id)))
        try:
            _delete_epoch(batch.sparkSession, epoch_id)
        except Exception as e:
            # only the missing-table case is benign (first epoch — the
            # append creates it); any other delete failure must abort the
            # batch, or a replay would silently duplicate rows
            msg = str(e).lower()
            if not any(m in msg for m in missing_table_markers):
                raise
        write_jdbc(
            stamped, url, table, mode="append", batch_size=batch_size, options=opts
        )

    writer = src.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
