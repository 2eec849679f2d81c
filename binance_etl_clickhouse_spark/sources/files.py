"""File-drop sources beyond parquet: JSONL / CSV document feeds.

Training corpora commonly arrive as JSONL dumps (one document per line) or
CSV exports long before they are parquet. Both readers here are
schema-explicit (never inferSchema on a 100 TB drop — that is a full extra
scan) and PERMISSIVE: malformed lines land in a quarantine column instead
of failing the job, so one bad shard can't kill an ingest — the same
per-record tolerance the fetch layer applies per symbol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

#: documents-table shape for text corpus drops (matches testdata documents)
DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL corpus reader: explicit schema, malformed lines quarantined.

    Returns all rows; split with :func:`partition_corrupt`. Line-split JSON
    is splittable, so at scale the scan parallelizes per HDFS/S3 block like
    any text source.
    """
    return (
        spark.read.schema(DOCUMENTS_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_documents_csv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """CSV twin (explicit schema + quarantine column, no inferSchema scan)."""
    return (
        spark.read.schema(DOCUMENTS_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .csv(path)
    )


def partition_corrupt(df: DataFrame, persist: bool = True) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the quarantine column, quarantined rows).

    Spark refuses plans that query the internal corrupt column straight off
    a raw JSON/CSV scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    — its documented pattern, applied here, is to cache the parsed scan and
    branch from that. Both halves then come from ONE parse. In a 100 TB
    ingest the equivalent is writing clean/quarantine out in the same job
    (foreachBatch / partitioned write), not re-scanning the raw drop.

    ``persist=False`` skips the cache: the returned frames have no
    releasable handle, so a repeated caller (a foreachBatch sink, once per
    micro-batch) would leak one cached dataset per call for the stream's
    lifetime. foreachBatch batches are materialized micro-batch frames,
    not raw scans, so the corrupt-column restriction doesn't bite there."""
    parsed = df.cache() if persist else df
    clean = parsed.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = parsed.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad
