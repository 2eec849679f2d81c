"""Testdata table loaders + temp-view registration.

The driver's synthetic TPC-H-ish tables (TESTDATA.md) are the correctness
corpus; the reference-shaped tables (klines/symbols/rates) are produced by
``sources.synthetic``. Loading is a plain partitioned parquet scan so
Catalyst's pushdown/pruning applies — the per-file pandas loop the reference
uses (`crypto_data_pipeline_clickhouse.py:642-649`) is subsumed by
``spark.read.parquet`` over the whole directory (SURVEY.md S7/U2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)



def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table.

    ``events.ts`` has shipped as either parquet TIMESTAMP(NANOS) — which
    Spark 4 refuses to read natively, so it arrives as long under the legacy
    conf and gets truncated to microseconds (Spark timestamp precision) —
    or as TIMESTAMP(MICROS) with isAdjustedToUTC=false, which Spark reads as
    TIMESTAMP_NTZ. Branch on the type actually read, and normalize both to a
    session-TZ TIMESTAMP (session TZ is pinned to UTC, so the NTZ cast is a
    type change, not a value change — and matches the UTC-naive DuckDB
    oracle). Downstream epoch/unix_* functions require plain TIMESTAMP.
    All other tables are plain scans with full pushdown.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, LongType):
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view for ``spark.sql``."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
