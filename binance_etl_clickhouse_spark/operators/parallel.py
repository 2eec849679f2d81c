"""Parallelism guard for CPU-heavy per-row operators.

A small parquet input (one file, one row group) plans as a single scan task,
which serializes compute-bound projections — shingling, minhash
permutations, simhash bit-sums — onto one core no matter how many the
cluster has. ``ensure_min_parallelism`` repartitions ONLY in that
under-partitioned regime; on a real multi-file/100 TB input the scan
already carries >= cluster parallelism and this is a no-op (no extra
shuffle). The shuffle it does introduce moves the raw rows once, which is
orders cheaper than the per-row hashing it then parallelizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, target: int | None = None) -> DataFrame:
    spark = df.sparkSession
    tgt = target or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= tgt:
        return df
    return df.repartition(tgt)
