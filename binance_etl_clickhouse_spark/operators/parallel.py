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


def compact_persist(df: DataFrame, target: int | None = None) -> DataFrame:
    """Persist a frame that later stages re-scan MANY times (iterative
    graph/EM loops), capped at cluster parallelism.

    The dual of :func:`ensure_min_parallelism`: a persisted shuffle output
    pins its reducer partitioning (AQE cannot re-coalesce a cached plan),
    so a small frame cached at ``spark.sql.shuffle.partitions`` fan-out
    costs every downstream iteration one tiny task per reducer partition —
    k iterations x 2 joins x 200+ near-empty tasks is pure scheduler
    overhead. ``coalesce`` to ``defaultParallelism`` merges those reads
    without a shuffle and without losing any usable parallelism: on a
    1000-executor cluster the cap IS the cluster's core count, so a big
    frame stays fully distributed.
    """
    spark = df.sparkSession
    tgt = target or spark.sparkContext.defaultParallelism
    # NOTE: no getNumPartitions() probe — under AQE, touching .rdd forces
    # eager evaluation of the query stages built so far (once per call in
    # an iterative loop). coalesce(tgt) caps the count at tgt instead:
    # a shuffle output wider than tgt merges down, anything at or under
    # tgt is unaffected — except that ADJACENT coalesces collapse in the
    # logical plan (df.coalesce(1) then coalesce(tgt) re-widens toward
    # the source partitioning, still <= tgt), which is harmless for the
    # purpose here and pinned in tests.
    return df.coalesce(tgt).persist()
