"""Globally-ordered parquet export — the ClickHouse ``ORDER BY`` final
materialization / deterministic training-order artifact.

``sorted_export`` writes a DataFrame as N parquet files forming ONE total
order: file i's key range lies entirely at-or-before file i+1's (equal keys
never split across files), and Spark's part-file numbering follows the range
partition id, so reading the files in lexicographic name order replays the
global order without any sort. Consumers that stream training data
sequentially (or resume mid-run at a file boundary) get a reproducible
order with no driver-side materialization anywhere.

Scale shape: ``repartitionByRange`` samples the keys to build balanced range
bounds (one pass + one shuffle — the same machinery as a global ``orderBy``)
and ``sortWithinPartitions`` sorts each output partition independently;
nothing ever funnels through a single task, and each file's footer carries
tight min/max stats on the sort keys (verified in tests via the zone-map
bounds reader), so the export is immediately range-prunable too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def sorted_arrangement(df: DataFrame, cols: list[str], n_files: int) -> DataFrame:
    """The plan half of :func:`sorted_export` (exposed for plan tests):
    range-repartition on the sort keys + partition-local sort."""
    return df.repartitionByRange(n_files, *cols).sortWithinPartitions(*cols)


def sorted_export(
    df: DataFrame, path: str, cols: list[str], n_files: int
) -> None:
    """Write ``df`` to ``path`` as ``n_files`` files in one global order on
    ``cols`` (file-name order == key order; equal keys stay in one file)."""
    sorted_arrangement(df, cols, n_files).write.mode("overwrite").parquet(path)
