"""Mergeable-sketch aggregate state — the AggregatingMergeTree pattern.

A per-bucket ``count(DISTINCT x)`` rollup cannot answer range queries
(distinct counts don't add), so warehouses store the aggregate's mergeable
STATE per bucket instead and merge at query time — ClickHouse's
``AggregateFunction(uniq, ...)`` columns in an AggregatingMergeTree (the
reference's backing store supports exactly this), Druid/Pinot's HLL metric
columns. Spark 4 ships the Apache DataSketches HLL primitives natively
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``), so the
whole pattern is plain DataFrame code:

- **build**: ``hll_state(col)`` inside any groupBy — e.g. as an extra agg in
  a :class:`~binance_etl_clickhouse_spark.storage.rollup.RollupTable`, whose
  month-granular incremental refresh then maintains the sketch column with
  no extra machinery (state recomputes only for touched months);
- **query**: union the per-bucket states over ANY bucket subset and
  estimate — O(buckets) work instead of a raw-table rescan, the same
  pre-aggregation speedup the additive columns get, now for distincts.

Scale: a sketch is ~2^lgK bytes regardless of cardinality (lgK=12 → 4 KB
for <2% error), so a year of hourly per-symbol sketches is megabytes. The
union agg is associative/commutative → map-side partial merge applies.

Accuracy: estimates are deterministic (no RNG) but engine-specific, so
there is no DuckDB hash-oracle for them; tests pin (a) relative error vs
exact distinct, (b) merge consistency — union of per-bucket states equals
the sketch built over the raw rows (register-wise max is order-free).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: DataSketches HLL log2(registers): 12 → 4 KB state, ~1.6% typical error
DEFAULT_LG_K = 12


def hll_state(col: Column | str, lg_k: int = DEFAULT_LG_K) -> Column:
    """Aggregate expression producing mergeable HLL state (binary).

    Use inside any ``groupBy(...).agg(...)`` — including a RollupTable's
    ``aggs`` factory — and alias it; the column stores to parquet as BINARY.
    """
    return F.hll_sketch_agg(F.col(col) if isinstance(col, str) else col, F.lit(lg_k))


def hll_merge(state_col: Column | str) -> Column:
    """Aggregate expression merging stored HLL states (register-wise max)."""
    return F.hll_union_agg(F.col(state_col) if isinstance(state_col, str) else state_col)


def hll_estimate(state_col: Column | str) -> Column:
    """Point estimate (long) from one HLL state value."""
    return F.hll_sketch_estimate(
        F.col(state_col) if isinstance(state_col, str) else state_col
    )


def merge_distinct_over(
    rollup: DataFrame,
    state_col: str,
    group_cols: list[str] | None = None,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Range-query a sketch rollup: merge per-bucket states (optionally per
    residual group) and estimate.

    ``rollup`` is any frame holding an :func:`hll_state` column — typically a
    RollupTable read filtered to the wanted time range, where partition
    pruning has already cut the scan to the touched months.
    """
    merged = hll_merge(state_col)
    if group_cols:
        return rollup.groupBy(*group_cols).agg(
            hll_estimate(merged).cast("long").alias(out_col)
        )
    return rollup.agg(hll_estimate(merged).cast("long").alias(out_col))
