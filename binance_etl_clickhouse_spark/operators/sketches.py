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

from pyspark.sql import Column, DataFrame, Window
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


# ---------------------------------------------------------------------------
# KLL quantile state — AggregateFunction(quantile, ...) analogue
# ---------------------------------------------------------------------------

#: DataSketches KLL accuracy parameter: 2048 → ~0.6% rank error, ~KB state
DEFAULT_KLL_K = 2048


def kll_state(col: Column | str, k: int = DEFAULT_KLL_K) -> Column:
    """Aggregate expression producing mergeable KLL quantile state (binary)
    over a double-valued column.

    The quantile counterpart of :func:`hll_state`: per-bucket medians/p99s
    don't combine (a median of medians is not the median), so the rollup
    stores the KLL STATE per bucket and :func:`merge_quantiles_over` answers
    any bucket range at query time. ClickHouse's
    ``AggregateFunction(quantilesTDigest, ...)`` column, on Spark's native
    DataSketches KLL primitives.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.kll_sketch_agg_double(c.cast("double"), F.lit(k))


def kll_merge_states(state_col: Column | str) -> Column:
    """Aggregate expression merging a GROUP of stored KLL states into one.

    Spark exposes KLL merge only as the two-argument scalar
    ``kll_sketch_merge_double``, so the group merge is a fold over
    ``collect_list`` — fine at query time, where the fold runs over the
    O(buckets-in-range) states a partition-pruned rollup scan returns (a few
    KB each), not over raw rows.
    """
    c = F.col(state_col) if isinstance(state_col, str) else state_col
    lst = F.collect_list(c)
    # empty-group guard: a range query over a quiet period (or a group
    # whose states are all NULL — collect_list drops them) yields [], and
    # element_at([], 1) THROWS under Spark 4's default ANSI mode instead of
    # returning NULL. try_element_at keeps the degenerate case a NULL state
    # (quantile reads then return NULL, the SQL-natural answer).
    return F.aggregate(
        F.slice(lst, 2, 2_000_000_000),
        F.try_element_at(lst, F.lit(1)),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    )


def kll_quantile(state_col: Column | str, q: float) -> Column:
    """Quantile point-read (double) from one KLL state value."""
    c = F.col(state_col) if isinstance(state_col, str) else state_col
    return F.kll_sketch_get_quantile_double(c, F.lit(float(q)))


def merge_quantiles_over(
    rollup: DataFrame,
    state_col: str,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Range-query a KLL rollup: merge per-bucket states (optionally per
    residual group) and read out quantiles as ``p50``/``p95``/... columns."""
    merged = kll_merge_states(state_col).alias("_m")
    outs = [
        F.kll_sketch_get_quantile_double(F.col("_m"), F.lit(float(q))).alias(
            f"p{int(q * 100)}" if float(q * 100).is_integer() else f"p{str(q).replace('.', '_')}"
        )
        for q in qs
    ]
    if group_cols:
        return rollup.groupBy(*group_cols).agg(merged).select(*group_cols, *outs)
    return rollup.agg(merged).select(*outs)


# ---------------------------------------------------------------------------
# Theta sketch state — set algebra over distincts (uniqTheta analogue)
# ---------------------------------------------------------------------------

#: DataSketches theta log2(nominal entries): 12 → exact below 4096 distincts
DEFAULT_THETA_LG_K = 12


def theta_state(col: Column | str, lg_k: int = DEFAULT_THETA_LG_K) -> Column:
    """Aggregate expression producing mergeable theta sketch state (binary).

    HLL answers only "how many distinct in this bucket range" (union). Theta
    states additionally support INTERSECTION and DIFFERENCE at query time —
    "users active in month A *and* month B" (retention) or "in A but not B"
    (churn) straight from per-bucket states, no raw-table rescan, no
    user-level join. ClickHouse's ``uniqTheta`` / ``AggregateFunction``
    pattern on Spark's native DataSketches theta primitives.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.theta_sketch_agg(c, F.lit(lg_k))


def theta_union_states(state_col: Column | str) -> Column:
    """Aggregate expression: union-merge stored theta states."""
    c = F.col(state_col) if isinstance(state_col, str) else state_col
    return F.theta_union_agg(c)


def theta_intersect_states(state_col: Column | str) -> Column:
    """Aggregate expression: intersection-merge stored theta states."""
    c = F.col(state_col) if isinstance(state_col, str) else state_col
    return F.theta_intersection_agg(c)


def theta_estimate(state_col: Column | str) -> Column:
    """Point estimate (double → cast long by callers) from one theta state."""
    c = F.col(state_col) if isinstance(state_col, str) else state_col
    return F.theta_sketch_estimate(c)


def cms_state(
    col: Column | str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> Column:
    """Aggregate expression producing mergeable Count-Min-Sketch frequency
    state (binary) — approximate per-item COUNTS, the frequency counterpart
    of the HLL/theta/KLL states.

    Per-bucket exact top-k tables can't answer "how often did item X occur
    over this bucket range" for arbitrary X; a CMS state per bucket can,
    with error ≤ eps * range_total at the given confidence. The ``seed``
    must be identical across buckets or the states don't merge.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.count_min_sketch(c, F.lit(float(eps)), F.lit(float(confidence)), F.lit(seed))


def cms_point_estimates(
    spark,
    states: DataFrame,
    state_col: str,
    items: list,
) -> dict:
    """Merge stored CMS states and point-query the given items.

    Spark exposes CMS build (`count_min_sketch`) but no SQL reader over the
    binary, so the merge + query runs driver-side through the JVM sketch
    class over the COLLECTED bucket states. That is the intended shape: a
    rollup holds O(buckets) kilobyte-scale states (the compressed form of
    the raw table), so collecting them is metadata-sized work no matter how
    many raw rows each bucket summarized. String items hash as UTF-8
    strings, integral items as longs — matching how the aggregate hashed
    the column.
    """
    jvm = spark._jvm
    cms_cls = jvm.org.apache.spark.util.sketch.CountMinSketch
    merged = None
    for row in states.select(state_col).collect():
        sk = cms_cls.readFrom(bytes(row[0]))
        if merged is None:
            merged = sk
        else:
            merged.mergeInPlace(sk)
    if merged is None:
        return {item: 0 for item in items}
    return {item: merged.estimateCount(item) for item in items}


def sketch_retention_adjacent(
    bucketed: DataFrame,
    bucket_col: str = "bucket",
    state_col: str = "users_theta",
) -> DataFrame:
    """Adjacent-bucket retention/churn from theta states alone.

    Input: one row per bucket with a :func:`theta_state` column (e.g. a
    daily rollup). Output per consecutive bucket pair: ``n_bucket`` distinct
    actives, ``retained`` (∩ next bucket) and ``churned`` (∖ next bucket)
    estimates. The entire computation is a lag window + two scalar sketch
    ops over O(buckets) rows — the raw table is never re-read, which is the
    point at 100 TB: the retention matrix costs the same whether the bucket
    held a thousand users or a billion.
    """
    from pyspark.sql import Window

    w = Window.orderBy(bucket_col)
    paired = bucketed.select(
        F.col(bucket_col),
        F.col(state_col).alias("s"),
        F.lead(state_col).over(w).alias("s_next"),
    )
    return paired.filter(F.col("s_next").isNotNull()).select(
        F.col(bucket_col),
        theta_estimate("s").cast("long").alias("n_bucket"),
        theta_estimate(F.theta_intersection("s", "s_next")).cast("long").alias("retained"),
        theta_estimate(F.theta_difference("s", "s_next")).cast("long").alias("churned"),
    )


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters: bounded-state per-bucket top-item summaries.
# ---------------------------------------------------------------------------


def misra_gries_summaries(
    df: DataFrame,
    bucket_cols: list[str],
    item_col: str,
    k: int = 8,
) -> DataFrame:
    """One-pass Misra-Gries summary per bucket: <= k counters + the total
    decrement, the mergeable heavy-hitters state (frequent() in ClickHouse
    terms, topNStream elsewhere).

    Guarantees per bucket: every item with true frequency > n_bucket/(k+1)
    is retained, and for each retained item
    ``count <= true_count <= count + decremented``. Summaries merge by
    counter addition + re-trim (:func:`merge_mg_summaries`), so a rollup
    can store one summary per (bucket) and answer any bucket-range
    heavy-hitters query from O(buckets * k) state.

    The pass itself is ``applyInPandas`` — a genuinely one-pass, O(k)-memory
    stream algorithm per bucket (the exact groupBy twin would shuffle every
    distinct item; this shuffles each bucket's rows once and keeps k
    counters).
    """
    import pandas as pd

    out_fields = ", ".join(f"{c} string" for c in bucket_cols)
    schema = f"{out_fields}, item string, lower_count long, decremented long, n_rows long"

    def mg(pdf: pd.DataFrame) -> pd.DataFrame:
        counters: dict[str, int] = {}
        dec = 0
        vals = pdf[item_col].astype(str)
        for x in vals:
            if x in counters:
                counters[x] += 1
            elif len(counters) < k:
                counters[x] = 1
            else:
                dec += 1
                dead = []
                for key in counters:
                    counters[key] -= 1
                    if counters[key] == 0:
                        dead.append(key)
                for key in dead:
                    del counters[key]
        keys = {c: str(pdf[c].iloc[0]) for c in bucket_cols}
        rows = [
            {**keys, "item": it, "lower_count": int(ct), "decremented": int(dec),
             "n_rows": int(len(pdf))}
            for it, ct in sorted(counters.items())
        ]
        return pd.DataFrame(
            rows,
            columns=[*bucket_cols, "item", "lower_count", "decremented", "n_rows"],
        )

    casted = df.select(
        *[F.col(c).cast("string").alias(c) for c in bucket_cols], item_col
    )
    return casted.groupBy(*bucket_cols).applyInPandas(mg, schema=schema)


def merge_mg_summaries(summaries: DataFrame, k: int = 8) -> DataFrame:
    """Merge per-bucket MG summaries into ONE summary (counter addition,
    then trim back to k by subtracting the (k+1)-largest merged count).

    The classic mergeable-summaries result (Agarwal et al., PODS'12): the
    merged state keeps the per-item lower-bound guarantee with error
    bounded by sum of the inputs' decrements plus the trim offset.
    """
    merged = summaries.groupBy("item").agg(
        F.sum("lower_count").cast("long").alias("c")
    )
    w = Window.orderBy(F.col("c").desc(), F.col("item"))
    ranked = merged.withColumn("rn", F.row_number().over(w))
    # offset = the (k+1)-th largest merged count (0 if <= k items survive)
    off = ranked.filter(F.col("rn") == k + 1).agg(
        F.coalesce(F.max("c"), F.lit(0)).cast("long").alias("off")
    )
    return (
        ranked.filter(F.col("rn") <= k)
        .crossJoin(F.broadcast(off))
        .select(
            "item",
            F.greatest(F.col("c") - F.col("off"), F.lit(0))
            .cast("long")
            .alias("lower_count"),
        )
        .filter(F.col("lower_count") > 0)
    )
