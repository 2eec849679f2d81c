"""Projection routing — answer aggregate queries from a materialized rollup
when it covers them (the ClickHouse *projections* / AggregatingMergeTree
auto-routing analogue; also TimescaleDB continuous-aggregate real-time
routing).

The reference's warehouse can attach pre-aggregated projections to a table
and its optimizer silently answers covered GROUP BYs from them. This module
is the engine-side equivalent built on :class:`storage.rollup.RollupTable`:

1. **Typed mergeable metrics.** A projection declares its metrics as
   (name, kind, source column) where kind ∈ sum/count/min/max/avg/uniq.
   Every kind has a *partial state* the rollup stores and a *merge*
   expression that re-aggregates states to any coarser grain:

   ==========  =======================  ==============================
   kind        stored state             merge to coarser bucket
   ==========  =======================  ==============================
   sum         sum(col)                 sum
   count       count(*)                 sum
   min / max   min/max(col)             min / max
   avg         sum(col), count(col)     sum/sum division at answer time
   uniq        hll_sketch_agg(col)      hll_union_agg -> estimate
   ==========  =======================  ==============================

   This is exactly ClickHouse's ``AggregateFunction`` state/merge split,
   expressed with Spark's native partial-aggregatable functions (the HLL
   state is Spark's DataSketches binary — see ``operators/sketches.py``).

2. **Coverage test, not SQL parsing.** ``covers(grain, group_cols,
   metrics)`` is a static check: requested group columns ⊆ projection's,
   requested grain is an exact coarsening of the stored grain (hour→day→
   month→quarter→year; week only from ≤day grains since weeks don't align
   with months), requested metrics ⊆ declared. Routing is explicit and
   inspectable — no optimizer magic to debug at 3am.

3. **Scale shape.** An answered query scans ONLY the rollup (orders of
   magnitude smaller than the raw table); a time-range predicate prunes
   rollup month partitions before any task runs. Re-aggregation shuffles
   |rollup buckets| rows, never raw rows. ``route()`` falls back to the
   raw dedup snapshot with the SAME output schema when nothing covers, so
   callers get projection acceleration without two code paths.

Correctness: merge-of-states equals direct aggregation exactly for
sum/count/min/max (and avg up to one IEEE division); for uniq both paths
go through the identical sketch, and merge-equality is pinned by
``tests/test_sketches.py``. ``tests/test_projection.py`` pins
rollup-answer == raw-answer and the only-the-rollup-is-scanned plan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.operators.sketches import (
    hll_estimate,
    hll_merge,
    hll_state,
)
from binance_etl_clickhouse_spark.schemas import MONTH_COL
from binance_etl_clickhouse_spark.storage.rollup import BUCKET_COL, RollupTable
from binance_etl_clickhouse_spark.storage.table import ServingTable

_KINDS = ("sum", "count", "min", "max", "avg", "uniq")

#: grain -> the strictly coarser grains reachable by date_trunc on the
#: stored bucket. Weeks only nest over sub-day grains (a month boundary can
#: split a week, so week is NOT derivable from month and vice versa).
def _is_aligned(bound, granularity: str) -> bool:
    """True when ``bound`` (None / str / datetime) sits exactly on a
    ``granularity`` bucket boundary (Spark date_trunc semantics: weeks
    start Monday, quarters on Jan/Apr/Jul/Oct)."""
    if bound is None:
        return True
    import pandas as pd

    t = pd.Timestamp(bound)
    sub_minute = t.second == 0 and t.microsecond == 0 and t.nanosecond == 0
    if granularity == "minute":
        return sub_minute
    hour_ok = sub_minute and t.minute == 0
    if granularity == "hour":
        return hour_ok
    day_ok = hour_ok and t.hour == 0
    if granularity == "day":
        return day_ok
    if granularity == "week":
        return day_ok and t.weekday() == 0
    month_ok = day_ok and t.day == 1
    if granularity == "month":
        return month_ok
    if granularity == "quarter":
        return month_ok and t.month in (1, 4, 7, 10)
    if granularity == "year":
        return month_ok and t.month == 1
    raise ValueError(f"unknown granularity: {granularity!r}")


_COARSENINGS: dict[str, tuple[str, ...]] = {
    "minute": ("minute", "hour", "day", "week", "month", "quarter", "year"),
    "hour": ("hour", "day", "week", "month", "quarter", "year"),
    "day": ("day", "week", "month", "quarter", "year"),
    "week": ("week",),
    "month": ("month", "quarter", "year"),
    "quarter": ("quarter", "year"),
    "year": ("year",),
}


@dataclass(frozen=True)
class Metric:
    """A mergeable aggregate: ``kind`` over source column ``col`` (col is
    ignored for count), exposed to queries as ``name``."""

    name: str
    kind: str
    col: str | None = None

    def __post_init__(self) -> None:
        if self.kind not in _KINDS:
            raise ValueError(f"unknown metric kind: {self.kind!r}")
        if self.kind != "count" and not self.col:
            raise ValueError(f"metric {self.name!r}: kind {self.kind} needs col")

    # -- state columns stored in the rollup --------------------------------

    def state_aggs(self) -> list[Column]:
        if self.kind == "sum":
            return [F.sum(self.col).alias(self.name)]
        if self.kind == "count":
            return [F.count(F.lit(1)).cast("long").alias(self.name)]
        if self.kind in ("min", "max"):
            return [getattr(F, self.kind)(self.col).alias(self.name)]
        if self.kind == "avg":
            return [
                F.sum(self.col).alias(f"{self.name}__sum"),
                F.count(self.col).cast("long").alias(f"{self.name}__cnt"),
            ]
        return [hll_state(self.col).alias(f"{self.name}__hll")]  # uniq

    # -- merge of stored states to a coarser bucket ------------------------

    def merge_aggs(self) -> list[Column]:
        if self.kind in ("sum", "count"):
            return [F.sum(self.name).alias(self.name)]
        if self.kind in ("min", "max"):
            return [getattr(F, self.kind)(self.name).alias(self.name)]
        if self.kind == "avg":
            return [
                F.sum(f"{self.name}__sum").alias(f"{self.name}__sum"),
                F.sum(f"{self.name}__cnt").alias(f"{self.name}__cnt"),
            ]
        return [hll_merge(f"{self.name}__hll").alias(f"{self.name}__hll")]

    # -- final user-facing column from merged state ------------------------

    def final_col(self) -> Column:
        if self.kind == "avg":
            return (F.col(f"{self.name}__sum") / F.col(f"{self.name}__cnt")).alias(
                self.name
            )
        if self.kind == "uniq":
            return hll_estimate(F.col(f"{self.name}__hll")).cast("long").alias(self.name)
        return F.col(self.name)

    # -- the same aggregate computed directly over raw rows ----------------

    def direct_agg(self) -> Column:
        if self.kind == "sum":
            return F.sum(self.col).alias(self.name)
        if self.kind == "count":
            return F.count(F.lit(1)).cast("long").alias(self.name)
        if self.kind in ("min", "max"):
            return getattr(F, self.kind)(self.col).alias(self.name)
        if self.kind == "avg":
            return F.avg(self.col).alias(self.name)
        # uniq: identical sketch path so routed == direct exactly
        return hll_estimate(hll_state(self.col)).cast("long").alias(self.name)


class Projection:
    """A declared rollup + the routing logic over it.

    Storage and incremental refresh are delegated to :class:`RollupTable`
    (month-granular invalidation, dynamic partition overwrite); this class
    owns the metric spec and the answer/route read paths.
    """

    def __init__(
        self,
        path: str,
        source: ServingTable,
        granularity: str,
        group_cols: list[str],
        metrics: list[Metric],
    ):
        # STORED buckets must nest inside one month partition: RollupTable's
        # incremental refresh recomputes touched months and dynamically
        # overwrites by the bucket's derived month, so a week/quarter/year
        # bucket straddling a month boundary could be rebuilt from only one
        # of its months. Those grains remain available as ANSWER grains
        # (re-aggregation reads every stored row they cover).
        if granularity not in ("minute", "hour", "day", "month"):
            raise ValueError(
                f"unsupported STORED granularity: {granularity!r} "
                "(must nest in a month partition: minute/hour/day/month)"
            )
        names = [m.name for m in metrics]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate metric names: {names}")
        self.granularity = granularity
        self.group_cols = list(group_cols)
        self.metrics = list(metrics)
        self._by_name = {m.name: m for m in metrics}
        self.table = RollupTable(
            path=path,
            source=source,
            granularity=granularity,
            group_cols=list(group_cols),
            aggs=lambda: [c for m in self.metrics for c in m.state_aggs()],
        )

    # -- maintenance (delegates) -------------------------------------------

    def refresh(self, spark: SparkSession) -> list[int]:
        return self.table.refresh(spark)

    def expire(self, before_month: int) -> list[int]:
        return self.table.expire(before_month)

    # -- routing -----------------------------------------------------------

    def covers(
        self, granularity: str, group_cols: list[str], metric_names: list[str]
    ) -> bool:
        return (
            granularity in _COARSENINGS.get(self.granularity, ())
            and set(group_cols) <= set(self.group_cols)
            and set(metric_names) <= set(self._by_name)
        )

    def _bounds_aligned(self, start, end) -> bool:
        """start/end must sit on STORED-grain bucket boundaries for the
        rollup answer to equal the raw answer: the rollup can only include
        or exclude a whole stored bucket, so e.g. start=12:30 against an
        hourly rollup would silently drop the 12:00 bucket's 12:30-13:00
        rows that the raw path keeps. Unaligned bounds -> not routable."""
        return _is_aligned(start, self.granularity) and _is_aligned(
            end, self.granularity
        )

    def answer(
        self,
        spark: SparkSession,
        granularity: str,
        group_cols: list[str],
        metric_names: list[str],
        start=None,
        end=None,
    ) -> DataFrame:
        """Answer the aggregate from the ROLLUP: re-bucket stored partial
        states to the requested grain and merge. Raises if not covered —
        use :func:`route` for transparent fallback.

        ``start``/``end`` bound the bucket column; the derived month bounds
        are applied to the rollup's partition column so the scan prunes
        month dirs driver-side (PartitionFilters, plan-pinned).
        """
        if not self.covers(granularity, group_cols, metric_names):
            raise ValueError(
                f"projection does not cover ({granularity}, {group_cols}, "
                f"{metric_names})"
            )
        if not self._bounds_aligned(start, end):
            raise ValueError(
                f"start/end must align to the stored '{self.granularity}' "
                "bucket boundaries (a rollup includes or excludes whole "
                "buckets); use route() for transparent raw fallback"
            )
        ms = [self._by_name[n] for n in metric_names]
        df = self.table.read(spark)
        if start is not None:
            df = df.filter(
                (F.col(BUCKET_COL) >= F.lit(start))
                & (F.col(MONTH_COL) >= F.date_format(F.lit(start), "yyyyMM").cast("int"))
            )
        if end is not None:
            df = df.filter(
                (F.col(BUCKET_COL) < F.lit(end))
                & (F.col(MONTH_COL) <= F.date_format(F.lit(end), "yyyyMM").cast("int"))
            )
        bucket = F.date_trunc(granularity, F.col(BUCKET_COL)).alias(BUCKET_COL)
        merged = df.groupBy(bucket, *group_cols).agg(
            *[c for m in ms for c in m.merge_aggs()]
        )
        return merged.select(BUCKET_COL, *group_cols, *[m.final_col() for m in ms])

    def compute_direct(
        self,
        spark: SparkSession,
        granularity: str,
        group_cols: list[str],
        metric_names: list[str],
        start=None,
        end=None,
    ) -> DataFrame:
        """The same aggregate from the raw dedup snapshot (fallback path;
        also the equivalence oracle for tests). Output schema matches
        :meth:`answer` exactly."""
        ms = [self._by_name[n] for n in metric_names]
        src = self.table.source
        df = src.read(spark)
        tcol = F.col(src.time_col)
        if start is not None:
            df = df.filter(tcol >= F.lit(start))
        if end is not None:
            df = df.filter(tcol < F.lit(end))
        bucket = F.date_trunc(granularity, tcol).alias(BUCKET_COL)
        return df.groupBy(bucket, *group_cols).agg(*[m.direct_agg() for m in ms])

    def route(
        self,
        spark: SparkSession,
        granularity: str,
        group_cols: list[str],
        metric_names: list[str],
        start=None,
        end=None,
    ) -> tuple[DataFrame, bool]:
        """(result, answered_from_projection): projection when covered AND
        materialized AND the time bounds sit on stored-bucket boundaries,
        raw snapshot otherwise — same schema and same VALUES either way
        (unaligned bounds fall back rather than silently dropping the
        partially-covered edge buckets)."""
        import os

        if (
            self.covers(granularity, group_cols, metric_names)
            and self._bounds_aligned(start, end)
            and os.path.isdir(self.table.path)
        ):
            return (
                self.answer(spark, granularity, group_cols, metric_names, start, end),
                True,
            )
        return (
            self.compute_direct(
                spark, granularity, group_cols, metric_names, start, end
            ),
            False,
        )
