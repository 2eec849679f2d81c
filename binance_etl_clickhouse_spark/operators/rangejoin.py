"""Scalable range join: points-in-intervals without a nested loop.

Open-source Spark compiles ``a JOIN b ON p BETWEEN lo AND hi`` to a
BroadcastNestedLoopJoin (fine for a tiny interval side, quadratic
otherwise). This operator makes the join an *equi*-join Catalyst can
shuffle-partition: bucket the domain into fixed-width bins, explode each
interval into every bin it covers, tag each point with its single bin, then
equi-join on the bin and re-check the exact predicate as a residual filter.

Each point lives in exactly one bin and an interval appears at most once
per bin, so no post-join dedup is needed — the result is exactly the
nested-loop semantics. Cost: |intervals| x (avg_len / bin_width) exploded
rows, shuffled on the bin key; pick ``bin_width`` near the typical interval
length so the blow-up factor stays ~1-2x. At 100 TB both sides partition on
the bin hash and AQE handles bin skew (a hot bin splits like any hot join
key); contrast with the broadcast-nested-loop which cannot shard at all.

Same construction as the as-of join's union-window trick (operators/asof.py):
re-expressing an order/range predicate as a key Catalyst can hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    closed: str = "both",
) -> DataFrame:
    """Inner-join each point row to every interval row containing it.

    ``closed``: "both" => lo <= p <= hi, "left" => lo <= p < hi.
    Column sets of the two inputs must be disjoint (like ``crossJoin``).
    """
    if closed not in ("both", "left"):
        raise ValueError(f"closed must be 'both' or 'left', got {closed!r}")
    w = float(bin_width)
    if w <= 0:
        raise ValueError("bin_width must be positive")

    p_bin = F.floor(_c(point_col) / w)
    tagged = points.withColumn("__bin", p_bin)

    lo_bin = F.floor(_c(lo_col) / w).cast("long")
    hi_bin = F.floor(_c(hi_col) / w).cast("long")
    # sequence() is inclusive on both ends; hi_bin >= lo_bin always since hi >= lo
    exploded = intervals.withColumn(
        "__bin", F.explode(F.sequence(lo_bin, hi_bin))
    )

    upper = (
        (_c(point_col) <= _c(hi_col))
        if closed == "both"
        else (_c(point_col) < _c(hi_col))
    )
    joined = tagged.join(exploded, "__bin").filter(
        (_c(point_col) >= _c(lo_col)) & upper
    )
    return joined.drop("__bin")


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_lo: str,
    a_hi: str,
    b_lo: str,
    b_hi: str,
    bin_width: float,
) -> DataFrame:
    """Inner-join interval rows of ``a`` to every OVERLAPPING interval row of
    ``b`` (closed ends: ``a_lo <= b_hi AND b_lo <= a_hi``) as a shuffled
    equi-join — the interval×interval twin of :func:`range_join`.

    Both sides explode into the fixed-width bins they cover and equi-join on
    the bin. An overlapping pair co-occurs in every shared bin, so instead
    of a post-join ``distinct`` (a second whole-result shuffle) the residual
    keeps ONE canonical collision: the bin holding the overlap's start,
    ``max(floor(a_lo/w), floor(b_lo/w))`` — both intervals always cover
    ``max(a_lo, b_lo)``, and floor is monotone, so exactly one surviving row
    per overlapping pair. Column sets must be disjoint.
    """
    w = float(bin_width)
    if w <= 0:
        raise ValueError("bin_width must be positive")

    def bins(lo: str, hi: str) -> Column:
        return F.sequence(
            F.floor(_c(lo) / w).cast("long"), F.floor(_c(hi) / w).cast("long")
        )

    ea = a.withColumn("__bin", F.explode(bins(a_lo, a_hi)))
    eb = b.withColumn("__bin", F.explode(bins(b_lo, b_hi)))
    first_shared = F.greatest(
        F.floor(_c(a_lo) / w).cast("long"), F.floor(_c(b_lo) / w).cast("long")
    )
    return (
        ea.join(eb, "__bin")
        .filter(
            (_c(a_lo) <= _c(b_hi))
            & (_c(b_lo) <= _c(a_hi))
            & (F.col("__bin") == first_shared)
        )
        .drop("__bin")
    )
