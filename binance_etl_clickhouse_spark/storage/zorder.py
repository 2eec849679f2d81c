"""Z-order (Morton-curve) file layout for multi-dimension data skipping.

The serving tables sort by ``(symbol, interval, timestamp)`` — the
ClickHouse ``ORDER BY`` analogue — which gives perfect parquet min/max
skipping on the *leading* key but none on a trailing-dimension-only
predicate (a time-range query with no symbol still touches every file).
Z-ordering interleaves the bits of two dimensions into one sort key so
files become axis-aligned rectangles in (dim_a, dim_b) space: a predicate
on EITHER dimension alone overlaps only ~sqrt-proportionally many files.
This is the same layout Delta's ``OPTIMIZE ZORDER BY`` builds; here it is
a plain column expression + ``repartitionByRange`` write, nothing engine-
specific.

Scale: the z-value is a linear 2·bits-term bit-fold (codegen'd, no UDF) —
a per-row projection; the write's range partitioning is the one shuffle it
costs, identical to any sorted write. File skipping then happens in the
scan's parquet-footer min/max pruning, executor-side, before any row is
decoded. The 100 TB payoff: a 1000-file month still answers single-symbol
AND time-slice queries from O(sqrt(files)) of them instead of O(files) for
whichever dimension lost the lexicographic tiebreak.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_interleave(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton z-value: interleave the low ``bits`` bits of two non-negative
    int columns (a gets even positions, b odd). Linear expression fold —
    2*bits shift/mask terms, never a when-chain."""
    one = F.lit(1).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a.cast("long"), i).bitwiseAND(one), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b.cast("long"), i).bitwiseAND(one), 2 * i + 1)
        )
    return z


def with_zorder_key(
    df: DataFrame,
    dim_a: Column,
    dim_b: Column,
    bits: int = 16,
    out: str = "__z",
) -> DataFrame:
    """Attach a Morton z-key with both dimensions NORMALIZED to the full
    ``bits`` range before interleaving.

    Normalization is the load-bearing step (it is what Delta's
    ``range_partition_id`` per z-column provides): raw interleaving only
    tiles when both dimensions' *varying* bits align — interleave a 63-bit
    hash with a 9-bit-span hour counter and the hash's high bits dominate
    the curve, degenerating back to a single-dimension sort. Min/max
    scaling maps each dimension onto [0, 2^bits) so their bits zip
    meaningfully. Cost: one tiny 1-row bounds agg, broadcast — no extra
    pass over the data (double rounding in the scale is harmless: the
    z-key is a layout hint, never an identity)."""
    a0, a1, b0, b1 = "__za0", "__za1", "__zb0", "__zb1"
    bounds = df.agg(
        F.min(dim_a).alias(a0),
        F.max(dim_a).alias(a1),
        F.min(dim_b).alias(b0),
        F.max(dim_b).alias(b1),
    )
    n = F.lit(float(1 << bits))
    top = F.lit((1 << bits) - 1).cast("long")

    def scale(x: Column, lo: str, hi: str) -> Column:
        span = (F.col(hi) - F.col(lo) + 1).cast("double")
        s = F.floor((x - F.col(lo)).cast("double") / span * n).cast("long")
        return F.least(s, top)

    return (
        df.join(F.broadcast(bounds))
        .withColumn(out, z_interleave(scale(dim_a, a0, a1), scale(dim_b, b0, b1), bits))
        .drop(a0, a1, b0, b1)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    dim_a: Column,
    dim_b: Column,
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` z-clustered parquet files.

    ``repartitionByRange`` on the z-key makes each output file one
    contiguous z-range (a rectangle-ish tile in dimension space);
    ``sortWithinPartitions`` tightens every file's per-column min/max to
    its tile."""
    (
        with_zorder_key(df, dim_a, dim_b, bits)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_overlap_fraction(path: str, column: str, lo, hi) -> float:
    """Fraction of parquet files under ``path`` whose [min, max] stats for
    ``column`` intersect [lo, hi] — i.e. the files a footer-pruning scan
    must read. Driver-side metadata-only helper for layout audits/tests."""
    import glob
    import os

    import pyarrow.parquet as pq

    import datetime

    def _naive(v):
        if isinstance(v, datetime.datetime) and v.tzinfo is not None:
            return v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v

    lo, hi = _naive(lo), _naive(hi)
    files = glob.glob(os.path.join(path, "*.parquet"))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    s = col.statistics
                    smin, smax = _naive(s.min), _naive(s.max)
                    fmin = smin if fmin is None else min(fmin, smin)
                    fmax = smax if fmax is None else max(fmax, smax)
        if fmin is None or (fmax >= lo and fmin <= hi):
            hit += 1
    return hit / max(len(files), 1)
