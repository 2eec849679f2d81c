"""As-of (point-in-time) join — the natural analytical join on this schema
(klines <-> funding rates), flagged as a deliberate extension in SURVEY.md
§2.4/§7. Spark has no native ASOF JOIN; this is the scalable composition:

    union-tag both sides -> one window per key ordered by (ts, side) ->
    last_value(right payload, ignorenulls) -> keep left rows.

Cost: ONE shuffle on the key (same as any join), no range explosion, no
per-group pandas. This beats bucketize-then-filter when right-side density
varies, and beats ``merge_asof``-in-``applyInPandas`` by staying JVM-side.
Skewed keys are handled by AQE; at 100 TB pre-bucketing both tables by the
key makes it shuffle-free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    right_on: str | None = None,
    value_cols: Sequence[str] | None = None,
    allow_exact_matches: bool = True,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` (or ``<`` when ``allow_exact_matches=False``)
    within the same ``by`` key.

    ``value_cols`` default to all right columns except keys/time.
    """
    r_on = right_on or on
    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in {*by, r_on}]

    l_tag, r_tag = (1, 0) if allow_exact_matches else (0, 1)
    # the payload travels as ONE struct, not per-column: carrying each
    # value column through its own last(ignorenulls) would mix columns
    # from different right rows whenever the most recent row has a NULL
    # payload field (rate from row 2, price from row 1 — a composite row
    # that never existed; pandas merge_asof keeps row 2's NULL price).
    # F.struct() is non-null even when every field is, so last(ignorenulls)
    # over it picks whole rows.
    payload = right.select(F.struct(*[F.col(c) for c in value_cols]).alias("__v"))
    payload_type = payload.schema[0].dataType
    lhs = (
        left.withColumn("__side", F.lit(l_tag))
        .withColumn("__ts", F.col(on))
        .withColumn("__v", F.lit(None).cast(payload_type))
    )
    rhs = right.select(
        *by,
        F.col(r_on).alias("__ts"),
        F.lit(r_tag).alias("__side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__v"),
    )
    for c in left.columns:
        if c not in rhs.columns and c != "__ts":
            rhs = rhs.withColumn(c, F.lit(None))

    merged = lhs.select(rhs.columns).unionByName(rhs.select(rhs.columns))
    # right rows sort before left rows at equal ts iff exact matches allowed
    w = (
        Window.partitionBy(*by)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = merged.withColumn("__vlast", F.last("__v", ignorenulls=True).over(w))
    out = merged.filter(F.col("__side") == l_tag)
    keep = [c for c in left.columns] + [
        F.col(f"__vlast.{c}").alias(f"{c}{suffix}") for c in value_cols
    ]
    return out.select(*keep)
