"""As-of (point-in-time) join — the natural analytical join on this schema
(klines <-> funding rates), flagged as a deliberate extension in SURVEY.md
§2.4/§7. Spark has no native ASOF JOIN; this is the scalable composition:

    union-tag both sides -> one window per key ordered by (ts, side) ->
    last/first(right payload struct, ignorenulls) -> keep left rows.

Cost: ONE shuffle on the key (same as any join), no range explosion, no
per-group pandas; ``nearest`` adds a second sort over the same partitions
(still one shuffle). This beats bucketize-then-filter when right-side
density varies, and beats ``merge_asof``-in-``applyInPandas`` by staying
JVM-side. Skewed keys are handled by AQE; at 100 TB pre-bucketing both
tables by the key makes it shuffle-free.

Directions mirror pandas ``merge_asof``:

- ``backward`` (default): most recent right row with ``r.ts <= l.ts``
  (``<`` when ``allow_exact_matches=False``);
- ``forward``: earliest right row with ``r.ts >= l.ts`` (``>`` without
  exact matches);
- ``nearest``: whichever of the two candidates is closer in absolute
  time; a tie prefers the backward row (pandas behavior).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DIRECTIONS = ("backward", "forward", "nearest")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    right_on: str | None = None,
    value_cols: Sequence[str] | None = None,
    allow_exact_matches: bool = True,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach one right row within the same ``by`` key,
    chosen by ``direction`` (see module docstring).

    ``value_cols`` default to all right columns except keys/time.
    """
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}, got {direction!r}")
    r_on = right_on or on
    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in {*by, r_on}]

    # the payload travels as ONE struct, not per-column: carrying each
    # value column through its own last(ignorenulls) would mix columns
    # from different right rows whenever the chosen row has a NULL payload
    # field (rate from row 2, price from row 1 — a composite row that
    # never existed; pandas merge_asof keeps row 2's NULL price).
    # F.struct() is non-null even when every field is, so last/first
    # (ignorenulls) over it picks whole rows. __rts rides inside so
    # ``nearest`` can compare the two candidates' distances.
    def _payload(src: DataFrame, ts_col):
        return F.struct(
            ts_col.alias("__rts"), *[F.col(c) for c in value_cols]
        )

    payload_type = right.select(_payload(right, F.col(r_on)).alias("__v")).schema[
        0
    ].dataType

    # side ordering decides whether a right row at EXACTLY the left row's
    # ts falls inside the frame. Backward frames look at preceding rows
    # (right must sort before left at equal ts iff exact matches count);
    # forward frames look at following rows (right must sort after left).
    # The two orderings differ, so each direction gets its own order
    # column — same partitioning, so still one shuffle.
    l_b, r_b = (1, 0) if allow_exact_matches else (0, 1)
    l_f, r_f = (0, 1) if allow_exact_matches else (1, 0)
    lhs = (
        left.withColumn("__is_left", F.lit(True))
        .withColumn("__ts", F.col(on))
        .withColumn("__ord_b", F.lit(l_b))
        .withColumn("__ord_f", F.lit(l_f))
        .withColumn("__v", F.lit(None).cast(payload_type))
    )
    rhs = right.select(
        *by,
        F.col(r_on).alias("__ts"),
        F.lit(False).alias("__is_left"),
        F.lit(r_b).alias("__ord_b"),
        F.lit(r_f).alias("__ord_f"),
        _payload(right, F.col(r_on)).alias("__v"),
    )
    for c in left.columns:
        if c not in rhs.columns and c != "__ts":
            rhs = rhs.withColumn(c, F.lit(None))

    merged = lhs.select(rhs.columns).unionByName(rhs.select(rhs.columns))
    picked = None
    if direction in ("backward", "nearest"):
        wb = (
            Window.partitionBy(*by)
            .orderBy("__ts", "__ord_b")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        merged = merged.withColumn("__vb", F.last("__v", ignorenulls=True).over(wb))
        picked = F.col("__vb")
    if direction in ("forward", "nearest"):
        wf = (
            Window.partitionBy(*by)
            .orderBy("__ts", "__ord_f")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        merged = merged.withColumn("__vf", F.first("__v", ignorenulls=True).over(wf))
        picked = F.col("__vf")
    if direction == "nearest":
        vb, vf = F.col("__vb"), F.col("__vf")
        delta_b = F.col("__ts").cast("double") - vb["__rts"].cast("double")
        delta_f = vf["__rts"].cast("double") - F.col("__ts").cast("double")
        picked = (
            F.when(vb.isNull(), vf)
            .when(vf.isNull(), vb)
            # tie prefers backward, hence <=
            .when(delta_b <= delta_f, vb)
            .otherwise(vf)
        )
    out = merged.filter(F.col("__is_left")).withColumn("__pick", picked)
    keep = [c for c in left.columns] + [
        F.col(f"__pick.{c}").alias(f"{c}{suffix}") for c in value_cols
    ]
    return out.select(*keep)
