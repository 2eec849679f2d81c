"""Skew-handling join utilities for hot keys at cluster scale.

AQE's skew-join splitting (enabled in session.py) covers sort-merge joins;
this utility covers the remaining case — aggregations/joins where one key
dominates (e.g. BTCUSDT holding 30% of all rows). Salting fans a hot key
into N subkeys, replicating the small side N ways, so no single task owns
the whole key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to skew in ``big[key]``.

    big rows get a random-but-deterministic salt (hash of the full row id
    space via monotonically varying pmod); small rows are exploded across all
    salts. Join key becomes (key, salt). Output equals a plain join — for
    ``inner`` and ``left`` ONLY, which is why other join types are
    rejected: a right/full outer join would emit every unmatched exploded
    COPY of a small row as its own null-extended output row (up to
    n_salts duplicates per small row), which no post-hoc drop can undo.
    Right/full-outer skew joins should salt the other side or rely on
    AQE's skew-join splitting.
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "leftsemi", "left_semi", "leftanti", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left joins only (got {how!r}): "
            "outer joins would duplicate unmatched small-side rows per salt"
        )
    big_s = big.withColumn("__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salts)).cast("int"))
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    small_s = small.withColumn("__salt", F.explode(salts))
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")


def salted_count(df: DataFrame, key: str, n_salts: int = 8) -> DataFrame:
    """Two-stage count for heavily skewed group keys:
    partial count on (key, salt) -> final sum on key. The first stage spreads
    a hot key over ``n_salts`` reducers."""
    salted = df.withColumn(
        "__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    partial = salted.groupBy(key, "__salt").agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(key).agg(F.sum("__c").alias("n"))
