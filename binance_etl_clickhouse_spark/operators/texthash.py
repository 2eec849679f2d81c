"""Cross-engine deterministic text hashing primitives.

Dedup/similarity operators need hash functions that produce IDENTICAL values
in Spark (for the engine) and DuckDB (for the correctness oracle). Neither
engine's native hash() matches the other's, so everything is built on md5:

    hash60(s)  = int(md5(s)[:15 hex], 16)            — 60 bits, fits BIGINT
    Spark:  conv(substr(md5(s),1,15), 16, 10) :: long
    DuckDB: ('0x' || substr(md5(s),1,15)) :: BIGINT

MinHash permutations are the classic universal-hash family
h_j(x) = (a_j * x + b_j) mod M with M = 2^31-1 and x pre-reduced mod M so
every product fits in int64 in both engines. Coefficients are fixed literals
(seeded PRNG at import) shared between the Spark builders and the generated
oracle SQL.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

M31 = 2_147_483_647  # 2^31 - 1

_rng = random.Random(20240)
#: (a, b) pairs for the minhash permutation family — module-level constants so
#: Spark plans and oracle SQL strings agree forever.
MINHASH_COEFFS: list[tuple[int, int]] = [
    (_rng.randrange(1, M31), _rng.randrange(0, M31)) for _ in range(24)
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def hash60(col: Column | str) -> Column:
    """60-bit integer hash of a string, identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(_c(col)), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    """DuckDB twin of :func:`hash60`."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def hash31(col: Column | str) -> Column:
    """hash60 reduced mod M31 — safe operand for a*x+b in int64."""
    return hash60(col) % M31


def hash31_sql(expr: str) -> str:
    return f"({hash60_sql(expr)} % {M31})"


def minhash_perm(j: int, x: Column) -> Column:
    """j-th permutation hash (a_j * x + b_j) mod M31 over a hash31 value."""
    a, b = MINHASH_COEFFS[j]
    return (x * F.lit(a) + F.lit(b)) % F.lit(M31)


def minhash_perm_sql(j: int, expr: str) -> str:
    a, b = MINHASH_COEFFS[j]
    return f"(({expr} * {a} + {b}) % {M31})"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (documents.text is space-separated)."""
    return F.split(_c(col), " ")


def shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct k-token shingles of a text column as an array<string>.

    Spark: transform over a 1..n-k+1 index sequence + slice; empty array for
    short docs. DuckDB twin below builds the same list comprehension.
    """
    w = tokens(col)
    n = F.size(w)
    idx = F.sequence(F.lit(1), n - F.lit(k - 1))
    # guard: Spark's sequence(1, 0) runs DESCENDING, so short docs need an
    # explicit empty array (DuckDB's range() is naturally empty there)
    return F.when(
        n >= k,
        F.array_distinct(F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i, k)))),
    ).otherwise(F.array().cast("array<string>"))


def shingles_sql(text_expr: str, k: int = 3) -> str:
    """DuckDB twin of :func:`shingles` (1-based inclusive list slicing)."""
    return (
        f"list_distinct([array_to_string(string_split({text_expr}, ' ')[i:i+{k - 1}], ' ') "
        f"for i in range(1, len(string_split({text_expr}, ' ')) - {k - 2})])"
    )
