"""IVF-style ANN: coarse k-means quantization + probe-nearest-cells search.

The second scale path for similarity search (alongside sign-LSH): a small
k-means codebook is trained with pure DataFrame ops — assignment is a
broadcast-codebook argmin projection, centroid update is a
posexplode -> groupBy(cluster, dim) -> avg -> re-assemble aggregation — so
every iteration is one shuffle over (k x dim) cells regardless of table
size. Deterministic: initial centroids are the first k vectors by id, and
every step is exact arithmetic (no RNG).

At 100 TB: train on a sample, write the table partitioned by ``cell``, and
a query touches only ``nprobe`` partitions. The iterative loop is the
classic Spark pattern — cache the working set, loop on the driver, keep
each iteration a single job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.operators.similarity import cosine_expr, dot_expr


def _as_double(vec_col):
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(c, lambda x: x.cast("double"))


def _assign_cell(v, centroids: list[list[float]]):
    """argmin_c squared-L2(v, centroid_c) as a pure expression tree.

    Each distance is built exactly once into an array and the argmin is
    ``array_position(dists, array_min(dists))`` — linear expression size in
    k. (A fold of ``when(dist < best, ...)`` chains duplicates the running
    best-distance subtree at every step: exponential expression growth that
    made codegen, not the data, the bottleneck.) Ties pick the lowest
    centroid index (array_position returns the first occurrence).
    """
    dists = []
    for cent in centroids:
        cv = F.array(*[F.lit(float(x)) for x in cent])
        diff = F.zip_with(v, cv, lambda a, b: (a - b) * (a - b))
        dists.append(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x))
    darr = F.array(*dists)
    return (F.array_position(darr, F.array_min(darr)) - 1).cast("int")


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic coarse codebook: init = first k vectors by id; each
    iteration assigns (projection) and re-averages per (cell, dim)."""
    vecs = df.select(id_col, _as_double(vec_col).alias("v")).cache()
    try:
        init = vecs.orderBy(id_col).limit(k).collect()
        centroids = [list(r.v) for r in init]
        for _ in range(n_iters):
            assigned = vecs.withColumn("cell", _assign_cell(F.col("v"), centroids))
            per_dim = (
                assigned.select("cell", F.posexplode("v").alias("dim", "x"))
                .groupBy("cell", "dim")
                .agg(F.avg("x").alias("m"))
            )
            rows = per_dim.collect()  # k x dim rows — tiny
            new = {}
            for r in rows:
                new.setdefault(r.cell, {})[r.dim] = r.m
            centroids = [
                [new[c][d] for d in sorted(new[c])] if c in new else centroids[c]
                for c in range(k)
            ]
        return centroids
    finally:
        vecs.unpersist()


def assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Add the IVF ``cell`` column (at scale: the partition key)."""
    return df.withColumn("cell", _assign_cell(_as_double(vec_col), centroids))


def probe_cells(centroids: list[list[float]], query_vec: list[float], nprobe: int) -> list[int]:
    """The ``nprobe`` cells nearest to the query (ties -> lowest cell id)."""
    dists = [
        (ci, sum((q - c) ** 2 for q, c in zip(query_vec, cent)))
        for ci, cent in enumerate(centroids)
    ]
    return [ci for ci, _ in sorted(dists, key=lambda t: t[1])[:nprobe]]


def _rerank(cand: DataFrame, query_vec: list[float], k: int, id_col: str, vec_col: str) -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_expr(_as_double(vec_col), q)
    return (
        cand.select(F.col(id_col), F.round(sim, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_topk(
    df: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the ``nprobe`` nearest cells to the query, exact-rerank inside.

    This form re-assigns cells over the full table at query time (k distance
    expressions per row) — fine for one-off scans; a standing index should
    use :func:`write_ivf_table` + :func:`ivf_topk_from_table`, where the
    parquet scan itself prunes to the probed cells.
    """
    probe = probe_cells(centroids, query_vec, nprobe)
    cand = assign_cells(df, centroids, id_col, vec_col).filter(
        F.col("cell").isin(probe)
    )
    return _rerank(cand, query_vec, k, id_col, vec_col)


def write_ivf_table(
    df: DataFrame,
    centroids: list[list[float]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index layout: the table partitioned by ``cell``.

    The assignment projection runs ONCE here; every subsequent query is a
    partition-pruned read of ``nprobe`` cell dirs — at 100 TB that is the
    entire point of IVF (scan nprobe/k of the data, no per-row math outside
    the probed cells)."""
    assign_cells(df, centroids, id_col, vec_col).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(path)


def append_ivf_table(
    df_new: DataFrame,
    centroids: list[list[float]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental index maintenance: fold a NEW vector batch into an
    existing :func:`write_ivf_table` layout without retraining.

    New vectors are assigned to the frozen codebook's nearest cells (one
    projection pass over the batch only) and appended into the matching
    cell directories — queries immediately see old and new vectors through
    the same partition-pruned read. This is how IVF indexes run in steady
    state everywhere (FAISS `add` after `train`): the codebook is a sample
    statistic, appending does not move it. Monitor :func:`ivf_cell_stats`
    and rewrite with a fresh codebook when drift skews the cells.
    """
    assign_cells(df_new, centroids, id_col, vec_col).write.mode("append").partitionBy(
        "cell"
    ).parquet(path)


def ivf_cell_stats(spark, path: str) -> DataFrame:
    """Per-cell row counts for the retrain decision: a drifted corpus shows
    up as cell skew (hot cells slow probes; empty cells waste the probe
    budget). Metadata-cheap — one count over the partition column."""
    df = spark.read.parquet(path)
    return df.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vectors"))


def ivf_topk_from_table(
    spark,
    path: str,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k over a :func:`write_ivf_table` layout.

    The ``cell IN probe`` filter lands in the scan's PartitionFilters
    (plan-pinned by test) — only the probed cell directories are read."""
    probe = probe_cells(centroids, query_vec, nprobe)
    cand = spark.read.parquet(path).filter(F.col("cell").isin(probe))
    return _rerank(cand, query_vec, k, id_col, vec_col)


def widened_nprobe(
    nprobe: int,
    k_cells: int,
    n_vectors: int,
    selectivity: float,
    k: int,
    alpha: int = 4,
) -> int:
    """Selectivity-aware probe count for FILTERED ANN.

    A metadata pre-filter starves a fixed-``nprobe`` candidate set: with a
    cell-uncorrelated filter keeping fraction ``s`` of vectors, the probed
    cells hold ~``nprobe * (n/k_cells) * s`` matching candidates — a
    selective filter can leave fewer than ``k``, silently degrading recall.
    Widen to the smallest probe count whose EXPECTED matching candidates
    reach ``alpha * k`` (a safety factor over the exact-k floor), clamped
    to every cell: ``max(nprobe, ceil(alpha * k * k_cells / (n * s)))``.
    Driver-side integer math over already-known stats — no extra scan.
    """
    if selectivity <= 0:
        return k_cells  # filter matches nothing we know of: probe all
    import math

    need = math.ceil(alpha * k * k_cells / (n_vectors * selectivity))
    return max(nprobe, min(k_cells, need))


def ivf_filtered_topk_from_table(
    spark,
    path: str,
    centroids: list[list[float]],
    query_vec: list[float],
    predicate,
    selectivity: float,
    n_vectors: int,
    k: int = 10,
    nprobe: int = 3,
    alpha: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Metadata-FILTERED ANN over the cell-partitioned index layout.

    Composes the two prunings the layout affords: ``cell IN probe`` lands
    in PartitionFilters (only the probed cell dirs are read) and the
    metadata ``predicate`` lands in PushedFilters (parquet row-group stats
    skip inside them). The probe set is widened by :func:`widened_nprobe`
    so a selective filter cannot starve the candidate pool — the failure
    mode of naive pre-filtered IVF.
    """
    probe = probe_cells(
        centroids,
        query_vec,
        widened_nprobe(nprobe, len(centroids), n_vectors, selectivity, k, alpha),
    )
    cand = (
        spark.read.parquet(path)
        .filter(F.col("cell").isin(probe))
        .filter(predicate)
    )
    return _rerank(cand, query_vec, k, id_col, vec_col)


def ivf_batch_topk_from_table(
    spark,
    path: str,
    centroids: list[list[float]],
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batched ANN over the cell-partitioned index: top-``k`` for EVERY
    (query_id, vector) in ``queries`` from ONE partition-pruned scan.

    Probe cells are computed driver-side per query (centroid math over a
    k x dim literal), the scan reads only the UNION of all probed cell
    directories (PartitionFilters), and a broadcast equi-join on ``cell``
    routes each row to exactly the queries that probed its cell — no cross
    product wider than the probed candidates. Per-query top-k is a rank
    window (WindowGroupLimit pushdown). At a billion vectors the scan cost
    is |Q| * nprobe/k_cells of the data, amortized further when queries
    share cells.
    """
    from pyspark.sql import Window

    rows = []
    for qid, qv in queries:
        for c in probe_cells(centroids, qv, nprobe):
            rows.append((int(qid), int(c), [float(x) for x in qv]))
    qdf = spark.createDataFrame(rows, "query_id long, cell int, q_vec array<double>")
    cells = sorted({r[1] for r in rows})
    cand = spark.read.parquet(path).filter(F.col("cell").isin(cells))
    pairs = cand.join(F.broadcast(qdf), "cell")
    sim = cosine_expr(_as_double(vec_col), F.col("q_vec"))
    scored = pairs.select(
        "query_id", F.col(id_col), F.round(sim, 6).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def ivf_range_from_table(
    spark,
    path: str,
    centroids: list[list[float]],
    queries: list[tuple[int, list[float]]],
    radius: float,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Range search (all neighbors with cosine >= ``radius``) over the
    cell-partitioned index — the radius sibling of
    :func:`ivf_batch_topk_from_table`.

    Identical scan/routing shape: one PartitionFilters-pruned read of the
    union of probed cells, broadcast (query, cell) routing join — but the
    selection is a per-row threshold instead of a rank window, so there is
    NO shuffle after the scan at all (filter + project only): the cheapest
    possible retrieval plan. Self-matches are excluded. Output size is
    data-dependent (that's what range search means); at scale the radius,
    not a k, bounds the result.
    """
    rows = []
    for qid, qv in queries:
        for c in probe_cells(centroids, qv, nprobe):
            rows.append((int(qid), int(c), [float(x) for x in qv]))
    qdf = spark.createDataFrame(rows, "query_id long, cell int, q_vec array<double>")
    cells = sorted({r[1] for r in rows})
    cand = spark.read.parquet(path).filter(F.col("cell").isin(cells))
    sim = cosine_expr(_as_double(vec_col), F.col("q_vec"))
    return (
        cand.join(F.broadcast(qdf), "cell")
        .select("query_id", F.col(id_col), F.round(sim, 6).alias("cos_sim"))
        .filter(
            (F.col("cos_sim") >= F.lit(float(radius)))
            & (F.col(id_col) != F.col("query_id"))
        )
    )
