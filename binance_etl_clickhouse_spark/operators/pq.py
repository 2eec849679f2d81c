"""Product quantization (PQ): the compressed-codes tier of the ANN stack.

IVF (``operators/ivf.py``) prunes WHICH vectors a query scans; PQ shrinks
WHAT is scanned — each 64-dim float vector becomes ``m`` small codes (one
byte each here: ksub <= 256), so the candidate scan reads codes + a tiny
lookup table instead of raw floats. Together they are the classic IVF-PQ
layout (Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011) that vector stores use at billion-vector scale: 64 floats
(256 B) -> 4 codes (4 B) is a 64x reduction in scanned bytes.

Spark-first construction, no new machinery:

- **fit**: the vector is sliced into ``m`` contiguous subvectors and the
  existing deterministic DataFrame k-means (``ivf.kmeans_fit``) runs once
  per subspace — slicing is a pure projection, so training cost is m small
  k-means runs regardless of table size.
- **encode**: per-subspace nearest-centroid assignment, the same
  ``array_position(dists, array_min(dists))`` argmin projection the IVF
  assign uses — one codegen'd stage, no shuffle, no UDF.
- **query (ADC — asymmetric distance computation)**: the query vector
  builds an ``m x ksub`` table of literal subspace distances; a row's
  approximate squared L2 distance is the sum of ``m`` array lookups —
  a pure projection over the codes column, never touching the raw
  vectors — then a global top-``shortlist`` and an exact cosine rerank
  over only those rows.

At 100 TB: codes live beside (or instead of) the raw vectors; the ADC scan
is a TakeOrderedAndProject over a byte-width column, and the exact rerank
fetches ``shortlist`` full vectors — the only rows whose floats are read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.operators.ivf import _as_double, _assign_cell, kmeans_fit
from binance_etl_clickhouse_spark.operators.similarity import cosine_expr

Codebooks = list[list[list[float]]]  # [subspace][code][dim]


def pq_fit(
    df: DataFrame,
    m: int = 4,
    ksub: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> Codebooks:
    """Train ``m`` per-subspace codebooks of ``ksub`` centroids each.

    Deterministic end to end: subvector s of a vector is dims
    ``[s*dsub, (s+1)*dsub)`` (a slice projection), and each subspace runs
    the same deterministic k-means as IVF (init = first ksub subvectors by
    id, exact-arithmetic assign/update loop).
    """
    if dim % m:
        raise ValueError(f"dim {dim} must divide evenly into m={m} subspaces")
    dsub = dim // m
    books: Codebooks = []
    for s in range(m):
        sub = df.select(
            F.col(id_col),
            F.slice(_as_double(vec_col), s * dsub + 1, dsub).alias("sub"),
        )
        books.append(kmeans_fit(sub, k=ksub, n_iters=n_iters, id_col=id_col, vec_col="sub"))
    return books


def pq_codes_expr(books: Codebooks, vec_col: str = "embedding"):
    """The codes column (array<int>, length m) as a pure expression —
    m per-subspace argmin projections, usable inside any select/write."""
    dsub = len(books[0][0])
    v = _as_double(vec_col)
    return F.array(
        *[_assign_cell(F.slice(v, s * dsub + 1, dsub), books[s]) for s in range(len(books))]
    )


def pq_encode(
    df: DataFrame,
    books: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int> of length m): nearest-centroid code per
    subspace — m argmin projections in one codegen'd stage, no shuffle."""
    return df.select(F.col(id_col), pq_codes_expr(books, vec_col).alias("codes"))


def adc_lut(books: Codebooks, query_vec: list[float]) -> list[list[float]]:
    """``lut[s][c]`` = squared L2 distance from the query's subvector s to
    centroid c of subspace s — the m x ksub table ADC scans against."""
    dsub = len(books[0][0])
    return [
        [
            sum((query_vec[s * dsub + d] - cent[d]) ** 2 for d in range(dsub))
            for cent in book
        ]
        for s, book in enumerate(books)
    ]


def adc_expr(books: Codebooks, query_vec: list[float], codes_col: str = "codes"):
    """Approximate squared-L2 distance ``sum_s lut[s][codes[s]]`` as a pure
    expression — m literal-array lookups per row, summed left-to-right (the
    oracle twin mirrors the order, so float results are bit-identical given
    equal codebooks)."""
    adc = None
    for s, lut in enumerate(adc_lut(books, query_vec)):
        term = F.element_at(
            F.array(*[F.lit(float(x)) for x in lut]),
            F.element_at(F.col(codes_col), s + 1) + 1,
        )
        adc = term if adc is None else adc + term
    return adc


def pq_topk(
    codes_df: DataFrame,
    vectors_df: DataFrame,
    books: Codebooks,
    query_vec: list[float],
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC shortlist over the codes, exact cosine rerank over the survivors.

    Only the ``shortlist`` rows the ADC scan keeps ever have their raw
    vectors read.
    """
    adc = adc_expr(books, query_vec)
    # round before ordering: both engines compute the codebooks with their
    # own float summation order, so raw ADC values can drift in the last
    # ulps; at 6 decimals the order (ties -> id) is identical across engines
    cand = (
        codes_df.select(F.col(id_col), F.round(adc, 6).alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col))
        .limit(shortlist)
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_expr(_as_double(vec_col), q)
    return (
        cand.join(vectors_df.select(id_col, vec_col), id_col)
        .select(F.col(id_col), F.round(sim, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def write_ivf_pq_table(
    df: DataFrame,
    centroids: list[list[float]],
    books: Codebooks,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the combined IVF-PQ index: the table partitioned by the
    coarse ``cell`` with the PQ ``codes`` stored alongside each vector.

    Both assignment projections (coarse argmin + m subspace argmins) run
    once, at build time. A query then (1) partition-prunes to ``nprobe``
    cell dirs, (2) ADC-scans the codes column inside them, and (3) reads
    raw floats only for the shortlist — the full IVF-PQ read path.
    """
    from binance_etl_clickhouse_spark.operators.ivf import assign_cells

    out = assign_cells(df, centroids, id_col, vec_col).withColumn(
        "codes", pq_codes_expr(books, vec_col)
    )
    out.write.mode("overwrite").partitionBy("cell").parquet(path)


def ivf_pq_topk_from_table(
    spark,
    path: str,
    centroids: list[list[float]],
    books: Codebooks,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 3,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k over a :func:`write_ivf_pq_table` layout: partition-pruned
    probe -> ADC shortlist within the probed cells -> exact cosine rerank.

    The ``cell IN probe`` filter lands in the scan's PartitionFilters (the
    same plan property the plain IVF query pins), and the ADC ordering is
    rounded to 6 decimals like :func:`pq_topk` so the oracle twin sorts
    identically."""
    from binance_etl_clickhouse_spark.operators.ivf import probe_cells

    probe = probe_cells(centroids, query_vec, nprobe)
    cand = spark.read.parquet(path).filter(F.col("cell").isin(probe))
    short = (
        cand.select(id_col, vec_col, F.round(adc_expr(books, query_vec), 6).alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col))
        .limit(shortlist)
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_expr(_as_double(vec_col), q)
    return (
        short.select(F.col(id_col), F.round(sim, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )
