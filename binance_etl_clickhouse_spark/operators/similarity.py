"""Similarity search over embedding columns (array<float>).

- :func:`cosine_expr` — pure built-in cosine (zip_with + aggregate fold);
  JVM-side, no UDF, deterministic fold order (matches the DuckDB oracle's
  sequential accumulation bit-for-bit in practice).
- :func:`brute_force_topk` — exact top-k vs a query vector: one narrow
  projection + TakeOrderedAndProject. The correctness baseline.
- :func:`random_hyperplane_buckets` / :func:`lsh_topk` — the scale path:
  sign-LSH bucket prefilter (deterministic md5-seeded hyperplanes), exact
  rerank within probed buckets. At 100 TB the bucket key becomes the
  partition key, so a query touches a handful of partitions instead of the
  full table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

M31 = 2_147_483_647


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def _as_double(vec_col: Column | str) -> Column:
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(c, lambda x: x.cast("double"))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_expr(_as_double(vec_col), q)
    return (
        df.select(F.col(id_col), F.round(sim, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def batch_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    q_vec_col: str = "q_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k for EVERY query in a query set — the batched
    retrieval shape (a single-vector call per query would rescan the corpus
    |Q| times).

    One corpus scan: the query frame broadcasts (it is the small side by
    construction), every corpus row scores against all queries inside the
    scan stage, and the per-query top-k is a rank window that Spark plans
    with WindowGroupLimit partial pushdown — each task keeps only its local
    top-k per query before the single shuffle on query_id. Scoring work is
    inherently |corpus| x |Q|; nothing is shuffled at that width.

    ``exclude_self`` drops the corpus row whose id equals the query id —
    correct when queries ARE corpus members (self-retrieval); set False when
    query ids live in a different id space, where an id collision would
    silently drop a legitimate neighbor.
    """
    pairs = df.crossJoin(F.broadcast(queries))
    if exclude_self:
        pairs = pairs.filter(F.col(id_col) != F.col(q_id_col))
    sim = cosine_expr(_as_double(vec_col), _as_double(q_vec_col))
    scored = pairs.select(
        F.col(q_id_col), F.col(id_col), F.round(sim, 6).alias("cos_sim")
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


# ---------------------------------------------------------------------------
# Sign-LSH (random hyperplane) bucketing — deterministic planes derived from
# md5 so engine and oracle (or two cluster jobs) always agree.
# ---------------------------------------------------------------------------


def _plane_component(p: int, d: int) -> float:
    """Deterministic pseudo-random plane component in [-1, 1)."""
    import hashlib

    h = int(hashlib.md5(f"plane:{p}:{d}".encode()).hexdigest()[:15], 16) % M31
    return (h / M31) * 2.0 - 1.0


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    return [[_plane_component(p, d) for d in range(dim)] for p in range(n_planes)]


def random_hyperplane_buckets(
    df: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a sign-LSH ``bucket`` column: bit p = sign(v . plane_p).

    2^n_planes buckets; nearby vectors collide with high probability. Pure
    projection — at scale, write the table partitioned/bucketed by this key.
    """
    v = _as_double(vec_col)
    bucket = None
    for p, plane in enumerate(hyperplanes(n_planes, dim)):
        pv = F.array(*[F.lit(x) for x in plane])
        bit = F.when(dot_expr(v, pv) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return df.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: q_i = floor(x_i·s + 0.5) with
    s = 127 / max|x| — the storage format that cuts a float32 embedding
    corpus 4× (parquet int8 + the per-row scale). Pure projection, no
    shuffle; dequantized dot products differ from exact by the returned
    per-vector reconstruction error, which downstream ANN can use to widen
    rerank margins.

    ``floor(x + 0.5)`` (not round()) so engine and oracle share one
    deterministic tie rule.
    """
    v = _as_double(vec_col)
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    # all-zero vectors (padding / failed-encode rows) have amax = 0:
    # unguarded division throws under ANSI mode and diverges from the
    # oracle otherwise — nullif yields NULL scale/metrics in BOTH engines
    scale = F.lit(127.0) / F.nullif(amax, F.lit(0.0))
    q = F.transform(v, lambda x: F.floor(x * scale + F.lit(0.5)).cast("int"))
    # dequantize + per-dim squared error, folded sequentially (same order as
    # the DuckDB list_sum twin)
    err = F.zip_with(v, q, lambda x, qi: (x - qi / scale) * (x - qi / scale))
    mse = F.aggregate(err, F.lit(0.0), lambda acc, e: acc + e) / F.size(v)
    return df.select(
        F.col(id_col),
        F.array_min(q).alias("q_min"),
        F.array_max(q).alias("q_max"),
        F.round(scale, 6).alias("scale"),
        F.round(mse, 12).alias("recon_mse"),
    )


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 6,
    multiprobe_hamming: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: probe the query's bucket (+ all buckets within
    ``multiprobe_hamming`` bit flips), exact-rerank the survivors.

    Recall knob = n_planes x multiprobe; with 8 planes + 1-bit probing the
    candidate set is ~9/256 of the data yet recall on near neighbors is high.
    """
    dim = len(query_vec)
    planes = hyperplanes(n_planes, dim)
    qbits = 0
    for p, plane in enumerate(planes):
        if sum(q * x for q, x in zip(query_vec, plane)) >= 0:
            qbits |= 1 << p
    from itertools import combinations

    probe = {qbits}
    for r in range(1, multiprobe_hamming + 1):
        for bits in combinations(range(n_planes), r):
            mask = 0
            for p in bits:
                mask |= 1 << p
            probe.add(qbits ^ mask)

    bucketed = random_hyperplane_buckets(df, n_planes, dim, id_col, vec_col)
    cand = bucketed.filter(F.col("bucket").isin(*sorted(probe)))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_expr(_as_double(vec_col), q)
    return (
        cand.select(F.col(id_col), F.round(sim, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 keyword candidates + dense cosine, fused by RRF
# ---------------------------------------------------------------------------


def bm25_sparse_ranks(
    docs: DataFrame,
    query_ids: list[int],
    n_docs: int,
    total_tokens: int,
    n_terms: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The sparse leg of hybrid retrieval: per-query BM25 scores + dense-
    rank (``sparse_rnk``) for every doc sharing >=1 of the query's first
    ``n_terms`` tokens. Corpus postings that match no query term die
    map-side (broadcast term-set semi-join); everything downstream is
    sized by the candidates, not the corpus."""
    from binance_etl_clickhouse_spark.operators.corpus import (
        BM25_B,
        BM25_K1,
        _pin_counts,
    )
    from binance_etl_clickhouse_spark.operators.parallel import ensure_min_parallelism
    from binance_etl_clickhouse_spark.operators.texthash import tokens

    w = tokens(text_col)
    qd = docs.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.array_distinct(F.slice(w, 1, n_terms)).alias("qterms"),
    )
    qt = qd.select("query_id", F.explode("qterms").alias("term"))

    tok = ensure_min_parallelism(docs).select(
        F.col(id_col), F.size(w).alias("dl"), F.explode(w).alias("term")
    )
    # probe before the aggregation (guide §2.3): the broadcast semi-join
    # kills non-query-term tokens map-side, so the (doc, dl, term)
    # exchange carries only matching occurrences, not the corpus's whole
    # distinct-posting set. Filtering on the grouping key commutes with
    # the groupBy — tf and df_count are unchanged.
    tfq = _pin_counts(
        tok.join(F.broadcast(qt.select("term").distinct()), "term")
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf")),
        True,
    )
    dfreq = tfq.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df_count"))
    n = float(n_docs)
    t_tot = float(total_tokens)
    idf = F.log(
        F.lit(1.0) + (F.lit(n) - F.col("df_count") + F.lit(0.5)) / (F.col("df_count") + F.lit(0.5))
    )
    norm = F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B)
        + F.lit(BM25_B) * (F.col("dl").cast("double") * F.lit(n) / F.lit(t_tot))
    )
    contrib = F.round(
        idf * (F.col("tf") * F.lit(BM25_K1 + 1.0)) / (F.col("tf") + norm), 6
    )
    return (
        tfq.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qt), "term")
        .filter(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum(contrib), 6).alias("bm25"))
        .withColumn(
            "sparse_rnk",
            F.row_number()
            .over(Window.partitionBy("query_id").orderBy(F.col("bm25").desc(), id_col))
            .cast("long"),
        )
    )


def rrf_fuse(
    sparse: DataFrame,
    dense: DataFrame,
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal Rank Fusion of a sparse and a dense ranking:

        rrf(d) = 1/(K + rank_sparse(d)) + 1/(K + rank_dense(d))

    (Cormack et al. 2009, K=60) — the standard sparse+dense fusion that
    needs no score calibration, and, because it consumes integer RANKS of
    deterministically-rounded scores, is exactly reproducible across
    engines (full value-hash oracle, unlike score-interpolation blends).

    Candidate sets need not nest: fusion is a FULL OUTER join on
    (query_id, doc), so a doc ranked by only one leg keeps that leg's
    contribution; the missing leg's rank surfaces as -1 and contributes 0.
    (When the dense leg is IVF-pruned, sparse-only candidates are the
    normal case, not an error.)
    """
    fused = dense.join(sparse, ["query_id", id_col], "full_outer").select(
        "query_id",
        id_col,
        F.coalesce(F.col("sparse_rnk"), F.lit(-1).cast("long")).alias("out_sparse_rnk"),
        F.coalesce(F.col("dense_rnk"), F.lit(-1).cast("long")).alias("out_dense_rnk"),
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("sparse_rnk")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("dense_rnk")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    fused = (
        fused.withColumnRenamed("out_sparse_rnk", "sparse_rnk")
        .withColumnRenamed("out_dense_rnk", "dense_rnk")
    )
    topw = Window.partitionBy("query_id").orderBy(F.col("rrf_score").desc(), id_col)
    return (
        fused.withColumn("rnk", F.row_number().over(topw).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", id_col, "rrf_score", "sparse_rnk", "dense_rnk", "rnk")
    )


def hybrid_rrf_topk(
    docs: DataFrame,
    emb: DataFrame,
    query_ids: list[int],
    n_docs: int,
    total_tokens: int,
    n_terms: int = 3,
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid search, EXACT dense leg: fuse each query doc's BM25 keyword
    retrieval (first ``n_terms`` tokens) with a full-corpus dense cosine
    ranking via :func:`rrf_fuse`.

    The dense side is one broadcast pass over ALL embeddings — exact but
    linear in the corpus per query batch, so this form is the small-scale /
    recall-oracle baseline. The registered production form is
    :func:`hybrid_rrf_ivf_topk`, which routes the dense leg through the
    IVF cell-partitioned index (partition-pruned candidate scan) and fuses
    identically.
    """
    sparse = bm25_sparse_ranks(
        docs, query_ids, n_docs, total_tokens, n_terms, id_col, text_col
    )

    v = emb.select(F.col(vec_id_col).alias(id_col), _as_double(vec_col).alias("v"))
    qe = v.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv")
    )
    dense = (
        v.crossJoin(F.broadcast(qe))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.round(cosine_expr(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        )
        .withColumn(
            "dense_rnk",
            F.row_number()
            .over(Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), id_col))
            .cast("long"),
        )
        .drop("cos_sim")
    )
    return rrf_fuse(sparse, dense, k=k, rrf_k=rrf_k, id_col=id_col)


def hybrid_rrf_ivf_topk(
    spark,
    docs: DataFrame,
    ivf_path: str,
    centroids: list[list[float]],
    queries: list[tuple[int, list[float]]],
    n_docs: int,
    total_tokens: int,
    n_terms: int = 3,
    k: int = 10,
    rrf_k: int = 60,
    nprobe: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid search, IVF dense leg — the scale form of
    :func:`hybrid_rrf_topk`.

    The dense candidates come from ONE partition-pruned scan of the
    :func:`~binance_etl_clickhouse_spark.operators.ivf.write_ivf_table`
    cell layout: probe cells are computed driver-side per query (centroid
    math over a k x dim literal), the scan reads only the UNION of probed
    cell directories (``cell IN ...`` lands in PartitionFilters —
    plan-pinned), and a broadcast (query, cell) routing join fans each
    candidate row to exactly the queries that probed its cell. Dense ranks
    are therefore ranks WITHIN the probed candidates — the standard ANN
    retrieval contract — and :func:`rrf_fuse`'s full-outer fusion keeps
    sparse-only candidates alive. At a billion vectors the dense cost is
    |Q| * nprobe/k_cells of the corpus instead of |Q| full scans.
    """
    from binance_etl_clickhouse_spark.operators.ivf import probe_cells

    sparse = bm25_sparse_ranks(
        docs, [qid for qid, _ in queries], n_docs, total_tokens, n_terms,
        id_col, text_col,
    )

    rows = []
    for qid, qv in queries:
        for c in probe_cells(centroids, qv, nprobe):
            rows.append((int(qid), int(c), [float(x) for x in qv]))
    qdf = spark.createDataFrame(rows, "query_id long, cell int, q_vec array<double>")
    cells = sorted({r[1] for r in rows})
    cand = spark.read.parquet(ivf_path).filter(F.col("cell").isin(cells))
    sim = cosine_expr(_as_double(vec_col), F.col("q_vec"))
    dense = (
        cand.join(F.broadcast(qdf), "cell")
        .filter(F.col(vec_id_col) != F.col("query_id"))
        .select("query_id", F.col(vec_id_col).alias(id_col), F.round(sim, 6).alias("cos_sim"))
        .withColumn(
            "dense_rnk",
            F.row_number()
            .over(Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), id_col))
            .cast("long"),
        )
        .drop("cos_sim")
    )
    return rrf_fuse(sparse, dense, k=k, rrf_k=rrf_k, id_col=id_col)


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection — deterministic ±1/sqrt(k) matrix
# from md5, so engine and oracle share the literals (like the LSH planes).
# ---------------------------------------------------------------------------


def jl_component(j: int, d: int, k: int) -> float:
    """Deterministic Rademacher entry: ±1/sqrt(k) from md5 parity."""
    import hashlib
    import math

    h = int(hashlib.md5(f"jl:{j}:{d}".encode()).hexdigest()[:15], 16)
    return (1.0 if h % 2 == 0 else -1.0) / math.sqrt(k)


def jl_matrix(k: int, dim: int) -> list[list[float]]:
    return [[jl_component(j, d, k) for d in range(dim)] for j in range(k)]


def jl_project(
    df: DataFrame,
    k: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project embeddings to k dims (distance-preserving w.h.p.) — k dot
    products against broadcast-literal rows, pure projection, zero shuffle.
    At 100 TB this is the cheap pre-pass that shrinks every downstream
    pairwise/ANN operator's bytes by dim/k."""
    v = _as_double(vec_col)
    cols = [F.col(id_col)]
    for j, row in enumerate(jl_matrix(k, dim)):
        rv = F.array(*[F.lit(x) for x in row])
        cols.append(F.round(dot_expr(v, rv), 6).alias(f"p{j:02d}"))
    return df.select(*cols)
