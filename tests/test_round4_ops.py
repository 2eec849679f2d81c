"""Property pins for the round-4 operators beyond oracle parity: structural
invariants that must hold at any scale or input shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_cdc_chunks_reassemble_to_original(spark):
    """Concatenating a document's chunks in order must reproduce its exact
    token stream — chunking moves boundaries, never content."""
    from binance_etl_clickhouse_spark.operators.textstats import cdc_chunks

    docs = _docs(spark)
    rebuilt = (
        cdc_chunks(docs)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("cidx", "chunk"))),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("rebuilt")
        )
    )
    bad = (
        docs.join(rebuilt, "doc_id")
        .filter(F.col("rebuilt") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_cdc_boundaries_shift_invariant_after_edit(spark):
    """Content-defined property: prepending tokens to a document changes
    only a bounded prefix of its chunk stream — the suffix chunks (past the
    first boundary after the edit) are identical. A fixed-width span grid
    would shift every chunk."""
    from binance_etl_clickhouse_spark.operators.textstats import cdc_chunks

    base = _docs(spark).filter(F.col("doc_id") == 1).select("doc_id", "text")
    edited = base.select(
        "doc_id", F.concat(F.lit("zzz qqq "), F.col("text")).alias("text")
    )
    c1 = [r.chunk for r in cdc_chunks(base).orderBy("cidx").collect()]
    c2 = [r.chunk for r in cdc_chunks(edited).orderBy("cidx").collect()]
    # suffix chunks re-synchronize: the tail of both chunk streams agrees
    tail = min(len(c1), len(c2)) - 1
    assert tail >= 1
    assert c1[-tail:] == c2[-tail:]


def test_minimizer_density_bounds(spark):
    from binance_etl_clickhouse_spark.operators.textstats import (
        minimizer_fingerprints,
    )

    out = minimizer_fingerprints(_docs(spark)).toPandas()
    with_windows = out[out.n_windows > 0]
    assert (with_windows.n_minimizers >= 1).all()
    assert (with_windows.n_minimizers <= with_windows.n_windows).all()
    # expected minimizer density for random hashes is ~2/(w+1) = 0.4 at
    # w=4; corpus-wide mean should land in a loose band around it
    assert 0.2 < with_windows.density.mean() < 0.7


def test_pagerank_mass_conserved(spark):
    """With no dangling nodes the total PageRank mass is exactly 1 (up to
    rounding) after every iteration."""
    from binance_etl_clickhouse_spark.operators import graph

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    pr = graph.pagerank(graph.copurchase_edges(li), iters=3)
    total = pr.agg(F.sum("pagerank")).first()[0]
    assert total == pytest.approx(1.0, abs=1e-3)


def test_triangle_orientation_matches_naive_count(spark):
    """Degree-ordered wedge counting equals the naive a<b<c join count —
    the algorithmic cross-check, independent of the DuckDB oracle."""
    from binance_etl_clickhouse_spark.operators import graph

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    edges = graph.copurchase_edges(li).persist()
    fast = graph.triangle_count(edges).first()["n_triangles"]
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = edges.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = edges.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    naive = e1.join(e2, "b").join(e3, ["a", "c"]).count()
    assert fast == naive


def test_ewma_first_event_per_user_has_null_smoother(spark):
    from binance_etl_clickhouse_spark.queries import QUERIES

    out = QUERIES["ewma_anomaly_events"].spark(spark, SF).toPandas()
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    first_ids = set(
        ev.sort_values(["ts", "event_id"]).groupby("user_id").head(1).event_id
    )
    firsts = out[out.event_id.isin(first_ids)]
    assert firsts.ewma.isna().all()
    assert (~firsts.is_anomaly).all()


def test_bloom_flags_supersets_exact_membership(spark):
    """Bloom semantics: every shingle truly shared with the eval set is
    flagged (no false negatives); false positives are allowed but bounded
    at this fill factor."""
    from binance_etl_clickhouse_spark.operators.textstats import bloom_flags
    from binance_etl_clickhouse_spark.operators.texthash import shingles

    docs = _docs(spark)
    ev = docs.filter(F.col("doc_id") % 11 == 0)
    out = bloom_flags(docs, ev, k=4).toPandas().set_index("doc_id")
    sh = docs.select("doc_id", F.explode(shingles("text", 4)).alias("sh"))
    ev_sh = ev.select(F.explode(shingles("text", 4)).alias("sh")).distinct()
    exact = (
        sh.join(ev_sh, "sh")
        .groupBy("doc_id")
        .agg(F.count_distinct("sh").alias("n_true"))
        .toPandas()
        .set_index("doc_id")
    )
    for doc_id, row in exact.iterrows():
        assert out.loc[doc_id, "n_flagged"] >= row.n_true
    # aggregate false-positive mass stays small at this fill factor
    total_flagged = int(out.n_flagged.sum())
    total_true = int(exact.n_true.sum())
    assert total_flagged - total_true <= 0.01 * int(out.n_shingles.sum())


def test_jl_projection_preserves_distances_approximately(spark):
    """JL lemma sanity: relative pairwise-distance distortion over a sample
    of pairs is bounded (loose band — k=16 is aggressive)."""
    import numpy as np

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(40).toPandas()
    from binance_etl_clickhouse_spark.operators.similarity import jl_matrix

    V = np.array([np.array(v, dtype=float) for v in emb.embedding])
    R = np.array(jl_matrix(16, 64))
    P = V @ R.T
    rng = range(0, 30, 3)
    ratios = []
    for i in rng:
        for j in range(i + 1, 30, 7):
            d0 = np.linalg.norm(V[i] - V[j])
            d1 = np.linalg.norm(P[i] - P[j])
            if d0 > 0:
                ratios.append(d1 / d0)
    r = np.array(ratios)
    assert 0.4 < r.mean() < 1.6
    assert (r > 0.2).all() and (r < 2.5).all()


def test_mg_merge_never_invents_items(spark):
    from binance_etl_clickhouse_spark.operators.sketches import (
        merge_mg_summaries,
        misra_gries_summaries,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    s = misra_gries_summaries(
        ev.withColumn("b", (F.col("user_id") % 3).cast("string")),
        ["b"],
        "event_type",
        k=3,
    )
    merged = merge_mg_summaries(s, k=3)
    src_items = {r.item for r in s.select("item").distinct().collect()}
    for r in merged.collect():
        assert r.item in src_items
        assert r.lower_count > 0


def test_compact_persist_caps_partitions_without_eager_eval(spark):
    """compact_persist must cap a wide shuffle output at cluster
    parallelism, pass an already-narrow frame through unchanged, and add
    NO jobs at call time (probing .rdd under AQE materializes query
    stages — the round-4 regression this helper exists to avoid)."""
    from binance_etl_clickhouse_spark.operators.parallel import compact_persist

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    wide = spark.range(10_000).repartition(200, "id")
    out = compact_persist(wide)
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert before == after, "compact_persist ran Spark jobs at call time"
    assert out.rdd.getNumPartitions() <= sc.defaultParallelism
    assert out.count() == 10_000
    # the cap also bounds frames narrowed by an ADJACENT coalesce — the
    # two coalesces collapse in the plan and re-widen toward the source
    # partitioning, but never above the cap
    narrow = spark.range(100).coalesce(1)
    kept = compact_persist(narrow)
    assert kept.rdd.getNumPartitions() <= sc.defaultParallelism
    assert kept.count() == 100
    out.unpersist()
    kept.unpersist()


def test_copurchase_mega_cart_routes_through_chunked_path(spark):
    """The cart_cap guard (guide §2.5): a 10k-item order must produce the
    exact same edge set as the inline path, with no single row/task ever
    holding the full O(cart²) pair array — the chunked path's biggest
    generated row is cart_cap² pair structs."""
    from binance_etl_clickhouse_spark.operators import graph

    n = 500  # 500 distinct parts in one order -> 124,750 pairs
    rows = [(1, p) for p in range(n)] + [(2, 1), (2, 2), (3, 7)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    guarded = graph.copurchase_edges(li, cart_cap=64)
    inline = graph.copurchase_edges(li, cart_cap=10**9)
    assert guarded.exceptAll(inline).count() == 0
    assert inline.exceptAll(guarded).count() == 0
    assert guarded.count() == n * (n - 1) // 2  # (1,2) merges with the cart's own pair
    # the guard engages: the chunked branch carries the mega-cart
    assert guarded.filter((F.col("src") == 1) & (F.col("dst") == 2)).first()["w"] == 2
