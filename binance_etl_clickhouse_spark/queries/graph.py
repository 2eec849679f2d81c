"""Graph-analytics queries over the part co-purchase graph.

Training-data-pipeline extension (the reference's surface has no graph ops):
entity-graph degree statistics, triangle counting, and fixed-iteration
PageRank. The DuckDB oracles rebuild the same graph from ``lineitem`` and
recompute each statistic independently — for triangles with the *naive*
id-ordered algorithm (the Spark side uses the scalable degree-ordered
orientation; the counts provably coincide, so the driver hash-check
cross-validates the two algorithms against each other), and for PageRank by
unrolling the identical power iterations as chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.operators import graph
from binance_etl_clickhouse_spark.queries.registry import register
from binance_etl_clickhouse_spark.tables import load_table as _t

_PR_ITERS = 3
_PR_D = graph.DAMPING

#: shared oracle CTE: the co-purchase edge list (src < dst, w = #orders)
_EDGES_CTE = """
    items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    edges AS (
      SELECT a.p AS src, b.p AS dst, count(*)::BIGINT AS w
      FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p
    ),
    und AS (
      SELECT src AS u, dst AS v, w FROM edges
      UNION ALL
      SELECT dst AS u, src AS v, w FROM edges
    )"""


@register(
    "graph_degree_stats",
    f"""
    WITH {_EDGES_CTE}
    SELECT u AS part_key, count(*)::BIGINT AS degree, sum(w)::BIGINT AS weighted_degree
    FROM und GROUP BY u
    """,
    survey_ref="graph: co-purchase degree statistics (bounded per-order pair join)",
)
def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = graph.copurchase_edges(_t(spark, sf_dir, "lineitem"))
    return graph.degree_stats(edges)


@register(
    "graph_triangle_count",
    f"""
    WITH {_EDGES_CTE}
    SELECT count(*)::BIGINT AS n_triangles
    FROM edges e1
    JOIN edges e2 ON e2.src = e1.dst
    JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
    """,
    survey_ref="graph: triangle count (degree-ordered orientation vs naive oracle)",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = graph.copurchase_edges(_t(spark, sf_dir, "lineitem"))
    return graph.triangle_count(edges)


def _pagerank_oracle() -> str:
    """Unroll _PR_ITERS power iterations as chained CTEs (deg >= 1 for every
    vertex by construction, so no dangling-mass term)."""
    ctes = [
        "deg AS (SELECT u, count(*)::DOUBLE AS d FROM und GROUP BY u)",
        "nn AS (SELECT count(*)::DOUBLE AS n FROM deg)",
        "p0 AS (SELECT u, 1.0 / nn.n AS pr FROM deg CROSS JOIN nn)",
    ]
    prev = "p0"
    for i in range(1, _PR_ITERS + 1):
        ctes.append(
            f"""p{i} AS (
      SELECT e.v AS u,
             (1.0 - {_PR_D}) / max(nn.n) + {_PR_D} * sum({prev}.pr / deg.d) AS pr
      FROM und e
      JOIN {prev} ON {prev}.u = e.u
      JOIN deg ON deg.u = e.u
      CROSS JOIN nn
      GROUP BY e.v
    )"""
        )
        prev = f"p{i}"
    body = ",\n    ".join(ctes)
    return f"""
    WITH {_EDGES_CTE},
    {body}
    SELECT u AS part_key, round(pr, 6) AS pagerank FROM {prev}
    """


@register(
    "pagerank_copurchase",
    _pagerank_oracle(),
    survey_ref="graph: fixed-iteration PageRank (one shuffle per iteration)",
)
def pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = graph.copurchase_edges(_t(spark, sf_dir, "lineitem"))
    return graph.pagerank(edges, iters=_PR_ITERS)


_PPR_MOD = 97


def _ppr_oracle() -> str:
    """Unrolled personalized PageRank: teleport mass returns to the seed
    set (part_key % MOD == 0) each iteration; non-flow vertices keep their
    teleport-only mass via LEFT JOIN + coalesce, exactly as the engine."""
    ctes = [
        "deg AS (SELECT u, count(*)::DOUBLE AS d FROM und GROUP BY u)",
        f"sd AS (SELECT u, 1.0 AS is_seed FROM deg WHERE u % {_PPR_MOD} = 0)",
        "ns AS (SELECT count(*)::DOUBLE AS n FROM sd)",
        """p0 AS (
      SELECT deg.u, coalesce(sd.is_seed, 0.0) / ns.n AS pr
      FROM deg LEFT JOIN sd USING (u) CROSS JOIN ns
    )""",
    ]
    prev = "p0"
    for i in range(1, _PR_ITERS + 1):
        ctes.append(
            f"""f{i} AS (
      SELECT e.v AS u, {_PR_D} * sum({prev}.pr / deg.d) AS flow
      FROM und e JOIN {prev} ON {prev}.u = e.u JOIN deg ON deg.u = e.u
      GROUP BY e.v
    )"""
        )
        ctes.append(
            f"""p{i} AS (
      SELECT deg.u,
             coalesce(f{i}.flow, 0.0)
               + (1.0 - {_PR_D}) * coalesce(sd.is_seed, 0.0) / ns.n AS pr
      FROM deg LEFT JOIN f{i} USING (u) LEFT JOIN sd USING (u) CROSS JOIN ns
    )"""
        )
        prev = f"p{i}"
    body = ",\n    ".join(ctes)
    return f"""
    WITH {_EDGES_CTE},
    {body}
    SELECT u AS part_key, round(pr, 8) AS ppr FROM {prev}
    """


@register(
    "personalized_pagerank_seeded",
    _ppr_oracle(),
    survey_ref="graph: personalized PageRank (seed-set teleport, related-item expansion)",
)
def personalized_pagerank_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = graph.copurchase_edges(_t(spark, sf_dir, "lineitem"))
    seeds = (
        edges.select(F.col("src").alias("u"))
        .unionAll(edges.select(F.col("dst").alias("u")))
        .distinct()
        .filter(F.col("u") % _PPR_MOD == 0)
    )
    return graph.personalized_pagerank(edges, seeds, iters=_PR_ITERS)


# ---------------------------------------------------------------------------
# Connected components: fixed-iteration min-label propagation
# ---------------------------------------------------------------------------
_CC_ITERS = 4


def _cc_oracle() -> str:
    """Unroll the identical k min-label rounds as chained CTEs."""
    ctes = ["l0 AS (SELECT DISTINCT u, u AS lbl FROM und)"]
    for i in range(1, _CC_ITERS + 1):
        ctes.append(
            f"""l{i} AS (
      SELECT cur.u, least(cur.lbl, min(nb.lbl)) AS lbl
      FROM l{i - 1} cur
      JOIN und e ON e.u = cur.u
      JOIN l{i - 1} nb ON nb.u = e.v
      GROUP BY cur.u, cur.lbl
    )"""
        )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {_EDGES_CTE},
    {body}
    SELECT u AS part_key, lbl::BIGINT AS component FROM l{_CC_ITERS}
    """


@register(
    "graph_connected_components",
    _cc_oracle(),
    survey_ref="graph: k-bounded connected components (min-label propagation)",
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = graph.copurchase_edges(_t(spark, sf_dir, "lineitem"))
    return graph.connected_components(edges, iters=_CC_ITERS)


@register(
    "cc_large_star_small_star",
    f"""
    WITH RECURSIVE {_EDGES_CTE},
    reach(u, lbl) AS (
      SELECT DISTINCT u, u AS lbl FROM und
      UNION
      SELECT e.u, r.lbl FROM und e JOIN reach r ON r.u = e.v
    )
    SELECT u AS part_key, min(lbl)::BIGINT AS component
    FROM reach GROUP BY u
    """,
    survey_ref="graph: EXACT connected components (large-star/small-star contraction, O(log^2 n) rounds)",
)
def cc_large_star_small_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact components regardless of diameter: the Spark side runs
    alternating large-star/small-star contraction to its fixpoint; the
    oracle computes true components via a recursive min-label closure, so
    this pair pins CONVERGED semantics (graph_connected_components pins
    the k-bounded form)."""
    edges = graph.copurchase_edges(_t(spark, sf_dir, "lineitem"))
    return graph.connected_components_lsss(edges)


# ---------------------------------------------------------------------------
# HITS hubs/authorities over the customer -> part bipartite purchase graph
# ---------------------------------------------------------------------------
_HITS_ITERS = 2


def _hits_oracle() -> str:
    """Unroll the identical push/L2-normalize rounds as chained CTEs."""
    ctes = [
        """eb AS (
      SELECT DISTINCT o.o_custkey AS hub, l.l_partkey AS auth
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )""",
        "h0n AS (SELECT DISTINCT hub, 1.0 AS s FROM eb)",
    ]
    prev_h = "h0n"
    for i in range(1, _HITS_ITERS + 1):
        ctes += [
            f"""a{i} AS (
      SELECT auth, sum(h.s) AS s FROM eb JOIN {prev_h} h ON h.hub = eb.hub
      GROUP BY auth
    )""",
            f"na{i} AS (SELECT sqrt(sum(s * s)) AS nrm FROM a{i})",
            f"a{i}n AS (SELECT auth, s / nrm AS s FROM a{i} CROSS JOIN na{i})",
            f"""h{i} AS (
      SELECT hub, sum(a.s) AS s FROM eb JOIN a{i}n a ON a.auth = eb.auth
      GROUP BY hub
    )""",
            f"nh{i} AS (SELECT sqrt(sum(s * s)) AS nrm FROM h{i})",
            f"h{i}n AS (SELECT hub, s / nrm AS s FROM h{i} CROSS JOIN nh{i})",
        ]
        prev_h = f"h{i}n"
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT 'hub' AS side, hub::BIGINT AS node_id, round(s, 6) AS score
    FROM h{_HITS_ITERS}n
    UNION ALL
    SELECT 'auth' AS side, auth::BIGINT AS node_id, round(s, 6) AS score
    FROM a{_HITS_ITERS}n
    """


@register(
    "hits_hub_authority",
    _hits_oracle(),
    survey_ref="graph: HITS hubs/authorities on the customer-part bipartite graph",
)
def hits_hub_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_custkey").alias("hub"), F.col("l_partkey").alias("auth")
        )
        .distinct()
    )
    return graph.hits_bipartite(edges, iters=_HITS_ITERS)


# ---------------------------------------------------------------------------
# BFS hop levels from a seed set (bounded-hop reachability)
# ---------------------------------------------------------------------------
_BFS_HOPS = 3
_BFS_MOD = 211


def _bfs_oracle() -> str:
    """Unroll the min-hop rounds; FULL join keeps both the settled frontier
    and newly reached vertices, exactly as the engine."""
    ctes = [
        f"d0 AS (SELECT DISTINCT u, 0 AS hop FROM und WHERE u % {_BFS_MOD} = 0)",
    ]
    for i in range(1, _BFS_HOPS + 1):
        ctes.append(
            f"""n{i} AS (
      SELECT e.u, min(d.hop) + 1 AS nhop
      FROM und e JOIN d{i - 1} d ON d.u = e.v
      GROUP BY e.u
    )""",
        )
        ctes.append(
            f"""d{i} AS (
      SELECT coalesce(d.u, n.u) AS u, least(d.hop, n.nhop) AS hop
      FROM d{i - 1} d FULL JOIN n{i} n ON n.u = d.u
    )""",
        )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {_EDGES_CTE},
    {body}
    SELECT u AS part_key, hop::BIGINT AS hop FROM d{_BFS_HOPS}
    """


@register(
    "graph_bfs_levels",
    _bfs_oracle(),
    survey_ref="graph: bounded-hop BFS levels from a seed set (min-hop propagation)",
)
def graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = graph.copurchase_edges(_t(spark, sf_dir, "lineitem"))
    seeds = (
        edges.select(F.col("src").alias("u"))
        .unionAll(edges.select(F.col("dst").alias("u")))
        .distinct()
        .filter(F.col("u") % _BFS_MOD == 0)
    )
    return graph.bfs_levels(edges, seeds, max_hops=_BFS_HOPS)


# ---------------------------------------------------------------------------
# Degree assortativity (one-formula moment aggregate over edge incidences)
# ---------------------------------------------------------------------------
@register(
    "graph_assortativity",
    f"""
    WITH {_EDGES_CTE},
    deg AS (SELECT u, count(*)::DOUBLE AS d FROM und GROUP BY u),
    p AS (
      SELECT du.d AS x, dv.d AS y
      FROM und JOIN deg du ON du.u = und.u JOIN deg dv ON dv.u = und.v
    ),
    m AS (
      SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      FROM p
    )
    SELECT n::BIGINT AS n_incidences,
           round((sxy - sx * sy / n)
                 / nullif(sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 0), 6)
             AS assortativity
    FROM m
    """,
    survey_ref="graph: degree assortativity (Newman r, endpoint-degree Pearson)",
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = graph.copurchase_edges(_t(spark, sf_dir, "lineitem"))
    return graph.degree_assortativity(edges)


# ---------------------------------------------------------------------------
# Per-vertex local clustering coefficients
# ---------------------------------------------------------------------------
@register(
    "graph_clustering_coefficients",
    f"""
    WITH {_EDGES_CTE},
    deg AS (SELECT u, count(*)::BIGINT AS d FROM und GROUP BY u),
    tri AS (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      FROM edges e1
      JOIN edges e2 ON e2.src = e1.dst
      JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
    ),
    corners AS (
      SELECT a AS u FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
    ),
    pv AS (SELECT u, count(*)::BIGINT AS t FROM corners GROUP BY u)
    SELECT deg.u AS part_key, deg.d AS degree,
           coalesce(pv.t, 0)::BIGINT AS n_triangles,
           round(CASE WHEN deg.d >= 2
                      THEN coalesce(pv.t, 0) / (deg.d * (deg.d - 1) / 2.0)
                      ELSE 0.0 END, 6) AS clustering_coeff
    FROM deg LEFT JOIN pv ON pv.u = deg.u
    """,
    survey_ref="graph: per-vertex local clustering coefficient (oriented-intersection corner credit vs naive wedge oracle)",
)
def graph_clustering_coefficients(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = graph.copurchase_edges(_t(spark, sf_dir, "lineitem"))
    return graph.clustering_coefficients(edges)


# ---------------------------------------------------------------------------
# k-core: bounded-round degeneracy peeling
# ---------------------------------------------------------------------------
_KCORE_K = 60
_KCORE_ROUNDS = 4


def _kcore_oracle() -> str:
    ctes = ["a0 AS (SELECT DISTINCT u FROM und)"]
    for i in range(1, _KCORE_ROUNDS + 1):
        ctes.append(
            f"""d{i} AS (
      SELECT e.u, count(*)::BIGINT AS d
      FROM und e
      JOIN a{i - 1} au ON au.u = e.u
      JOIN a{i - 1} av ON av.u = e.v
      GROUP BY e.u
    )"""
        )
        ctes.append(f"a{i} AS (SELECT u FROM d{i} WHERE d >= {_KCORE_K})")
    body = ",\n    ".join(ctes)
    return f"""
    WITH {_EDGES_CTE},
    {body}
    SELECT u AS part_key, d AS core_degree FROM d{_KCORE_ROUNDS}
    WHERE d >= {_KCORE_K}
    """


@register(
    "graph_kcore_vertices",
    _kcore_oracle(),
    survey_ref="graph: bounded-round k-core peeling (degeneracy core extraction)",
)
def graph_kcore_vertices(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = graph.copurchase_edges(_t(spark, sf_dir, "lineitem"))
    return graph.kcore_vertices(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS)


# ---------------------------------------------------------------------------
# Link-prediction scores for existing edges
# ---------------------------------------------------------------------------
@register(
    "graph_link_prediction_scores",
    f"""
    WITH {_EDGES_CTE},
    deg AS (SELECT u, count(*)::BIGINT AS d FROM und GROUP BY u),
    common AS (
      SELECT e.src, e.dst, a.v AS w
      FROM edges e
      JOIN und a ON a.u = e.src
      JOIN und b ON b.u = e.dst AND b.v = a.v
    ),
    cn AS (
      SELECT src, dst, count(*)::BIGINT AS c,
             sum(1.0 / ln(dw.d)) AS aa
      FROM common JOIN deg dw ON dw.u = common.w
      GROUP BY src, dst
    )
    SELECT e.src, e.dst,
           coalesce(cn.c, 0)::BIGINT AS common_neighbors,
           round(coalesce(cn.c, 0)
                 / (du.d + dv.d - coalesce(cn.c, 0))::DOUBLE, 6) AS jaccard,
           round(coalesce(cn.aa, 0.0), 6) AS adamic_adar
    FROM edges e
    JOIN deg du ON du.u = e.src
    JOIN deg dv ON dv.u = e.dst
    LEFT JOIN cn ON cn.src = e.src AND cn.dst = e.dst
    """,
    survey_ref="graph: link-prediction scores (common neighbors / Jaccard / Adamic-Adar) per edge",
)
def graph_link_prediction_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = graph.copurchase_edges(_t(spark, sf_dir, "lineitem"))
    return graph.link_prediction_scores(edges)


# ---------------------------------------------------------------------------
# Weight-proportional PageRank (flows follow co-purchase counts)
# ---------------------------------------------------------------------------
def _wpagerank_oracle() -> str:
    ctes = [
        "wdeg AS (SELECT u, sum(w)::DOUBLE AS wd FROM und GROUP BY u)",
        "nn AS (SELECT count(*)::DOUBLE AS n FROM wdeg)",
        "p0 AS (SELECT u, 1.0 / nn.n AS pr FROM wdeg CROSS JOIN nn)",
    ]
    prev = "p0"
    for i in range(1, _PR_ITERS + 1):
        ctes.append(
            f"""p{i} AS (
      SELECT e.v AS u,
             (1.0 - {_PR_D}) / max(nn.n)
               + {_PR_D} * sum({prev}.pr * e.w / wdeg.wd) AS pr
      FROM und e
      JOIN {prev} ON {prev}.u = e.u
      JOIN wdeg ON wdeg.u = e.u
      CROSS JOIN nn
      GROUP BY e.v
    )"""
        )
        prev = f"p{i}"
    body = ",\n    ".join(ctes)
    return f"""
    WITH {_EDGES_CTE},
    {body}
    SELECT u AS part_key, round(pr, 6) AS pagerank FROM {prev}
    """


@register(
    "pagerank_weighted_copurchase",
    _wpagerank_oracle(),
    survey_ref="graph: weight-proportional PageRank (flow follows co-purchase multiplicity)",
)
def pagerank_weighted_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = graph.copurchase_edges(_t(spark, sf_dir, "lineitem"))
    return graph.pagerank(edges, iters=_PR_ITERS, weighted=True)
