"""Query registry — every implemented operator exposed as a named query.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with (where SQL-expressible) an equivalent DuckDB oracle SQL string over the
driver's pre-registered testdata views. The driver hash-compares the two at
sf0.01 (order-insensitive, column-name-sorted), so both sides alias every
computed column identically.
"""

from binance_etl_clickhouse_spark.queries.registry import (  # noqa: F401
    QUERIES,
    oracle_sql_map,
    queries_map,
    register,
)

# Importing these modules populates the registry.
from binance_etl_clickhouse_spark.queries import relational  # noqa: F401,E402
from binance_etl_clickhouse_spark.queries import llm  # noqa: F401,E402
from binance_etl_clickhouse_spark.queries import analytics  # noqa: F401,E402
from binance_etl_clickhouse_spark.queries import extended  # noqa: F401,E402
from binance_etl_clickhouse_spark.queries import windows  # noqa: F401,E402
from binance_etl_clickhouse_spark.queries import functions_wide  # noqa: F401,E402
from binance_etl_clickhouse_spark.queries import tpch_suite  # noqa: F401,E402
from binance_etl_clickhouse_spark.queries import dataset  # noqa: F401,E402
from binance_etl_clickhouse_spark.queries import corpus  # noqa: F401,E402
from binance_etl_clickhouse_spark.queries import graph  # noqa: F401,E402
from binance_etl_clickhouse_spark.queries import textstats  # noqa: F401,E402
from binance_etl_clickhouse_spark.queries import market  # noqa: F401,E402
from binance_etl_clickhouse_spark.queries import stats_eval  # noqa: F401,E402
from binance_etl_clickhouse_spark.queries import entity  # noqa: F401,E402
from binance_etl_clickhouse_spark.queries import quality  # noqa: F401,E402

# ---------------------------------------------------------------------------
# Driver verification window. The correctness driver checks the FIRST 50
# registered queries per round, so registration order is a verification
# budget. Round-6 window: (a) the residual 17 queries that have NEVER had
# a driver CORRECTNESS row (r5 closed the rest of the backlog — 187/204
# checked-ever after r5), (b) new round-6 registrations, (c) re-proofs of
# the highest-complexity composites per the round-5 verdict.
# ---------------------------------------------------------------------------
DRIVER_WINDOW = [
    # --- residual 17: never driver-checked (green in judge's sf0.01 parity) ---
    "quality_quantile_filter",
    "weighted_sample_per_source",
    "hopping_window_counts",
    "graph_bfs_levels",
    "graph_assortativity",
    "graph_clustering_coefficients",
    "graph_kcore_vertices",
    "graph_link_prediction_scores",
    "pagerank_weighted_copurchase",
    "textrank_keywords",
    "kaplan_meier_click_to_purchase",
    "mann_whitney_click_vs_purchase",
    "logrank_cohort_survival",
    "profile_numeric_correlations",
    "fuzzy_snippet_pairs",
    # rows-only trainer carve-outs (pure-Python pytest references) — driver
    # records the weaker rows-only check for these two
    "bpe_train_merges",
    "bpe_token_counts",
    # --- new round-6 registrations (all landed) ---
    "unigram_em_trace",
    "entity_resolution_converged",
    "minhash_pairs_capped",
    "cc_large_star_small_star",
    "tokenizer_apply_bpe",
    "doc_containment_pairs",
    "ngram_lm_kneser_ney",
    "stratified_kfold_assign",
    "salted_skew_agg",
    "ann_recall_at_k",
    "psi_source_drift",
    "minhash_estimator_calibration",
    # --- re-proofs: highest-complexity composites (round-5 verdict list)
    # plus the shapes this round's engine changes touch (substring dedup
    # interval rewrite, capped minhash, convergent CC, MMR collapse) ---
    "training_data_prep_pipeline_v2",
    "substring_dedup_corpus",
    "ann_ivf_pq_topk",
    "minhash_lsh_neardup",
    "neardup_clusters",
    "entity_resolution_parts",
    "graph_connected_components",
    "hybrid_rrf_search",
    "embedding_pca_project",
    "logreg_quality_classifier",
    "tpch_q8_market_share",
    "training_data_prep_pipeline",
    "semdedup_prune",
    "ann_ivf_topk",
    "bpe_merge_trace",
    "unigram_lm_token_counts",
    "dsir_importance_select",
    "source_mixture_sample",
    "mmr_diversified_topk",
    "span_dedup_corpus",
    "asof_join_purchase_click",
]


# Names in DRIVER_WINDOW that are not yet registered are skipped IF listed
# here (a window may name planned registrations before they land);
# anything else unknown still fails loudly, so a typo in an existing query
# name cannot silently shrink the verification window. Empty = every
# round-6 registration has landed.
PLANNED_NEW: set[str] = set()


def _apply_driver_order() -> None:
    missing = [n for n in DRIVER_WINDOW if n not in QUERIES]
    unexpected = [n for n in missing if n not in PLANNED_NEW]
    if unexpected:
        raise ValueError(f"DRIVER_WINDOW names unknown queries: {unexpected}")
    present = [n for n in DRIVER_WINDOW if n in QUERIES]
    rest = [n for n in QUERIES if n not in DRIVER_WINDOW]
    ordered = {n: QUERIES[n] for n in [*present, *rest]}
    QUERIES.clear()
    QUERIES.update(ordered)


_apply_driver_order()
