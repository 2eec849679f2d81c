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
    with_cache_hygiene,
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
# budget. Round-11 window (per the round-10 verdict, item #3): the 5
# round-10 registrations that have never been driver-checked (local
# sf0.001/sf0.01 pytest parity only), ALL 38 queries whose last driver
# proof is round 6, and the 7 stalest round-7 proofs (first-checked in
# CORRECTNESS_r07 order). After this rotation no registered query has a
# driver proof older than round 7.
# ---------------------------------------------------------------------------
DRIVER_WINDOW = [
    # --- round-10 registrations, never driver-checked (lead the window) ---
    "show_create_verbatim_roundtrip",
    "null_engine_mv_staging",
    "enum_map_ddl_roundtrip",
    "system_tables_introspection",
    "scalar_r10_family",
    # --- round-6-era: every query last driver-checked in CORRECTNESS_r06 ---
    "mann_whitney_click_vs_purchase",
    "logrank_cohort_survival",
    "profile_numeric_correlations",
    "fuzzy_snippet_pairs",
    "bpe_train_merges",
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
    # --- round-7-era fills: the 7 stalest r7 proofs (CORRECTNESS_r07 order) ---
    "training_data_prep_pipeline_v3",
    "tokenizer_apply_unigram",
    "dup_rate_by_source",
    "project_literals",
    "filter_eq_project",
    "filter_range_ts",
    "filter_in_list",
]


# Names in DRIVER_WINDOW that are not yet registered are skipped IF listed
# here (a window may name planned registrations before they land);
# anything else unknown still fails loudly, so a typo in an existing query
# name cannot silently shrink the verification window. Empty = every
# round-10 registration has landed.
#
# Round-12 rotation heads-up: NEXT_WINDOW below (the r11 registrations,
# each oracle-parity green at sf0.001 and sf0.01 in pytest) plus the 43
# remaining r7-era proofs are the natural next window.
PLANNED_NEW: set[str] = set()

# This round's (r11) registrations, placed in registration order
# IMMEDIATELY behind the 50-query verification window (r9 verdict item 6):
# first in line for the r12 rotation, and visible to the judge at stable
# positions 51+.
NEXT_WINDOW = [
    "prewhere_where_verbatim_sql",
    "cte_settings_verbatim_sql",
    "bracket_subscript_verbatim_sql",
    "aggregating_mt_roundtrip",
]


def _apply_driver_order() -> None:
    missing = [
        n for n in [*DRIVER_WINDOW, *NEXT_WINDOW] if n not in QUERIES
    ]
    unexpected = [n for n in missing if n not in PLANNED_NEW]
    if unexpected:
        raise ValueError(f"DRIVER_WINDOW names unknown queries: {unexpected}")
    head = [*DRIVER_WINDOW, *NEXT_WINDOW]
    present = [n for n in head if n in QUERIES]
    rest = [n for n in QUERIES if n not in head]
    ordered = {n: QUERIES[n] for n in [*present, *rest]}
    QUERIES.clear()
    QUERIES.update(ordered)


_apply_driver_order()
