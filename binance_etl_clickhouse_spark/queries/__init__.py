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
# budget. Round-8 window (per the round-7 verdict, item #1): the 50 STALEST
# proofs — all 34 queries last driver-checked in round 2 (the TPC-H long
# tail q2/q4/q5/q7/q10-q17/q19-q22, the date/array/map function families,
# the subquery shapes, grouping sets, stats, the 7-day range window,
# gapfill LOCF, the r2-era near-dup/ANN/quantize shapes, and the dataset
# split/sample/pack family), the rows-only `approx_aggregates` (sketches
# have no cross-engine twin; the driver records its weaker rows-only
# check), the 14 stalest round-4 proofs, and this round's new
# registration (the traced fixed-budget BPE trainer, which converts one of
# the remaining rows-only carve-outs into a fully hash-oracled query).
# Nothing in this window was driver-proven later than round 4.
# ---------------------------------------------------------------------------
DRIVER_WINDOW = [
    # --- new round-8 registration: the fixed-merge-budget BPE trainer with
    # the per-merge pair-argmax unrolled in the oracle (r7 verdict item 4) ---
    "bpe_train_merges_traced",
    # --- round-2-era: last driver-checked in CORRECTNESS_r02 ---
    "tpch_q2_min_cost_supplier",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q7_nation_volume",
    "tpch_q10_returned_items",
    "tpch_q11_value_concentration",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_disjunctive_revenue",
    "tpch_q20_excess_share_supplier",
    "tpch_q21_waiting_supplier",
    "tpch_q22_sales_opportunity",
    "date_function_family",
    "array_function_family",
    "map_function_family",
    "correlated_subquery_above_avg",
    "scalar_subquery_above_global_avg",
    "grouping_sets_orders",
    "stats_family",
    "window_range_rolling_7d",
    "gapfill_hourly_locf",
    "simhash_neardup_pairs",
    "embedding_lsh_neardup",
    "embedding_int8_quantize",
    "ann_lsh_topk",
    "ann_pq_topk",
    "dataset_split_hash",
    "leakage_safe_split",
    "stratified_sample_per_lang",
    "token_budget_pack",
    "repetition_signals",
    # --- rows-only carve-out, never hash-proven (no cross-engine twin) ---
    "approx_aggregates",
    # --- round-4-era fills: the 14 stalest CORRECTNESS_r04 proofs ---
    "tpch_q1_pricing_summary",
    "tumbling_resample_1h",
    "ann_bruteforce_topk",
    "multimodal_binary_features",
    "knn_label_classifier",
    "cluster_representative_select",
    "kmeans_cluster_quality",
    "ewma_anomaly_events",
    "session_window_agg",
    "trending_decayed_counts",
    "pandas_zscore_per_user",
    "heavy_hitters_event_types",
    "jl_random_projection",
    "ks_test_click_vs_purchase",
]


# Names in DRIVER_WINDOW that are not yet registered are skipped IF listed
# here (a window may name planned registrations before they land);
# anything else unknown still fails loudly, so a typo in an existing query
# name cannot silently shrink the verification window. Empty = every
# round-8 registration has landed.
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
