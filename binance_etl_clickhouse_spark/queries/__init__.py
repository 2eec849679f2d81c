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
# budget. Round-7 window (per the round-6 verdict, item #1): the 50 STALEST
# proofs — every query last driver-checked in round 1 (38 queries: the
# relational/predicate/join/set-op, window, scalar-function, and first-wave
# dedup/text families), nine stalest round-2 shapes (TPC-H, window/scalar
# families, set ops), and the three new round-7 registrations (the v3
# flagship, the fixed-vocab unigram encode, the per-source dup-rate
# monitor). Nothing in this window was driver-proven later than round 2,
# so it re-proves the r1/r2-era surface through the round-7 cache-hygiene
# relocation. The four queries
# whose builders this round's ADVICE fixes touch (salted_skew_agg,
# minhash_estimator_calibration, ann_recall_at_k, cc_large_star_small_star)
# are r6-green and stay outside the window; their parity is pinned by the
# full oracle sweep in tests/test_oracle_parity.py this round.
# ---------------------------------------------------------------------------
DRIVER_WINDOW = [
    # --- new round-7 registrations ---
    "training_data_prep_pipeline_v3",
    "tokenizer_apply_unigram",
    "dup_rate_by_source",
    # --- round-1-era: last driver-checked in CORRECTNESS_r01 ---
    "project_literals",
    "filter_eq_project",
    "filter_range_ts",
    "filter_in_list",
    "distinct_where_flag",
    "anti_join_completed",
    "semi_join_exists",
    "broadcast_dim_join",
    "keep_last_dedup",
    "max_watermark",
    "window_lag_delta",
    "window_running_sum",
    "topk_per_group",
    "orderby_limit_topn",
    "union_pages_distinct",
    "intersect_users",
    "scalar_time_roundtrip",
    "month_bucket_agg",
    "coerce_fill_zero",
    "regexp_json_extract",
    "array_join_slice",
    "rollup_orders",
    "cube_events",
    "count_rows_per_type",
    "exact_dedup_canonical",
    "ngram_jaccard_neardup",
    "simhash_signatures",
    "embedding_cosine_neardup",
    "text_quality_scores",
    "langid_heuristic",
    "doc_fingerprints",
    "multimodal_frame_samples",
    "benchmark_decontamination",
    "resample_ohlc_hourly",
    "sessionization_stats",
    "range_join_price_bands",
    "pivot_event_counts",
    "unpivot_lineitem_measures",
    # --- round-2-era fills: the judge-named families (TPC-H, windows,
    # scalar-function families, set ops), last checked in CORRECTNESS_r02 ---
    "except_users",
    "window_rank_family",
    "window_distribution_family",
    "tpch_q3_shipping_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q9_product_profit",
    "tpch_q18_large_volume_customer",
    "string_function_family",
    "null_semantics_family",
]


# Names in DRIVER_WINDOW that are not yet registered are skipped IF listed
# here (a window may name planned registrations before they land);
# anything else unknown still fails loudly, so a typo in an existing query
# name cannot silently shrink the verification window. Empty = every
# round-7 registration has landed.
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
