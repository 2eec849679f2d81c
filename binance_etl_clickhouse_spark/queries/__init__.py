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

# ---------------------------------------------------------------------------
# Driver verification window. The correctness driver checks the FIRST 50
# registered queries per round, so registration order is a verification
# budget. This round's window: (a) everything that has never had a driver
# CORRECTNESS row (the TPC-H suite, function families, window frames,
# dataset ops — r1 checked only indices 0-49 of the old order), (b) queries
# whose implementation changed or were added this round, (c) one
# already-green representative as regression canary.
#
# NEXT-ROUND ROTATION: still driver-unchecked after r2 (pytest-oracle only)
# and first in line for the next window: ann_ivf_pq_topk, tfidf_top_terms,
# unigram_logprob_quality, source_mixture_sample, pii_redaction,
# chunk_sliding_windows, winsorize_per_type, rolling_corr_click_purchase,
# tpch_q12_shipmode_priority, span_dedup_corpus,
# funnel_signup_click_purchase, cohort_retention_daily,
# hopping_window_counts, price_histogram_fixed_bins,
# embedding_centroid_per_label, ann_batch_topk, ann_ivf_batch_topk,
# embedding_decontamination, length_bucket_batches,
# funnel_conversion_lags, cohort_retention_weekly,
# equi_depth_histogram, interval_overlap_pairs, fuzzy_snippet_pairs,
# training_shuffle_shards, dsir_importance_select, bm25_topk_docs,
# nb_lang_classifier, gopher_quality_filters, bm25_index_topk,
# hybrid_rrf_search, bpe_pair_stats (+ rows-only bpe_train_merges /
# bpe_token_counts), asof_forward_purchase_click,
# asof_nearest_purchase_click — plus
# re-proving a sample of the r1-green
# block rotated out this round (relational/scalar/set/window basics,
# keep_last_dedup, ngram/simhash/ann families, multimodal, sessionization,
# rollup/cube).
# ---------------------------------------------------------------------------
DRIVER_WINDOW = [
    # (a) never driver-checked: windows / grouping
    "window_rank_family",
    "window_range_rolling_7d",
    "grouping_sets_orders",
    # (a) the TPC-H suite
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_volume_customer",
    "tpch_q19_disjunctive_revenue",
    "tpch_q21_waiting_supplier",
    "tpch_q22_sales_opportunity",
    # (a) function families + set ops + subqueries
    "conditional_agg_priority_mix",
    "string_function_family",
    "date_function_family",
    "null_semantics_family",
    "array_function_family",
    "map_function_family",
    "except_users",
    "stats_family",
    "scalar_subquery_above_global_avg",
    "correlated_subquery_above_avg",
    # (a) dataset-engineering ops
    "dataset_split_hash",
    "stratified_sample_per_lang",
    "training_data_prep_pipeline",
    # (b) changed this round
    "simhash_neardup_pairs",
    "approx_aggregates",
    "ann_lsh_topk",
    "embedding_lsh_neardup",
    "ann_ivf_topk",
    # semdedup_prune displaced embedding_cosine_neardup: the latter was
    # driver-green in r1 and its only change since (GEMM boundary mask) is
    # equivalence-pinned by pytest at sf0.001 AND sf0.01; the former is a
    # brand-new operator that needs its first driver row.
    "semdedup_prune",
    # (b) new this round — never driver-checked
    "window_distribution_family",
    "token_budget_pack",
    "leakage_safe_split",
    "embedding_int8_quantize",
    "neardup_clusters",
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_profit",
    "tpch_q11_value_concentration",
    "tpch_q16_supplier_cnt",
    "tpch_q20_excess_share_supplier",
    "gapfill_hourly_locf",
    "repetition_signals",
    # (b) new this session — PQ ANN (ADC shortlist + exact rerank). Takes
    # the canary slot: every family already has an (a)/(b) row in the
    # window, and the r1-green set (incl. keep_last_dedup, driver-proven in
    # r1) stays pytest-pinned and rotates back in next round.
    "ann_pq_topk",
]


def _apply_driver_order() -> None:
    missing = [n for n in DRIVER_WINDOW if n not in QUERIES]
    if missing:
        raise ValueError(f"DRIVER_WINDOW names unknown queries: {missing}")
    rest = [n for n in QUERIES if n not in DRIVER_WINDOW]
    ordered = {n: QUERIES[n] for n in [*DRIVER_WINDOW, *rest]}
    QUERIES.clear()
    QUERIES.update(ordered)


_apply_driver_order()
