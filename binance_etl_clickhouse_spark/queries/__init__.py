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
# budget. Round-4 window: (a) the 43 queries with NO driver CORRECTNESS
# row ever — the five registered after round 3's rotation
# (training_data_prep_pipeline_v2, knn_label_classifier,
# cluster_representative_select, embedding_pca_project,
# logreg_quality_classifier) plus every operator ADDED in round 4
# (graph family incl. connected components + HITS, text-statistics
# family, EWMA anomaly, k-means quality, dataset/retrieval/tokenizer/
# sessionization additions, marketing analytics, statistical testing);
# then (b) 7 re-proof canaries whose only driver row is from round 1 —
# the highest-complexity ones (dedup, ANN, multimodal, pandas-UDF,
# as-of, resample, TPC-H q1); the r1-proven simpler shapes yield their
# slots (they retain continuous sf0.01 pytest parity).
# ---------------------------------------------------------------------------
DRIVER_WINDOW = [
    # (a) never driver-checked: late round-3 registrations
    "training_data_prep_pipeline_v2",
    "knn_label_classifier",
    "cluster_representative_select",
    "embedding_pca_project",
    "logreg_quality_classifier",
    # (a) never driver-checked: round-4 graph family
    "graph_degree_stats",
    "graph_triangle_count",
    "pagerank_copurchase",
    "personalized_pagerank_seeded",
    # (a) never driver-checked: round-4 text-statistics family
    "pmi_cooccurrence_pairs",
    "zipf_vocab_stats",
    "minimizer_fingerprints",
    "cdc_chunk_dedup",
    "bloom_decontaminate",
    "keyword_tag_docs",
    # (a) never driver-checked: round-4 analytics/clustering
    "ewma_anomaly_events",
    "kmeans_cluster_quality",
    # (a) never driver-checked: round-4 dataset / retrieval / sketch /
    # tokenizer / sessionization additions
    "normalize_dedup_docs",
    "curriculum_interleave",
    "contrastive_negative_sample",
    "mmr_diversified_topk",
    "heavy_hitters_event_types",
    "unigram_seed_piece_stats",
    "unigram_lm_train",
    "unigram_lm_token_counts",
    "session_window_agg",
    "trending_decayed_counts",
    "jl_random_projection",
    "ks_test_click_vs_purchase",
    "event_sequence_trigrams",
    "profile_lineitem_columns",
    # (a) never driver-checked: round-4 marketing-analytics family
    "rfm_customer_segments",
    "attribution_last_touch",
    "attribution_linear",
    "assoc_rules_copurchase",
    # (a) never driver-checked: round-4 statistical-testing family
    "ab_conversion_ztest",
    "chi2_event_cohort_independence",
    "cusum_changepoint_daily",
    "seasonal_hourly_anomaly",
    "score_calibration_bins",
    "source_budget_waterfill",
    # (a) never driver-checked: round-4 graph additions
    "graph_connected_components",
    "hits_hub_authority",
    # (b) re-proof canaries: r1-only driver rows, the 7 most complex
    # plans (dedup, ANN, multimodal, pandas-UDF, as-of, resample, TPC-H);
    # the simpler r1-proven shapes retain continuous sf0.01 pytest parity
    "minhash_lsh_neardup",
    "ann_bruteforce_topk",
    "multimodal_binary_features",
    "pandas_zscore_per_user",
    "asof_join_purchase_click",
    "tumbling_resample_1h",
    "tpch_q1_pricing_summary",
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
