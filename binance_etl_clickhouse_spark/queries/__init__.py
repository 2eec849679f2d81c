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
# budget. Round-5 window: spend the ENTIRE window on the verification
# backlog — 49 of the 66 queries that have NEVER had a driver
# CORRECTNESS row (r1/r2/r4 artifacts; round 3 produced none), plus the
# one historical red whose fix has no driver row
# (conditional_agg_priority_mix, red in r2, ::BIGINT casts landed in r4).
# New-query registration is FROZEN this round until the backlog clears.
#
# Residual 17 never-checked for round 6: quality_quantile_filter,
# weighted_sample_per_source, hopping_window_counts, graph_bfs_levels,
# graph_assortativity, graph_clustering_coefficients,
# graph_kcore_vertices, graph_link_prediction_scores,
# pagerank_weighted_copurchase, textrank_keywords,
# kaplan_meier_click_to_purchase, mann_whitney_click_vs_purchase,
# logrank_cohort_survival, profile_numeric_correlations,
# fuzzy_snippet_pairs, bpe_train_merges, bpe_token_counts (the last two
# are the rows-only trainer carve-outs pinned by pure-Python pytest
# references).
# ---------------------------------------------------------------------------
DRIVER_WINDOW = [
    # historical red (r2) — fix landed r4, needs driver re-proof
    "conditional_agg_priority_mix",
    # corpus-statistics family (11) — the reference's ClickHouse-delegated
    # SQL surface, never driver-checked
    "tfidf_top_terms",
    "bm25_topk_docs",
    "bm25_index_topk",
    "nb_lang_classifier",
    "gopher_quality_filters",
    "dsir_importance_select",
    "unigram_logprob_quality",
    "bigram_logprob_quality",
    "ccnet_perplexity_buckets",
    "ngram_novelty_scores",
    "source_mixture_sample",
    # hybrid retrieval (2)
    "hybrid_rrf_search",
    "hybrid_rrf_exact_search",
    # span / substring / tfidf-cosine dedup (3)
    "span_dedup_corpus",
    "substring_dedup_corpus",
    "tfidf_cosine_pairs",
    # batch / PQ / range ANN paths (4)
    "ann_batch_topk",
    "ann_ivf_batch_topk",
    "ann_ivf_pq_topk",
    "ann_ivf_range_search",
    # BPE oracled queries (2)
    "bpe_pair_stats",
    "bpe_merge_trace",
    # as-of variants (2)
    "asof_forward_purchase_click",
    "asof_nearest_purchase_click",
    # funnels / cohorts (4)
    "funnel_signup_click_purchase",
    "funnel_conversion_lags",
    "cohort_retention_daily",
    "cohort_retention_weekly",
    # TPC-H gap (1)
    "tpch_q12_shipmode_priority",
    # histograms (2)
    "price_histogram_fixed_bins",
    "equi_depth_histogram",
    # robust statistics / correlation / intervals (4)
    "winsorize_per_type",
    "mad_outlier_per_type",
    "rolling_corr_click_purchase",
    "interval_overlap_pairs",
    # chunking / sharding / centroids / redaction / decontamination (6)
    "chunk_sliding_windows",
    "training_shuffle_shards",
    "length_bucket_batches",
    "embedding_centroid_per_label",
    "pii_redaction",
    "embedding_decontamination",
    # variant extraction (1)
    "variant_extract_agg",
    # entity-resolution family (3)
    "entity_match_pairs",
    "entity_resolution_parts",
    "entity_cluster_rollup",
    # data-quality family (4)
    "dq_expectations_lineitem",
    "dq_referential_orphans",
    "dq_uniqueness_keys",
    "dq_freshness_event_types",
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
