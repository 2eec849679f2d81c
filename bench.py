"""Headline benchmark: runs representative queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is materialized with the noop sink (full plan execution, no
driver collect). Per-query time = best of N_RUNS to damp JIT/IO noise.

Load-robust (r10): a /proc/stat busy-cores sentinel brackets every tier;
a loaded bracket triggers one re-sweep (per-query best of both passes)
and the artifact carries {"loaded": bool, "sentinel": {...}} so a
timings file taken on a busy machine is self-describing.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from binance_etl_clickhouse_spark.queries import QUERIES  # noqa: E402
from binance_etl_clickhouse_spark.queries.registry import (  # noqa: E402
    clear_rdd_blocks,
)
from binance_etl_clickhouse_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("BENCH_RUNS", "2"))

#: Iterative families persist several frames per round, so their cold-cache
#: run-to-run variance is the highest in the suite (r6 verdict): best-of-3
#: minimum converges where best-of-2 still swings ~1.5x.
N_RUNS_ITERATIVE = max(N_RUNS, int(os.environ.get("BENCH_RUNS_ITERATIVE", "3")))
ITERATIVE_FAMILIES = {
    "graph_triangle_count",
    "pagerank_copurchase",
    "graph_connected_components",
    "hits_hub_authority",
    "cc_large_star_small_star",
    "minhash_lsh_neardup",
    "tfidf_cosine_pairs",
    "embedding_pca_project",
    "logreg_quality_classifier",
    "entity_resolution_parts",
    # not iterative, but its ~1.3 s wall swings 1.3-2.1 s run-to-run under
    # best-of-2 (the r8 "regression" was exactly this noise — best-of-5
    # reproduces 1.31 s, and the r8 neardup.py diff was comment-only):
    # best-of-3 is the stable statistic (r8 verdict item 2)
    "doc_containment_pairs",
    # same class (r9 verdict item 3): the two r9 idle movers. Code
    # unchanged either round; measured r10 idle, 10-run series swing
    # 0.41-0.92 s (hopping) and 0.88-1.52 s (q2) — ~2x run-to-run on
    # sub-second walls, which best-of-2 samples as a fake ±35% move.
    "hopping_window_counts",
    "tpch_q2_min_cost_supplier",
}

#: headline set — one per operator family (agg, join, window-dedup, top-k,
#: month rollup, event-time resample, running window, anti-join), plus the
#: expensive families where regressions would actually hurt at scale:
#: LSH dedup, GEMM embedding pairs, decontamination, as-of join, the
#: 7-table TPC-H join, banded SimHash, and the multi-stage prep pipeline
HEADLINE = [
    "tpch_q1_pricing_summary",
    "broadcast_dim_join",
    "keep_last_dedup",
    "topk_per_group",
    "month_bucket_agg",
    "tumbling_resample_1h",
    "window_running_sum",
    "anti_join_completed",
    "minhash_lsh_neardup",
    "embedding_cosine_neardup",
    "benchmark_decontamination",
    "asof_join_purchase_click",
    "tpch_q8_market_share",
    "simhash_neardup_pairs",
    "training_data_prep_pipeline",
    # round-2 additions: correlated-min over the part-supplier bridge,
    # grid-generating gapfill, shuffle-keyed repetition, projection chunking
    "tpch_q2_min_cost_supplier",
    "gapfill_hourly_locf",
    "repetition_signals",
    "chunk_sliding_windows",
    # corpus span dedup (explode + global first-occurrence window) and the
    # 4x-replicating hopping window — the two new shuffle-heavy shapes
    "span_dedup_corpus",
    "hopping_window_counts",
    # DSIR selection: two corpus-wide shuffles (doc-bucket counts + score
    # join-back) — the newest corpus-statistic family
    "dsir_importance_select",
    # BM25 retrieval (broadcast inverted-index probe) and the trained NB
    # classifier (broadcast model scoring) — this session's retrieval +
    # quality-classifier additions
    "bm25_topk_docs",
    "nb_lang_classifier",
    # newly diamond-pinned corpus stats + the rule-filter pass
    "tfidf_top_terms",
    "gopher_quality_filters",
    # tokenizer family: the round-0 pair statistics (the per-iteration unit
    # of BPE training; full trainer timings live in SCALE.md)
    "bpe_pair_stats",
    # round-3 additions: the IVF-routed hybrid (r2's one perf_weak — track
    # the fix), the inverted-index APSS sparse-cosine join, and the
    # stride-1 exact substring dedup (the heaviest new corpus shape)
    "hybrid_rrf_search",
    "tfidf_cosine_pairs",
    "substring_dedup_corpus",
    # the composed five-stage prep pipeline (gate -> substring dedup ->
    # LM score -> tercile gate -> split) — the end-to-end flagship
    "training_data_prep_pipeline_v2",
    # the two fixed-iteration trained models: PCA (one-pass d^2-moment
    # aggregation + driver power method) and logistic regression (per-step
    # score + gradient aggregations with broadcast literal weights)
    "embedding_pca_project",
    "logreg_quality_classifier",
    # round-4 additions — graph analytics (wedge-join triangles, 3-iteration
    # PageRank), the text-statistics family's two heaviest shapes (PMI pair
    # fan-out, CDC chunk-dedup window), the zero-shuffle minimizer
    # projection, the banded EWMA history join, MMR greedy retrieval, the
    # unigram tokenizer's seed-statistics pass, and normalized exact dedup
    "graph_triangle_count",
    "pagerank_copurchase",
    "pmi_cooccurrence_pairs",
    "cdc_chunk_dedup",
    "minimizer_fingerprints",
    "bloom_decontaminate",
    "ewma_anomaly_events",
    "mmr_diversified_topk",
    "unigram_seed_piece_stats",
    "normalize_dedup_docs",
    # late round-4 additions — the two new iterative graph shapes (staged
    # per-round frames), the full entity-resolution pipeline (blocked fuzzy
    # match -> components -> per-row map-back), and the survival life-table
    "graph_connected_components",
    "hits_hub_authority",
    "entity_resolution_parts",
    "kaplan_meier_click_to_purchase",
    # round-6 additions — the convergent-CC contraction loop (the new
    # iterative shape), the capped minhash production path, the
    # containment inverted-index self-join, the fixed-merge BPE encode
    # (chained folds + broadcast dictionary join), and Kneser-Ney scoring
    # (four broadcastable model joins)
    "cc_large_star_small_star",
    "minhash_pairs_capped",
    "doc_containment_pairs",
    "tokenizer_apply_bpe",
    "ngram_lm_kneser_ney",
    # round-7 additions — the storm-guarded five-stage flagship (exact dedup
    # -> capped minhash clustering -> substring dedup -> Gopher gate ->
    # leakage-safe split) and the fixed-vocab unigram Viterbi encode
    "training_data_prep_pipeline_v3",
    "tokenizer_apply_unigram",
    # round-8 addition — metadata-FILTERED ANN over the shared IVF layout
    # (composed PartitionFilters + PushedFilters, selectivity-widened probe)
    "ann_ivf_filtered_topk",
]

#: dialect tier (r8 verdict item 8): the verbatim ClickHouse-SQL surfaces
#: are sub-1.5 s micro-queries — real coverage, but folding ~7 of them per
#: round into the headline total would swamp the cross-round comparison
#: with registration growth. They time exactly like headline queries
#: (cold cache, best-of-N, noop sink) and report under the separate
#: "dialect" key; the headline keeps the >=1 s operator shapes. The PII
#: scrub rides here too — also a sub-second projection pass, and its
#: scale curve is already tracked as corpus_scale's map-only control.
DIALECT_TIER = [
    # ASOF JOIN verbatim (union-tag + one keyed window, single shuffle);
    # windowFunnel verbatim (array_sort + aggregate() fold)
    "asof_join_verbatim_sql",
    "windowfunnel_verbatim_sql",
    # ARRAY JOIN unnest (posexplode fan-out), WITH FILL gap-fill (lead +
    # per-gap sequence explode), dictGet broadcast-lookup join
    "array_join_verbatim_sql",
    "with_fill_verbatim_sql",
    "dictionary_verbatim_sql",
    # sequenceMatch with (?t<=N) / (?t==N) / band gaps (r9: completion-time
    # set DP) — the newest dialect state machine, tracked from day one
    "sequencematch_time_verbatim_sql",
    # expression-only PII detect/redact (regex + Luhn fold, zero Exchange)
    "pii_detect_redact",
]


def _sf_from_dir(d: str) -> float:
    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else -1.0


# ---------------------------------------------------------------------------
# Load sentinel (r9 verdict item 2). The r9 driver artifact was taken on a
# loaded machine: every headline query — including untouched pure-SQL
# shapes — came out uniformly 1.3-2.8x slower than the idle run of the
# identical code, which is uninterpretable without cross-referencing git.
# The fix is measured, not asserted. A Spark probe job was tried first and
# rejected by measurement: on local[32] a concurrent full-width Spark job
# only inflates a probe's wall ~1.3x (median 0.50 s vs 0.37 s idle,
# overlapping single-shot ranges) — too weak to classify. What separates
# cleanly is MACHINE BUSY CORES read from /proc/stat while this process
# sleeps: idle floor 0.0-0.02 cores; a single concurrent sf0.01 query
# sweep shows 1.6-5.4 cores over 1-second samples (measured r10, this
# machine). The sentinel samples busy cores over a 3 s window (long
# enough to average over a concurrent job's inter-query gaps) before and
# after each query tier; any bracket over the envelope triggers ONE
# re-sweep of the headline+dialect tiers (per-query best across both
# passes — "best-of-2-under-load"), and the artifact is stamped
# loaded=true only if EVERY sample exceeded the envelope (load persisted
# through every pass, so even the best-of timings are suspect).
# ---------------------------------------------------------------------------

#: idle envelope, busy cores. Calibrated r10 on the target machine
#: (local[32]): idle 0.0-0.02, lightest real interference >=1.6 — 1.0
#: sits between with >=50x margin to the floor. Override per-machine with
#: BENCH_SENTINEL_ENVELOPE_CORES.
SENTINEL_ENVELOPE_CORES = float(
    os.environ.get("BENCH_SENTINEL_ENVELOPE_CORES", "1.0")
)


def _run_sentinel(sample_s: float = 3.0) -> float:
    """Busy CPU cores machine-wide over a ``sample_s`` sleep window
    (/proc/stat busy-jiffies delta x core count). Our own JVM is between
    jobs while we sleep, so its contribution is daemon-thread noise
    (<0.1 core); anything above the envelope is concurrent work. Returns
    -1.0 where /proc/stat is unreadable (non-Linux) — recorded as
    'unknown', never counted as load."""

    def read():
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
        return sum(vals), idle

    try:
        t0, i0 = read()
        time.sleep(sample_s)
        t1, i1 = read()
    except OSError:
        return -1.0
    dt, di = t1 - t0, i1 - i0
    if dt <= 0:
        return -1.0
    return round((1.0 - di / dt) * (os.cpu_count() or 1), 2)


#: idle envelope for the CPU micro-probe, wall seconds. Calibrated r11 on
#: the target machine: idle best-of-3 0.21-0.24 s over repeated runs; 0.30
#: flags a ~1.3x+ single-core slowdown. Override per-machine with
#: BENCH_CPU_PROBE_ENVELOPE_S.
CPU_PROBE_ENVELOPE_S = float(
    os.environ.get("BENCH_CPU_PROBE_ENVELOPE_S", "0.30")
)


def _run_cpu_probe(iters: int = 2_000_000, runs: int = 3) -> float:
    """Best-of-N wall seconds for a FIXED single-core pure-Python
    arithmetic loop — no Spark, no allocation, no I/O (r10 verdict item
    4). The busy-cores sentinel sees concurrent WORK but is blind to
    throughput-degrading machine STATE (frequency scaling, cache/thermal
    pressure): r10 recorded 84.3 s vs 65.2 s on identical idle code, both
    sentinel-clean. This probe's wall time tracks exactly that state — a
    slow probe with idle busy-cores is broad-spectrum inflation and
    triggers the same best-of-both re-sweep."""
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        x = 0
        for i in range(iters):
            x = (x * 31 + i) & 0xFFFFFFFF
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def sentinel_policy(
    samples: list[float],
    envelope_cores: float,
    probe_samples: list[float] | None = None,
    probe_envelope_s: float | None = None,
) -> dict:
    """Pure policy: given busy-core samples, CPU-probe samples, and their
    idle envelopes, decide (a) whether the query tiers need one re-sweep
    and (b) whether the artifact must be stamped loaded. Re-sweep as soon
    as ANY bracket saw load on EITHER sensor; stamp loaded only if every
    valid sample of some sensor saw load (a single clean bracket means at
    least one pass ran clean, and per-query best-of keeps that pass's
    timings). Negative samples = sensor unavailable: never counted."""
    valid = [s for s in samples if s >= 0]
    over = [s > envelope_cores for s in valid]
    probe_samples = list(probe_samples or [])
    pvalid = [p for p in probe_samples if p >= 0]
    pover = (
        [p > probe_envelope_s for p in pvalid]
        if probe_envelope_s is not None
        else []
    )
    return {
        "envelope_cores": envelope_cores,
        "samples_busy_cores": list(samples),
        "probe_envelope_s": probe_envelope_s,
        "samples_probe_s": probe_samples,
        "resweep": any(over) or any(pover),
        "loaded": (bool(over) and all(over)) or (bool(pover) and all(pover)),
    }


#: corpus-family ops measured at 1x AND a synthesized 10x corpus each round
#: (VERDICT r2 item 5): tracks the dedup-verification scaling curve in
#: BENCH_r{N} instead of one-off in SCALE.md. Reported under the separate
#: "corpus_scale" key so the headline total stays comparable across rounds.
_SCALE_REPLICAS = int(os.environ.get("BENCH_SCALE_REPLICAS", "10"))


def _corpus_scale_ops():
    from pyspark.sql import functions as F

    from binance_etl_clickhouse_spark.operators import corpus as corpus_ops
    from binance_etl_clickhouse_spark.operators import neardup
    from binance_etl_clickhouse_spark.operators.text import simhash_wide
    from binance_etl_clickhouse_spark.queries.dataset import prep_pipeline_v3_frame

    return {
        # the FLAGSHIP under the storm: exact dedup collapses the 5 exact
        # replicas, capped minhash + clustering canonicalize the near-dup
        # variants — the composition's scale curve, not just each stage's
        # (the synth frame carries no lang; a literal stands in)
        "training_data_prep_pipeline_v3": lambda df: prep_pipeline_v3_frame(
            df.withColumn("lang", F.lit("xx"))
        ),
        # caps ENGAGED: the scale curve must reflect the production path —
        # band_cap bounds verify work under the synthesized duplicate storm
        "minhash_lsh_neardup": lambda df: neardup.minhash_lsh_pairs(
            df, threshold=0.5, band_cap=64
        ),
        "simhash_neardup_pairs": lambda df: neardup.simhash_banded_pairs(
            simhash_wide(df), n_bands=4, sig_bits=60, max_hamming=3
        ),
        "span_dedup_corpus": lambda df: corpus_ops.span_dedup(df),
        "substring_dedup_corpus": lambda df: corpus_ops.substring_dedup(df),
        # map-only control: the PII scrub has no shuffle at all, so its
        # curve should track the replica factor ~1:1 — a measured floor
        # that separates scan-bound cost growth from shuffle amplification
        # in the shapes above
        "pii_scrub": lambda df: _pii_scrub_frame(df),
    }


def _pii_scrub_frame(df):
    from pyspark.sql import functions as F

    from binance_etl_clickhouse_spark.operators.pii import pii_scrub

    out = pii_scrub(df, "text")
    return out.select(
        F.sum("n_email").alias("e"),
        F.sum("n_credit_card").alias("c"),
        F.sum(F.length("text_redacted")).alias("red_chars"),
    )


def _bench_corpus_scale(spark) -> dict:
    import tempfile

    from binance_etl_clickhouse_spark.tables import load_table
    from binance_etl_clickhouse_spark.testing.corpusscale import (
        synth_replicated_corpus,
    )

    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    scratch = os.path.join(
        tempfile.gettempdir(), f"spark_graft_bench_corpus_{os.getpid()}"
    )
    big = synth_replicated_corpus(base, scratch, replicas=_SCALE_REPLICAS)
    ops = _corpus_scale_ops()
    out: dict[str, dict[str, float]] = {"1x": {}, f"{_SCALE_REPLICAS}x": {}}
    # warmup pass first (JIT / codegen / Arrow init), then best-of-N per
    # measurement: the 1x times are ~1 s, so single-shot run-to-run noise
    # swings the reported scale factor by 1.5x+ (r5 verdict) — the MIN of
    # N runs is the stable statistic on an otherwise-idle machine
    for tag, df in (("warmup", base), ("1x", base), (f"{_SCALE_REPLICAS}x", big)):
        for name, op in ops.items():
            best = float("inf")
            for _ in range(1 if tag == "warmup" else N_RUNS):
                spark.catalog.clearCache()  # cold-cache per run, like HEADLINE
                clear_rdd_blocks(spark)
                t0 = time.perf_counter()
                op(df).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            if tag != "warmup":
                out[tag][name] = round(best, 4)
    # band_cap recall trade, measured not assumed (r6 verdict item 3): at
    # the 10x storm, how many true >=0.5-Jaccard pairs does cap=64 lose?
    # Capped candidates are a subset of uncapped ones (same verify filter),
    # so the loss is a pair-count difference; evictions come from the wired
    # Observation on the same run.
    from pyspark.sql import Observation

    from binance_etl_clickhouse_spark.operators import neardup

    obs = Observation()
    capped_n = neardup.minhash_lsh_pairs(
        big, threshold=0.5, band_cap=64, overflow=obs
    ).count()
    # band_cap=None EXPLICITLY: the baseline must stay uncapped now that the
    # operator's default is 64, or this becomes a cap-vs-cap comparison that
    # can never detect recall loss
    uncapped_n = neardup.minhash_lsh_pairs(big, threshold=0.5, band_cap=None).count()
    band_cap_recall = {
        "band_cap": 64,
        "uncapped_pairs": int(uncapped_n),
        "capped_pairs": int(capped_n),
        "lost_pair_frac": round((uncapped_n - capped_n) / max(uncapped_n, 1), 6),
        **{k: int(v) for k, v in obs.get.items()},
    }

    # DEEPER storm tier (r7 verdict item 7): the production claim "band_cap
    # eviction decorrelates across bands" was measured lossless at the 10x
    # storm; rehearse the two cap-sensitive shapes at 30x (~3x deeper bucket
    # overflow) so the default cites the deepest measured point. Only the
    # flagship + capped minhash run here — the full op set's curve is the
    # 10x block above, kept unchanged for cross-round comparability.
    deep_out: dict = {}
    deep = int(os.environ.get("BENCH_SCALE_DEEP", "30"))
    if deep > _SCALE_REPLICAS:
        deep_scratch = scratch + "_deep"
        deep_df = synth_replicated_corpus(base, deep_scratch, replicas=deep)
        deep_tag = f"{deep}x"
        times: dict[str, float] = {}
        for name in ("training_data_prep_pipeline_v3", "minhash_lsh_neardup"):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            ops[name](deep_df).write.format("noop").mode("overwrite").save()
            times[name] = round(time.perf_counter() - t0, 4)
        d_uncapped = neardup.minhash_lsh_pairs(
            deep_df, threshold=0.5, band_cap=None
        ).count()
        # cap sweep (r8 verdict item 4): the recall/wall frontier at the
        # deepest measured storm — the data behind
        # neardup.recommended_band_cap's widening thresholds
        cap_sweep: dict[str, dict] = {}
        for cap in (64, 128, 256):
            o = Observation()
            t0 = time.perf_counter()
            n_pairs = neardup.minhash_lsh_pairs(
                deep_df, threshold=0.5, band_cap=cap, overflow=o
            ).count()
            cap_sweep[str(cap)] = {
                "pairs": int(n_pairs),
                "lost_pair_frac": round(
                    (d_uncapped - n_pairs) / max(d_uncapped, 1), 6
                ),
                "wall_s": round(time.perf_counter() - t0, 2),
                **{k: int(v) for k, v in o.get.items()},
            }
        deep_out = {
            "replicas": deep,
            deep_tag: times,
            "scale_factor_vs_1x": {
                n: round(times[n] / max(out["1x"][n], 1e-3), 2) for n in times
            },
            "band_cap_recall": {
                "band_cap": 64,
                "uncapped_pairs": int(d_uncapped),
                "capped_pairs": cap_sweep["64"]["pairs"],
                "lost_pair_frac": cap_sweep["64"]["lost_pair_frac"],
                **{
                    k: cap_sweep["64"][k]
                    for k in ("overflow_rows", "overflow_buckets", "max_bucket")
                    if k in cap_sweep["64"]
                },
            },
            "cap_sweep": cap_sweep,
        }
        import shutil as _sh

        _sh.rmtree(deep_scratch, ignore_errors=True)

    import shutil

    shutil.rmtree(scratch, ignore_errors=True)
    big_tag = f"{_SCALE_REPLICAS}x"
    return {
        "replicas": _SCALE_REPLICAS,
        "1x": out["1x"],
        big_tag: out[big_tag],
        "scale_factor": {
            n: round(out[big_tag][n] / max(out["1x"][n], 1e-3), 2) for n in ops
        },
        "band_cap_recall": band_cap_recall,
        **({"deep_storm": deep_out} if deep_out else {}),
    }


#: sf1-shape replication factor for the storage (skip-index) tier
_STORAGE_REPLICAS = int(os.environ.get("BENCH_STORAGE_REPLICAS", "10"))


def _bench_storage(spark) -> dict:
    """Skip-index pruning, measured not asserted (r9 verdict item 7): at
    an sf1-shape table (events x replicas, range-written so files are
    time-sliced; documents x replicas, doc-sliced), report files-pruned /
    files-total and the pruned-vs-full scan wall for (a) a minmax
    zone-map on timestamp and (b) a token-bloom on the text column. The
    local wall ratio UNDERSTATES the value at 100 TB (parquet row-group
    stats already cheapen the local full scan; on object storage every
    skipped file is a skipped request), so the files ratio is the
    headline number."""
    import shutil
    import tempfile

    import pandas as pd
    from pyspark.sql import functions as F

    from binance_etl_clickhouse_spark.storage import tokenbloom, zonemap
    from binance_etl_clickhouse_spark.tables import load_table

    scratch = os.path.join(
        tempfile.gettempdir(), f"spark_graft_bench_storage_{os.getpid()}"
    )
    out: dict = {"replicas": _STORAGE_REPLICAS}

    def _timed(fn):
        spark.catalog.clearCache()
        clear_rdd_blocks(spark)
        t0 = time.perf_counter()
        fn()
        return round(time.perf_counter() - t0, 4)

    # -- minmax zone map on events.ts ------------------------------------
    ev_path = os.path.join(scratch, "events_sliced")
    ev = load_table(spark, SF_DIR, "events").select("ts", "user_id", "value")
    reps = [ev]
    for i in range(1, _STORAGE_REPLICAS):
        reps.append(ev.withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i * 91} DAYS")))
    big_ev = reps[0]
    for r in reps[1:]:
        big_ev = big_ev.unionByName(r)
    n_files = 8 * _STORAGE_REPLICAS
    big_ev.repartitionByRange(n_files, "ts").write.mode("overwrite").parquet(ev_path)
    zm = zonemap.build_zonemap(ev_path, ["ts"])
    lo, hi = "2024-02-01 00:00:00", "2024-02-03 00:00:00"
    kept = zonemap.prune_files(
        zm, ev_path, {"ts": ("between", pd.Timestamp(lo), pd.Timestamp(hi))}
    )
    total = len(zonemap.data_files(ev_path))
    pred = (F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi))

    def _scan(paths):
        df = spark.read.parquet(*paths) if paths else spark.read.parquet(ev_path)
        df.filter(pred).agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
        ).write.format("noop").mode("overwrite").save()

    wall_full = min(_timed(lambda: _scan(None)) for _ in range(N_RUNS))
    wall_pruned = min(_timed(lambda: _scan(kept)) for _ in range(N_RUNS))
    out["minmax"] = {
        "files_total": total,
        "files_kept": len(kept) if kept is not None else total,
        "pruned_frac": round(1 - (len(kept) if kept is not None else total) / total, 4),
        "wall_full_s": wall_full,
        "wall_pruned_s": wall_pruned,
    }

    # -- token bloom on documents.text -----------------------------------
    # Two layouts, because a skip index's value IS a layout property (CH's
    # own docs say the same: skip indexes need ORDER BY locality):
    #  * scattered — docs written in doc_id order; the probe token appears
    #    in ~every file, so the bloom correctly keeps everything (the
    #    fail-safe floor, and the probe's overhead is the measured cost);
    #  * clustered — docs range-written with token-presence as the leading
    #    sort key (the locality a production ORDER BY / materialized
    #    clustering gives); the same probe now prunes most files.
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    # probe token: the globally LEAST-frequent token (ties broken
    # lexicographically — deterministic per dataset)
    rare = (
        docs.select(F.explode(tokenbloom.tokens("text")).alias("t"), "doc_id")
        .groupBy("t")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.length("t") >= 3)
        .orderBy(F.col("df").asc(), F.col("t").asc())
        .limit(1)
        .collect()[0]
        .t
    )
    dreps = [docs]
    for i in range(1, _STORAGE_REPLICAS):
        dreps.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        )
    big_docs = dreps[0]
    for r in dreps[1:]:
        big_docs = big_docs.unionByName(r)
    d_files = 4 * _STORAGE_REPLICAS

    def _doc_scan(path: str, pruned: bool):
        if pruned:
            df = tokenbloom.read_containing(spark, path, rare, "text")
        else:
            df = spark.read.parquet(path).filter(
                F.array_contains(tokenbloom.tokens("text"), rare)
            )
        df.agg(F.count(F.lit(1)).alias("n")).write.format("noop").mode(
            "overwrite"
        ).save()

    out["token_bloom"] = {"probe_token": rare}
    has_tok = F.array_contains(tokenbloom.tokens("text"), rare).cast("int")
    for layout, frame in (
        ("scattered", big_docs.repartitionByRange(d_files, "doc_id")),
        (
            "clustered",
            big_docs.withColumn("__tk", has_tok).repartitionByRange(
                d_files, "__tk", "doc_id"
            ).drop("__tk"),
        ),
    ):
        path = os.path.join(scratch, f"docs_{layout}")
        frame.write.mode("overwrite").parquet(path)
        tokenbloom.build_token_bloom(spark, path, "text")
        idx = tokenbloom.read_token_bloom(path)
        dkept = tokenbloom.prune_files_with_token(idx, path, rare)
        dtotal = len(zonemap.data_files(path))
        n_kept = len(dkept) if dkept is not None else dtotal
        out["token_bloom"][layout] = {
            "files_total": dtotal,
            "files_kept": n_kept,
            "pruned_frac": round(1 - n_kept / dtotal, 4),
            "wall_full_s": min(
                _timed(lambda: _doc_scan(path, False)) for _ in range(N_RUNS)
            ),
            "wall_pruned_s": min(
                _timed(lambda: _doc_scan(path, True)) for _ in range(N_RUNS)
            ),
        }
    shutil.rmtree(scratch, ignore_errors=True)
    return out


def main() -> None:
    # shuffle partitions sized to the bench scale, not the core count: at
    # sf<=1 the inputs are tens of MB, so 8 initial partitions (AQE coalesces
    # further) beat one-per-core by ~7% in scheduling overhead. At real scale
    # this knob derives from input_bytes / 128MB instead.
    spark = get_spark(app_name="bench", shuffle_partitions=8)
    # warmup: JVM / codegen / filesystem cache
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()

    def _sweep(names: list[str]) -> dict[str, float]:
        out: dict[str, float] = {}
        for name in names:
            entry = QUERIES[name]
            runs = N_RUNS_ITERATIVE if name in ITERATIVE_FAMILIES else N_RUNS
            best = float("inf")
            for _ in range(runs):
                # cold-cache per run (r6+ measurement series, see SCALE.md):
                # the registry builders are unwrapped, so the sweep harness
                # owns the cache hygiene — every run pays its own persist()
                # cost, and stale CacheManager entries can't NPE the
                # 50-query session. r12: ALSO drop orphaned RDD-layer
                # blocks (localCheckpoint leftovers clearCache can't see) —
                # they are never reused across runs, only hold memory.
                spark.catalog.clearCache()
                clear_rdd_blocks(spark)
                t0 = time.perf_counter()
                entry.spark(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            out[name] = round(best, 4)
        return out

    # sentinel bracket around the query tiers (r9 verdict item 2; CPU
    # micro-probe alongside busy-cores since r11 — r10 verdict item 4)
    sentinel_samples = [_run_sentinel()]
    probe_samples = [_run_cpu_probe()]
    timings = _sweep(HEADLINE)
    dialect_timings = _sweep(DIALECT_TIER)
    sentinel_samples.append(_run_sentinel())
    probe_samples.append(_run_cpu_probe())
    if sentinel_policy(
        sentinel_samples,
        SENTINEL_ENVELOPE_CORES,
        probe_samples,
        CPU_PROBE_ENVELOPE_S,
    )["resweep"]:
        # a bracket saw load: one full re-sweep, per-query best of the two
        re_timings = _sweep(HEADLINE)
        re_dialect = _sweep(DIALECT_TIER)
        timings = {k: min(timings[k], re_timings[k]) for k in timings}
        dialect_timings = {
            k: min(dialect_timings[k], re_dialect[k]) for k in dialect_timings
        }
        sentinel_samples.append(_run_sentinel())
        probe_samples.append(_run_cpu_probe())
    # the corpus-scale and storage tiers are bracketed too (one sample
    # after each); their timings are single-tier so they get the loaded
    # stamp, not a re-sweep
    corpus_scale = _bench_corpus_scale(spark)
    storage = _bench_storage(spark)
    sentinel_samples.append(_run_sentinel())
    probe_samples.append(_run_cpu_probe())
    sentinel = sentinel_policy(
        sentinel_samples,
        SENTINEL_ENVELOPE_CORES,
        probe_samples,
        CPU_PROBE_ENVELOPE_S,
    )

    total = round(sum(timings.values()), 4)
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
        "loaded": sentinel["loaded"],
        "sentinel": sentinel,
        "dialect": {
            "total": round(sum(dialect_timings.values()), 4),
            "queries": dialect_timings,
        },
        "corpus_scale": corpus_scale,
        "storage": storage,
    }
    line = json.dumps(payload)
    # The driver captures only the tail of stdout, which has truncated the
    # head of this line in past rounds — persist the artifact atomically so
    # every round's bench is machine-parseable regardless of capture limits.
    out_path = Path(
        os.environ.get("BENCH_OUT", os.path.join(_REPO_ROOT, "bench_out.json"))
    )
    tmp = out_path.with_suffix(".json.tmp")
    tmp.write_text(line + "\n")
    os.replace(tmp, out_path)
    print(line)
    # The full payload (54 queries + corpus_scale) exceeds the driver's
    # 2000-char tail capture, so BENCH_r07 recorded `parsed: null`. End with
    # a compact, self-contained summary line (<600 chars) that carries the
    # required metric/value/unit/queries/sf keys — queries limited to the
    # five slowest — plus n and a pointer to the complete artifact. The
    # driver parses the LAST line; this one always fits.
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    compact = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": slowest,
        "sf": payload["sf"],
        "n": len(timings),
        "loaded": sentinel["loaded"],
        "full": str(out_path),
    }
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
