"""Corpus-level statistics operators: TF-IDF, unigram-LM quality scoring,
and target-mixture sampling.

These are the corpus-wide passes of a training-data pipeline (the per-row
passes live in ``operators/text.py``): each one aggregates a statistic over
the WHOLE corpus (document frequency, unigram counts, per-source counts) and
then joins it back against the documents. The reference delegates every
analytical pass of this kind to its warehouse (ClickHouse); here each is a
first-class DataFrame plan.

Scale shape (the part that matters at 100 TB):

- the corpus-statistic side of each join is vocabulary- or source-sized,
  orders of magnitude smaller than the corpus — term stats are an ordinary
  equi-join (AQE broadcasts them when they fit), per-source rates are an
  explicit ``F.broadcast``;
- everything aggregates with map-side partial aggregation (groupBy on
  (doc, term) / term / source), no windows over unpartitioned data;
- the only driver-side values are single scalars (corpus size, token
  total) obtained from one count()/first() job each — never a per-row
  collect.

Cross-engine determinism: token counts and frequencies are exact integers;
log/division results are rounded at 6 dp before any ordering or output so
libm last-ulp drift between the JVM and DuckDB cannot reorder rows (same
policy as the rest of the repo; ties then break on the term/id string).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from binance_etl_clickhouse_spark.operators.parallel import ensure_min_parallelism
from binance_etl_clickhouse_spark.operators.texthash import hash60, tokens


def _pin_counts(df: DataFrame, persist: bool) -> DataFrame:
    """Persist a compact derived frame that a train/score or stats/score
    diamond consumes from BOTH branches.

    Such diamonds defeat exchange reuse the same way neardup's self-joins
    do (`operators/neardup._pin`): one branch ends in a broadcast of the
    tiny model/stats frame, the other in a hash join — the exchanges never
    canonicalize equal, so without pinning the corpus-wide tokenize+explode
    +aggregate runs once per consumer (3x in the NB classifier; measured
    8.3s -> 1.4s at 50k docs when pinned). Pinned frames are orders of
    magnitude narrower than the text they summarize (hashed bucket counts,
    query-term postings); MEMORY_AND_DISK spills instead of recomputing.
    """
    return df.persist(StorageLevel.MEMORY_AND_DISK) if persist else df

#: 2^60 as a float divisor: hash60(x) / HASH60_SPAN is a deterministic
#: uniform in [0, 1) identical in Spark and DuckDB (single IEEE division)
HASH60_SPAN = float(1 << 60)


def term_frequencies(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, term, tf): occurrence count of each term within each document.

    One explode + one groupBy on the composite (doc, term) key — partial
    aggregation collapses repeats map-side, so the shuffle carries distinct
    doc-term rows, not raw token occurrences.
    """
    tok = ensure_min_parallelism(df).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    )
    return tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))


def tfidf_top_terms(
    df: DataFrame,
    n_docs: int,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    persist: bool = True,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    score = tf * (ln((N+1)/(df+1)) + 1)  (smoothed idf, sklearn-style).

    ``n_docs`` is the corpus size, passed in as a scalar (one metadata-cheap
    count job; at scale, parquet footer statistics). The document-frequency
    side of the join is vocabulary-sized — AQE broadcasts it when it fits.
    The per-doc top-k is a row_number window ordered by the ROUNDED score
    (then term), so the ordering is identical in both engines, and Spark
    plans it as a WindowGroupLimit pushdown, never a full per-doc sort spill.
    """
    # tf feeds both the document-frequency aggregate and the scoring join —
    # the same reuse-defeating diamond as the classifiers (see _pin_counts)
    tf = _pin_counts(term_frequencies(df, id_col, text_col), persist)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_count"))
    idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df_count") + F.lit(1.0))) + F.lit(1.0)
    scored = tf.join(dfreq, "term").select(
        F.col(id_col),
        F.col("term"),
        F.col("tf"),
        F.round(F.col("tf") * idf, 6).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(id_col, "term", "tf", "tfidf", "rnk")
    )


def unigram_logprob(
    df: DataFrame,
    total_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    persist: bool = True,
) -> DataFrame:
    """Per-document mean unigram log-probability — the CCNet-style
    language-model quality proxy (docs of common words score high; rare-token
    soup scores low), with a corpus-unigram model in place of KenLM.

    avg_logp(d) = sum_t tf(d,t) * ln(cnt(t) / total) / n_tokens(d)

    Weighted by the per-doc term frequency so the join input is distinct
    doc-term rows (not raw occurrences); ``total_tokens`` is the one scalar
    (single agg job). Output rounded at 6 dp (summation-order ULPs).
    """
    tf = _pin_counts(term_frequencies(df, id_col, text_col), persist)
    cnt = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    logp = F.log(F.col("cnt").cast("double") / F.lit(float(total_tokens)))
    return (
        tf.join(cnt, "term")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.round(F.sum(F.col("tf") * logp) / F.sum("tf"), 6).alias("avg_logp"),
        )
    )


def doc_spans(
    df: DataFrame, k: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, pos, span): non-overlapping ``k``-token spans of each document.

    The span unit for corpus-level span dedup (the line/paragraph analog for
    a corpus without line structure — C4 dedups three-sentence spans the same
    way). Pure per-row projection: sequence + slice + posexplode, no UDF; the
    only shuffle is whatever the consumer does with the spans. The final span
    of a document may be shorter than ``k``.
    """
    w = tokens(text_col)
    n_spans = F.ceil(F.size(w) / F.lit(float(k))).cast("int")
    span_list = F.transform(
        F.sequence(F.lit(0), n_spans - F.lit(1)),
        lambda p: F.concat_ws(" ", F.slice(w, p * k + 1, k)),
    )
    return ensure_min_parallelism(df).select(
        F.col(id_col), F.posexplode(span_list).alias("pos", "span")
    )


def span_dedup(
    df: DataFrame, k: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-level span dedup with first-occurrence retention and document
    reassembly — the C4-style "remove any duplicated span, keep one copy"
    pass, over ``k``-token spans.

    A span occurrence survives iff it is the globally FIRST occurrence of
    that exact span text, ordered by (doc id, position) — a total order, so
    the kept set is deterministic across engines and cluster sizes (and
    within-document repeats dedup too). Survivors are stitched back into
    ``text_deduped`` in position order; documents whose every span was seen
    earlier come back with empty text rather than vanishing, so downstream
    length filters see them.

    Scale shape (guide §2.3 / §8 — decide with small rows, never move the
    payload): the first-occurrence pass shuffles (id, pos, xxhash64(span))
    — 20-odd bytes per span instead of the span TEXT (the hash only
    decides span EQUALITY; it never reaches the output, so any
    collision-free hash gives the identical result, ~n_spans^2/2^64
    expected colliding pairs). Reassembly then groups the surviving
    (id, pos) pairs — ints, not strings — and the kept span text is
    re-sliced from the document's own token array after the join-back,
    so span bytes cross the network exactly zero times. Two shuffles
    total, both narrow, high-cardinality keys, no self-join.
    """
    w = tokens(text_col)
    n_spans = F.ceil(F.size(w) / F.lit(float(k))).cast("int")
    span_hashes = F.transform(
        F.sequence(F.lit(0), n_spans - F.lit(1)),
        lambda p: F.xxhash64(F.concat_ws(" ", F.slice(w, p * k + 1, k))),
    )
    spans = ensure_min_parallelism(df).select(
        F.col(id_col), F.posexplode(span_hashes).alias("pos", "h")
    )
    first = Window.partitionBy("h").orderBy(id_col, "pos")
    kept = (
        spans.withColumn("rn", F.row_number().over(first))
        .filter(F.col("rn") == 1)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans_kept"),
            F.array_sort(F.collect_list("pos")).alias("ps"),
        )
    )
    rebuilt = F.array_join(
        F.transform("ps", lambda p: F.concat_ws(" ", F.slice(w, p * k + 1, k))),
        " ",
    )
    return df.join(kept, id_col, "left").select(
        F.col(id_col),
        F.ceil(F.size(w) / F.lit(float(k))).cast("long").alias("n_spans_total"),
        F.coalesce(F.col("n_spans_kept"), F.lit(0).cast("long")).alias("n_spans_kept"),
        F.when(F.col("ps").isNotNull(), rebuilt).otherwise(F.lit("")).alias(
            "text_deduped"
        ),
    )


def source_mixture_rates(
    df: DataFrame, target: dict[str, float], source_col: str = "source"
) -> DataFrame:
    """(source, n_docs, keep_rate): per-source acceptance rates that hit a
    target mixture exactly, keeping 100% of the binding (scarcest) source.

    With per-source counts n_s and target weights w_s, the largest corpus
    consistent with the mixture keeps ``scale = min_s(n_s / w_s)`` total
    docs; source s keeps ``w_s * scale / n_s`` of its rows (1.0 for the
    binding source). Sources absent from the target get rate 0. All on a
    source-cardinality frame — two tiny aggregations, no window.
    """
    w_expr = F.lit(0.0)
    for src, wt in target.items():
        w_expr = F.when(F.col(source_col) == src, F.lit(float(wt))).otherwise(w_expr)
    counts = (
        df.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("w", w_expr)
    )
    scale = counts.filter(F.col("w") > 0).agg(
        F.min(F.col("n_docs") / F.col("w")).alias("scale")
    )
    return counts.crossJoin(F.broadcast(scale)).select(
        source_col,
        F.col("n_docs"),
        F.round(
            F.when(F.col("w") > 0, F.col("w") * F.col("scale") / F.col("n_docs")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("keep_rate"),
    )


def source_mixture_sample(
    df: DataFrame,
    target: dict[str, float],
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Deterministic mixture sample: keep doc d of source s iff
    u(d) < keep_rate(s), with u(d) = hash60('mix:' || d) / 2^60.

    The rates frame is source-cardinality and explicitly broadcast, so the
    corpus side never shuffles — the sample is a single filtered scan. The
    md5-based u() reproduces bit-identically in any engine, so the selected
    row SET (not just its size) is stable across runs, engines, and
    cluster sizes — resumable sampling for free.
    """
    rates = source_mixture_rates(df, target, source_col)
    u = hash60(F.concat(F.lit("mix:"), F.col(id_col).cast("string"))) / F.lit(HASH60_SPAN)
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(u < F.col("keep_rate"))
        .select(F.col(id_col), F.col(source_col), F.col("keep_rate"))
    )


#: hashed feature space for importance-resampling scores — small enough that
#: the per-bucket log-ratio table broadcasts (a few KB), large enough that
#: unigram+bigram collisions stay rare at corpus scale
DSIR_BUCKETS = 1024


def hashed_feature_counts(
    df: DataFrame,
    n_buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *carry, bucket, cnt): per-document hashed unigram+bigram
    occurrence counts — the DSIR feature extractor (Xie et al. 2023,
    "Data Selection with Importance Resampling": hashed n-gram bag-of-words).

    bucket(f) = hash60(f) % n_buckets, identical in Spark and DuckDB, so the
    oracle recomputes the exact same feature space. One explode + one
    groupBy on (doc, bucket) — partial aggregation collapses the ~2n token
    occurrences to at most ``n_buckets`` rows per document map-side.
    """
    w = tokens(text_col)
    bigrams = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = ensure_min_parallelism(df).select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.explode(F.concat(w, bigrams)).alias("feat"),
    )
    return (
        feats.withColumn("bucket", (hash60("feat") % n_buckets).cast("long"))
        .groupBy(id_col, *carry_cols, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def dsir_scores(
    df: DataFrame,
    target_col: str,
    target_value: str,
    n_buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
    persist: bool = True,
) -> DataFrame:
    """(id, n_feats, dsir_score, keep): importance-resampling selection score
    per document — DSIR's log importance weight under hashed-n-gram
    bag-of-words models of a target slice vs the raw corpus.

    With Laplace-smoothed bucket models p_t (docs where target_col ==
    target_value) and p_r (all docs):

        score(d) = (1/|d|) * sum_b cnt(d,b) * ln(p_t(b) / p_r(b))

    ``keep`` = score > 0: the doc looks more like the target slice than the
    corpus average (DSIR then resamples by this weight; a deterministic
    positive-score filter is the scale-free analogue — no global sort or
    quantile pass, selection is a per-row predicate).

    Scale shape: the bucket-model frame is ``n_buckets`` rows (two tiny
    aggregations + a cross join against its own 1-row total), explicitly
    broadcast back; the corpus side shuffles twice, both times with map-side
    partial aggregation — once to (doc, bucket) counts, once to per-doc
    sums. Per-bucket log-ratios round at 6 dp before the weighted sum and
    the final score rounds again (summation-order ULP policy).
    """
    cnts = _pin_counts(
        hashed_feature_counts(df, n_buckets, id_col, text_col, carry_cols=(target_col,)),
        persist,
    )
    is_tgt = F.col(target_col) == target_value
    bucket_stats = cnts.groupBy("bucket").agg(
        F.sum("cnt").cast("long").alias("raw_cnt"),
        F.sum(F.when(is_tgt, F.col("cnt")).otherwise(F.lit(0))).cast("long").alias(
            "tgt_cnt"
        ),
    )
    totals = bucket_stats.agg(
        F.sum("raw_cnt").cast("double").alias("r_tot"),
        F.sum("tgt_cnt").cast("double").alias("t_tot"),
    )
    b = float(n_buckets)
    logratio = bucket_stats.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.round(
            F.log((F.col("tgt_cnt") + F.lit(1.0)) / (F.col("t_tot") + F.lit(b)))
            - F.log((F.col("raw_cnt") + F.lit(1.0)) / (F.col("r_tot") + F.lit(b))),
            6,
        ).alias("logratio"),
    )
    score = F.round(F.sum(F.col("cnt") * F.col("logratio")) / F.sum("cnt"), 6)
    return (
        cnts.join(F.broadcast(logratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_feats"),
            score.alias("dsir_score"),
        )
        .withColumn("keep", F.col("dsir_score") > 0)
    )


# ---------------------------------------------------------------------------
# BM25 keyword retrieval
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    df: DataFrame,
    queries: list[tuple[str, str]],
    n_docs: int,
    total_tokens: int,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    persist: bool = True,
) -> DataFrame:
    """Top-``k`` documents per keyword query under BM25 (Robertson/Lucene).

    score(q, d) = sum_{t in q} idf(t) * tf * (k1+1) / (tf + k1*(1-b+b*dl/avgdl))
    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))

    The retrieval shape that matters at corpus scale: the query set is a
    tiny literal frame (broadcast), so the corpus-side work is ONE pass —
    per-doc term frequencies filtered to query terms by a broadcast
    semi-join (the inverted-index probe; everything not matching any query
    term dies map-side), then document frequency over that filtered frame,
    then a per-query top-k via WindowGroupLimit. ``n_docs`` /
    ``total_tokens`` are exact-integer scalars from one footer-cheap agg
    job; avgdl enters as dl*N/T so both engines do the identical IEEE
    double ops. Scores round at 6 dp before ranking (ties -> doc_id).
    """
    spark = df.sparkSession
    qrows = [
        (qid, t)
        for qid, qtext in queries
        for t in sorted(set(qtext.split(" ")))
    ]
    qt = spark.createDataFrame(qrows, "query_id string, term string")

    tok = ensure_min_parallelism(df).select(
        F.col(id_col), F.size(tokens(text_col)).alias("dl"), F.explode(tokens(text_col)).alias("term")
    )
    # inverted-index probe BEFORE the aggregation (guide §2.3): the
    # broadcast semi-join drops every token that matches no query term
    # map-side, so the (doc, dl, term) exchange carries only query-term
    # occurrences instead of the whole corpus's distinct postings.
    # Filtering on the grouping key commutes with the groupBy, so tf /
    # df_count are unchanged. Pin the probe result: document-frequency
    # (-> broadcast) and scoring both consume tfq, and the broadcast
    # branch defeats exchange reuse — without this the corpus-wide
    # tokenize+explode runs once per consumer. The frame is only the
    # query-term postings: tiny.
    tfq = _pin_counts(
        tok.join(F.broadcast(qt.select("term").distinct()), "term")
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf")),
        persist,
    )
    dfreq = tfq.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df_count"))

    n = float(n_docs)
    t_tot = float(total_tokens)
    idf = F.log(
        F.lit(1.0) + (F.lit(n) - F.col("df_count") + F.lit(0.5)) / (F.col("df_count") + F.lit(0.5))
    )
    norm = F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B)
        + F.lit(BM25_B) * (F.col("dl").cast("double") * F.lit(n) / F.lit(t_tot))
    )
    contrib = F.round(
        idf * (F.col("tf") * F.lit(BM25_K1 + 1.0)) / (F.col("tf") + norm), 6
    )
    scored = (
        tfq.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qt), "term")
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum(contrib), 6).alias("bm25"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("bm25").desc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", id_col, "bm25", "rnk")
    )


# ---------------------------------------------------------------------------
# Naive-Bayes quality/domain classifier (fasttext-style linear scorer)
# ---------------------------------------------------------------------------


def nb_classifier_scores(
    df: DataFrame,
    label_col: str,
    positive_value: str,
    n_buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
    persist: bool = True,
) -> DataFrame:
    """(id, label, n_feats, nb_score, pred_positive, correct): train a
    Naive-Bayes bag-of-hashed-ngrams classifier on the corpus's own labels
    and score every document — the classic "quality classifier" stage of a
    training-data pipeline (a fasttext-style linear model over hashed
    unigram+bigram features; NB log-odds are its closed-form, pure-
    aggregation trainable special case — no gradient loop needed).

    Per-bucket Laplace-smoothed log-odds of positive vs negative:

        lo(b) = ln((pos_b + 1)/(pos_tot + B)) - ln((neg_b + 1)/(neg_tot + B))
        score(d) = (1/|d|) * sum_b cnt(d, b) * lo(b)

    Distinct from DSIR (:func:`dsir_scores`): this is a supervised
    discriminative pos-vs-NEG model with a prediction + train-accuracy
    output, not an importance weight of target-vs-corpus.

    Scale shape: identical to DSIR — the trained model is ``n_buckets``
    rows broadcast back over the corpus; feature extraction and scoring
    both shuffle once with map-side partial aggregation. Training is ONE
    aggregation over the same (doc, bucket) frame that scoring consumes
    (the plan reuses it), so adding the classifier to a pipeline costs one
    extra vocabulary-sized agg, not a second corpus scan.
    """
    cnts = _pin_counts(
        hashed_feature_counts(df, n_buckets, id_col, text_col, carry_cols=(label_col,)),
        persist,
    )
    is_pos = F.col(label_col) == positive_value
    bucket_stats = cnts.groupBy("bucket").agg(
        F.sum(F.when(is_pos, F.col("cnt")).otherwise(F.lit(0))).cast("long").alias("pos_cnt"),
        F.sum(F.when(~is_pos, F.col("cnt")).otherwise(F.lit(0))).cast("long").alias("neg_cnt"),
    )
    totals = bucket_stats.agg(
        F.sum("pos_cnt").cast("double").alias("p_tot"),
        F.sum("neg_cnt").cast("double").alias("n_tot"),
    )
    b = float(n_buckets)
    logodds = bucket_stats.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.round(
            F.log((F.col("pos_cnt") + F.lit(1.0)) / (F.col("p_tot") + F.lit(b)))
            - F.log((F.col("neg_cnt") + F.lit(1.0)) / (F.col("n_tot") + F.lit(b))),
            6,
        ).alias("logodds"),
    )
    score = F.round(F.sum(F.col("cnt") * F.col("logodds")) / F.sum("cnt"), 6)
    scored = (
        cnts.join(F.broadcast(logodds), "bucket")
        .groupBy(id_col, label_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_feats"),
            score.alias("nb_score"),
        )
    )
    pred = F.col("nb_score") > 0
    return scored.select(
        id_col,
        label_col,
        "n_feats",
        "nb_score",
        pred.alias("pred_positive"),
        (pred == (F.col(label_col) == positive_value)).alias("correct"),
    )


# ---------------------------------------------------------------------------
# Gopher-style rule-based quality filters
# ---------------------------------------------------------------------------

#: stopword presence check (Gopher's "contains at least 2 stop words" rule);
#: literal list shared with the oracle SQL
GOPHER_STOPWORDS = ("the", "a", "of", "to", "and", "in")

#: (min_words, max_words, min_mean_len, max_mean_len, max_top_share,
#:  min_unique_frac, min_stop_hits) — Gopher/C4-shaped bounds adapted to the
#: synthetic vocabulary (short all-lowercase words, no punctuation)
GOPHER_BOUNDS = (20, 100_000, 3.0, 10.0, 0.2, 0.2, 2)


def gopher_quality_filters(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document rule-based quality metrics + keep decision (Gopher
    §A1.1 / C4-style heuristic filtering, word-level rules — the corpus has
    no line structure, so line rules collapse to word rules).

    Metrics: word count, mean word length, fraction of distinct words,
    most-frequent-word share (the repetition rule), stopword hits. ``keep``
    ANDs the per-rule flags under :data:`GOPHER_BOUNDS`.

    One explode + two nested aggregations on (doc, word) -> doc; all
    partial-aggregatable, no windows, no UDFs. Ratios round at 6 dp.
    """
    tf = term_frequencies(df, id_col, text_col)
    stop_hits = F.sum(
        F.when(F.col("term").isin(*GOPHER_STOPWORDS), F.col("tf")).otherwise(F.lit(0))
    )
    per_doc = tf.groupBy(id_col).agg(
        F.sum("tf").cast("long").alias("n_words"),
        F.count(F.lit(1)).cast("long").alias("n_unique"),
        F.max("tf").cast("long").alias("max_tf"),
        F.sum(F.length("term") * F.col("tf")).cast("long").alias("sum_len"),
        stop_hits.cast("long").alias("stop_hits"),
    )
    (min_w, max_w, min_ml, max_ml, max_share, min_uniq, min_stop) = GOPHER_BOUNDS
    n = F.col("n_words").cast("double")
    mean_len = F.round(F.col("sum_len") / n, 6)
    top_share = F.round(F.col("max_tf") / n, 6)
    uniq_frac = F.round(F.col("n_unique") / n, 6)
    out = per_doc.select(
        id_col,
        "n_words",
        mean_len.alias("mean_word_len"),
        uniq_frac.alias("unique_frac"),
        top_share.alias("top_word_share"),
        "stop_hits",
    )
    keep = (
        F.col("n_words").between(min_w, max_w)
        & F.col("mean_word_len").between(min_ml, max_ml)
        & (F.col("top_word_share") <= max_share)
        & (F.col("unique_frac") >= min_uniq)
        & (F.col("stop_hits") >= min_stop)
    )
    return out.withColumn("keep", keep)


def shingle_frequencies(
    df: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, term, tf): occurrence count of each k-token shingle per document.

    Unlike :func:`texthash.shingles` this keeps REPEATS (tf is a count, not
    membership) — the term unit for shingle-space TF-IDF vectors. Same scale
    shape as :func:`term_frequencies`: per-row projection + explode, then one
    (doc, shingle) groupBy with map-side partial aggregation.
    """
    w = tokens(text_col)
    n = F.size(w)
    sh = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.concat_ws(" ", F.slice(w, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tok = ensure_min_parallelism(df).select(
        F.col(id_col), F.explode(sh).alias("term")
    )
    return tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))


def tfidf_cosine_pairs(
    df: DataFrame,
    n_docs: int,
    threshold: float = 0.6,
    df_cap: int = 50,
    shingle_k: int | None = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    persist: bool = True,
) -> DataFrame:
    """All-pairs sparse cosine similarity (APSS) over TF-IDF vectors via an
    inverted-index join — the sparse-vector twin of the embedding near-dup
    families (`operators/neardup.embedding_cosine_pairs`): pairs of documents
    whose TF-IDF cosine clears ``threshold``, generated WITHOUT an all-pairs
    product.

    Vectors are defined over the df-capped vocabulary: terms appearing in
    more than ``df_cap`` documents are dropped from the vectors entirely
    (weights AND norms), the classic stop-term prune of inverted-index APSS
    (Bayardo et al., "Scaling Up All Pairs Similarity Search", WWW'07 — the
    prefix filter is the finer refinement of the same bound). With the cap,
    each posting list has at most ``df_cap`` entries, so candidate pairs are
    bounded by sum_t df_t^2 <= df_cap * (total postings) — LINEAR in corpus
    size with a constant cap, not quadratic. Shuffle keys are the term
    (candidate generation) and the (doc_a, doc_b) pair (dot-product
    aggregation), both high-cardinality and skew-free by construction.

    ``shingle_k``: use k-token shingles as the term space (near-dup
    detection — unigram vectors saturate when the vocabulary is small);
    ``None`` for plain unigram terms. idf is the smoothed sklearn form,
    ln((N+1)/(df+1))+1, with ``n_docs`` passed as a scalar. The cosine is
    rounded at 6 dp before the threshold, so the kept pair SET is identical
    across engines (summation-order drift is ~1 ulp, far below 6 dp).
    """
    tf = (
        shingle_frequencies(df, shingle_k, id_col, text_col)
        if shingle_k is not None
        else term_frequencies(df, id_col, text_col)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_count"))
    idf = F.log(
        F.lit(float(n_docs + 1)) / (F.col("df_count") + F.lit(1.0))
    ) + F.lit(1.0)
    # single consumer (the normalized frame below) — no pin needed here;
    # the pinned wn materialization computes this chain exactly once
    wts = tf.join(dfreq.filter(F.col("df_count") <= df_cap), "term").select(
        F.col(id_col), F.col("term"), (F.col("tf") * idf).alias("wt")
    )
    # L2 norm via a window over the SAME doc key instead of a groupBy +
    # join-back: one doc-keyed exchange instead of two plus a join
    # (guide §2.4 — a window partitioned like the preceding shuffle needs
    # no second exchange). Same sum terms, order-insensitive at 6 dp.
    nrm = F.sqrt(
        F.sum(F.col("wt") * F.col("wt")).over(Window.partitionBy(id_col))
    )
    # wn feeds BOTH sides of the self-join — pin it or the whole
    # tokenize+explode+aggregate chain runs twice (see _pin_counts)
    wn = _pin_counts(
        wts.select(
            F.col(id_col), F.col("term"), (F.col("wt") / nrm).alias("wn")
        ),
        persist,
    )
    a, b = wn.alias("a"), wn.alias("b")
    return (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.round(F.sum(F.col("a.wn") * F.col("b.wn")), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def weighted_sample_wor(
    df: DataFrame,
    k: int,
    weight_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, ``k`` rows per
    group — Efraimidis–Spirakis A-Res with hash-derived uniforms.

    Each row draws key = u^(1/w) with u = hash60('wsam:' || id) / 2^60 and
    w its weight; the k largest keys per group are an exact weighted
    sample without replacement (Efraimidis & Spirakis, IPL 2006). Because
    u comes from md5 of the row id rather than an RNG, the selected SET is
    reproducible across engines, runs, and cluster sizes — the same
    resumable-sampling property as :func:`source_mixture_sample`, but
    weight-proportional instead of rate-per-source.

    One window shuffle on the group key; row_number plans as a
    WindowGroupLimit (top-k pushdown), never a full per-group sort spill.
    The key is rounded at 9 dp before ranking (pow() last-ulp drift), with
    the id as the deterministic tie-break.
    """
    u = hash60(F.concat(F.lit("wsam:"), F.col(id_col).cast("string"))) / F.lit(
        HASH60_SPAN
    )
    w = F.col(weight_col).cast("double")
    key = F.round(F.pow(u, F.lit(1.0) / w), 9)
    keyed = df.filter(w > 0).select(
        F.col(id_col), F.col(group_col), F.col(weight_col), key.alias("sample_key")
    )
    win = Window.partitionBy(group_col).orderBy(
        F.col("sample_key").desc(), F.col(id_col)
    )
    return (
        keyed.withColumn("rn", F.row_number().over(win).cast("long"))
        .filter(F.col("rn") <= k)
    )


def bigram_frequencies(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, prev, cur, tf): occurrence count of each adjacent token pair per
    document. Same shape discipline as :func:`term_frequencies`: per-row
    projection + explode, one (doc, prev, cur) groupBy with map-side
    partial aggregation; docs with < 2 tokens contribute nothing.
    """
    w = tokens(text_col)
    n = F.size(w)
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(1)),
            lambda i: F.struct(
                F.element_at(w, i).alias("prev"),
                F.element_at(w, i + 1).alias("cur"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
    tok = ensure_min_parallelism(df).select(
        F.col(id_col), F.explode(pairs).alias("p")
    )
    return tok.select(id_col, F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur")).groupBy(
        id_col, "prev", "cur"
    ).agg(F.count(F.lit(1)).alias("tf"))


def bigram_logprob(
    df: DataFrame,
    total_tokens: int,
    lam: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    persist: bool = True,
) -> DataFrame:
    """Per-document mean INTERPOLATED bigram log-probability — one model
    order up from :func:`unigram_logprob`, the KenLM-shaped quality proxy:

    p(w_i | w_{i-1}) = lam * c(w_{i-1}, w_i) / c(w_{i-1})
                     + (1 - lam) * c(w_i) / total
    avg_logp2(d) = sum_bigrams tf * ln(p) / n_bigrams(d)

    (Jelinek–Mercer interpolation; the unigram floor keeps every observed
    bigram finite without discounting bookkeeping.) The corpus model is two
    aggregate frames — bigram counts (vocabulary² bounded, in practice far
    smaller) and unigram counts — joined back against DISTINCT per-doc
    bigrams weighted by tf, never raw occurrences. Docs with < 2 tokens get
    n_bigrams = 0 and a NULL score (no tokens to condition on). Rounded at
    6 dp (summation-order ULPs).
    """
    bf = _pin_counts(bigram_frequencies(df, id_col, text_col), persist)
    big_cnt = bf.groupBy("prev", "cur").agg(F.sum("tf").alias("c_big"))
    uni_cnt = (
        term_frequencies(df, id_col, text_col)
        .groupBy("term")
        .agg(F.sum("tf").alias("cnt"))
    )
    p = (
        F.lit(float(lam)) * F.col("c_big").cast("double") / F.col("c_prev")
        + F.lit(1.0 - float(lam)) * F.col("c_cur") / F.lit(float(total_tokens))
    )
    scored = (
        bf.join(big_cnt, ["prev", "cur"])
        .join(uni_cnt.select(F.col("term").alias("prev"), F.col("cnt").alias("c_prev")), "prev")
        .join(uni_cnt.select(F.col("term").alias("cur"), F.col("cnt").alias("c_cur")), "cur")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.round(F.sum(F.col("tf") * F.log(p)) / F.sum("tf"), 6).alias("avg_logp2"),
        )
    )
    ids = df.select(id_col)
    return ids.join(scored, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long")).alias("n_bigrams"),
        F.col("avg_logp2"),
    )


def kneser_ney_logprob(
    df: DataFrame,
    discount: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    persist: bool = True,
) -> DataFrame:
    """Per-document mean log-probability under an interpolated Kneser-Ney
    bigram model fit on the same corpus (Kneser & Ney 1995; the smoothing
    used by KenLM-class models, one order above the Jelinek-Mercer proxy
    in :func:`bigram_logprob`):

        P(cur|prev) = max(c(prev,cur) - D, 0) / c(prev·)
                      + D * N1+(prev·) / c(prev·) * Pcont(cur)
        Pcont(cur)  = N1+(·cur) / N1+(··)

    with absolute discount ``D`` and continuation counts over distinct
    bigram TYPES. Every quantity is a corpus aggregate: bigram counts,
    per-prev totals/type-counts, per-cur continuation type-counts, and
    one global type total — all broadcastable (vocabulary-bounded), joined
    back against DISTINCT per-doc bigrams weighted by tf. Scale shape is
    identical to :func:`bigram_logprob`.
    """
    bf = _pin_counts(bigram_frequencies(df, id_col, text_col), persist)
    # four consumers (prev_stats, cont, the type count, the scored join) —
    # pin the bigram-type counts too, or each consumer re-aggregates the
    # pinned bf frame (4 identical shuffles instead of 1)
    big_cnt = _pin_counts(
        bf.groupBy("prev", "cur").agg(F.sum("tf").alias("c_big")), persist
    )
    prev_stats = big_cnt.groupBy("prev").agg(
        F.sum("c_big").alias("c_prev"),
        F.count(F.lit(1)).alias("n1_prev"),
    )
    cont = big_cnt.groupBy("cur").agg(F.count(F.lit(1)).alias("n1_cur"))
    n_types = big_cnt.count()  # one scalar: distinct bigram types
    d = F.lit(float(discount))
    p = (
        F.greatest(F.col("c_big") - d, F.lit(0.0)) / F.col("c_prev")
        + d * F.col("n1_prev") / F.col("c_prev") * (F.col("n1_cur") / F.lit(float(n_types)))
    )
    scored = (
        bf.join(big_cnt, ["prev", "cur"])
        .join(prev_stats, "prev")
        .join(cont, "cur")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.round(F.sum(F.col("tf") * F.log(p)) / F.sum("tf"), 6).alias("avg_logp_kn"),
        )
    )
    ids = df.select(id_col)
    return ids.join(scored, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long")).alias("n_bigrams"),
        F.col("avg_logp_kn"),
    )


def substring_dedup(
    df: DataFrame, min_len: int = 12, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact substring dedup: remove every token that sits inside a
    ``min_len``-token run whose exact text occurs MORE THAN ONCE in the
    corpus, keeping only the globally first occurrence — the
    suffix-array-style pass of Lee et al. 2022 ("Deduplicating Training
    Data Makes Language Models Better"), re-expressed relationally:

    1. every stride-1 window of ``min_len`` tokens (ONE row per token
       position — linear in corpus size), keyed by its 60-bit content hash
       so the shuffle carries (id, pos, int64), never window text;
    2. global first-occurrence rank per window hash ordered by (doc id,
       position) — a total order, so the kept occurrence is deterministic;
    3. every LATER occurrence contributes a removal interval
       [pos, pos+min_len-1]; per doc, overlapping/adjacent intervals are
       merged with one gaps-and-islands pass (running max of interval end
       over a (doc, pos) sort), so the removal set is a short array of
       disjoint intervals — NO per-position explode. Work is
       O(dup windows), not O(dup windows x min_len): under a duplicate
       storm (every window duplicated) the old explode multiplied rows by
       min_len before a corpus-wide distinct; the interval form stays one
       row per dup window through a single doc-keyed shuffle.
    4. tokens at positions outside every merged interval are stitched
       back in order.

    Against span_dedup (non-overlapping fixed spans): stride-1 windows
    catch duplicated runs at ANY alignment — the reason Lee et al. use
    suffix arrays. Hash collisions (60-bit md5 prefix) can only
    over-remove, at ~n_windows^2 / 2^60 expected pairs — negligible below
    ~10^8 distinct windows per corpus; shard the hash space for more.

    Returns (id, n_tokens, n_removed, text_deduped) for every input row.
    """
    w = tokens(text_col)
    n = F.size(w)
    # Window key = xxhash64 of the window text, NOT the cross-engine
    # hash60 (md5): the key is internal — it only decides duplicate-window
    # EQUALITY (the output carries positions and reassembled text, never
    # the hash), so any collision-free hash yields the identical result,
    # and xxhash64 is ~an order of magnitude cheaper per window than md5
    # (guide §1.2 step 2 — this projection is O(tokens) hash calls and
    # dominated the operator's task time). Collision risk is the same
    # shape as the md5 form's documented bound: ~n_windows^2 / 2^64
    # expected colliding pairs, negligible below ~10^9 windows; the
    # DuckDB oracle keeps its md5 key and agrees because both keys are
    # collision-free on any real corpus slice.
    win_hashes = F.when(
        n >= min_len,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(min_len - 1)),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(w, i, min_len))),
        ),
    ).otherwise(F.array().cast("array<long>"))
    wins = ensure_min_parallelism(df).select(
        F.col(id_col), F.posexplode(win_hashes).alias("pos0", "h")
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "h")
    first = Window.partitionBy("h").orderBy(id_col, "pos")
    dups = (
        wins.withColumn("rn", F.row_number().over(first))
        .filter(F.col("rn") > 1)
        .select(id_col, "pos")
    )
    wd = Window.partitionBy(id_col).orderBy("pos")
    prev_max_end = F.max(F.col("pos") + F.lit(min_len - 1)).over(
        wd.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = dups.withColumn(
        "island",
        F.sum(
            F.when(prev_max_end.isNull() | (F.col("pos") > prev_max_end + 1), 1).otherwise(0)
        ).over(wd.rowsBetween(Window.unboundedPreceding, 0)),
    )
    intervals = islands.groupBy(id_col, "island").agg(
        F.min("pos").alias("s"), F.max(F.col("pos") + F.lit(min_len - 1)).alias("e")
    )
    removed = intervals.groupBy(id_col).agg(
        F.sum(F.col("e") - F.col("s") + 1).cast("long").alias("n_removed"),
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("ivs"),
    )
    joined = df.join(removed, id_col, "left")
    ivs = F.coalesce(F.col("ivs"), F.array().cast("array<struct<s:int,e:int>>"))
    kept = F.filter(
        F.sequence(F.lit(1), n),
        lambda p: ~F.exists(ivs, lambda iv: (p >= iv["s"]) & (p <= iv["e"])),
    )
    return joined.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        F.coalesce(F.col("n_removed"), F.lit(0).cast("long")).alias("n_removed"),
        F.concat_ws(
            " ", F.transform(kept, lambda p: F.element_at(w, p))
        ).alias("text_deduped"),
    )


#: logistic-regression quality classifier defaults: hashed-feature width
#: (small enough that the per-step gradient collect is a 256-double
#: vector), fixed full-batch GD steps, unit learning rate
LOGREG_BUCKETS, LOGREG_STEPS, LOGREG_LR = 256, 3, 1.0


def logreg_fit_scores(
    df: DataFrame,
    label: "F.Column",
    n_buckets: int = LOGREG_BUCKETS,
    steps: int = LOGREG_STEPS,
    lr: float = LOGREG_LR,
    id_col: str = "doc_id",
    text_col: str = "text",
    persist: bool = True,
) -> DataFrame:
    """Trained DISCRIMINATIVE quality classifier — logistic regression over
    the DSIR hashed unigram+bigram features, fit with ``steps`` fixed
    full-batch gradient-descent rounds, scored per document.

    The iterative-fit twin of :func:`nb_classifier_scores` (generative) —
    and, like the IVF k-means and PCA power method, FIXED-ITERATION
    semantics: w starts at zero and takes exactly ``steps`` updates
    w <- w - lr * (1/N) sum_d (sigmoid(w.x_d) - y_d) x_d, so the whole
    training run is a deterministic map both engines replay (the oracle
    unrolls the steps in SQL; no fitted literals cross engines).

    Scale shape per step: the corpus is collapsed ONCE to one row per
    document carrying its sparse feature array (bucket, x) — after that,
    per-doc scoring is a pure projection (``aggregate`` over the array
    with the weights riding the plan as a broadcast literal — no shuffle,
    no join), and the gradient is a single ``n_buckets``-group aggregation
    (map-side partial) whose only driver traffic is the
    ``n_buckets``-double gradient vector. Full-batch GD means ``steps``
    passes over the pinned per-doc frame — at 100 TB you fit on a sample
    or switch to mini-batches; the per-step plan is unchanged. Features
    are L1-normalized counts (x = cnt / doc_total), keeping scores O(|w|)
    and the sigmoid off its saturated tails.
    """
    lab = df.select(
        F.col(id_col), F.col(text_col), label.cast("double").alias("y")
    )
    feats = hashed_feature_counts(lab, n_buckets, id_col, text_col, carry_cols=("y",))
    # one row per doc: sparse (bucket, x) feature array — every later pass
    # (3 GD steps + final scoring) is a projection or one tiny bucket agg
    xy = _pin_counts(
        feats.groupBy(id_col, "y")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("bucket").cast("int").alias("b"),
                    F.col("cnt").cast("double").alias("c"),
                )
            ).alias("fs"),
            F.sum("cnt").cast("double").alias("tot"),
        )
        .select(
            F.col(id_col),
            F.col("y"),
            F.transform(
                "fs",
                lambda f: F.struct(
                    f["b"].alias("b"), (f["c"] / F.col("tot")).alias("x")
                ),
            ).alias("fs"),
        ),
        persist,
    )
    n = float(df.count())
    w = [0.0] * n_buckets

    def score_expr(weights: list[float]):
        warr = F.array(*[F.lit(float(v)) for v in weights])
        return F.aggregate(
            F.col("fs"),
            F.lit(0.0),
            lambda acc, f: acc + F.element_at(warr, f["b"] + 1) * f["x"],
        )

    for _ in range(steps):
        resid = (
            F.lit(1.0) / (F.lit(1.0) + F.exp(-score_expr(w))) - F.col("y")
        ).alias("r")
        grads = {
            r.b: r.g
            for r in xy.select(resid, F.col("fs"))
            .select("r", F.explode("fs").alias("f"))
            .groupBy(F.col("f.b").alias("b"))
            .agg((F.sum(F.col("r") * F.col("f.x")) / F.lit(n)).alias("g"))
            .collect()  # n_buckets doubles — the only driver traffic
        }
        w = [w[b] - lr * grads.get(b, 0.0) for b in range(n_buckets)]
    s = score_expr(w)
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-s))
    return xy.select(
        F.col(id_col),
        F.col("y").cast("int").alias("label"),
        F.round(s, 6).alias("score"),
        F.round(prob, 6).alias("prob"),
        (prob >= 0.5).alias("pred"),
    )
