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
