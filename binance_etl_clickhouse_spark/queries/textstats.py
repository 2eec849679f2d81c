"""Text-statistics queries: PMI, Zipf, minimizers, CDC chunk dedup, bloom.

Each oracle recomputes the full pass from the raw `documents` table with
DuckDB list comprehensions / window functions, sharing the md5-based
``hash60`` constants with the Spark side so hashed artifacts (minimizers,
CDC boundaries, bloom bit positions) are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from binance_etl_clickhouse_spark.operators import textstats
from binance_etl_clickhouse_spark.operators.parallel import ensure_min_parallelism
from binance_etl_clickhouse_spark.operators.texthash import hash60_sql, shingles_sql
from binance_etl_clickhouse_spark.queries.registry import register
from binance_etl_clickhouse_spark.tables import load_table as _t


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with the single-file scan fanned out for per-row hashing."""
    return ensure_min_parallelism(_t(spark, sf_dir, "documents"))

_PMI_V, _PMI_MIN = 40, 5


@register(
    "pmi_cooccurrence_pairs",
    f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    dfreq AS (SELECT t, count(*)::BIGINT AS c FROM toks GROUP BY t),
    vocab AS (
      SELECT t, c FROM (
        SELECT t, c, row_number() OVER (ORDER BY c DESC, t) AS rn FROM dfreq
      ) WHERE rn <= {_PMI_V}
    ),
    vt AS (SELECT toks.doc_id, toks.t, vocab.c FROM toks JOIN vocab USING (t)),
    n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
    pairs AS (
      SELECT a.t AS t1, b.t AS t2, a.c AS c1, b.c AS c2, count(*)::BIGINT AS c_xy
      FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.t < b.t
      GROUP BY a.t, b.t, a.c, b.c
    )
    SELECT t1, t2, c_xy,
           round(ln(c_xy * n.n_docs / (c1 * c2)), 6) AS pmi
    FROM pairs CROSS JOIN n
    WHERE c_xy >= {_PMI_MIN}
    """,
    survey_ref="text stats: PMI term co-occurrence (vocab-capped pair fan-out)",
)
def pmi_cooccurrence_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.count()
    return textstats.pmi_pairs(docs, n_docs=n_docs, max_vocab=_PMI_V, min_pair=_PMI_MIN)


_ZIPF_R = 30


@register(
    "zipf_vocab_stats",
    f"""
    WITH toks AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
    tf AS (SELECT t, count(*)::BIGINT AS f FROM toks GROUP BY t),
    top AS (
      SELECT ln(r::DOUBLE) AS x, ln(f::DOUBLE) AS y FROM (
        SELECT f, row_number() OVER (ORDER BY f DESC, t) AS r FROM tf
      ) WHERE r <= {_ZIPF_R}
    ),
    s AS (
      SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM top
    ),
    tot AS (SELECT sum(len(string_split(text, ' ')))::BIGINT AS total_tokens FROM documents),
    v AS (SELECT count(*)::BIGINT AS vocab_size FROM tf)
    SELECT vocab_size, total_tokens,
           round((s.n * s.sxy - s.sx * s.sy) / (s.n * s.sxx - s.sx * s.sx), 6)
             AS zipf_slope,
           round((s.sy - ((s.n * s.sxy - s.sx * s.sy) / (s.n * s.sxx - s.sx * s.sx)) * s.sx) / s.n, 6)
             AS zipf_intercept
    FROM s CROSS JOIN tot CROSS JOIN v
    """,
    survey_ref="text stats: Zipf rank-frequency fit + vocabulary totals",
)
def zipf_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.zipf_stats(_t(spark, sf_dir, "documents"), top_r=_ZIPF_R)


_MZ_K, _MZ_W = 3, 4


@register(
    "minimizer_fingerprints",
    f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    hs AS (
      SELECT doc_id,
             [{hash60_sql(f"array_to_string(w[i:i+{_MZ_K - 1}], ' ')")}
              for i in range(1, len(w) - {_MZ_K - 2})] AS h
      FROM t
    ),
    mz AS (
      SELECT doc_id,
             greatest(len(h) - {_MZ_W - 1}, 0)::BIGINT AS n_windows,
             len(list_distinct(
               [list_min(h[j:j+{_MZ_W - 1}]) for j in range(1, len(h) - {_MZ_W - 2})]
             ))::BIGINT AS n_minimizers
      FROM hs
    )
    SELECT doc_id, n_windows, n_minimizers,
           round(n_minimizers / nullif(n_windows::DOUBLE, 0.0), 6) AS density
    FROM mz
    """,
    survey_ref="text stats: (w,k)-minimizer fingerprint density (zero-shuffle projection)",
)
def minimizer_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.minimizer_fingerprints(_docs(spark, sf_dir), k=_MZ_K, w=_MZ_W)


_CDC_D = textstats.CDC_DIVISOR


@register(
    "cdc_chunk_dedup",
    f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    c AS (
      SELECT doc_id, w,
             [i for i in range(1, len(w) + 1)
              if {hash60_sql('w[i]')} % {_CDC_D} = 0 and i < len(w)] AS cuts
      FROM t
    ),
    s AS (
      SELECT doc_id, w,
             list_prepend(1, [c + 1 for c in cuts]) AS starts,
             list_append(cuts, len(w)) AS ends
      FROM c
    ),
    ch AS (
      SELECT doc_id,
             generate_subscripts(chunks, 1) AS cidx,
             unnest(chunks) AS chunk
      FROM (
        SELECT doc_id,
               [array_to_string(w[starts[j]:ends[j]], ' ')
                for j in range(1, len(starts) + 1)] AS chunks
        FROM s
      )
    ),
    rn AS (
      SELECT doc_id, row_number() OVER (PARTITION BY chunk ORDER BY doc_id, cidx) AS rn
      FROM ch
    )
    SELECT doc_id, count(*)::BIGINT AS n_chunks,
           sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept
    FROM rn GROUP BY doc_id
    """,
    survey_ref="dedup: content-defined chunking + corpus first-occurrence dedup",
)
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.cdc_chunk_dedup(_docs(spark, sf_dir), divisor=_CDC_D)


_BLOOM_K_SH = 4


def _bpos(expr: str, j: int) -> str:
    salted = "'b" + str(j) + ":' || " + expr
    return f"({hash60_sql(salted)} % {textstats.BLOOM_M})"


@register(
    "bloom_decontaminate",
    f"""
    WITH ev AS (
      SELECT DISTINCT unnest({shingles_sql("text", _BLOOM_K_SH)}) AS sh
      FROM documents WHERE doc_id % 11 = 0
    ),
    bits AS (
      SELECT DISTINCT bit FROM (
        SELECT unnest([{_bpos('sh', 0)}, {_bpos('sh', 1)}, {_bpos('sh', 2)}]) AS bit
        FROM ev
      )
    ),
    cs AS (
      SELECT doc_id, unnest({shingles_sql("text", _BLOOM_K_SH)}) AS sh FROM documents
    ),
    pos AS (
      SELECT doc_id, sh, 0 AS j, {_bpos('sh', 0)} AS bit FROM cs
      UNION ALL
      SELECT doc_id, sh, 1 AS j, {_bpos('sh', 1)} AS bit FROM cs
      UNION ALL
      SELECT doc_id, sh, 2 AS j, {_bpos('sh', 2)} AS bit FROM cs
    ),
    fl AS (
      SELECT doc_id, count(*)::BIGINT AS n_flagged FROM (
        SELECT doc_id, sh, count(DISTINCT j) AS m
        FROM pos JOIN bits USING (bit)
        GROUP BY doc_id, sh
      ) WHERE m = 3
      GROUP BY doc_id
    ),
    per AS (
      SELECT doc_id, len({shingles_sql("text", _BLOOM_K_SH)})::BIGINT AS n_shingles
      FROM documents
    )
    SELECT per.doc_id, per.n_shingles,
           coalesce(fl.n_flagged, 0)::BIGINT AS n_flagged,
           round(coalesce(fl.n_flagged, 0) / nullif(per.n_shingles::DOUBLE, 0.0), 6)
             AS frac_flagged,
           coalesce(fl.n_flagged, 0) > 0 AS is_contaminated
    FROM per LEFT JOIN fl USING (doc_id)
    """,
    survey_ref="training-data: bloom-filter eval decontamination (broadcast bitset)",
)
def bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    ev = docs.filter(docs.doc_id % 11 == 0)
    return textstats.bloom_flags(docs, ev, k=_BLOOM_K_SH)


KEYWORDS = ["spark", "window", "hash join", "table scan", "merge sort"]


@register(
    "keyword_tag_docs",
    f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    uni AS (SELECT doc_id, unnest(w) AS g FROM t),
    big AS (
      SELECT doc_id, unnest([array_to_string(w[i:i+1], ' ')
                             for i in range(1, len(w))]) AS g
      FROM t
    ),
    grams AS (SELECT * FROM uni UNION ALL SELECT * FROM big),
    kw AS (SELECT unnest({KEYWORDS!r}) AS keyword)
    SELECT doc_id, keyword, count(*)::BIGINT AS n_matches
    FROM grams JOIN kw ON grams.g = kw.keyword
    GROUP BY doc_id, keyword
    """,
    survey_ref="text stats: dictionary phrase tagging (broadcast 1/2-gram join)",
)
def keyword_tag_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.keyword_tags(_docs(spark, sf_dir), KEYWORDS)


# --------------------------------------------------------------------------
# TextRank keyword scores: PageRank over the word co-occurrence graph
# --------------------------------------------------------------------------
_TR_WINDOW = 2  # co-occurrence window (token offsets 1..W)
_TR_ITERS = 3


def _textrank_oracle() -> str:
    """Word graph from offset-(1..W) co-occurrence, then the same unrolled
    power iterations as ``pagerank_copurchase``."""
    from binance_etl_clickhouse_spark.queries.graph import _PR_D

    offs = " OR ".join(
        f"b.pos = a.pos + {k}" for k in range(1, _TR_WINDOW + 1)
    )
    ctes = [
        """tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    )""",
        f"""pairs AS (
      SELECT least(a.w, b.w) AS src, greatest(a.w, b.w) AS dst,
             count(*)::BIGINT AS w
      FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND ({offs})
      WHERE a.w <> b.w AND a.w <> '' AND b.w <> ''
      GROUP BY 1, 2
    )""",
        """und AS (
      SELECT src AS u, dst AS v FROM pairs
      UNION ALL
      SELECT dst AS u, src AS v FROM pairs
    )""",
        "deg AS (SELECT u, count(*)::DOUBLE AS d FROM und GROUP BY u)",
        "nn AS (SELECT count(*)::DOUBLE AS n FROM deg)",
        "p0 AS (SELECT u, 1.0 / nn.n AS pr FROM deg CROSS JOIN nn)",
    ]
    prev = "p0"
    for i in range(1, _TR_ITERS + 1):
        ctes.append(
            f"""p{i} AS (
      SELECT e.v AS u,
             (1.0 - {_PR_D}) / max(nn.n) + {_PR_D} * sum({prev}.pr / deg.d) AS pr
      FROM und e
      JOIN {prev} ON {prev}.u = e.u
      JOIN deg ON deg.u = e.u
      CROSS JOIN nn
      GROUP BY e.v
    )"""
        )
        prev = f"p{i}"
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT u AS word, round(pr, 6) AS textrank FROM {prev}
    """


@register(
    "textrank_keywords",
    _textrank_oracle(),
    survey_ref="text statistics: TextRank keyword scoring (PageRank on the word co-occurrence graph)",
)
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank (Mihalcea 2004): rank words by PageRank over the
    offset-(1..W) co-occurrence graph.

    Scale shape: the token->pair step is W exact EQUI-joins on
    (doc_id, pos + k) — linear fan-out per token, never the doc-wide
    join-on-doc_id a positional theta-join would plan; the graph itself is
    vocabulary-sized (at web scale: capped top-V by document frequency
    first, exactly like ``pmi_cooccurrence_pairs``), so the fixed-iteration
    PageRank runs on a frame orders smaller than the corpus. Reuses
    :func:`~binance_etl_clickhouse_spark.operators.graph.pagerank`
    verbatim — one shuffle per iteration, staged round frames.
    """
    from pyspark.sql import functions as F

    from binance_etl_clickhouse_spark.operators import graph
    from binance_etl_clickhouse_spark.operators.texthash import tokens

    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos0", "w")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    arms = []
    for k in range(1, _TR_WINDOW + 1):
        b = tok.select(
            "doc_id", (F.col("pos") - k).alias("pos"), F.col("w").alias("w2")
        )
        arms.append(tok.join(b, ["doc_id", "pos"]))
    both = arms[0]
    for a in arms[1:]:
        both = both.unionAll(a)
    edges = (
        both.filter((F.col("w") != F.col("w2")) & (F.col("w") != "") & (F.col("w2") != ""))
        .groupBy(
            F.least("w", "w2").alias("src"), F.greatest("w", "w2").alias("dst")
        )
        .agg(F.count("*").cast("long").alias("w"))
    )
    pr = graph.pagerank(edges, iters=_TR_ITERS)
    return pr.select(
        F.col("part_key").alias("word"), F.col("pagerank").alias("textrank")
    )


# ---------------------------------------------------------------------------
# PII detection + redaction (r8) — operators/pii.py driven as a registered
# query. The synthetic corpus carries no PII, so deterministic spans are
# INJECTED per doc (email, phone, SSN, IP, and a credit card that is
# Luhn-VALID on even doc_ids and Luhn-INVALID on odd ones — the invalid run
# must survive redaction). Counts are measured on the original text; the
# redacted text is pinned end-to-end by md5. The DuckDB oracle replicates
# the same regexes (Java ∩ RE2 subset), the same Luhn fold (list lambdas)
# and the same fixed redaction order; DuckDB regexp_replace needs the
# explicit 'g' flag where Spark's is global by default.
# ---------------------------------------------------------------------------

_PII_ORACLE = r"""
WITH injected AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or (555) 123-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' ssn 123-45-6789 from 10.'
              || CAST(doc_id % 256 AS VARCHAR) || '.0.1 card '
              || CASE WHEN doc_id % 2 = 0
                      THEN '4111111111111111' ELSE '4111111111111112' END
             AS txt
  FROM documents
),
carded AS (
  SELECT doc_id, txt,
         list_filter(
           regexp_extract_all(txt, '\b\d(?:[ -]?\d){12,18}\b'),
           c -> length(regexp_replace(c, '[^0-9]', '', 'g')) BETWEEN 13 AND 19
            AND list_sum(list_transform(
                  range(1, length(regexp_replace(c, '[^0-9]', '', 'g')) + 1),
                  i -> CASE WHEN i % 2 = 1
                       THEN CAST(substr(regexp_replace(c, '[^0-9]', '', 'g'), -i, 1) AS INT)
                       ELSE CASE WHEN CAST(substr(regexp_replace(c, '[^0-9]', '', 'g'), -i, 1) AS INT) * 2 > 9
                            THEN CAST(substr(regexp_replace(c, '[^0-9]', '', 'g'), -i, 1) AS INT) * 2 - 9
                            ELSE CAST(substr(regexp_replace(c, '[^0-9]', '', 'g'), -i, 1) AS INT) * 2 END
                       END)) % 10 = 0
         ) AS cards
  FROM injected
),
redacted AS (
  SELECT doc_id, txt, cards,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 list_reduce(list_prepend(txt, cards),
                             (acc, c) -> replace(acc, c, '<CREDIT_CARD>')),
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
             '\(?\d{3}\)?[ .-]\d{3}[ .-]\d{4}\b', '<PHONE>', 'g'),
           '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS red
  FROM carded
)
SELECT doc_id,
       CAST(len(regexp_extract_all(txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
       CAST(len(regexp_extract_all(txt, '\(?\d{3}\)?[ .-]\d{3}[ .-]\d{4}\b')) AS INT) AS n_phone,
       CAST(len(regexp_extract_all(txt, '\b\d{3}-\d{2}-\d{4}\b')) AS INT) AS n_ssn,
       CAST(len(regexp_extract_all(txt, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS INT) AS n_ipv4,
       CAST(len(cards) AS INT) AS n_credit_card,
       md5(red) AS red_md5,
       CAST(length(red) AS INT) AS red_len
FROM redacted
"""


@register(
    "pii_detect_redact",
    _PII_ORACLE,
    survey_ref=(
        "LLM-pipeline extension: PII detection + redaction — regex counts "
        "per class, expression-level Luhn validation of card candidates, "
        "fixed-order placeholder redaction pinned end-to-end by md5; pure "
        "JVM expressions, map-only at any scale (operators/pii.py)"
    ),
)
def pii_detect_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from binance_etl_clickhouse_spark.operators.pii import pii_scrub

    docs = _docs(spark, sf_dir)
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or (555) 123-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" ssn 123-45-6789 from 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0.1 card "),
            F.when(F.col("doc_id") % 2 == 0, F.lit("4111111111111111")).otherwise(
                F.lit("4111111111111112")
            ),
        ).alias("text"),
    )
    out = pii_scrub(injected, "text")
    return out.select(
        "doc_id",
        F.col("n_email").cast("int").alias("n_email"),
        F.col("n_phone").cast("int").alias("n_phone"),
        F.col("n_ssn").cast("int").alias("n_ssn"),
        F.col("n_ipv4").cast("int").alias("n_ipv4"),
        F.col("n_credit_card").cast("int").alias("n_credit_card"),
        F.md5(F.col("text_redacted")).alias("red_md5"),
        F.length("text_redacted").cast("int").alias("red_len"),
    )
