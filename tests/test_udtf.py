"""Python UDTF surface (§2.12): the SQL-callable lateral span fan-out must
match the JVM doc_spans path row-for-row."""

from __future__ import annotations


def test_span_rows_udtf_matches_jvm_doc_spans(spark):
    from binance_etl_clickhouse_spark.functions.udtfs import SpanRows
    from binance_etl_clickhouse_spark.operators.corpus import doc_spans
    from binance_etl_clickhouse_spark.tables import load_table

    spark.udtf.register("span_rows", SpanRows)
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    docs.limit(50).createOrReplaceTempView("docs_head")
    got = spark.sql(
        "SELECT d.doc_id, s.pos, s.span FROM docs_head d, LATERAL span_rows(d.text, 8) s"
    )
    want = doc_spans(docs.limit(50), k=8)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_span_rows_udtf_null_and_bad_k(spark):
    from binance_etl_clickhouse_spark.functions.udtfs import SpanRows

    spark.udtf.register("span_rows", SpanRows)
    df = spark.sql(
        "SELECT * FROM VALUES (CAST(NULL AS STRING), 2), ('a b', 0) AS t(txt, k), "
        "LATERAL span_rows(t.txt, t.k) s"
    )
    assert df.count() == 0  # null text / non-positive k fan out to nothing
