"""JSONL/CSV corpus drop sources: schema-explicit, corrupt-line quarantine."""

from __future__ import annotations

import json

from binance_etl_clickhouse_spark.sources.files import (
    partition_corrupt,
    read_documents_csv,
    read_documents_jsonl,
)


def test_jsonl_reader_quarantines_corrupt_lines(spark, tmp_path):
    p = tmp_path / "drop.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "lang": "en", "text": "hello world", "n_chars": 11}),
        '{"doc_id": 2, "lang": "en", "text": "broken',  # truncated JSON
        json.dumps({"doc_id": 3, "lang": "de", "text": "hallo welt", "n_chars": 10}),
        "not json at all",
    ]
    p.write_text("\n".join(lines) + "\n")

    df = read_documents_jsonl(spark, str(p))
    clean, bad = partition_corrupt(df)
    got = {r.doc_id: (r.lang, r.text) for r in clean.collect()}
    assert got == {1: ("en", "hello world"), 3: ("de", "hallo welt")}
    quarantined = [r["_corrupt_record"] for r in bad.collect()]
    assert len(quarantined) == 2  # one bad shard never kills the ingest
    assert any("broken" in q for q in quarantined)


def test_jsonl_clean_rows_flow_into_operators(spark, tmp_path):
    # the JSONL path feeds the same operators as parquet documents
    from binance_etl_clickhouse_spark.operators.text import quality_features

    p = tmp_path / "docs.jsonl"
    rows = [
        {"doc_id": i, "lang": "en", "text": f"the quick doc number {i} again", "n_chars": 30}
        for i in range(5)
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    clean, _ = partition_corrupt(read_documents_jsonl(spark, str(p)))
    feats = quality_features(clean)
    assert feats.count() == 5
    assert {f.name for f in feats.schema.fields} >= {"doc_id", "n_tokens", "quality_score"}


def test_csv_reader_quarantines_bad_width(spark, tmp_path):
    p = tmp_path / "drop.csv"
    p.write_text(
        "doc_id,lang,text,n_chars\n"
        "1,en,hello,5\n"
        "oops-a-bare-line\n"
        "2,de,welt,4\n"
    )
    clean, bad = partition_corrupt(read_documents_csv(spark, str(p)))
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    assert bad.count() == 1


def test_partition_corrupt_no_persist_splits_identically(spark, tmp_path):
    """persist=False (the per-micro-batch mode: no releasable cache handle
    would otherwise leak one cached dataset per batch) must split exactly
    like the cached default on a materialized frame."""
    import json

    p = tmp_path / "docs.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps({"doc_id": 1, "lang": "en", "text": "a", "n_chars": 1}) + "\n")
        f.write("{not json\n")
    parsed = read_documents_jsonl(spark, str(p))
    # materialize first (foreachBatch shape) so the corrupt-column
    # restriction on raw scans doesn't apply
    frozen = spark.createDataFrame(parsed.collect(), parsed.schema)
    clean, bad = partition_corrupt(frozen, persist=False)
    assert [r.doc_id for r in clean.collect()] == [1]
    assert bad.count() == 1
