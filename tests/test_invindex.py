"""Materialized inverted index: index-answered BM25 is bit-identical to the
raw-corpus operator, the postings scan partition-prunes to the queried
terms' buckets, and rebuilds swap atomically."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.operators import corpus
from binance_etl_clickhouse_spark.operators.texthash import tokens
from binance_etl_clickhouse_spark.queries.corpus import BM25_QUERIES
from binance_etl_clickhouse_spark.storage.invindex import InvertedIndex

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _build(spark, tmp_path) -> InvertedIndex:
    idx = InvertedIndex(str(tmp_path / "inv"), n_buckets=64)
    idx.build(_docs(spark))
    return idx


def test_index_answer_matches_raw_corpus_bm25(spark, tmp_path):
    idx = _build(spark, tmp_path)
    got = idx.bm25_topk(spark, BM25_QUERIES, k=5).toPandas()
    docs = _docs(spark)
    stats = docs.select(
        F.count(F.lit(1)).alias("n"), F.sum(F.size(tokens("text"))).alias("t")
    ).first()
    want = corpus.bm25_topk(
        docs, BM25_QUERIES, n_docs=stats["n"], total_tokens=stats["t"], k=5
    ).toPandas()
    cols = ["query_id", "doc_id", "bm25", "rnk"]
    got = got[cols].sort_values(cols, ignore_index=True)
    want = want[cols].sort_values(cols, ignore_index=True)
    pd.testing.assert_frame_equal(got, want)  # bit-identical, incl. scores


def test_query_scan_partition_prunes_to_term_buckets(spark, tmp_path):
    idx = _build(spark, tmp_path)
    df = idx.bm25_topk(spark, [("q", "spark join")], k=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "tbucket" in plan
    # the term filter must ALSO push into the parquet scan within buckets
    assert "PushedFilters: [In(term" in plan or "PushedFilters: [IsNotNull(term" in plan
    # meta carries the corpus scalars
    m = idx.meta()
    assert m["n_docs"] == _docs(spark).count()


def test_rebuild_swaps_atomically_and_updates_stats(spark, tmp_path):
    idx = _build(spark, tmp_path)
    n0 = idx.meta()["n_docs"]
    # grow the corpus and rebuild — meta and answers follow the new corpus
    docs2 = _docs(spark).union(
        _docs(spark).withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
    )
    idx.build(docs2)
    assert idx.meta()["n_docs"] == 2 * n0
    got = idx.bm25_topk(spark, [("q", "table scan")], k=3)
    assert got.count() == 3


def test_incremental_append_equals_full_rebuild(spark, tmp_path):
    docs = _docs(spark)
    half1 = docs.filter(F.col("doc_id") % 2 == 0)
    half2 = docs.filter(F.col("doc_id") % 2 == 1)

    inc = InvertedIndex(str(tmp_path / "inc"), n_buckets=64)
    inc.build(half1)
    inc.append(half2)

    full = InvertedIndex(str(tmp_path / "full"), n_buckets=64)
    full.build(docs)

    assert inc.meta()["n_docs"] == full.meta()["n_docs"]
    assert inc.meta()["total_tokens"] == full.meta()["total_tokens"]
    a = inc.bm25_topk(spark, BM25_QUERIES, k=5).toPandas()
    b = full.bm25_topk(spark, BM25_QUERIES, k=5).toPandas()
    cols = ["query_id", "doc_id", "bm25", "rnk"]
    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols, ignore_index=True),
        b[cols].sort_values(cols, ignore_index=True),
    )


def test_epoch_append_replay_is_idempotent(spark, tmp_path):
    docs = _docs(spark)
    half1 = docs.filter(F.col("doc_id") % 2 == 0)
    half2 = docs.filter(F.col("doc_id") % 2 == 1)
    idx = InvertedIndex(str(tmp_path / "inv"), n_buckets=64)
    idx.build(half1)
    idx.append(half2, epoch=7)
    a = idx.bm25_topk(spark, BM25_QUERIES, k=5).toPandas()
    m1 = idx.meta()
    # checkpoint replay: the SAME epoch appends again — must converge
    idx.append(half2, epoch=7)
    b = idx.bm25_topk(spark, BM25_QUERIES, k=5).toPandas()
    assert idx.meta() == m1  # stats replaced, not double-counted
    cols = ["query_id", "doc_id", "bm25", "rnk"]
    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols, ignore_index=True),
        b[cols].sort_values(cols, ignore_index=True),
    )


def test_streaming_corpus_dedup_feeds_search_index(spark, tmp_path):
    """End-to-end ingestion story: JSONL drops stream in, near-dups are
    rejected, and every ACCEPTED doc becomes keyword-searchable — the
    search index equals a from-scratch build over the accepted corpus."""
    import json as _json

    from binance_etl_clickhouse_spark.streaming.jobs import stream_dedup_corpus

    in_dir = tmp_path / "drop"
    in_dir.mkdir()
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten eleven twelve"
    with open(in_dir / "b1.jsonl", "w") as f:
        for i, text in [(1, base), (2, base), (3, other)]:  # 2 dups 1
            f.write(
                _json.dumps(
                    {"doc_id": i, "lang": "en", "text": text, "n_chars": len(text)}
                )
                + "\n"
            )
    idx = InvertedIndex(str(tmp_path / "search"), n_buckets=16)
    idx.build(spark.createDataFrame([], "doc_id long, text string"))  # empty seed
    q = stream_dedup_corpus(
        spark,
        str(in_dir),
        str(tmp_path / "sigindex"),
        str(tmp_path / "corpus"),
        str(tmp_path / "ckpt"),
        search_index=idx,
    )
    q.awaitTermination(120)
    q.stop()

    accepted = spark.read.parquet(str(tmp_path / "corpus")).select("doc_id", "text")
    assert {r.doc_id for r in accepted.collect()} == {1, 3}
    assert idx.meta()["n_docs"] == 2
    got = idx.bm25_topk(spark, [("q1", "alpha beta"), ("q2", "seven eight")], k=2)
    rows = {(r.query_id, r.doc_id, r.rnk) for r in got.collect()}
    assert ("q1", 1, 1) in rows and ("q2", 3, 1) in rows

    # the streamed index answers identically to a from-scratch build
    full = InvertedIndex(str(tmp_path / "rebuild"), n_buckets=16)
    full.build(accepted)
    a = idx.bm25_topk(spark, [("q", "alpha nine")], k=3).toPandas()
    b = full.bm25_topk(spark, [("q", "alpha nine")], k=3).toPandas()
    cols = ["query_id", "doc_id", "bm25", "rnk"]
    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols, ignore_index=True),
        b[cols].sort_values(cols, ignore_index=True),
    )


def test_compact_merges_epochs_preserving_answers(spark, tmp_path):
    docs = _docs(spark)
    thirds = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    idx = InvertedIndex(str(tmp_path / "inv"), n_buckets=32)
    idx.build(thirds[0])
    idx.append(thirds[1])
    idx.append(thirds[2])
    before = idx.bm25_topk(spark, BM25_QUERIES, k=5).toPandas()
    tot = idx.meta()
    assert len(tot["epochs"]) == 3
    merged = idx.compact(spark)
    assert merged == 3
    after = idx.bm25_topk(spark, BM25_QUERIES, k=5).toPandas()
    m2 = idx.meta()
    assert len(m2["epochs"]) == 1
    assert (m2["n_docs"], m2["total_tokens"]) == (tot["n_docs"], tot["total_tokens"])
    cols = ["query_id", "doc_id", "bm25", "rnk"]
    import pandas as pd

    pd.testing.assert_frame_equal(
        before[cols].sort_values(cols, ignore_index=True),
        after[cols].sort_values(cols, ignore_index=True),
    )


def test_compact_crash_window_recovers_from_old(spark, tmp_path):
    """A crash between compact()'s two renames leaves the live path missing
    with the previous index parked in .old — the next open must heal it
    (same contract as ServingTable._recover), not FileNotFoundError."""
    import os

    idx = _build(spark, tmp_path)
    before = idx.meta()
    # simulate the mid-swap crash: live moved to .old, tmp never moved in
    os.replace(idx.path, idx.path + ".old")
    os.makedirs(idx.path + ".compact.tmp", exist_ok=True)  # stale debris
    healed = InvertedIndex(idx.path, n_buckets=64)
    assert healed.meta() == before
    assert not os.path.exists(idx.path + ".old")
    assert not os.path.exists(idx.path + ".compact.tmp")
    got = healed.bm25_topk(spark, BM25_QUERIES, k=5)
    assert got.count() > 0


def test_append_on_never_built_index_bootstraps(spark, tmp_path):
    """The streaming search_index flow starts from an empty dir: append()
    on a never-built path must bootstrap (empty meta, epoch 0), not die on
    a missing meta sidecar."""
    idx = InvertedIndex(str(tmp_path / "fresh"), n_buckets=64)
    idx.append(_docs(spark).limit(50), epoch=0)
    m = idx.meta()
    assert m["n_docs"] == 50 and m["epochs"].keys() == {"0"}
    got = idx.bm25_topk(spark, BM25_QUERIES, k=3)
    assert got.count() > 0
