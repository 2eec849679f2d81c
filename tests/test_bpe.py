"""BPE tokenizer family: fold-merge semantics, exact trainer parity with
the pure-Python reference (the pytest oracle for the iterative queries),
dictionary-join encoding, and the plan shapes that matter at scale."""

from __future__ import annotations

import os
from collections import Counter

from binance_etl_clickhouse_spark.operators import bpe
from binance_etl_clickhouse_spark.queries import QUERIES

# sf0.001 by default; RUN_SF001=1 upshifts to the driver's sf0.01 scale,
# mirroring tests/test_oracle_parity.py
SF = (
    "/root/testdata/sf0.01" if os.environ.get("RUN_SF001") else "/root/testdata/sf0.001"
)


def _docs(spark):
    from binance_etl_clickhouse_spark.tables import load_table

    return load_table(spark, SF, "documents")


def _py_word_counts(spark) -> dict[str, int]:
    texts = [r["text"] for r in _docs(spark).select("text").collect()]
    cnt: Counter[str] = Counter()
    for t in texts:
        cnt.update(w for w in t.split(" ") if w)
    return dict(cnt)


def test_merge_pair_fold_semantics(spark):
    rows = [
        (["a", "a", "a"],),  # overlapping pair resolves leftmost-first
        (["a", "b", "a", "b"],),
        (["b", "a"],),  # no occurrence -> unchanged
        (["a"],),  # single symbol -> unchanged
        ([],),  # empty -> empty
    ]
    df = spark.createDataFrame(rows, "syms array<string>")
    got = [r["m"] for r in df.select(bpe.merge_pair_expr("syms", "a", "a").alias("m")).collect()]
    assert got[0] == ["aa", "a"]
    got_ab = [
        r["m"] for r in df.select(bpe.merge_pair_expr("syms", "a", "b").alias("m")).collect()
    ]
    assert got_ab[1] == ["ab", "ab"]
    assert got_ab[2] == ["b", "a"]
    assert got_ab[3] == ["a"]
    assert got_ab[4] == []
    # Spark fold == Python fold on every case
    for (syms,), spark_out in zip(rows, got):
        assert bpe.py_merge(syms, "a", "a") == spark_out


def test_chars_with_eow(spark):
    df = spark.createDataFrame([("abc",), ("x",)], "word string")
    got = [r["s"] for r in df.select(bpe.chars_with_eow("word").alias("s")).collect()]
    assert got == [["a", "b", "c", bpe.EOW], ["x", bpe.EOW]]


def test_train_matches_python_reference(spark):
    """The distributed trainer reproduces the single-process reference
    merge-for-merge (order, pair, AND frequency) on real corpus data."""
    wc = _py_word_counts(spark)
    ref_merges, _ = bpe.reference_bpe(wc, n_merges=12)
    model = bpe.train_bpe(_docs(spark), n_merges=12)
    assert model.merges == ref_merges
    assert len(model.merges) == 12  # corpus is rich enough to learn all 12


def test_trained_dictionary_matches_reference(spark):
    wc = _py_word_counts(spark)
    _, ref_words = bpe.reference_bpe(wc, n_merges=8)
    model = bpe.train_bpe(_docs(spark), n_merges=8)
    got = {r["word"]: r["syms"] for r in model.words.collect()}
    assert got == ref_words


def test_encode_token_counts_matches_reference(spark):
    wc = _py_word_counts(spark)
    _, ref_words = bpe.reference_bpe(wc, n_merges=12)
    model = bpe.train_bpe(_docs(spark), n_merges=12)
    got = {
        r["doc_id"]: (r["n_bpe_tokens"], r["n_words"])
        for r in bpe.encode_token_counts(_docs(spark), model).collect()
    }
    for r in _docs(spark).select("doc_id", "text").collect():
        words = [w for w in r["text"].split(" ") if w]
        want = (sum(len(ref_words[w]) for w in words), len(words))
        assert got[r["doc_id"]] == want


def test_early_stop_below_min_freq(spark):
    df = spark.createDataFrame([("ab zz",)], "text string")
    # every pair occurs exactly once -> min_freq=2 learns nothing
    model = bpe.train_bpe(df, n_merges=5, min_freq=2)
    assert model.merges == []


def test_pair_stats_plan_partial_agg_no_join(spark):
    plan = (
        QUERIES["bpe_pair_stats"]
        .spark(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # both the word count and the pair count aggregate map-side first
    assert plan.count("HashAggregate") >= 4


def test_token_counts_plan_dict_join_no_nested_loop(spark):
    plan = (
        QUERIES["bpe_token_counts_traced"]
        .spark(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan  # dictionary equi-join, broadcast at this scale


def test_encode_counts_oov_corpus_not_dropped(spark):
    """ADVICE r2: encoding a DIFFERENT corpus than the training one must
    not silently drop OOV words — their counts come from replaying the
    learned merges over the unseen words (reference-BPE behavior)."""
    from binance_etl_clickhouse_spark.operators.bpe import (
        encode_token_counts,
        py_merge,
        reference_bpe,
        train_bpe,
        EOW,
    )

    train = spark.createDataFrame(
        [(1, "low lower lowest low low newer newer new")],
        "doc_id long, text string",
    )
    model = train_bpe(train, n_merges=6, min_freq=2)

    # encode a corpus with OOV words ("slow", "newest" unseen in training)
    enc = spark.createDataFrame(
        [(10, "low slow newest"), (11, "slow slow")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_bpe_tokens, r.n_words)
           for r in encode_token_counts(enc, model).collect()}
    # every word must be counted
    assert got[10][1] == 3 and got[11][1] == 2

    # exact expectation: reference BPE replay over each word
    merges = [(l, r) for l, r, _ in model.merges]

    def ref_count(word):
        syms = list(word) + [EOW]
        for l, r in merges:
            syms = py_merge(syms, l, r)
        return len(syms)

    assert got[10][0] == ref_count("low") + ref_count("slow") + ref_count("newest")
    assert got[11][0] == 2 * ref_count("slow")


def test_traced_trainer_oracle_stop_semantics():
    """The bpe_train_merges_traced oracle encodes the trainer's min_freq=2
    early stop as a per-round WHERE that empties every later round. Pin
    that unroll against reference_bpe on a corpus engineered to stop
    BEFORE the 8-merge budget — the shipped corpora never stop early, so
    driver parity alone cannot exercise this path."""
    import duckdb

    from binance_etl_clickhouse_spark.queries.llm import (
        _BPE_TRAINED_BUDGET,
        _bpe_trace_oracle,
    )

    # 'aaab' x3 -> (a,a) freq 6 then (aa,a) 3, (aaa,b) 3, (b,</w>) 3,
    # then every remaining pair is unique -> stops at 4 merges
    texts = ["aaab aaab aaab", "xy", "pq"]
    word_cnt = Counter(w for t in texts for w in t.split(" ") if w)
    ref_merges, _ = bpe.reference_bpe(
        dict(word_cnt), n_merges=_BPE_TRAINED_BUDGET, min_freq=2
    )
    assert 0 < len(ref_merges) < _BPE_TRAINED_BUDGET  # the stop engages

    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES " +
                ", ".join(f"('{t}')" for t in texts) + ") v(text)")
    sql = _bpe_trace_oracle(
        rounds=_BPE_TRAINED_BUDGET, round_alias="rank",
        with_merged=True, min_freq=2,
    )
    got = con.execute(f"SELECT * FROM ({sql}) ORDER BY rank").fetchall()
    want = [
        (i + 1, left, right, left + right, freq)
        for i, (left, right, freq) in enumerate(ref_merges)
    ]
    assert got == want
