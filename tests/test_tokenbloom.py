"""Token bloom skip index (tokenbf_v1 analogue): contains-token reads prune
files driver-side, never lose rows (bloom = false positives only), and fall
back to the full scan on a stale sidecar."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.operators.texthash import tokens
from binance_etl_clickhouse_spark.storage import tokenbloom as tb


def _corpus(spark, tmp_path) -> str:
    """8 files, each with a file-distinctive token (rare{g}) plus shared
    filler — so a rare-token lookup must prune most files."""
    rows = []
    for g in range(8):
        for i in range(20):
            rows.append((g, g * 100 + i, f"common filler rare{g} word{i % 5} text"))
    df = spark.createDataFrame(rows, "grp int, doc_id long, text string")
    path = str(tmp_path / "corpus")
    # co-locate each group in one file so a rare-token lookup CAN prune
    df.repartition(8, "grp").drop("grp").write.parquet(path)
    return path


def _true_files(spark, path, token):
    return {
        os.path.relpath(r.f.removeprefix("file:"), os.path.abspath(path)).lstrip("/")
        for r in spark.read.parquet(path)
        .filter(F.array_contains(tokens("text"), token))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }


def test_token_bloom_prunes_and_matches_full_scan(spark, tmp_path):
    path = _corpus(spark, tmp_path)
    idx = tb.build_token_bloom(spark, path)
    n_files = len(idx["files"])
    assert n_files >= 4

    pruned = tb.prune_files_with_token(idx, path, "rare3")
    assert pruned is not None
    # must keep every file truly containing the token (no false negatives)...
    true_rel = _true_files(spark, path, "rare3")
    kept_rel = {os.path.relpath(p, os.path.abspath(path)) for p in pruned}
    assert true_rel <= kept_rel
    # ...and actually prune (8 files, 1 real match, <1% bloom fp rate)
    assert len(pruned) < n_files

    got = tb.read_containing(spark, path, "rare3")
    want = spark.read.parquet(path).filter(F.array_contains(tokens("text"), "rare3"))
    assert sorted(r.doc_id for r in got.collect()) == sorted(
        r.doc_id for r in want.collect()
    )


def test_token_bloom_shared_token_keeps_all_data_files(spark, tmp_path):
    path = _corpus(spark, tmp_path)
    idx = tb.build_token_bloom(spark, path)
    pruned = tb.prune_files_with_token(idx, path, "common")
    assert pruned is not None
    # every file that truly has rows keeps (the token is in every doc);
    # zero-row part files carry an empty bloom and prune away
    true_rel = _true_files(spark, path, "common")
    kept_rel = {os.path.relpath(p, os.path.abspath(path)) for p in pruned}
    assert len(true_rel) >= 4 and kept_rel == true_rel


def test_token_bloom_absent_token_reads_nothing(spark, tmp_path):
    path = _corpus(spark, tmp_path)
    tb.build_token_bloom(spark, path)
    df = tb.read_containing(spark, path, "zz_not_a_token")
    assert df.count() == 0


def test_token_bloom_stale_sidecar_falls_back(spark, tmp_path):
    path = _corpus(spark, tmp_path)
    idx = tb.build_token_bloom(spark, path)
    victim = next(iter(idx["files"]))
    del idx["files"][victim]
    import json

    with open(os.path.join(path, tb.TOKENBLOOM_SIDECAR), "w") as f:
        json.dump(idx, f)
    assert tb.prune_files_with_token(tb.read_token_bloom(path), path, "rare3") is None
    got = tb.read_containing(spark, path, "rare3")  # full scan, still correct
    assert got.count() == 20


def test_token_bloom_adversarial_tokens_never_false_negative(spark, tmp_path):
    """Sign-bit words (a position with pos % 64 == 63 -> the OR'd long goes
    negative in the JVM), unicode, and the empty-string token must all
    survive the build -> JSON -> probe round trip (t88/t93/t111 were found
    by search to place a bit in slot 63)."""
    toks = ["t88", "t93", "t111", "naïve", "统计", ""]
    rows = [(i, " ".join([t, "pad"])) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "adv")
    df.coalesce(1).write.parquet(path)
    idx = tb.build_token_bloom(spark, path)
    for t in toks:
        pruned = tb.prune_files_with_token(idx, path, t)
        assert pruned, f"false negative for token {t!r}"
        got = tb.read_containing(spark, path, t)
        assert got.count() >= 1, f"read lost token {t!r}"


def test_prune_worth_it_bails_out_on_scattered_layout(spark, tmp_path):
    """r10 verdict item 5: a token present in ~every file (scattered
    layout) keeps ~every file — the explicit file-list plan only adds
    listing overhead (+0.09 s measured r10), so the read path must fall
    back to the plain directory scan. The pruner itself stays pure (its
    kept-list is the stats/telemetry surface)."""
    rows = [(i, f"common filler w{i % 5}") for i in range(160)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "scattered")
    df.repartition(8).write.parquet(path)  # round-robin: no empty files
    idx = tb.build_token_bloom(spark, path)
    pruned = tb.prune_files_with_token(idx, path, "common")
    assert pruned is not None  # pruner unchanged: reports the kept set
    assert len(pruned) == 8
    assert not tb.prune_worth_it(pruned, path)
    # stale fallback (None) is never "worth it"
    assert not tb.prune_worth_it(None, path)
    # empty kept list (absent token) IS worth it: reads nothing
    assert tb.prune_worth_it([], path)
    # a clustered corpus pruning 7 of 8 files IS worth it
    cpath = _corpus(spark, tmp_path)
    cidx = tb.build_token_bloom(spark, cpath)
    assert tb.prune_worth_it(
        tb.prune_files_with_token(cidx, cpath, "rare3"), cpath
    )
    # and the read path stays correct through the bail-out
    got = tb.read_containing(spark, path, "common")
    assert got.count() == 160


def test_ddl_read_containing_bails_out_but_stays_correct(spark, tmp_path):
    from binance_etl_clickhouse_spark.engine import AnalyticsEngine

    eng = AnalyticsEngine(
        spark, verbose=False, ddl_root=str(tmp_path / "ddl_bail")
    )
    eng.sql(
        "CREATE TABLE bt (doc_id Int64, text String) "
        "ENGINE = MergeTree ORDER BY (doc_id)",
        dialect="clickhouse",
    )
    eng.insert(
        "bt",
        [{"doc_id": i, "text": f"common filler rare{i % 2} w{i}"} for i in range(40)],
    )
    eng.sql(
        "ALTER TABLE bt ADD INDEX t_bf text TYPE tokenbf_v1(256, 3, 0)",
        dialect="clickhouse",
    )
    got = eng.ddl_catalog.read_containing("bt", "common")
    assert got.count() == 40
