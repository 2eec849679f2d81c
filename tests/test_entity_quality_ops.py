"""Property pins for entity resolution, data quality, and survival stats:
structural invariants beyond oracle parity that must hold at any scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Entity resolution
# ---------------------------------------------------------------------------
def _resolved(spark):
    from binance_etl_clickhouse_spark.queries.entity import (
        _pairs,
        _records,
        entity,
        _CC_ITERS,
    )

    records = _records(spark, SF)
    pairs = _pairs(records)
    return records, pairs, entity.resolve_entities(records, pairs, iters=_CC_ITERS)


def test_entity_every_record_gets_exactly_one_entity(spark):
    records, _, resolved = _resolved(spark)
    n_rec = records.count()
    assert resolved.count() == n_rec
    assert resolved.filter(F.col("entity_id").isNull()).count() == 0
    # entity ids are record ids (the component minimum), so every entity
    # id must itself be a known rid
    orphan_ids = (
        resolved.select(F.col("entity_id").alias("rid"))
        .distinct()
        .join(records.select("rid"), "rid", "left_anti")
        .count()
    )
    assert orphan_ids == 0


def test_entity_matched_pairs_share_entity_and_min_is_entity(spark):
    """Every verified match pair must land in the same entity (the pair IS
    an edge of the component), and each entity's id equals the min rid of
    its member set."""
    _, pairs, resolved = _resolved(spark)
    ent = resolved.select("rid", "entity_id")
    joined = (
        pairs.join(ent.withColumnRenamed("rid", "rid1").withColumnRenamed("entity_id", "e1"), "rid1")
        .join(ent.withColumnRenamed("rid", "rid2").withColumnRenamed("entity_id", "e2"), "rid2")
    )
    assert joined.filter(F.col("e1") != F.col("e2")).count() == 0
    mins = resolved.groupBy("entity_id").agg(F.min("rid").alias("min_rid"))
    assert mins.filter(F.col("entity_id") != F.col("min_rid")).count() == 0


def test_entity_singletons_keep_own_rid(spark):
    """Records appearing in no match pair must be their own entity."""
    records, pairs, resolved = _resolved(spark)
    on_pairs = (
        pairs.select(F.col("rid1").alias("rid"))
        .unionAll(pairs.select(F.col("rid2").alias("rid")))
        .distinct()
    )
    singles = resolved.join(on_pairs, "rid", "left_anti")
    assert singles.filter(F.col("entity_id") != F.col("rid")).count() == 0


def test_entity_match_pairs_within_block_and_threshold(spark):
    """Every emitted pair obeys the blocking key (same brand, same noun)
    and the edit-distance threshold, with rid1 < rid2."""
    from binance_etl_clickhouse_spark.queries.entity import _MAX_DIST

    _, pairs, _ = _resolved(spark)
    bad = pairs.filter(
        (F.col("rid1") >= F.col("rid2"))
        | (F.col("edit_dist") > _MAX_DIST)
        | (F.split("p_name1", " ").getItem(1) != F.split("p_name2", " ").getItem(1))
        | (F.levenshtein("p_name1", "p_name2") != F.col("edit_dist"))
    )
    assert bad.count() == 0


# ---------------------------------------------------------------------------
# Data quality
# ---------------------------------------------------------------------------
def test_dq_orphan_counts_match_anti_join(spark):
    """The left-join null-count formulation must equal the anti-join count
    it replaces (the two classic formulations of the same check)."""
    from binance_etl_clickhouse_spark.queries.quality import (
        _FK_EDGES,
        dq_referential_orphans,
    )
    from binance_etl_clickhouse_spark.tables import load_table

    got = {
        r["fk"]: r["n_orphans"]
        for r in dq_referential_orphans(spark, SF).collect()
    }
    for name, child, ck, parent, pk in _FK_EDGES:
        c = load_table(spark, SF, child)
        p = load_table(spark, SF, parent).select(pk).distinct()
        expect = c.join(p, c[ck] == p[pk], "left_anti").count()
        assert got[name] == expect, name


def test_dq_expectation_rates_bounded_and_consistent(spark):
    from binance_etl_clickhouse_spark.queries.quality import (
        _LINEITEM_RULES,
        dq_expectations_lineitem,
    )

    rows = dq_expectations_lineitem(spark, SF).collect()
    assert {r["rule"] for r in rows} == set(_LINEITEM_RULES)
    for r in rows:
        assert 0 <= r["n_violations"]
        assert 0.0 <= r["violation_rate"] <= 1.0


# ---------------------------------------------------------------------------
# Survival statistics
# ---------------------------------------------------------------------------
def test_kaplan_meier_invariants(spark):
    """S is a survival curve: starts <= 1, nonincreasing within a cohort;
    risk sets telescope (next at-risk = at-risk - events - censored); the
    cohort's first at-risk count equals its subject count."""
    from binance_etl_clickhouse_spark.queries.stats_eval import (
        kaplan_meier_click_to_purchase,
    )

    rows = sorted(
        kaplan_meier_click_to_purchase(spark, SF).collect(),
        key=lambda r: (r["cohort"], r["duration_days"]),
    )
    by_cohort: dict[int, list] = {}
    for r in rows:
        by_cohort.setdefault(r["cohort"], []).append(r)
    for cohort, rs in by_cohort.items():
        prev_s = 1.0 + 1e-9
        for r in rs:
            assert r["survival"] <= prev_s, (cohort, r)
            assert r["survival"] >= 0.0
            prev_s = r["survival"]
        for a, b in zip(rs, rs[1:]):
            assert (
                b["n_at_risk"] == a["n_at_risk"] - a["n_event"] - a["n_censored"]
            ), (a, b)
        assert rs[0]["n_at_risk"] == sum(
            r["n_event"] + r["n_censored"] for r in rs
        )


def test_logrank_expected_totals_balance(spark):
    """Summed over both cohorts the log-rank expectation equals the
    observed event total, so expected_1 must sit inside [0, total events]
    and chi2 must be finite and nonnegative."""
    import math

    from binance_etl_clickhouse_spark.queries.stats_eval import (
        logrank_cohort_survival,
        kaplan_meier_click_to_purchase,
    )

    lr = logrank_cohort_survival(spark, SF).collect()[0]
    km = kaplan_meier_click_to_purchase(spark, SF).collect()
    total_events = sum(r["n_event"] for r in km)
    obs1 = sum(r["n_event"] for r in km if r["cohort"] == 1)
    assert lr["observed_1"] == obs1
    assert 0.0 <= lr["expected_1"] <= total_events
    assert lr["chi2"] >= 0.0 and math.isfinite(lr["chi2"])


# ---------------------------------------------------------------------------
# Blocked fuzzy match vs pure-Python brute force (adversarial cases)
# ---------------------------------------------------------------------------
def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


# (id, name, brand) — covers: transitive chains within a block, the
# threshold boundary, identical names in DIFFERENT blocks (must not match),
# exact duplicates (collapse to one record), singletons
ENTITY_CASES = [
    [
        (1, "cold widget", "B1"),
        (2, "bold widget", "B1"),  # dist 1 to cold -> chain link
        (3, "bolt widget", "B1"),  # dist 1 to bold, 2 to cold -> transitive
        (4, "cold widget", "B2"),  # same name, other block: no match
        (5, "warm widget", "B1"),  # dist > 1 to all: singleton
        (6, "cold widget", "B1"),  # exact dup of 1 -> same record
    ],
    [
        (10, "red gear", "B1"),
        (11, "red gears", "B1"),  # insertion at the end, dist 1 -- same noun? no: 'gears' != 'gear'
        (12, "red gear", "B1"),
    ],
    [(42, "lone anvil", "B9")],  # single record corpus
]


def _brute_entities(rows, max_dist=1):
    """Pure-Python reference: collapse, block on (noun, brand), match,
    union-find, component-min entity per record key."""
    rec = {}
    for rid, name, brand in rows:
        key = (name, brand)
        rec[key] = min(rec.get(key, rid), rid)
    ids = {key: rid for key, rid in rec.items()}
    parent = {r: r for r in ids.values()}

    def find(x):
        while parent[x] != x:
            x = parent[x]
        return x

    keys = list(ids)
    for i, k1 in enumerate(keys):
        for k2 in keys[i + 1 :]:
            (n1, b1), (n2, b2) = k1, k2
            if b1 != b2 or n1.split(" ")[1] != n2.split(" ")[1]:
                continue
            if _lev(n1, n2) <= max_dist:
                ra, rb = find(ids[k1]), find(ids[k2])
                parent[max(ra, rb)] = min(ra, rb)
    return {ids[k]: find(ids[k]) for k in keys}


@pytest.mark.parametrize("rows", ENTITY_CASES)
def test_blocked_match_resolution_matches_brute_force(spark, rows):
    import pytest as _pytest  # noqa: F401

    from binance_etl_clickhouse_spark.operators import entity
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "p_partkey long, p_name string, p_brand string")
    records = entity.canonical_records(df, ["p_name", "p_brand"], "p_partkey")
    blocked = records.withColumn("noun", F.split("p_name", " ").getItem(1))
    pairs = entity.blocked_match_pairs(blocked, ["noun", "p_brand"], "p_name", max_dist=1)
    resolved = entity.resolve_entities(records, pairs, iters=4)
    got = {r.rid: r.entity_id for r in resolved.collect()}
    assert got == _brute_entities(rows)
