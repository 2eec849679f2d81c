"""Property pins for entity resolution, data quality, and survival stats:
structural invariants beyond oracle parity that must hold at any scale."""

from __future__ import annotations

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
