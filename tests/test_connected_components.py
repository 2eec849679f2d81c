"""Convergence semantics of the three connected-component forms.

The failure mode these tests pin: a component whose diameter exceeds a
fixed iteration cap silently SPLITS under k-bounded propagation — and
because the DuckDB oracle truncates identically, the parity suite can
never catch it. The convergent forms must not split, and must fail
loudly (never return partial labels) when their round cap is hit.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from binance_etl_clickhouse_spark.operators import graph
from binance_etl_clickhouse_spark.operators.entity import resolve_entities


def _path_edges(spark, n):
    """A path graph 0-1-2-...-n (diameter n)."""
    return spark.createDataFrame(
        [(i, i + 1, 1) for i in range(n)], ["src", "dst", "w"]
    )


def _components(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.component, set()).add(r.part_key)
    return out


def test_fixed_k_splits_long_chain_but_converged_does_not(spark):
    edges = _path_edges(spark, 12)  # diameter 12 >> 4 rounds
    fixed = _components(graph.connected_components(edges, iters=4))
    assert len(fixed) > 1  # the documented k-bounded truncation
    conv = _components(graph.connected_components_converged(edges))
    assert len(conv) == 1 and conv[0] == set(range(13))


def test_lsss_exact_on_long_chain_and_multi_component(spark):
    # chain 0..12 plus a separate triangle 100-101-102 and an edge 200-201
    rows = [(i, i + 1, 1) for i in range(12)]
    rows += [(100, 101, 1), (101, 102, 1), (100, 102, 1), (200, 201, 1)]
    edges = spark.createDataFrame(rows, ["src", "dst", "w"])
    comp = _components(graph.connected_components_lsss(edges))
    assert comp == {
        0: set(range(13)),
        100: {100, 101, 102},
        200: {200, 201},
    }


def test_converged_raises_past_round_cap(spark):
    edges = _path_edges(spark, 8)
    with pytest.raises(RuntimeError, match="no fixpoint"):
        graph.connected_components_converged(edges, max_rounds=2).collect()


def test_resolve_entities_converged_by_default(spark):
    """A 6-record match chain (diameter 5): fixed iters=3 splits it into
    two entities; the default (converged) resolves one entity, and
    singletons keep their own rid either way."""
    records = spark.createDataFrame(
        [(i, f"rec {i}", 1) for i in range(6)] + [(99, "lonely", 1)],
        ["rid", "p_name", "n_rows"],
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], ["rid1", "rid2"]
    )
    fixed = resolve_entities(records, pairs, iters=3)
    assert fixed.select("entity_id").distinct().count() > 2
    conv = resolve_entities(records, pairs)
    got = {r.rid: r.entity_id for r in conv.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 0, 99: 99}
