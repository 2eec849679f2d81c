"""r10 fuzz: the round's new parser surfaces, property-tested.

- Enum spec round-trip: parse -> print -> parse is the identity for any
  valid spec (the SHOW CREATE fidelity path).
- _split_top_level: generic angle-bracket runs (map<...>, arbitrary
  nesting) are depth-protected, while bare comparisons in DEFAULT
  expressions stay ordinary characters — for ANY mix of the two.
- LIMIT BY: every (offset-spelling x group-spelling x ORDER BY) combo
  rewrites to the window form with the right keep-band, idempotently.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from binance_etl_clickhouse_spark.dialect import translate_clickhouse_sql
from binance_etl_clickhouse_spark.dialect_ddl import (
    _split_top_level,
    ch_type_to_spark,
    enum_type_text,
    parse_enum_type,
)

_names = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=8
)


@st.composite
def enum_specs(draw):
    width = draw(st.sampled_from([8, 16]))
    lo, hi = (-128, 127) if width == 8 else (-32768, 32767)
    n = draw(st.integers(1, 6))
    names = draw(
        st.lists(_names, min_size=n, max_size=n, unique=True)
    )
    codes = draw(
        st.lists(
            st.integers(lo, hi), min_size=n, max_size=n, unique=True
        )
    )
    return width, dict(zip(names, codes))


@given(enum_specs())
@settings(max_examples=200, deadline=None)
def test_enum_spec_roundtrip(spec):
    width, values = spec
    text = enum_type_text(width, values)
    assert parse_enum_type(text) == (width, values)
    assert ch_type_to_spark(text) == "string"


# -- generic-run protection in _split_top_level ---------------------------

_simple = st.sampled_from(["bigint", "int", "string", "double"])


@st.composite
def generic_types(draw, depth=2):
    if depth == 0:
        return draw(_simple)
    kind = draw(st.sampled_from(["simple", "array", "map"]))
    if kind == "simple":
        return draw(_simple)
    if kind == "array":
        return f"array<{draw(generic_types(depth=depth - 1))}>"
    k = draw(_simple)
    v = draw(generic_types(depth=depth - 1))
    return f"map<{k},{v}>"


@st.composite
def coldefs(draw):
    name = draw(_names)
    typ = draw(generic_types())
    dflt = draw(
        st.sampled_from(
            [None, "1", "x < 2", "y > 1", "if(a > b, 1, 2)", "'lit,txt'"]
        )
    )
    text = f"{name} {typ}"
    if dflt is not None:
        text += f" DEFAULT {dflt}"
    return text


@given(st.lists(coldefs(), min_size=1, max_size=6))
@settings(max_examples=200, deadline=None)
def test_split_top_level_protects_generic_runs(defs):
    joined = ", ".join(defs)
    assert _split_top_level(joined) == defs


@given(generic_types())
@settings(max_examples=200, deadline=None)
def test_spark_generic_spellings_are_idempotent(typ):
    # SHOW CREATE prints Spark names; re-running them through the CREATE
    # path must be the identity
    assert ch_type_to_spark(typ) == typ


# -- LIMIT BY spelling matrix ---------------------------------------------


@given(
    st.integers(1, 9),
    st.integers(0, 9),
    st.sampled_from(["comma", "offset", "plain"]),
    st.sampled_from(["bare", "paren", "two"]),
    st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_limit_by_spelling_matrix(n, m, off_form, group_form, with_order):
    cols = {"bare": "g", "paren": "(g)", "two": "g, h"}[group_form]
    order = "ORDER BY v DESC " if with_order else ""
    if off_form == "plain":
        clause, lo, hi = f"LIMIT {n} BY {cols}", 0, n
    elif off_form == "comma":
        clause, lo, hi = f"LIMIT {m}, {n} BY {cols}", m, m + n
    else:
        clause, lo, hi = f"LIMIT {n} OFFSET {m} BY {cols}", m, m + n
    q = f"SELECT g, h, v FROM t {order}{clause}"
    got = translate_clickhouse_sql(q)
    assert f"PARTITION BY {cols}" in got, got
    keep = (
        f"__lb_rn <= {hi}"
        if lo == 0
        else f"__lb_rn > {lo} AND __lb_rn <= {hi}"
    )
    assert keep in got, got
    if with_order:
        assert "ORDER BY v DESC" in got
    # idempotent: the rewritten text passes through unchanged
    assert translate_clickhouse_sql(got) == got
