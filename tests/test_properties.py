"""Semantics pinned against independent references.

Hypothesis drives only pure-Python components (a failing Spark-backed
property would shrink with one Spark job per step — pathological). The
Spark operators get deterministic adversarial tables checked against pandas
references instead: ties, duplicates, empty matches, single elements.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from binance_etl_clickhouse_spark.operators.asof import asof_join
from binance_etl_clickhouse_spark.operators.dedup import keep_last
from binance_etl_clickhouse_spark.sources.ratelimit import TokenBucket

# ---------------------------------------------------------------------------
# keep-last vs pandas drop_duplicates(keep='last') — adversarial cases:
# all-same-key, version ties broken by arrival, interleaved keys, singletons.
# ---------------------------------------------------------------------------
KEEP_LAST_CASES = [
    # (key, version, arrival, payload)
    [(1, 0, 0, 10), (1, 0, 1, 11), (1, 0, 2, 12)],  # pure ties -> arrival wins
    [(1, 5, 0, 10), (1, 1, 1, 11)],  # later arrival, older version -> version wins
    [(1, 0, 0, 1), (2, 0, 1, 2), (1, 1, 2, 3), (2, 1, 3, 4), (3, 9, 4, 5)],
    [(7, 3, 0, 42)],  # singleton
    [(1, 2, 0, 1), (1, 2, 1, 2), (2, 2, 2, 3), (2, 3, 3, 4), (1, 0, 4, 5)],
]


@pytest.mark.parametrize("data", KEEP_LAST_CASES)
def test_keep_last_matches_pandas_reference(spark, data):
    df = spark.createDataFrame(data, "k long, v long, arrival long, payload long")
    got = {
        r.k: (r.v, r.arrival, r.payload)
        for r in keep_last(df, ["k"], ["v", "arrival"]).collect()
    }
    pdf = pd.DataFrame(data, columns=["k", "v", "arrival", "payload"])
    expect = {
        r.k: (r.v, r.arrival, r.payload)
        for r in pdf.sort_values(["v", "arrival"])
        .drop_duplicates(subset=["k"], keep="last")
        .itertuples()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# as-of join vs pd.merge_asof (backward, inclusive) — adversarial cases:
# left before any right (no match), exact-equal timestamps, right after all
# left, dense/sparse interleavings.
# ---------------------------------------------------------------------------
ASOF_CASES = [
    # (left_ts_seconds, right_ts_seconds)
    ([5, 10, 15], [0, 10, 20]),  # exact match at 10 must be taken (inclusive)
    ([1, 2], [10, 20]),  # no match for any left row
    ([30, 40], [0, 1, 2]),  # all rights old: last one wins for both
    ([7], [7]),  # single exact equality
    ([0, 50, 100], [0, 49, 50, 99]),
]


@pytest.mark.parametrize("left_ts,right_ts", ASOF_CASES)
def test_asof_join_matches_merge_asof(spark, left_ts, right_ts):
    lpdf = pd.DataFrame(
        {"k": 1, "ts": pd.to_datetime(sorted(left_ts), unit="s"), "lv": range(len(left_ts))}
    )
    rpdf = pd.DataFrame({"k": 1, "ts": pd.to_datetime(sorted(right_ts), unit="s")})
    rpdf["rv"] = rpdf["ts"].astype("int64")
    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)
    got = (
        asof_join(left, right, on="ts", by=["k"], value_cols=["rv"]).orderBy("lv").collect()
    )
    expect = pd.merge_asof(lpdf, rpdf, on="ts", by="k")  # backward, inclusive
    assert len(got) == len(expect)
    for row, (_, erow) in zip(got, expect.iterrows()):
        ev = erow["rv"]
        if pd.isna(ev):
            assert row.rv_asof is None
        else:
            assert row.rv_asof == int(ev)


# ---------------------------------------------------------------------------
# Token bucket: pure Python -> full hypothesis treatment.
# ---------------------------------------------------------------------------
@given(
    calls=st.integers(1, 20),
    period=st.floats(0.1, 10.0),
    n_acquires=st.integers(1, 60),
)
@settings(max_examples=50, deadline=None)
def test_token_bucket_never_exceeds_budget(calls, period, n_acquires):
    t = [0.0]
    bucket = TokenBucket(
        calls, period, clock=lambda: t[0], sleeper=lambda s: t.__setitem__(0, t[0] + s)
    )
    stamps = []
    for _ in range(n_acquires):
        bucket.acquire()
        stamps.append(t[0])
    # in any window starting at an acquisition, at most `calls` further
    # acquisitions complete within `period` (+1 boundary tolerance)
    for s in stamps:
        in_window = [x for x in stamps if s < x <= s + period]
        assert len(in_window) <= calls + 1


# ---------------------------------------------------------------------------
# span_dedup vs a sequential pure-Python reference: global first-occurrence
# over (doc_id, pos) with within-doc repeats, ragged tails, whole-doc dups.
# ---------------------------------------------------------------------------
def _span_dedup_ref(docs: list[tuple[int, str]], k: int) -> dict[int, tuple[int, int, str]]:
    seen: set[str] = set()
    out = {}
    for doc_id, text in sorted(docs):
        w = text.split(" ")
        spans = [" ".join(w[i : i + k]) for i in range(0, len(w), k)]
        kept = [s for s in spans if s not in seen and not seen.add(s)]
        out[doc_id] = (len(spans), len(kept), " ".join(kept))
    return out


SPAN_CASES = [
    # ragged tail is its own span; "c" tail != "c d" span
    [(0, "a b c"), (1, "a b c d")],
    # whole-doc duplicate + within-doc repetition
    [(0, "x y x y x y"), (1, "x y"), (2, "p q x y")],
    # single tokens, all distinct vs all same
    [(0, "a"), (1, "a"), (2, "b")],
    # interleaved overlap: doc order decides the winner
    [(2, "m n o p"), (0, "m n"), (1, "o p m n")],
]


@pytest.mark.parametrize("docs", SPAN_CASES)
def test_span_dedup_matches_sequential_reference(spark, docs):
    from binance_etl_clickhouse_spark.operators.corpus import span_dedup

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_spans_total, r.n_spans_kept, r.text_deduped)
        for r in span_dedup(df, k=2).collect()
    }
    assert got == _span_dedup_ref(docs, k=2)


# ---------------------------------------------------------------------------
# funnel_stages vs a sequential reference: strict order, window cap,
# earliest-QUALIFYING anchoring, multi-stage chains.
# ---------------------------------------------------------------------------
def _funnel_ref(events, stages, within=None):
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, t, ts in events:
        by_user[u].append((t, ts))
    counts = [0] * len(stages)
    for evs in by_user.values():
        s0 = [ts for t, ts in evs if t == stages[0]]
        if not s0:
            continue
        counts[0] += 1
        t_prev = min(s0)
        for i, stage in enumerate(stages[1:], start=1):
            cand = [
                ts
                for t, ts in evs
                if t == stage and ts > t_prev and (within is None or ts <= t_prev + within)
            ]
            if not cand:
                break
            t_prev = min(cand)
            counts[i] += 1
    return counts


FUNNEL_CASES = [
    # chain where the middle stage's earliest event predates stage 0
    ([(1, "a", 5.0), (1, "b", 1.0), (1, "b", 7.0), (1, "c", 9.0)], None),
    # exact-tie timestamps never convert (strict >)
    ([(1, "a", 5.0), (1, "b", 5.0)], None),
    # window cap: qualifying b exists but outside the window
    ([(1, "a", 0.0), (1, "b", 100.0)], 50),
    # anchoring: first b in-window anchors c's window, not a later b
    ([(1, "a", 0.0), (1, "b", 10.0), (1, "b", 40.0), (1, "c", 45.0)], 40),
    # multiple users at different depths
    (
        [
            (1, "a", 0.0), (1, "b", 1.0), (1, "c", 2.0),
            (2, "a", 0.0), (2, "c", 1.0),
            (3, "b", 0.0), (3, "a", 1.0),
        ],
        None,
    ),
]


@pytest.mark.parametrize("events,within", FUNNEL_CASES)
def test_funnel_matches_sequential_reference(spark, events, within):
    from binance_etl_clickhouse_spark.operators.funnel import funnel_stages

    rows = [(u, t, float(ts)) for u, t, ts in events]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, sec double"
    ).selectExpr("user_id", "event_type", "timestamp_seconds(sec) AS ts")
    got = {
        r.stage_idx: r.n_users
        for r in funnel_stages(
            df, ["a", "b", "c"], within_seconds=within
        ).collect()
    }
    want = _funnel_ref(events, ["a", "b", "c"], within)
    assert [got.get(i, 0) for i in range(3)] == want


# ---------------------------------------------------------------------------
# substring_dedup vs a sequential reference: stride-1 windows, global
# first-occurrence order by (doc_id, pos), union of later occurrences'
# position ranges removed, in-order reassembly.
# ---------------------------------------------------------------------------
def _substring_dedup_ref(docs, L):
    seen: dict[str, tuple[int, int]] = {}
    removed: dict[int, set] = {d: set() for d, _ in docs}
    for doc_id, text in sorted(docs):
        w = text.split(" ")
        for pos in range(1, len(w) - L + 2):
            win = " ".join(w[pos - 1 : pos - 1 + L])
            if win in seen:
                removed[doc_id].update(range(pos, pos + L))
            else:
                seen[win] = (doc_id, pos)
    out = {}
    for doc_id, text in docs:
        w = text.split(" ")
        rset = removed[doc_id]
        kept = [w[p - 1] for p in range(1, len(w) + 1) if p not in rset]
        out[doc_id] = (len(w), len(rset), " ".join(kept))
    return out


SUBSTRING_CASES = [
    # misaligned duplicate run across docs
    [(0, "a b c d e"), (1, "z a b c d y")],
    # overlapping dup windows merge into one removed region
    [(0, "a b c d"), (1, "x a b c d e f")],
    # within-doc repeat at distance; short doc untouched
    [(0, "m n o t m n o"), (1, "m n")],
    # doc order (not input order) decides the first occurrence
    [(5, "a b c"), (2, "a b c")],
    # full duplicate collapses to empty text
    [(0, "p q r s"), (1, "p q r s")],
]


@pytest.mark.parametrize("docs", SUBSTRING_CASES)
def test_substring_dedup_matches_sequential_reference(spark, docs):
    from binance_etl_clickhouse_spark.operators.corpus import substring_dedup

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.text_deduped)
        for r in substring_dedup(df, min_len=3).collect()
    }
    assert got == _substring_dedup_ref(docs, L=3)


def test_substring_dedup_matches_reference_on_random_corpus(spark):
    """Seeded random corpus (tiny alphabet -> dense collisions), ONE Spark
    call, exact match against the sequential reference."""
    import random

    from binance_etl_clickhouse_spark.operators.corpus import substring_dedup

    rng = random.Random(7)
    docs = [
        (d, " ".join(rng.choice("abc") for _ in range(rng.randint(1, 30))))
        for d in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.text_deduped)
        for r in substring_dedup(df, min_len=4).collect()
    }
    assert got == _substring_dedup_ref(docs, L=4)


# ---------------------------------------------------------------------------
# neardup_clusters two-regime equivalence: the driver-side union-find (the
# default) and the distributed min-label loop must label ANY pair graph
# identically — and both must equal a pure-Python transitive closure.
# Adversarial shapes: chains (deep diameter), cliques-by-transitivity,
# singleton docs, isolated pairs, merged components.
# ---------------------------------------------------------------------------
CLUSTER_CASES = [
    [],  # no pairs: every doc its own singleton cluster
    [(0, 1)],  # one isolated pair
    [(0, 1), (1, 2), (2, 3), (3, 4)],  # chain, diameter 4
    [(0, 1), (2, 3), (1, 2)],  # two pairs merged by a bridge
    [(5, 9), (9, 7), (7, 5)],  # triangle stated redundantly
    [(0, 9), (1, 8), (2, 7), (8, 9)],  # star-ish merge of two components
]


@pytest.mark.parametrize("edges", CLUSTER_CASES)
def test_neardup_cluster_regimes_match_reference(spark, edges):
    from binance_etl_clickhouse_spark.operators.neardup import neardup_clusters

    n_docs = 10
    docs = spark.createDataFrame([(i,) for i in range(n_docs)], "doc_id long")
    pairs_df = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(0, 0)], "d1 long, d2 long"
    )
    if not edges:
        pairs_df = pairs_df.filter("d1 <> d2")  # empty frame, typed

    # pure-Python reference: transitive closure, min id per component
    ref = {i: i for i in range(n_docs)}
    changed = True
    while changed:
        changed = False
        for a, b in edges:
            m = min(ref[a], ref[b])
            if ref[a] != m or ref[b] != m:
                ref[a] = ref[b] = m
                changed = True
            # propagate through shared labels
            for k, v in list(ref.items()):
                mv = ref[v]
                if mv < v and ref[k] != mv:
                    ref[k] = mv
                    changed = True
    sizes: dict[int, int] = {}
    for v in ref.values():
        sizes[v] = sizes.get(v, 0) + 1
    expected = {(k, v, sizes[v]) for k, v in ref.items()}

    local = {
        (r.doc_id, r.cluster_id, r.cluster_size)
        for r in neardup_clusters(docs, pairs_df).collect()
    }
    dist = {
        (r.doc_id, r.cluster_id, r.cluster_size)
        for r in neardup_clusters(docs, pairs_df, driver_max_edges=0).collect()
    }
    assert local == expected
    assert dist == expected
