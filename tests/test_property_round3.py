"""Hypothesis property tests for the round-3 operators: triangle stats vs
a brute-force enumerator on random graphs, session n-grams vs a Python
reference on random event streams, and EWMA's exact-dyadic invariant."""

from __future__ import annotations

import itertools
from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=0,
    max_size=25,
)


import pytest

# heavy property sweep / e2e tier (see pytest.ini): excluded from the
# default driver-window run, executed by the full tier at close-out
pytestmark = pytest.mark.slow


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edges_strategy)
def test_triangle_stats_property_matches_bruteforce(spark, edges):
    from unified_firmographic_data_pipeline_spark.operators.triangles import (
        triangle_stats,
    )

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    if not und:
        return  # empty graph: nothing to compare (agg would yield 0 rows)
    nodes = sorted({n for e in und for n in e})
    tri = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in und and (a, c) in und and (b, c) in und
    )
    deg: dict[int, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    wedges = sum(d * (d - 1) // 2 for d in deg.values())

    df = spark.createDataFrame(list(edges), "src long, dst long")
    row = triangle_stats(df, materialize=False).collect()[0]
    assert row["n_nodes"] == len(nodes)
    assert row["n_edges"] == len(und)
    assert row["n_wedges"] == wedges
    assert row["n_triangles"] == tri
    expect_cc = round(3.0 * tri / wedges, 6) if wedges else 0.0
    assert row["global_clustering"] == expect_cc


stream_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),       # user
        st.integers(min_value=0, max_value=7200),    # ts offset sec
        st.sampled_from(["a", "b", "c"]),            # step
    ),
    min_size=0,
    max_size=20,
    unique_by=lambda t: (t[0], t[1]),  # unique (user, ts): total order w/o id
)

BASE = datetime(2024, 1, 1)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=stream_strategy)
def test_session_ngrams_property_matches_reference(spark, rows):
    from unified_firmographic_data_pipeline_spark.operators.temporal import (
        session_ngrams,
    )

    GAP = 600  # 10 minutes
    ref: dict[str, int] = {}
    by_user: dict[int, list[tuple[int, str]]] = {}
    for u, s, t in rows:
        by_user.setdefault(u, []).append((s, t))
    for evs in by_user.values():
        evs.sort()
        sessions: list[list[str]] = []
        prev = None
        for s, t in evs:
            if prev is None or s - prev > GAP:
                sessions.append([])
            sessions[-1].append(t)
            prev = s
        for sess in sessions:
            for i in range(len(sess) - 1):
                path = ">".join(sess[i : i + 2])
                ref[path] = ref.get(path, 0) + 1

    df = spark.createDataFrame(
        [(u, i, BASE + timedelta(seconds=s), t) for i, (u, s, t) in enumerate(rows)],
        "user_id long, event_id long, ts timestamp, event_type string",
    )
    got = {
        r["path"]: r["n_occurrences"]
        for r in session_ngrams(
            df, key="user_id", ts="ts", n=2, gap="10 minutes"
        ).collect()
    }
    assert got == ref


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    counts=st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=30)
)
def test_ewma_property_exact_vs_python_reference(spark, counts):
    from unified_firmographic_data_pipeline_spark.operators.timeseries import (
        ewma_halflife1,
    )
    import datetime as dt

    W = 5
    base = dt.date(2024, 1, 1)
    df = spark.createDataFrame(
        [(base + dt.timedelta(days=i), c) for i, c in enumerate(counts)],
        "day date, cnt long",
    )
    got = {r["day"]: r["ewma"] for r in ewma_halflife1(df, window=W).collect()}
    for t in range(len(counts)):
        lo = max(0, t - W + 1)
        num = sum(counts[j] * 2.0 ** (j - t) for j in range(lo, t + 1))
        den = sum(2.0 ** (j - t) for j in range(lo, t + 1))
        assert got[base + dt.timedelta(days=t)] == num / den  # EXACT by design
