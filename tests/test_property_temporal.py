"""Property-based checks (hypothesis): the scalable temporal operators must
agree with brute-force references on arbitrary small inputs.

Few examples, deadline off — each example runs Spark jobs; the value is in
randomized shapes (dup timestamps, empty sides, single keys), not volume.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from unified_firmographic_data_pipeline_spark.operators.temporal import (
    asof_join,
    range_join_binned,
)

BASE = datetime(2024, 1, 1)

events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # key
        st.integers(min_value=0, max_value=5000),   # ts offset seconds
    ),
    min_size=0,
    max_size=15,
)


def _mk(spark, rows, cols):
    schema = ", ".join(f"{c} {'long' if c != 'ts' else 'timestamp'}" for c in cols)
    return spark.createDataFrame(rows, schema)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=events, right=events)
def test_asof_join_matches_bruteforce(spark, left, right):
    lrows = [(k, BASE + timedelta(seconds=s), i) for i, (k, s) in enumerate(left)]
    rrows = [(k, BASE + timedelta(seconds=s), i) for i, (k, s) in enumerate(right)]
    ldf = spark.createDataFrame(lrows, "key long, ts timestamp, lid long")
    rdf = spark.createDataFrame(rrows, "key long, ts timestamp, rid long")
    got = {
        r["lid"]: r["rid_asof"]
        for r in asof_join(ldf, rdf, key="key", ts="ts", tiebreak="rid").collect()
    }
    for k, ts, lid in lrows:
        cands = [(rts, rid) for rk, rts, rid in rrows if rk == k and rts <= ts]
        want = max(cands)[1] if cands else None  # latest ts, tiebreak max rid
        assert got[lid] == want, (lid, got[lid], want)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(pts=events, ivals=st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=5000),
        st.integers(min_value=0, max_value=4000),  # interval length seconds
    ),
    min_size=0, max_size=10,
))
def test_range_join_binned_matches_bruteforce(spark, pts, ivals):
    prows = [(k, BASE + timedelta(seconds=s), i) for i, (k, s) in enumerate(pts)]
    irows = [
        (k, BASE + timedelta(seconds=s), BASE + timedelta(seconds=s + ln), i)
        for i, (k, s, ln) in enumerate(ivals)
    ]
    pdf = spark.createDataFrame(prows, "key long, pts timestamp, pid long")
    idf = spark.createDataFrame(irows, "key long, istart timestamp, iend timestamp, iid long")
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join_binned(
            pdf, idf, left_ts="pts", right_start="istart", right_end="iend",
            bin_width_s=600, keys=["key"],
        ).collect()
    )
    want = sorted(
        (pid, iid)
        for pk, pts_, pid in prows
        for ik, istart, iend, iid in irows
        if pk == ik and istart <= pts_ < iend
    )
    assert got == want
