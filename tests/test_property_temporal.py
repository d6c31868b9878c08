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

import pytest

# heavy property sweep / e2e tier (see pytest.ini): excluded from the
# default driver-window run, executed by the full tier at close-out
pytestmark = pytest.mark.slow


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


# ----------------------------------------------------------------- SCD2 ----

scd_runs = st.lists(
    # one run = {key: ts_offset_seconds}; a key absent from a run is a hard
    # delete, present again later is a reinsertion
    st.dictionaries(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=100),
        max_size=4,
    ),
    min_size=3,
    max_size=5,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(runs=scd_runs)
def test_scd2_multi_run_delete_reinsert_matches_bruteforce(spark, runs):
    """>=3 scd2_apply folds with interleaved hard-deletes and reinsertions of
    the same key must match a brute-force dbt-timestamp-strategy simulator
    (snapshots/*.sql:4-11, invalidate_hard_deletes=True; deletes close at the
    batch high-watermark, empty batches are no-ops)."""
    from unified_firmographic_data_pipeline_spark.operators.scd2 import scd2_apply

    snap = None
    state: list[dict] = []  # brute-force versions
    for run_idx, batch in enumerate(runs):
        rows = [
            (k, BASE + timedelta(seconds=s), f"v{run_idx}_{k}_{s}")
            for k, s in sorted(batch.items())
        ]
        sdf = spark.createDataFrame(rows, "key long, updated_at timestamp, val string")
        snap = scd2_apply(snap, sdf, key="key", updated_at="updated_at")

        if snap is not None and not rows:
            pass  # empty batch: engine is a no-op (hwm is NULL)
        elif run_idx == 0 or not state:
            state = [
                {"key": k, "val": v, "updated_at": ts, "valid_from": ts, "valid_to": None}
                for k, ts, v in rows
            ]
        elif rows:
            hwm = max(ts for _, ts, _ in rows)
            src = {k: (ts, v) for k, ts, v in rows}
            open_before = {r["key"]: r for r in state if r["valid_to"] is None}
            for r in open_before.values():
                if r["key"] in src:
                    ts, _ = src[r["key"]]
                    if ts > r["updated_at"]:
                        r["valid_to"] = ts  # close superseded version
                else:
                    r["valid_to"] = hwm  # hard-delete invalidation
            for k, (ts, v) in src.items():
                if k not in open_before or ts > open_before[k]["updated_at"]:
                    state.append(
                        {"key": k, "val": v, "updated_at": ts, "valid_from": ts, "valid_to": None}
                    )

        got = sorted(
            (r["key"], r["val"], r["dbt_updated_at"], r["dbt_valid_from"], r["dbt_valid_to"])
            for r in snap.collect()
        )
        want = sorted(
            (r["key"], r["val"], r["updated_at"], r["valid_from"], r["valid_to"])
            for r in state
        )
        assert got == want, f"run {run_idx}: {got} != {want}"
        # rebase the engine snapshot on materialized rows (the graph runner
        # persists between runs; also keeps the lineage bounded)
        snap = spark.createDataFrame(snap.collect(), snap.schema)


intervals_strategy = st.lists(
    st.tuples(st.integers(0, 48), st.integers(1, 12)),  # (start-halfhour, len)
    min_size=0,
    max_size=8,
)


@given(a_iv=intervals_strategy, b_iv=intervals_strategy)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_overlap_join_property_matches_brute_force(spark, a_iv, b_iv):
    from datetime import datetime, timedelta

    from unified_firmographic_data_pipeline_spark.operators.temporal import overlap_join

    base = datetime(2024, 1, 1)
    mk = lambda s, ln: (base + timedelta(minutes=30 * s), base + timedelta(minutes=30 * (s + ln)))
    a_rows = [(i, *mk(s, ln)) for i, (s, ln) in enumerate(a_iv)]
    b_rows = [(i, *mk(s, ln)) for i, (s, ln) in enumerate(b_iv)]
    a = spark.createDataFrame(a_rows, "a_id long, a_s timestamp, a_e timestamp") \
        if a_rows else spark.createDataFrame([], "a_id long, a_s timestamp, a_e timestamp")
    b = spark.createDataFrame(b_rows, "b_id long, b_s timestamp, b_e timestamp") \
        if b_rows else spark.createDataFrame([], "b_id long, b_s timestamp, b_e timestamp")
    got = sorted(
        (r.a_id, r.b_id)
        for r in overlap_join(a, b, "a_s", "a_e", "b_s", "b_e", bin_width_s=3600)
        .select("a_id", "b_id")
        .collect()
    )
    brute = sorted(
        (ai, bi)
        for ai, as_, ae in a_rows
        for bi, bs, be in b_rows
        if as_ < be and bs < ae
    )
    assert got == brute
