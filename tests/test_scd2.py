"""Direct scd2_apply unit tests — FIXTURES.md §4 multi-run sequence,
including the hard-delete invalidation path that the full pipeline can't
reach (its incremental core never deletes keys)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from unified_firmographic_data_pipeline_spark.operators.scd2 import (
    VALID_FROM,
    VALID_TO,
    scd2_apply,
    scd2_current,
)

T0 = datetime(2025, 1, 1)
T1 = datetime(2025, 2, 1)
T2 = datetime(2025, 3, 1)

SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("city", StringType()),
        StructField("last_updated", TimestampType()),
    ]
)


def src(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def by_key(snap):
    return {(r["key"], r[VALID_FROM]): r for r in snap.collect()}


def test_scd2_three_run_sequence(spark):
    # t0: A@city1, B@city1 -> 2 open rows
    s0 = scd2_apply(None, src(spark, [("A", "city1", T0), ("B", "city1", T0)]),
                    "key", "last_updated")
    rows = by_key(s0)
    assert len(rows) == 2
    assert rows[("A", T0)][VALID_TO] is None and rows[("B", T0)][VALID_TO] is None

    # t1: A moved (newer ts), B unchanged (same ts) -> A closed+reopened, B untouched
    s1 = scd2_apply(s0, src(spark, [("A", "city2", T1), ("B", "city1", T0)]),
                    "key", "last_updated")
    rows = by_key(s1)
    assert len(rows) == 3
    assert rows[("A", T0)][VALID_TO] == T1            # closed at new updated_at
    assert rows[("A", T1)][VALID_TO] is None
    assert rows[("A", T1)]["city"] == "city2"
    assert rows[("B", T0)][VALID_TO] is None          # untouched

    # t2: only A present -> B hard-delete-invalidated at batch high-watermark
    s2 = scd2_apply(s1, src(spark, [("A", "city2", T2)]), "key", "last_updated")
    rows = by_key(s2)
    assert rows[("B", T0)][VALID_TO] == T2            # closed (hard delete)
    assert rows[("A", T1)][VALID_TO] == T2            # re-versioned (ts bumped)
    assert rows[("A", T2)][VALID_TO] is None
    # closed history rows immutable
    assert rows[("A", T0)][VALID_TO] == T1

    cur = scd2_current(s2).collect()
    assert {(r["key"], r["city"]) for r in cur} == {("A", "city2")}


def test_scd2_no_hard_delete_invalidation(spark):
    s0 = scd2_apply(None, src(spark, [("A", "x", T0), ("B", "y", T0)]), "key", "last_updated")
    s1 = scd2_apply(s0, src(spark, [("A", "x", T1)]), "key", "last_updated",
                    invalidate_hard_deletes=False)
    rows = by_key(s1)
    assert rows[("B", T0)][VALID_TO] is None  # vanished key stays open


def test_scd2_stale_source_rows_ignored(spark):
    """Source rows with updated_at <= the open row's are no-ops (dbt
    timestamp strategy only reacts to strictly newer timestamps)."""
    s0 = scd2_apply(None, src(spark, [("A", "x", T1)]), "key", "last_updated")
    s1 = scd2_apply(s0, src(spark, [("A", "stale", T0)]), "key", "last_updated")
    rows = by_key(s1)
    assert len(rows) == 1
    assert rows[("A", T1)]["city"] == "x"
    assert rows[("A", T1)][VALID_TO] is None


def test_scd2_current_filters_open_only(spark):
    s0 = scd2_apply(None, src(spark, [("A", "x", T0)]), "key", "last_updated")
    s1 = scd2_apply(s0, src(spark, [("A", "y", T1)]), "key", "last_updated")
    assert scd2_current(s1).count() == 1
    assert s1.filter(F.col(VALID_TO).isNotNull()).count() == 1


# ------------------------------------------------- check strategy (dbt) ----


def test_scd2_check_strategy_evolution(spark):
    """dbt strategy='check': new version iff any check_col differs
    (null-safe); unchanged rows untouched; hard deletes close at run_ts;
    reinsertion opens a fresh version."""
    from datetime import datetime

    from unified_firmographic_data_pipeline_spark.operators.scd2 import (
        VALID_FROM,
        VALID_TO,
        scd2_apply_check,
        scd2_current,
    )

    t1, t2, t3 = (datetime(2025, 1, d) for d in (1, 2, 3))

    def src(rows):
        return spark.createDataFrame(rows, "k long, city string, state string")

    snap = scd2_apply_check(None, src([(1, "Austin", "TX"), (2, None, "CA")]),
                            "k", ["city", "state"], t1)
    assert snap.count() == 2 and scd2_current(snap).count() == 2

    # run 2: k1 city changes; k2 identical (NULL city compares null-safe);
    # k3 appears
    snap = scd2_apply_check(
        snap, src([(1, "Dallas", "TX"), (2, None, "CA"), (3, "Miami", "FL")]),
        "k", ["city", "state"], t2,
    )
    rows = {(r["k"], r[VALID_FROM], r[VALID_TO]) for r in snap.collect()}
    assert (1, t1, t2) in rows and (1, t2, None) in rows  # versioned
    assert (2, t1, None) in rows  # untouched (null-safe compare)
    assert (3, t2, None) in rows

    # run 3: k2 vanishes (hard delete), k1 unchanged vs its open version
    snap = scd2_apply_check(snap, src([(1, "Dallas", "TX"), (3, "Miami", "FL")]),
                            "k", ["city", "state"], t3)
    cur = {r["k"]: r for r in scd2_current(snap).collect()}
    assert set(cur) == {1, 3}
    closed2 = [r for r in snap.collect() if r["k"] == 2]
    assert len(closed2) == 1 and closed2[0][VALID_TO] == t3

    # run 4: k2 reinserted -> fresh open version
    t4 = datetime(2025, 1, 4)
    snap = scd2_apply_check(snap, src([(2, "Reno", "NV")]), "k", ["city", "state"], t4)
    k2 = sorted((r[VALID_FROM], r[VALID_TO]) for r in snap.collect() if r["k"] == 2)
    assert k2 == [(t1, t3), (t4, None)]
