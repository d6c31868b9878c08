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
