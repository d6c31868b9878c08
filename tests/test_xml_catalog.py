"""XML catalog format tier (Spark 4 native XML source).

The reference lands external feeds as JSON (DAG fetch tasks); real
firmographic feeds also arrive as XML (SEC filings, sitemaps, RSS). The
catalog treats XML exactly like the other schema-free interchange tiers:
types round-trip through the `_schema.json` sidecar, writes stay
swap-atomic, and dynamic partition overwrite replaces only the touched
partitions.
"""

import datetime as dt

from unified_firmographic_data_pipeline_spark.sources.catalog import (
    CATALOG_FORMATS,
    Catalog,
)


def test_xml_is_a_catalog_format():
    assert "xml" in CATALOG_FORMATS


def test_xml_typed_round_trip(spark, tmp_path):
    """Timestamps, longs, doubles and arrays survive write→read because
    read() restores the exact schema from the sidecar (XML itself carries
    no types — everything would infer as string/bigint otherwise)."""
    cat = Catalog(spark, str(tmp_path / "wh"), fmt="xml")
    df = spark.createDataFrame(
        [
            (1, "alpha", dt.datetime(2024, 1, 2, 3, 4, 5), 1.5, [1, 2]),
            (2, None, dt.datetime(2024, 2, 3), 2.25, []),
        ],
        "id long, name string, ts timestamp, score double, xs array<int>",
    )
    cat.overwrite(df, "staging", "companies")
    got = cat.read("staging", "companies")
    assert got.schema == df.schema
    rows = {r.id: r for r in got.collect()}
    assert rows[1].ts == dt.datetime(2024, 1, 2, 3, 4, 5)
    assert rows[1].xs == [1, 2]
    assert rows[2].name is None
    assert rows[2].score == 2.25


def test_xml_append(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"), fmt="xml")
    df1 = spark.createDataFrame([(1, "a")], "id long, v string")
    cat.overwrite(df1, "core", "t")
    cat.append(spark.createDataFrame([(2, "b")], "id long, v string"), "core", "t")
    assert sorted(r.id for r in cat.read("core", "t").collect()) == [1, 2]


def test_xml_overwrite_is_atomic_swap(spark, tmp_path):
    """Second overwrite replaces the data in place; the read path never
    sees a missing directory (swap contract shared with parquet)."""
    cat = Catalog(spark, str(tmp_path / "wh"), fmt="xml")
    df1 = spark.createDataFrame([(1, "a")], "id long, v string")
    cat.overwrite(df1, "core", "t")
    df2 = spark.createDataFrame([(9, "z")], "id long, v string")
    cat.overwrite(df2, "core", "t")
    assert [(r.id, r.v) for r in cat.read("core", "t").collect()] == [(9, "z")]
