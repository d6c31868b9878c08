"""XML staging parse (operators.xmlstage) + XML landing reader."""

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from unified_firmographic_data_pipeline_spark.operators.xmlstage import (
    flatten_xml_array,
    infer_xml_schema,
    parse_xml_payload,
    xpath_leaf,
)
from unified_firmographic_data_pipeline_spark.sources.landing import read_xml_landing

WIKI_XML = (
    "<sp500><company><symbol>MMM</symbol><security>3M</security>"
    "<cik>66740</cik></company><company><symbol>AOS</symbol>"
    "<security>A. O. Smith</security><cik>91142</cik></company></sp500>"
)

COMPANY = StructType(
    [
        StructField("symbol", StringType()),
        StructField("security", StringType()),
        StructField("cik", IntegerType()),
    ]
)
ROOT = StructType([StructField("company", ArrayType(COMPANY))])


@pytest.fixture
def payload_df(spark):
    return spark.createDataFrame(
        [(1, WIKI_XML), (2, "<sp500></sp500>"), (3, "<not closed")],
        "id long, payload string",
    )


def test_parse_xml_payload_typed(spark, payload_df):
    out = parse_xml_payload(payload_df, "payload", ROOT, parent_cols=["id"])
    rows = {r.id: r.doc for r in out.collect()}
    assert rows[1].company[0].symbol == "MMM"
    assert rows[1].company[1].cik == 91142
    assert rows[2].company is None  # empty root: no repeated children
    assert rows[3].company is None  # malformed: PERMISSIVE -> NULL fields


def test_parse_xml_failfast_raises(spark, payload_df):
    bad = payload_df.where(F.col("id") == 3)
    with pytest.raises(Exception):
        parse_xml_payload(bad, "payload", ROOT, lenient=False).collect()


def test_flatten_xml_array_is_lateral_flatten(spark, payload_df):
    out = flatten_xml_array(
        payload_df, "payload", "company", ROOT, parent_cols=["id"], out_col="c"
    )
    got = sorted((r.id, r.c.symbol, r.c.cik) for r in out.collect())
    # doc 1 contributes one row per <company>; docs 2 (empty) and 3
    # (malformed) contribute zero rows — the JSON-variant contract
    assert got == [(1, "AOS", 91142), (1, "MMM", 66740)]


def test_flatten_xml_is_narrow(spark, payload_df):
    plan = flatten_xml_array(
        payload_df, "payload", "company", ROOT, parent_cols=["id"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # parse+explode never shuffles


def test_xpath_leaf_probe(spark, payload_df):
    out = xpath_leaf(
        payload_df,
        "payload",
        {"first_symbol": "//company[1]/symbol/text()", "missing": "//nope/text()"},
        keep_cols=["id"],
    )
    rows = {r.id: r for r in out.collect()}
    assert rows[1].first_symbol == "MMM"
    assert rows[1].missing is None  # no match -> NULL, not ''
    assert rows[2].first_symbol is None
    assert rows[3].first_symbol is None  # malformed: guarded NULL, no throw


def test_xpath_leaf_strict_throws_on_malformed(spark, payload_df):
    from py4j.protocol import Py4JJavaError

    bad = payload_df.where(F.col("id") == 3)
    with pytest.raises(Py4JJavaError):
        xpath_leaf(
            bad, "payload", {"s": "//x/text()"}, keep_cols=["id"], lenient=False
        ).collect()


def test_xml_is_well_formed_column(spark, payload_df):
    from unified_firmographic_data_pipeline_spark.operators.xmlstage import (
        xml_is_well_formed,
    )

    out = payload_df.select(
        "id", xml_is_well_formed(F.col("payload")).alias("ok")
    ).collect()
    assert {r.id: r.ok for r in out} == {1: True, 2: True, 3: False}


def test_infer_xml_schema_then_pin(spark, payload_df):
    ddl = infer_xml_schema(payload_df.where(F.col("id") == 1), "payload")
    assert "company" in ddl.lower()
    # the inferred DDL is usable as a from_xml schema
    parsed = payload_df.where(F.col("id") == 1).select(
        F.from_xml("payload", ddl).alias("d")
    )
    assert parsed.collect()[0].d is not None


def test_infer_xml_schema_empty_raises(spark):
    df = spark.createDataFrame([], "payload string")
    with pytest.raises(ValueError):
        infer_xml_schema(df, "payload")


def test_read_xml_landing(spark, tmp_path):
    land = tmp_path / "land"
    land.mkdir()
    (land / "a.xml").write_text(WIKI_XML)
    (land / "b.xml").write_text("<sp500/>")
    (land / "ignore.txt").write_text("nope")
    df = read_xml_landing(spark, str(land), "wiki_sp500")
    assert df.count() == 2  # glob excludes the .txt
    row = df.orderBy("payload").collect()
    assert {r.source for r in row} == {"wiki_sp500"}
    assert any(r.payload == WIKI_XML for r in row)


def test_landing_to_staging_end_to_end(spark, tmp_path):
    """Land XML files, stage-parse with the pinned schema, flatten to one
    row per company — the full RAW->STAGING path for an XML feed."""
    land = tmp_path / "land"
    land.mkdir()
    (land / "feed.xml").write_text(WIKI_XML)
    raw = read_xml_landing(spark, str(land), "wiki_sp500")
    staged = flatten_xml_array(
        raw, "payload", "company", ROOT, parent_cols=["source"], out_col="c"
    ).select("source", "c.symbol", "c.security", "c.cik")
    got = sorted((r.symbol, r.cik) for r in staged.collect())
    assert got == [("AOS", 91142), ("MMM", 66740)]
