"""Synthetic raw-payload fixtures per FIXTURES.md §1-§2 — every string
chosen to exercise a parsing edge case the reference handles explicitly."""

from __future__ import annotations

import json
from datetime import datetime

T0 = datetime(2025, 1, 1, 0, 0, 0)
T1 = datetime(2025, 2, 1, 0, 0, 0)
T2 = datetime(2025, 3, 1, 0, 0, 0)

WIKI_ROWS_T0 = [
    {
        "Symbol": "MMM",
        "Security": "3M Company (the conglomerate)",  # parenthetical -> split
        "GICS Sector": "Industrials",
        "GICS Sub-Industry": "Industrial Conglomerates",
        "Headquarters Location": "Saint Paul, Minnesota",
        "Date added": "1957-03-04",
        "CIK": 66740,
        "Founded": "1902 (as Minnesota Mining)",  # trailing text -> first 4
    },
    {
        "Symbol": "GOOGL",
        "Security": "Alphabet (Class A)",
        "GICS Sector": "Communication Services",
        "GICS Sub-Industry": "Interactive Media",
        "Headquarters Location": "Mountain View, California",
        "Date added": "2014-04-03",
        "CIK": 1652044,  # duplicate CIK with GOOG below
        "Founded": "1998",
    },
    {
        "Symbol": "GOOG",
        "Security": "Alphabet (Class C)",
        "GICS Sector": "Communication Services",
        "GICS Sub-Industry": "Interactive Media",
        "Headquarters Location": "Mountain View, California",
        "Date added": "2006-04-03",  # earlier date -> G1 keeps this row
        "CIK": 1652044,
        "Founded": "1998",
    },
    {
        "Symbol": "NOHQ",
        "Security": "Nowhere Corp",
        "GICS Sector": "Industrials",
        "GICS Sub-Industry": "Misc",
        "Headquarters Location": "none",  # sentinel -> NULL city/country
        "Date added": "",  # empty -> NULL date
        "CIK": 999001,
        "Founded": "2013",
    },
    {
        "Symbol": "NONE",
        "Security": "None City Corp",
        "GICS Sector": "Industrials",
        "GICS Sub-Industry": "Misc",
        # a city literally named "none" with a real state: only a WHOLE-field
        # sentinel may null it (stg_wiki_sp500.sql:32-33)
        "Headquarters Location": "none, Alaska",
        "Date added": "2001-01-01",
        "CIK": 999002,
        "Founded": "1999",
    },
    {
        "Symbol": "WMT",
        "Security": "Walmart",
        "GICS Sector": "Consumer Staples",
        "GICS Sub-Industry": "Retail",
        "Headquarters Location": "Bentonville, Arkansas",
        "Date added": "1982-08-31",
        "CIK": 104169,
        "Founded": "1962",
    },
]


def fortune_item(
    name: str,
    rank: int,
    slug: str,
    city: str = "Bentonville",
    state: str = "AR",
    revenues: str = "$648,125",
    profits: str = "$15,511.0",
    **data_overrides,
) -> dict:
    data = {
        "Assets ($M)": "$252,399",
        "Revenues ($M)": revenues,
        "Profits ($M)": profits,
        "Market Value ($M)": "$484,345",
        "Employees": "2,100,000",
        "Revenue Percent Change": "6%",
        "Profits Percent Change": "32.8%",
        "Headquarters City": city,
        "State": state,
        "Industry": "General Merchandisers",
        "Sector": "Retailing",
        "Best Companies": "yes",
        "Change the World": "no",
        "Dropped in Rank": "no",
        "Future 50": "no",
        "Global 500": "yes",
        "Profitable": "yes",
        "Newcomer to the Fortune 500": "no",
        "Female CEO": "no",
        "Founder is CEO": "no",
        "Fastest Growing Companies": "no",
        "World's Most Admired Companies": "yes",
        "Change in Rank (500 only)": "0",
        "Change in Rank (Full 1000)": "",  # empty -> 0.0
    }
    data.update(data_overrides)
    return {"name": name, "order": rank, "rank": rank, "slug": slug, "data": data}


FORTUNE_ITEMS_T0 = [
    fortune_item("Walmart", 1, "walmart"),
    fortune_item(
        "3M Company",
        50,
        "3m-company",
        city="Saint Paul",
        state="MN",
        revenues="$32,681",
        profits="$-1,234",  # negative money string
        **{
            "Employees": "",  # empty -> NULL int
            "Revenue Percent Change": "",  # empty -> 0.0
            "Change in Rank (500 only)": "-42",
        },
    ),
    fortune_item("Alphabet", 8, "alphabet", city="Mountain View", state="CA",
                 revenues="$307,394", profits="$73,795"),
    fortune_item("FortuneOnly Inc", 900, "fortuneonly", city="Austin", state="TX",
                 revenues="$1,000", profits="$10"),  # not in wiki -> dropped by core join
]


def wiki_payload(rows=None) -> str:
    return json.dumps(rows if rows is not None else WIKI_ROWS_T0)


def fortune_payload(items=None) -> str:
    return json.dumps({"items": items if items is not None else FORTUNE_ITEMS_T0})


def raw_df(spark, payload: str, source: str, ingested_at: datetime, row_id: int = 0):
    """One RAW-shape row: (id, source, ingested_at, payload)."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("source", StringType()),
            StructField("ingested_at", TimestampType()),
            StructField("payload", StringType()),
        ]
    )
    return spark.createDataFrame([(row_id, source, ingested_at, payload)], schema)
