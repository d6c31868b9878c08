"""Round-3 batch-22 operators: BM25, interval merge, Gini, 2-D skyline.
(The exact-moment correlation matrix is pinned by the oracle parity suite;
these tests pin semantics the parity hash can't explain by itself.)"""

import math

import pytest
from pyspark.sql import functions as F


def test_merge_intervals_islands_and_adjacency(spark):
    from unified_firmographic_data_pipeline_spark.operators.temporal import (
        merge_intervals,
    )

    rows = [
        # user 1: [0,10) + [5,15) overlap; [15,20) touches (half-open: merges);
        # [30,40) separate
        (1, 0, 10),
        (1, 5, 15),
        (1, 15, 20),
        (1, 30, 40),
        # user 2: single interval
        (2, 100, 110),
    ]
    df = spark.createDataFrame(rows, "k long, s long, e long").select(
        "k",
        F.timestamp_seconds("s").alias("s"),
        F.timestamp_seconds("e").alias("e"),
    )
    got = sorted(
        (
            r["k"],
            r["merged_start"].timestamp(),
            r["merged_end"].timestamp(),
            r["n_source_intervals"],
        )
        for r in merge_intervals(df, "k", "s", "e").collect()
    )
    assert got == [
        (1, 0.0, 20.0, 3),
        (1, 30.0, 40.0, 1),
        (2, 100.0, 110.0, 1),
    ]


def test_gini_by_group_known_values(spark):
    from unified_firmographic_data_pipeline_spark.operators.stats import gini_by_group

    rows = [("a", i, float(v)) for i, v in enumerate([1, 1, 1, 1])] + [
        ("b", i, float(v)) for i, v in enumerate([0, 0, 0, 100])
    ]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = {r["g"]: r for r in gini_by_group(df, "g", "v", "id").collect()}
    # perfect equality -> 0
    assert got["a"]["gini"] == 0.0
    # one holder of everything among n=4 -> (n-1)/n = 0.75
    assert got["b"]["gini"] == 0.75
    assert got["b"]["total_value"] == 100.0


def test_skyline_2d_dominance_semantics(spark):
    from unified_firmographic_data_pipeline_spark.operators.stats import skyline_2d

    rows = [
        (1, 1, 50.0),  # front: earliest date
        (2, 2, 80.0),  # front: later but higher
        (3, 2, 80.0),  # tie of row 2 on both coords -> kept (no strict)
        (4, 2, 70.0),  # dominated by 2 (same x, lower y)
        (5, 3, 60.0),  # dominated by 2 (later, lower)
        (6, 4, 90.0),  # front
    ]
    df = spark.createDataFrame(rows, "id long, x int, y double")
    got = sorted(r["id"] for r in skyline_2d(df, "x", "y", "id").collect())
    assert got == [1, 2, 3, 6]


def test_bm25_scores_reference_formula(spark):
    from unified_firmographic_data_pipeline_spark.operators.curation import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "spark spark join runs fast"),
            (2, "window window window functions"),
            (3, "nothing relevant here at all"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bm25_scores(docs, ["spark", "window"]).collect()}
    assert got[3]["n_terms_matched"] == 0 and got[3]["bm25"] == 0.0
    assert got[1]["n_terms_matched"] == 1 and got[2]["n_terms_matched"] == 1

    # plain-Python reference for doc 1 / term 'spark' (tf=2, df=1, N=3,
    # dl=5, avgdl=14/3)
    def ref(tf, df, dl, n_docs=3, avgdl=14 / 3, k1=1.2, b=0.75):
        idf_micro = round(math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0) * 1e6)
        return round(idf_micro * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))) / 1e6

    assert got[1]["bm25"] == pytest.approx(round(ref(2, 1, 5), 6), abs=2e-6)
    assert got[2]["bm25"] == pytest.approx(round(ref(3, 1, 4), 6), abs=2e-6)
