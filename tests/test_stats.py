"""exact_quantiles_bracketed must agree with Spark's exact F.percentile."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from unified_firmographic_data_pipeline_spark.operators.stats import exact_quantiles_bracketed


def _reference(df, col, p):
    return df.agg(F.percentile(col, F.lit(p))).first()[0]

def test_continuous_values(spark):
    rng = random.Random(7)
    rows = [(rng.uniform(0, 1000),) for _ in range(5000)]
    df = spark.createDataFrame(rows, ["x"])
    got = exact_quantiles_bracketed(df, {"x": 0.9})["x"]
    assert got == _reference(df, "x", 0.9)


def test_heavy_ties_median(spark):
    # 90% of rows share one value -> bracket subset is dominated by ties;
    # the histogram path must stay exact
    rows = [(25.0,)] * 4500 + [(float(i % 50),) for i in range(500)]
    df = spark.createDataFrame(rows, ["x"])
    got = exact_quantiles_bracketed(df, {"x": 0.5})["x"]
    assert got == _reference(df, "x", 0.5)


def test_multi_column_one_call(spark):
    rng = random.Random(11)
    rows = [(rng.uniform(0, 10), float(rng.randint(1, 50))) for _ in range(3000)]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = exact_quantiles_bracketed(df, {"a": 0.25, "b": 0.5})
    assert got["a"] == _reference(df, "a", 0.25)
    assert got["b"] == _reference(df, "b", 0.5)


def test_edge_probabilities(spark):
    rows = [(float(i),) for i in range(100)]
    df = spark.createDataFrame(rows, ["x"])
    assert exact_quantiles_bracketed(df, {"x": 0.0})["x"] == 0.0
    assert exact_quantiles_bracketed(df, {"x": 1.0})["x"] == 99.0


def test_empty_input(spark):
    df = spark.createDataFrame([], "x double")
    import math
    assert math.isnan(exact_quantiles_bracketed(df, {"x": 0.5})["x"])


def test_null_heavy_column(spark):
    # percentile ignores NULLs; ranks must come from the non-null count.
    # 60% NULLs previously shifted the target rank by ~1.5x.
    rng = random.Random(3)
    rows = [
        ((rng.uniform(0, 100) if i % 5 < 2 else None),)
        for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "x double")
    for p in (0.1, 0.5, 0.9):
        assert exact_quantiles_bracketed(df, {"x": p})["x"] == _reference(df, "x", p)


def test_all_null_column(spark):
    import math
    df = spark.createDataFrame([(None,)] * 100, "x double")
    assert math.isnan(exact_quantiles_bracketed(df, {"x": 0.5})["x"])


def test_mixed_null_and_clean_columns(spark):
    rng = random.Random(5)
    rows = [
        (float(i), (rng.uniform(0, 10) if i % 3 else None))
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "a double, b double")
    got = exact_quantiles_bracketed(df, {"a": 0.75, "b": 0.25})
    assert got["a"] == _reference(df, "a", 0.75)
    assert got["b"] == _reference(df, "b", 0.25)


def test_exact_quantiles_pairs_same_column_twice(spark):
    """winsorize's shape: two probabilities of ONE column share the passes
    and must both be exact."""
    from unified_firmographic_data_pipeline_spark.operators.stats import (
        exact_quantiles_pairs,
    )
    from pyspark.sql import functions as F

    df = spark.range(0, 1000).select(F.col("id").cast("double").alias("x"))
    lo, hi, med = exact_quantiles_pairs(df, [("x", 0.05), ("x", 0.95), ("x", 0.5)])
    assert lo == df.agg(F.percentile("x", F.lit(0.05))).first()[0]
    assert hi == df.agg(F.percentile("x", F.lit(0.95))).first()[0]
    assert med == df.agg(F.percentile("x", F.lit(0.5))).first()[0]


def test_closed_form_slope_matches_numpy_reference(spark):
    """The exact-moment OLS slope must agree with numpy's lstsq on the same
    (x, y) integer data."""
    import numpy as np
    from pyspark.sql import functions as F

    xs = [0, 1, 2, 3, 4, 10]
    ys = [1.0, 3.0, 5.25, 6.75, 9.0, 21.5]  # ~2.05x + 1
    df = spark.createDataFrame(list(zip(xs, ys)), "x long, value double")
    b = df.select("x", F.round(F.col("value") * 1e3).cast("long").alias("y"))
    mo = b.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (
        F.col(c).cast("double") for c in ["n", "sx", "sy", "sxy", "sxx"]
    )
    got = mo.select(
        F.round((n * sxy - sx * sy) / (n * sxx - sx * sx) / F.lit(1e3), 6).alias("m")
    ).collect()[0]["m"]
    ref = np.polyfit(np.array(xs, dtype=float), np.array(ys), 1)[0]
    assert abs(got - ref) < 1e-6
