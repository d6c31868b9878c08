"""quality.profile — one-pass column profiler, top-k, histogram."""

import math

import pytest

from unified_firmographic_data_pipeline_spark.quality.profile import (
    frequent_values,
    numeric_histogram,
    profile_columns,
)


@pytest.fixture
def df(spark):
    rows = [
        (1, "alpha", 10.0),
        (2, "beta", 20.0),
        (3, None, 30.0),
        (4, "alpha", None),
        (5, "gamma-long", 40.0),
    ]
    return spark.createDataFrame(rows, "id long, name string, score double")


def test_profile_counts_and_types(spark, df):
    prof = {r.column: r for r in profile_columns(df).collect()}
    assert set(prof) == {"id", "name", "score"}
    assert prof["id"].n_rows == 5
    assert prof["id"].n_null == 0 and prof["id"].approx_distinct == 5
    assert prof["name"].n_null == 1
    assert prof["score"].n_nonnull == 4
    assert prof["id"].dtype == "bigint"


def test_profile_numeric_stats(spark, df):
    p = {r.column: r for r in profile_columns(df, ["score"]).collect()}["score"]
    assert p.min == "10.0" and p.max == "40.0"
    assert p.mean == pytest.approx(25.0)
    assert p.stddev == pytest.approx(math.sqrt(500 / 3), rel=1e-9)
    assert p.p50 in (20.0, 30.0)  # approx_percentile picks a data point
    assert p.avg_len is None  # numeric column: no length stats


def test_profile_string_stats(spark, df):
    p = {r.column: r for r in profile_columns(df, ["name"]).collect()}["name"]
    assert p.max_len == len("gamma-long")
    assert p.avg_len == pytest.approx((5 + 4 + 5 + 10) / 4)
    assert p.mean is None  # string column: no moments
    assert p.min == "alpha" and p.max == "gamma-long"


def test_profile_unknown_column_raises(spark, df):
    with pytest.raises(ValueError, match="unknown"):
        profile_columns(df, ["nope"])


def test_profile_is_single_pass(spark, df):
    """All per-column stats ride ONE aggregate — profiling N columns
    launches one job (one table scan), not N."""
    sc = spark.sparkContext
    sc.setJobGroup("profile_single_pass", "profiler pass-count check")
    try:
        profile_columns(df)
    finally:
        sc.setJobGroup("", "")
    jobs = sc.statusTracker().getJobIdsForGroup("profile_single_pass")
    assert 1 <= len(jobs) <= 2  # the agg collect (+ at most an Arrow prep job)


def test_frequent_values_topk(spark, df):
    top = frequent_values(df, "name", k=2).collect()
    assert (top[0].value, top[0].n) == ("alpha", 2)
    assert top[1].n == 1  # deterministic tie-break by value asc
    assert top[1].value == "beta"


def test_numeric_histogram_equiwidth(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    h = numeric_histogram(df, "x", bins=4).collect()
    assert [r.bucket for r in h] == [1, 2, 3, 4]
    assert sum(r.n for r in h) == 100
    assert h[0].lo == 0.0 and h[-1].hi == 99.0
    # max value folds into the LAST bucket, not an overflow bucket
    assert h[-1].n == 25


def test_numeric_histogram_constant_and_empty(spark):
    const = spark.createDataFrame([(5.0,), (5.0,)], "x double")
    h = numeric_histogram(const, "x", bins=10).collect()
    assert len(h) == 1 and h[0].n == 2 and h[0].lo == h[0].hi == 5.0
    empty = spark.createDataFrame([], "x double")
    assert numeric_histogram(empty, "x").count() == 0


def test_histogram_nulls_excluded(spark):
    df = spark.createDataFrame([(1.0,), (None,), (3.0,)], "x double")
    h = numeric_histogram(df, "x", bins=2).collect()
    assert sum(r.n for r in h) == 2
