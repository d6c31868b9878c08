"""Isotonic PAV calibration (operators/isotonic.py) and Unicode NFC
normalization (functions/text.py:nfc_normalize_pandas)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from unified_firmographic_data_pipeline_spark.functions.text import nfc_normalize_pandas
from unified_firmographic_data_pipeline_spark.operators.isotonic import (
    binned_label_rates,
    isotonic_calibrate_bins,
    pav_pools,
)


# --------------------------------------------------------------------- PAV
def test_pav_already_monotone_is_identity():
    items = [(0, 10, 1), (1, 10, 3), (2, 10, 7)]
    assert pav_pools(items) == [(0, 0, 10, 1), (1, 1, 10, 3), (2, 2, 10, 7)]


def test_pav_single_violation_pools_pairwise_mean():
    # rates 0.5, 0.2 -> pooled 7/20
    assert pav_pools([(0, 10, 5), (1, 10, 2)]) == [(0, 1, 20, 7)]


def test_pav_cascading_merge():
    # 0.9, 0.5, 0.1: merging (0.5,0.1)->0.3 then violates 0.9 -> one pool
    assert pav_pools([(0, 10, 9), (1, 10, 5), (2, 10, 1)]) == [(0, 2, 30, 15)]


def test_pav_equal_means_stay_separate_but_fit_equal():
    pools = pav_pools([(0, 10, 3), (1, 20, 6)])  # both 0.3
    assert pools == [(0, 0, 10, 3), (1, 1, 20, 6)]


def test_pav_matches_sklearn_reference_shape():
    # hand-checked: rates .1 .7 .3 .6 .2 with equal weights
    # stack: [.1] [.1,.7] -> push .3 merges .7 -> [.1, .5]; push .6 ok;
    # push .2 merges .6 -> .4, still > .5? (4+2)/20=0.4 < 0.5 -> merge
    # again with (7+3)/20=0.5 -> (10+6+2... recompute via fold
    items = [(i, 10, p) for i, p in enumerate([1, 7, 3, 6, 2])]
    pools = pav_pools(items)
    # fitted values must be non-decreasing and mass-preserving
    total_p = sum(p for _, _, _, p in pools)
    assert total_p == 19
    rates = [p / n for _, _, n, p in pools]
    assert rates == sorted(rates)
    # bins covered exactly once, in order
    spans = [(lo, hi) for lo, hi, _, _ in pools]
    covered = [b for lo, hi in spans for b in range(lo, hi + 1)]
    assert covered == [0, 1, 2, 3, 4]


def test_isotonic_calibrate_bins_spark(spark):
    rows = [(float(i % 8) + 0.5, 1 if (i * 7) % 10 < (i % 8) else 0) for i in range(400)]
    df = spark.createDataFrame(rows, "score double, label int")
    out = isotonic_calibrate_bins(df, "score", "label", n_bins=8, lo=0.0, hi=8.0)
    pdf = out.orderBy("bin").toPandas()
    assert list(pdf["bin"]) == list(range(8))
    assert pdf["n"].sum() == 400
    # fitted curve is monotone non-decreasing
    assert (pdf["fitted_rate"].diff().fillna(0) >= -1e-12).all()
    # and is the L2 projection: pooled means match a python replay
    bins = binned_label_rates(df, "score", "label", 8, 0.0, 8.0).collect()
    items = sorted((r["bin"], r["n"], r["pos"]) for r in bins)
    pools = pav_pools(items)
    fitted = {}
    for lo, hi, n, p in pools:
        for b in range(lo, hi + 1):
            fitted[b] = round(p / n, 6)
    for _, r in pdf.iterrows():
        assert fitted[r["bin"]] == r["fitted_rate"]


def test_binned_rates_clamps_out_of_range(spark):
    df = spark.createDataFrame([(-5.0, 1), (99.0, 0)], "score double, label int")
    rows = {r["bin"]: r for r in binned_label_rates(df, "score", "label", 4, 0.0, 1.0).collect()}
    assert set(rows) == {0, 3}  # clamped to edge bins, never dropped


# --------------------------------------------------------------------- NFC
@pytest.mark.parametrize(
    "raw,composed",
    [
        ("cafe\u0301", "caf\u00e9"),  # e + combining acute -> e-acute
        ("A\u0308", "\u00c4"),
        ("\u00e9", "\u00e9"),  # already NFC: fixed point
        ("plain ascii", "plain ascii"),
    ],
)
def test_nfc_normalize_pandas(spark, raw, composed):
    df = spark.createDataFrame([(raw,)], "t string")
    got = df.select(nfc_normalize_pandas("t").alias("n")).first()["n"]
    assert got == composed


def test_nfc_null_passthrough(spark):
    df = spark.createDataFrame([(None,)], "t string")
    assert df.select(nfc_normalize_pandas("t").alias("n")).first()["n"] is None
