"""t-closeness audit (quality/privacy.py:tcloseness_classes)."""

from __future__ import annotations

from unified_firmographic_data_pipeline_spark.quality.privacy import tcloseness_classes


def _emd(p, q):
    m = len(q)
    cum = 0.0
    total = 0.0
    for pj, qj in zip(p, q):
        cum += pj - qj
        total += abs(cum)
    return total / (m - 1)


def test_tcloseness_matches_hand_emd(spark):
    # two classes over an ordered 3-value sensitive attribute:
    # class A skews low, class B skews high
    rows = (
        [("A", 0)] * 6 + [("A", 1)] * 3 + [("A", 2)] * 1
        + [("B", 0)] * 1 + [("B", 1)] * 3 + [("B", 2)] * 6
    )
    df = spark.createDataFrame(rows, "qi string, sv int")
    out = {r["qi"]: r for r in tcloseness_classes(df, ["qi"], "sv").collect()}
    q = [7 / 20, 6 / 20, 7 / 20]  # global distribution
    assert out["A"]["n_c"] == 10 and out["B"]["n_c"] == 10
    assert out["A"]["t_emd"] == round(_emd([0.6, 0.3, 0.1], q), 6)
    assert out["B"]["t_emd"] == round(_emd([0.1, 0.3, 0.6], q), 6)
    # symmetric skews, symmetric distances
    assert out["A"]["t_emd"] == out["B"]["t_emd"]


def test_tcloseness_zero_when_class_matches_global(spark):
    rows = [("A", v) for v in (0, 1, 2)] * 4 + [("B", v) for v in (0, 1, 2)] * 2
    df = spark.createDataFrame(rows, "qi string, sv int")
    out = {r["qi"]: r["t_emd"] for r in tcloseness_classes(df, ["qi"], "sv").collect()}
    assert out == {"A": 0.0, "B": 0.0}


def test_tcloseness_missing_value_counts_as_zero_mass(spark):
    # class B never takes value 2: the axis crossJoin must fill the gap
    rows = [("A", 0), ("A", 1), ("A", 2), ("B", 0), ("B", 1)]
    df = spark.createDataFrame(rows, "qi string, sv int")
    out = {r["qi"]: r["t_emd"] for r in tcloseness_classes(df, ["qi"], "sv").collect()}
    q = [2 / 5, 2 / 5, 1 / 5]
    assert out["B"] == round(_emd([0.5, 0.5, 0.0], q), 6)


def test_tcloseness_detects_skew_l_diversity_misses(spark):
    # all three classes are 3-diverse, but B concentrates in the top
    # bucket; with two uniform classes anchoring the global, only B's
    # distance crosses a 0.25 gate (uniform classes read ~0.16 because
    # B's mass skews the GLOBAL too — t-closeness is relative by design)
    rows = (
        [("A", 0)] * 30 + [("A", 1)] * 30 + [("A", 2)] * 30
        + [("C", 0)] * 30 + [("C", 1)] * 30 + [("C", 2)] * 30
        + [("B", 0)] * 1 + [("B", 1)] * 1 + [("B", 2)] * 88
    )
    df = spark.createDataFrame(rows, "qi string, sv int")
    out = {r["qi"]: r["t_emd"] for r in tcloseness_classes(df, ["qi"], "sv").collect()}
    assert out["B"] > 0.25 > out["A"] == out["C"]  # the gate fires on B only
