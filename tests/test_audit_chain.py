"""Tamper-evident audit hash chain (plans/graph.py:audit_hash_chain)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from unified_firmographic_data_pipeline_spark.plans.graph import audit_hash_chain


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _daily(spark, rows):
    return spark.createDataFrame(rows, "day string, digest string")


def test_chain_links_fold_in_day_order(spark):
    rows = [("2024-01-02", "bb"), ("2024-01-01", "aa"), ("2024-01-03", "cc")]
    out = {r["day"]: r["chain"] for r in audit_hash_chain(_daily(spark, rows)).collect()}
    c1 = _md5("GENESIS" + "aa")
    c2 = _md5(c1 + "bb")
    c3 = _md5(c2 + "cc")
    assert out == {"2024-01-01": c1, "2024-01-02": c2, "2024-01-03": c3}


def test_chain_detects_historical_tamper(spark):
    rows = [("d1", "aa"), ("d2", "bb"), ("d3", "cc")]
    base = {r["day"]: r["chain"] for r in audit_hash_chain(_daily(spark, rows)).collect()}
    tampered = [("d1", "aa"), ("d2", "XX"), ("d3", "cc")]
    tam = {r["day"]: r["chain"] for r in audit_hash_chain(_daily(spark, tampered)).collect()}
    assert tam["d1"] == base["d1"]  # prefix unchanged
    assert tam["d2"] != base["d2"] and tam["d3"] != base["d3"]  # suffix all breaks


def test_single_and_empty_axes(spark):
    one = audit_hash_chain(_daily(spark, [("d", "x")])).collect()
    assert len(one) == 1 and one[0]["chain"] == _md5("GENESIS" + "x")
    empty = audit_hash_chain(
        spark.createDataFrame([], "day string, digest string")
    ).collect()
    assert empty == []


def test_chain_is_jvm_expression_no_udf(spark):
    import contextlib
    import io

    df = audit_hash_chain(_daily(spark, [("d1", "aa"), ("d2", "bb")]))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
