"""Reference-implementation tests for batch-34: Theil-Sen slope,
Mann-Kendall trend, seeded label propagation, prefix-dup groups,
quantile normalization, sorted-neighborhood ER."""

from __future__ import annotations

import math
import re
import statistics

import duckdb

import __spark_entry__ as m

QUERIES = m.queries()


def _daily(sf_small: str, col: str):
    con = duckdb.connect()
    return con.execute(
        f"""SELECT {col} FROM '{sf_small}/orders.parquet'
            GROUP BY CAST(o_orderdate AS DATE)
            ORDER BY CAST(o_orderdate AS DATE)"""
    ).fetchall()


def test_theilsen_matches_pairwise_median(spark, sf_small):
    row = QUERIES["theilsen_slope_daily"](spark, sf_small).collect()[0]
    ys = [
        y
        for (y,) in _daily(
            sf_small, "CAST(SUM(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT)"
        )
    ]
    slopes = [
        (ys[j] - ys[i]) / (j - i)
        for i in range(len(ys))
        for j in range(i + 1, len(ys))
    ]
    assert row["n_pairs"] == len(slopes)
    assert abs(row["theilsen_slope"] - statistics.median(slopes) / 1e6) < 1e-4


def test_mann_kendall_matches_direct(spark, sf_small):
    row = QUERIES["mann_kendall_trend_daily"](spark, sf_small).collect()[0]
    ys = [y for (y,) in _daily(sf_small, "CAST(COUNT(*) AS BIGINT)")]
    n = len(ys)
    s = sum(
        (1 if ys[j] > ys[i] else -1 if ys[j] < ys[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties: dict[int, int] = {}
    for y in ys:
        ties[y] = ties.get(y, 0) + 1
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    corr = 1.0 if s > 0 else -1.0 if s < 0 else 0.0
    z = (s - corr) / math.sqrt(var)
    assert row["s_stat"] == s and row["n_days"] == n
    assert abs(row["z"] - z) < 1e-5


def test_label_prop_two_rounds_matches_bruteforce(spark, sf_small):
    out = {r["node"]: r["score"] for r in QUERIES["label_prop_seeded_scores"](spark, sf_small).collect()}
    con = duckdb.connect()
    edges = con.execute(
        f"""WITH bsk AS (SELECT DISTINCT l_orderkey ok, l_partkey pk
                        FROM '{sf_small}/lineitem.parquet')
            SELECT a.pk, b.pk FROM bsk a JOIN bsk b
            ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2 HAVING COUNT(*) >= 2"""
    ).fetchall()
    nbrs: dict[int, list[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    seeds = {v for v in nbrs if v % 10 == 0}
    r1 = {
        v: round(1e6 * sum(1 for u in ns if u in seeds) / len(ns))
        for v, ns in nbrs.items()
    }
    r2 = {
        v: round(sum(r1.get(u, 0) for u in ns) / len(ns))
        for v, ns in nbrs.items()
    }
    ranked = sorted(
        ((s / 1e6, v) for v, s in r2.items() if v % 10 != 0),
        key=lambda t: (-t[0], t[1]),
    )[:25]
    assert set(out) == {v for _, v in ranked}
    for s, v in ranked:
        assert abs(out[v] - s) < 2e-6, v


def test_prefix_dup_groups_match_python(spark, sf_small):
    import hashlib

    got = {
        r["prefix_fp"]: (r["n_docs"], r["keeper"])
        for r in QUERIES["prefix_dup_groups"](spark, sf_small).collect()
    }
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    groups: dict[str, list[int]] = {}
    for doc_id, text in docs:
        toks = re.sub(r"\s+", " ", text).strip().split(" ")[:16]
        fp = hashlib.md5(" ".join(toks).encode()).hexdigest()
        groups.setdefault(fp, []).append(doc_id)
    expect = {
        fp: (len(ids), min(ids)) for fp, ids in groups.items() if len(ids) > 1
    }
    assert got == expect


def test_quantile_normalization_preserves_rank_and_range(spark, sf_small):
    out = QUERIES["quantile_normalize_quality"](spark, sf_small).collect()
    assert len(out) == 40
    # normalized values come from the global quality distribution, so they
    # stay within the raw range; within one source the mapping is monotone
    from pyspark.sql import functions as F

    from unified_firmographic_data_pipeline_spark.functions.text import quality_score

    qs = [
        r["q"]
        for r in spark.read.parquet(f"{sf_small}/documents.parquet")
        .select(F.round(quality_score("text"), 6).alias("q"))
        .collect()
    ]
    lo, hi = min(qs), max(qs)
    by_source: dict[str, list] = {}
    for r in out:
        assert lo - 1e-9 <= r["norm_q"] <= hi + 1e-9
        by_source.setdefault(r["source"], []).append((r["raw_q"], r["norm_q"]))
    for src, pairs in by_source.items():
        pairs.sort()
        norms = [n for _, n in pairs]
        assert norms == sorted(norms), src


def test_sorted_neighborhood_matches_python(spark, sf_small):
    import duckdb

    got = {
        r["w"]: r["n_pairs"]
        for r in QUERIES["sorted_neighborhood_pairs"](spark, sf_small).collect()
    }
    con = duckdb.connect()
    names = sorted(
        n
        for (n,) in con.execute(
            f"SELECT DISTINCT c_name FROM '{sf_small}/customer.parquet'"
        ).fetchall()
    )

    def lev(a: str, b: str) -> int:
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    for w in (1, 2, 3):
        expect = sum(
            1 for i in range(w, len(names)) if lev(names[i], names[i - w]) <= 2
        )
        assert got[w] == expect, w


def test_variant_type_roundtrip_and_schema_inference(spark, sf_small):
    """Spark 4 VariantType semantics beyond the oracle-checked stats:
    schema_of_variant_agg merges per-row shapes, and variant columns
    survive a parquet round-trip (the open Variant binary encoding)."""
    import tempfile

    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{sf_small}/events.parquet").limit(100)
    v = e.select("event_id", F.parse_json("props").alias("v"))
    merged = v.agg(F.schema_of_variant_agg("v").alias("s")).collect()[0]["s"]
    assert "k" in merged and "BIGINT" in merged.upper()
    with tempfile.TemporaryDirectory() as d:
        v.write.mode("overwrite").parquet(d)
        back = spark.read.parquet(d)
        assert back.schema["v"].dataType.typeName() == "variant"
        a = {r["event_id"]: r["k"] for r in v.select(
            "event_id", F.variant_get("v", "$.k", "int").alias("k")).collect()}
        b = {r["event_id"]: r["k"] for r in back.select(
            "event_id", F.variant_get("v", "$.k", "int").alias("k")).collect()}
        assert a == b
