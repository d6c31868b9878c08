"""Reference tests for batch 42: the dq report against per-test direct
SQL counts (and an injected-violation negative case), RAKE scores vs a
Python implementation, and decayed scores vs direct math."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as m

QUERIES = m.queries()


def _round_half_away(x: float) -> int:
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def test_dq_report_shape_and_clean_data(spark, sf_small):
    rows = QUERIES["dq_report_all_tables"](spark, sf_small).collect()
    assert len(rows) == 11
    # the generated testdata is clean: every check passes with 0 violations
    for r in rows:
        assert r["n_violations"] == 0 and r["passed"] is True
    assert {r["tbl"] for r in rows} == {"orders", "lineitem", "customer", "events"}


def test_dq_report_catches_injected_violations(spark, sf_small):
    """Negative case: corrupt a copy of orders and the report must count
    the violations exactly (not just flag them)."""
    from pyspark.sql import functions as F

    from unified_firmographic_data_pipeline_spark.quality.expect import expect

    o = spark.read.parquet(f"{sf_small}/orders.parquet")
    bad = o.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 100 == 0, F.lit(None)).otherwise(F.col("o_custkey")),
    ).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 200 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    dup = bad.unionByName(bad.limit(5))  # 5 duplicated keys
    rep = {
        r["test"]: r
        for r in expect(dup)
        .not_null(["o_custkey"])
        .accepted("o_orderstatus", ["O", "F", "P"])
        .unique(["o_orderkey"])
        .report("orders")
        .collect()
    }
    n_null = bad.filter(F.col("o_custkey").isNull()).count() + sum(
        1 for r in bad.limit(5).collect() if r["o_custkey"] is None
    )
    n_bad_status = dup.filter(F.col("o_orderstatus") == "X").count()
    assert rep["not_null(o_custkey)"]["n_violations"] == n_null
    assert rep["not_null(o_custkey)"]["passed"] is False or n_null == 0
    assert rep["accepted(o_orderstatus)"]["n_violations"] == n_bad_status
    assert rep["unique(o_orderkey)"]["n_violations"] == 5


def test_rake_matches_python(spark, sf_small):
    rows = QUERIES["rake_keyword_scores"](spark, sf_small).collect()
    con = duckdb.connect()
    texts = [t for (t,) in con.execute(f"SELECT text FROM '{sf_small}/documents.parquet'").fetchall()]
    stops = {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"}
    phrases = []
    for t in texts:
        toks = re.sub(r"\s+", " ", t).strip().split(" ")
        cur = []
        for w in toks:
            if w in stops:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(cur)
    freq = Counter()
    deg = Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    s_micro = {w: _round_half_away(1e6 * deg[w] / freq[w]) for w in freq}
    occ = Counter(" ".join(p) for p in phrases)
    scores = {
        ph: sum(s_micro[w] for w in ph.split(" ")) for ph in occ
    }
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["phrase"],) for r in rows] == [(ph,) for ph, _ in ranked]
    for r in rows:
        assert r["n_occurrences"] == occ[r["phrase"]]
        assert r["n_words"] == len(r["phrase"].split(" "))
        assert abs(r["rake_score"] - scores[r["phrase"]] / 1e6) < 1e-6


def test_decayed_scores_match_direct(spark, sf_small):
    out = {r["event_type"]: r for r in QUERIES["decayed_event_scores"](spark, sf_small).collect()}
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, epoch_us(ts) FROM '{sf_small}/events.parquet'"
    ).fetchall()
    mts = max(us for _, us in rows)
    per = defaultdict(list)
    for et, us in rows:
        per[et].append(_round_half_away(1e6 * 0.5 ** ((mts - us) / (7.0 * 86400.0 * 1e6))))
    for et, ws in per.items():
        r = out[et]
        assert r["n_events"] == len(ws)
        assert abs(r["decayed_count"] - sum(ws) / 1e6) < 1e-5
        assert 0.0 < r["recency_index"] <= 1.0
        assert abs(r["recency_index"] - sum(ws) / 1e6 / len(ws)) < 1e-6
