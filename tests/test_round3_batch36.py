"""Reference-implementation tests for batch-36: JS divergence, Hill
diversity, source centroid cosine, customer regularity, Pythagorean
means, per-customer trend buckets."""

from __future__ import annotations

import math
import re
import statistics

import duckdb

import __spark_entry__ as m

QUERIES = m.queries()


def _source_counts(sf_small: str) -> dict[str, dict[str, int]]:
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT source, text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    cnt: dict[str, dict[str, int]] = {}
    for src, text in docs:
        d = cnt.setdefault(src, {})
        for t in re.sub(r"\s+", " ", text).strip().split(" "):
            d[t] = d.get(t, 0) + 1
    return cnt


def test_js_divergence_matches_direct_and_is_bounded(spark, sf_small):
    out = {
        (r["src_a"], r["src_b"]): r["js_divergence"]
        for r in QUERIES["js_divergence_sources"](spark, sf_small).collect()
    }
    cnt = _source_counts(sf_small)
    srcs = sorted(cnt)
    assert len(out) == len(srcs) * (len(srcs) - 1) // 2
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            na, nb = sum(cnt[a].values()), sum(cnt[b].values())
            js = 0.0
            for tok in set(cnt[a]) | set(cnt[b]):
                pa = cnt[a].get(tok, 0) / na
                pb = cnt[b].get(tok, 0) / nb
                mx = 0.5 * pa + 0.5 * pb
                if pa > 0:
                    js += 0.5 * pa * math.log(pa / mx)
                if pb > 0:
                    js += 0.5 * pb * math.log(pb / mx)
            assert abs(out[(a, b)] - js) < 1e-4, (a, b)
            assert -1e-9 <= out[(a, b)] <= math.log(2) + 1e-9


def test_hill_numbers_match_and_are_ordered(spark, sf_small):
    out = {
        r["source"]: r for r in QUERIES["hill_diversity_sources"](spark, sf_small).collect()
    }
    cnt = _source_counts(sf_small)
    for src, d in cnt.items():
        n = sum(d.values())
        ent = -sum((c / n) * math.log(c / n) for c in d.values())
        q2 = n * n / sum(c * c for c in d.values())
        r = out[src]
        assert r["hill_q0"] == len(d)
        assert abs(r["hill_q1"] - math.exp(ent)) < max(1e-3, math.exp(ent) * 1e-4)
        assert abs(r["hill_q2"] - q2) < 1e-3
        # Hill numbers are non-increasing in q
        assert r["hill_q0"] >= r["hill_q1"] - 1e-6 >= r["hill_q2"] - 1e-6


def test_source_cosine_matches_direct(spark, sf_small):
    out = {
        (r["src_a"], r["src_b"]): r["cosine"]
        for r in QUERIES["source_similarity_matrix"](spark, sf_small).collect()
    }
    cnt = _source_counts(sf_small)
    srcs = sorted(cnt)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            dot = sum(c * cnt[b].get(t, 0) for t, c in cnt[a].items())
            na = math.sqrt(sum(c * c for c in cnt[a].values()))
            nb = math.sqrt(sum(c * c for c in cnt[b].values()))
            assert abs(out[(a, b)] - dot / (na * nb)) < 1e-6, (a, b)
            assert 0.0 <= out[(a, b)] <= 1.0 + 1e-9


def test_regular_customers_cv_matches_python(spark, sf_small):
    out = QUERIES["regular_customers_topk"](spark, sf_small).collect()
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE)
            FROM '{sf_small}/orders.parquet' ORDER BY 1, 2"""
    ).fetchall()
    by_ck: dict[int, list] = {}
    for ck, d in rows:
        by_ck.setdefault(ck, []).append(d)
    cvs = []
    for ck, ds in by_ck.items():
        gaps = [(b - a).days for a, b in zip(ds, ds[1:])]
        if len(gaps) >= 5:
            cv = statistics.stdev(gaps) / statistics.mean(gaps)
            cvs.append((round(cv, 6), ck, len(gaps), statistics.mean(gaps)))
    cvs.sort()
    top = cvs[:20]
    assert [r["custkey"] for r in out] == [ck for _, ck, _, _ in top]
    for r, (cv, ck, n, mean) in zip(out, top):
        assert r["n_gaps"] == n
        assert abs(r["mean_gap_days"] - mean) < 1e-6
        assert abs(r["cv"] - cv) < 1e-5


def test_pythagorean_mean_inequality_and_values(spark, sf_small):
    out = QUERIES["pythagorean_means_by_type"](spark, sf_small).collect()
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT event_type, CAST(round(value * 1e3) AS BIGINT)
            FROM '{sf_small}/events.parquet'
            WHERE value IS NOT NULL AND value > 0"""
    ).fetchall()
    by_type: dict[str, list[int]] = {}
    for et, v in rows:
        by_type.setdefault(et, []).append(v)
    got = {r["event_type"]: r for r in out}
    for et, vs in by_type.items():
        xs = [v / 1e3 for v in vs]
        am = sum(xs) / len(xs)
        gm = math.exp(sum(math.log(x) for x in xs) / len(xs))
        hm = len(xs) / sum(1 / x for x in xs)
        r = got[et]
        assert abs(r["mean_arith"] - am) < 1e-5
        assert abs(r["mean_geom"] - gm) < 1e-3
        assert abs(r["mean_harm"] - hm) < 1e-3
        assert r["mean_arith"] >= r["mean_geom"] >= r["mean_harm"]


def test_customer_trend_buckets_match_python(spark, sf_small):
    got = {
        r["trend"]: r["n_customers"]
        for r in QUERIES["customer_trend_buckets"](spark, sf_small).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT o_custkey, CAST(round(o_totalprice) AS BIGINT)
            FROM '{sf_small}/orders.parquet'
            ORDER BY o_custkey, CAST(o_orderdate AS DATE), o_orderkey"""
    ).fetchall()
    by_ck: dict[int, list[int]] = {}
    for ck, y in rows:
        by_ck.setdefault(ck, []).append(y)
    hist: dict[str, int] = {}
    for ck, ys in by_ck.items():
        n = len(ys)
        if n < 5:
            continue
        ts = list(range(1, n + 1))
        sx, sy = sum(ts), sum(ys)
        sxx = sum(t * t for t in ts)
        sxy = sum(t * y for t, y in zip(ts, ys))
        slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
        b = (
            "falling_fast" if slope < -1000
            else "falling" if slope < -100
            else "flat" if slope <= 100
            else "rising" if slope <= 1000
            else "rising_fast"
        )
        hist[b] = hist.get(b, 0) + 1
    assert got == hist
