"""Reference-implementation tests for batch-33: empirical-Bayes
shrinkage, log-log elasticity, duplicate-invoice screening, nth_value
frames, and the HOF-based view-to-purchase step gaps."""

from __future__ import annotations

import math
import statistics

import duckdb

import __spark_entry__ as m

QUERIES = m.queries()


def test_eb_shrinkage_matches_method_of_moments(spark, sf_small):
    out = QUERIES["eb_shrunk_return_rates"](spark, sf_small).collect()
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT l_partkey, COUNT(*), count_if(l_returnflag = 'R')
            FROM '{sf_small}/lineitem.parquet' GROUP BY l_partkey"""
    ).fetchall()
    rates = [round(1e6 * r / n) / 1e6 for _, n, r in rows]
    mu = sum(rates) / len(rates)
    var = statistics.variance(rates)
    k = mu * (1 - mu) / var - 1
    alpha, beta = mu * k, (1 - mu) * k
    shrunk = sorted(
        (((r + alpha) / (n + alpha + beta), pk, n, r) for pk, n, r in rows),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    assert [o["part_key"] for o in out] == [pk for _, pk, _, _ in shrunk]
    for o, (s, pk, n, r) in zip(out, shrunk):
        assert o["n"] == n and o["n_returned"] == r
        assert abs(o["shrunk_rate"] - s) < 1e-4
        # shrinkage pulls every estimate toward the prior mean
        raw = r / n
        assert (o["shrunk_rate"] - mu) * (raw - mu) >= -1e-9
        assert abs(o["shrunk_rate"] - mu) <= abs(raw - mu) + 1e-9


def test_elasticity_matches_numpy_slope(spark, sf_small):
    import numpy as np

    out = {
        r["brand"]: r
        for r in QUERIES["elasticity_loglog_by_brand"](spark, sf_small).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT p.p_brand, l.l_quantity, l.l_extendedprice
            FROM '{sf_small}/lineitem.parquet' l
            JOIN '{sf_small}/part.parquet' p ON l.l_partkey = p.p_partkey"""
    ).fetchall()
    by_brand: dict[str, list] = {}
    for b, q, p in rows:
        by_brand.setdefault(b, []).append((math.log(q), math.log(p / q)))
    for b, data in by_brand.items():
        x = np.array([lp for _, lp in data])
        y = np.array([lq for lq, _ in data])
        slope = np.polyfit(x, y, 1)[0]
        assert abs(out[b]["elasticity"] - slope) < 1e-3, b
        assert out[b]["n"] == len(data)


def test_dup_invoice_pairs_match_bruteforce(spark, sf_small):
    got = {
        (r["custkey"], r["order_a"], r["order_b"])
        for r in QUERIES["dup_invoice_candidates"](spark, sf_small).collect()
    }
    con = duckdb.connect()
    orders = con.execute(
        f"""SELECT o_custkey, o_orderkey, round(o_totalprice / 1000),
                   CAST(o_orderdate AS DATE)
            FROM '{sf_small}/orders.parquet'"""
    ).fetchall()
    by_ck: dict[int, list] = {}
    for ck, ok, kb, d in orders:
        by_ck.setdefault(ck, []).append((ok, kb, d))
    expect = set()
    for ck, rows in by_ck.items():
        for i, (ok1, kb1, d1) in enumerate(rows):
            for ok2, kb2, d2 in rows[i + 1 :]:
                a, b = min(ok1, ok2), max(ok1, ok2)
                da, db = (d1, d2) if ok1 < ok2 else (d2, d1)
                if kb1 == kb2 and abs((db - da).days) <= 45:
                    expect.add((ck, a, b))
    assert got == expect


def test_nth_value_first_second_last(spark, sf_small):
    out = QUERIES["window_nth_value_frames"](spark, sf_small).collect()
    con = duckdb.connect()
    orders = con.execute(
        f"""SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE),
                   CAST(round(o_totalprice * 1e6) AS BIGINT)
            FROM '{sf_small}/orders.parquet'
            ORDER BY o_custkey, 3, o_orderkey"""
    ).fetchall()
    by_ck: dict[int, list[int]] = {}
    for ck, ok, d, mv in orders:
        by_ck.setdefault(ck, []).append(mv)
    eligible = sorted(ck for ck, vs in by_ck.items() if len(vs) >= 3)[:50]
    assert [r["custkey"] for r in out] == eligible
    for r in out:
        vs = by_ck[r["custkey"]]
        assert abs(r["first_price"] - vs[0] / 1e6) < 1e-6
        assert abs(r["second_price"] - vs[1] / 1e6) < 1e-6
        assert abs(r["last_price"] - vs[-1] / 1e6) < 1e-6


def test_step_gaps_match_python_scan(spark, sf_small):
    got = {
        r["step_gap"]: r["n"]
        for r in QUERIES["view_to_purchase_step_gap"](spark, sf_small).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT user_id, CAST(ts AS DATE), event_type
            FROM '{sf_small}/events.parquet' ORDER BY user_id, 2, ts, event_id"""
    ).fetchall()
    sess: dict[tuple, list[str]] = {}
    for uid, d, et in rows:
        sess.setdefault((uid, d), []).append(et)
    hist: dict[int, int] = {}
    for seq in sess.values():
        for i, et in enumerate(seq):
            if et != "view":
                continue
            nxt = next((j for j in range(i + 1, len(seq)) if seq[j] == "purchase"), None)
            if nxt is not None:
                g = nxt - i
                hist[g] = hist.get(g, 0) + 1
    assert got == hist
