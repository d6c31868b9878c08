"""Reference tests for batch 43: Cohen's kappa vs direct marginal math,
session-path edit distances vs python Levenshtein, the two-proportion
z-test vs the closed form, and detector P/R against brute-force pair
sets."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as m

QUERIES = m.queries()


def test_cohens_kappa_matches_confusion_matrix(spark, sf_small):
    row = QUERIES["cohens_kappa_langid"](spark, sf_small).collect()[0]
    conf = {
        (r["lang"], r["detected"]): r["n"]
        for r in QUERIES["lang_id_confusion"](spark, sf_small).collect()
    }
    n = sum(conf.values())
    agree = sum(v for (a, b), v in conf.items() if a == b)
    rt, ct = Counter(), Counter()
    for (a, b), v in conf.items():
        rt[a] += v
        ct[b] += v
    exp = sum(rt[l] * ct[l] for l in set(rt) & set(ct))
    po, pe = agree / n, exp / (n * n)
    kappa = (po - pe) / (1 - pe)
    assert row["n_docs"] == n and row["n_agree"] == agree
    assert abs(row["po"] - po) < 1e-6
    assert abs(row["pe"] - pe) < 1e-6
    assert abs(row["kappa"] - kappa) < 1e-5
    assert -1.0 <= row["kappa"] <= 1.0


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_session_path_distances_match_python(spark, sf_small):
    rows = QUERIES["session_path_edit_distance"](spark, sf_small).collect()
    con = duckdb.connect()
    ev = con.execute(
        f"""SELECT user_id, event_id, epoch_us(ts), event_type
            FROM '{sf_small}/events.parquet' ORDER BY user_id, 3, 2"""
    ).fetchall()
    per = defaultdict(list)
    for u, eid, us, et in ev:
        per[u].append((us, et))
    paths = []
    for u, evs in per.items():
        cur = []
        last = None
        for us, et in evs:
            if last is not None and us - last > 30 * 60 * 1_000_000:
                paths.append("".join(cur))
                cur = []
            cur.append(et[0])
            last = us
        paths.append("".join(cur))
    occ = Counter(paths)
    modal = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    hist = Counter(_lev(p, modal) for p in paths)
    assert {r["edit_distance"]: r["n_sessions"] for r in rows} == dict(hist)
    assert all(r["modal_path"] == modal for r in rows)


def test_two_proportion_ztest_closed_form(spark, sf_small):
    row = QUERIES["two_proportion_ztest"](spark, sf_small).collect()[0]
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT user_id % 2, MAX(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)
            FROM '{sf_small}/events.parquet' GROUP BY user_id, CAST(ts AS DATE)"""
    ).fetchall()
    n = Counter()
    k = Counter()
    for v, c in rows:
        n[v] += 1
        k[v] += c
    p1, p2 = k[0] / n[0], k[1] / n[1]
    pp = (k[0] + k[1]) / (n[0] + n[1])
    z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / n[0] + 1 / n[1]))
    assert row["n1"] == n[0] and row["k1"] == k[0]
    assert row["n2"] == n[1] and row["k2"] == k[1]
    assert abs(row["z"] - z) < 1e-5
    assert row["significant_95"] == (abs(z) > 1.959964)


def test_dedup_detector_pr_bruteforce(spark, sf_small):
    row = QUERIES["dedup_detector_pr"](spark, sf_small).collect()[0]
    con = duckdb.connect()
    docs = con.execute(f"SELECT doc_id, text FROM '{sf_small}/documents.parquet'").fetchall()
    sh = {}
    pfx = defaultdict(set)
    for d, t in docs:
        ts = re.sub(r"\s+", " ", t).strip().split(" ")
        sh[d] = {" ".join(ts[i : i + 3]) for i in range(len(ts) - 2)}
        pfx[" ".join(ts[:16])].add(d)
    truth = set()
    for g in pfx.values():
        g = sorted(g)
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                truth.add((g[i], g[j]))
    det = set()
    ids = sorted(sh)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            inter = len(sh[a] & sh[b])
            if inter and inter / len(sh[a] | sh[b]) >= 0.1:
                det.add((a, b))
    tp = len(det & truth)
    assert row["n_truth"] == len(truth)
    assert row["n_detected"] == len(det)
    assert row["tp"] == tp
    assert abs(row["precision"] - tp / len(det)) < 1e-6
    assert abs(row["recall"] - tp / len(truth)) < 1e-6
    assert 0.0 <= row["f1"] <= 1.0
