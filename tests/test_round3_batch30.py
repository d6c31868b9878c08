"""Reference-implementation tests for batch-30 statistics: two-sample KS
and Welch t, Spearman/Kendall rank correlations, Kaplan-Meier survival,
Theil inequality, k-core peeling, and the regex session-pattern counts —
each checked against a direct, independently-coded Python computation on
the same inputs (the oracle-parity hash confirms cross-engine agreement;
these confirm the STATISTIC is the right one)."""

from __future__ import annotations

import math
import re

import duckdb
import pytest

import __spark_entry__ as m

QUERIES = m.queries()


def _events_by_variant(sf_small: str) -> dict[str, tuple[list[int], list[int]]]:
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT event_type, CAST(user_id % 2 AS INTEGER) AS variant,
                   CAST(round(value * 1e3) AS BIGINT) AS v
            FROM '{sf_small}/events.parquet' WHERE value IS NOT NULL"""
    ).fetchall()
    by_type: dict[str, tuple[list[int], list[int]]] = {}
    for et, var, v in rows:
        by_type.setdefault(et, ([], []))[var].append(v)
    return by_type


def test_ks_statistic_matches_empirical_cdf_reference(spark, sf_small):
    out = {
        r["event_type"]: r
        for r in QUERIES["ks_test_value_by_variant"](spark, sf_small).collect()
    }
    for et, (a, b) in _events_by_variant(sf_small).items():
        n0, n1 = len(a), len(b)
        sa, sb = sorted(a), sorted(b)
        d = 0.0
        for x in sorted(set(a) | set(b)):
            f0 = sum(1 for v in sa if v <= x) / n0
            f1 = sum(1 for v in sb if v <= x) / n1
            d = max(d, abs(f0 - f1))
        assert out[et]["n0"] == n0 and out[et]["n1"] == n1
        assert abs(out[et]["ks_d"] - d) < 1e-9, et


def test_welch_t_matches_direct_formula(spark, sf_small):
    out = {
        r["event_type"]: r
        for r in QUERIES["welch_ttest_value_by_variant"](spark, sf_small).collect()
    }
    for et, (a, b) in _events_by_variant(sf_small).items():
        n0, n1 = len(a), len(b)
        m0, m1 = sum(a) / n0, sum(b) / n1
        v0 = sum((x - m0) ** 2 for x in a) / (n0 - 1)
        v1 = sum((x - m1) ** 2 for x in b) / (n1 - 1)
        se0, se1 = v0 / n0, v1 / n1
        t = (m0 - m1) / math.sqrt(se0 + se1)
        dof = (se0 + se1) ** 2 / (se0**2 / (n0 - 1) + se1**2 / (n1 - 1))
        assert abs(out[et]["t_stat"] - t) < 1e-4, et
        assert abs(out[et]["welch_dof"] - dof) < 1e-2, et
        assert abs(out[et]["mean_diff"] - (m0 - m1) / 1e3) < 1e-5, et


def _daily(sf_small: str) -> list[tuple[int, int]]:
    con = duckdb.connect()
    return con.execute(
        f"""SELECT CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT)
            FROM '{sf_small}/orders.parquet'
            GROUP BY CAST(o_orderdate AS DATE) ORDER BY 1, 2"""
    ).fetchall()


def _avg_ranks(vals: list[int]) -> list[float]:
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    ranks = [0.0] * len(vals)
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[order[j]] == vals[order[i]]:
            j += 1
        avg = (i + 1 + j) / 2.0
        for k in range(i, j):
            ranks[order[k]] = avg
        i = j
    return ranks


def test_spearman_matches_rank_pearson_reference(spark, sf_small):
    row = QUERIES["spearman_daily_orders_revenue"](spark, sf_small).collect()[0]
    daily = _daily(sf_small)
    xs, ys = [d[0] for d in daily], [d[1] for d in daily]
    rx, ry = _avg_ranks(xs), _avg_ranks(ys)
    n = len(daily)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    )
    assert row["n_days"] == n
    assert abs(row["rho"] - num / den) < 1e-9


def test_kendall_taub_matches_bruteforce(spark, sf_small):
    row = QUERIES["kendall_tau_daily"](spark, sf_small).collect()[0]
    daily = _daily(sf_small)
    n = len(daily)
    con = dis = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = daily[i][0] - daily[j][0]
            dy = daily[i][1] - daily[j][1]
            if dx * dy > 0:
                con += 1
            elif dx * dy < 0:
                dis += 1
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
    n0 = n * (n - 1) // 2
    taub = (con - dis) / math.sqrt((n0 - tx) * (n0 - ty))
    assert row["concordant"] == con and row["discordant"] == dis
    assert abs(row["tau_b"] - taub) < 1e-9


def test_kaplan_meier_matches_product_limit_reference(spark, sf_small):
    rows = {
        r["gap_days"]: r
        for r in QUERIES["kaplan_meier_order_gaps"](spark, sf_small).collect()
    }
    con = duckdb.connect()
    pairs = con.execute(
        f"""WITH o AS (SELECT DISTINCT o_custkey ck, CAST(o_orderdate AS DATE) d
                       FROM '{sf_small}/orders.parquet')
            SELECT ck, d FROM o ORDER BY ck, d"""
    ).fetchall()
    by_ck: dict[int, list] = {}
    for ck, d in pairs:
        by_ck.setdefault(ck, []).append(d)
    dmax = max(d for _, d in pairs)
    durs: list[tuple[int, int]] = []  # (t, event)
    for ck, ds in by_ck.items():
        for a, b in zip(ds, ds[1:]):
            durs.append(((b - a).days, 1))
        durs.append(((dmax - ds[-1]).days, 0))
    total = len(durs)
    surv = 1.0
    # walk event times in order, maintaining the at-risk count
    by_t: dict[int, tuple[int, int]] = {}
    for t, ev in durs:
        n_all, n_ev = by_t.get(t, (0, 0))
        by_t[t] = (n_all + 1, n_ev + ev)
    removed = 0
    for t in sorted(by_t):
        n_all, n_ev = by_t[t]
        n_risk = total - removed
        removed += n_all
        if n_ev == 0 or n_ev == n_risk:
            continue
        surv *= 1.0 - n_ev / n_risk
        assert t in rows, f"missing event time {t}"
        assert rows[t]["n_risk"] == n_risk and rows[t]["n_events"] == n_ev
        # micro-rounded ln accumulation: relative error <= n_terms * 5e-7
        assert abs(rows[t]["survival"] - surv) < 5e-4, t


def test_theil_index_matches_direct_formula(spark, sf_small):
    out = {
        r["region"]: r for r in QUERIES["theil_index_by_region"](spark, sf_small).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT r.r_name, CAST(SUM(CAST(round(o.o_totalprice * 1e6) AS BIGINT)) AS BIGINT)
            FROM '{sf_small}/orders.parquet' o
            JOIN '{sf_small}/customer.parquet' c ON o.o_custkey = c.c_custkey
            JOIN '{sf_small}/nation.parquet' n ON c.c_nationkey = n.n_nationkey
            JOIN '{sf_small}/region.parquet' r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name, c.c_custkey"""
    ).fetchall()
    by_region: dict[str, list[int]] = {}
    for reg, x in rows:
        by_region.setdefault(reg, []).append(x)
    for reg, xs in by_region.items():
        n, tot = len(xs), sum(xs)
        t = sum((x / tot) * math.log(x * n / tot) for x in xs)
        assert out[reg]["n_customers"] == n
        assert abs(out[reg]["theil_t"] - t) < 1e-4, reg
        assert 0.0 <= out[reg]["theil_t"] <= math.log(n) + 1e-9


def test_kcore_peel_matches_bruteforce(spark, sf_small):
    got = {
        r["round"]: (r["n_nodes"], r["n_edges"])
        for r in QUERIES["kcore_peel_rounds"](spark, sf_small).collect()
    }
    con = duckdb.connect()
    edges = set(
        map(
            tuple,
            con.execute(
                f"""WITH bsk AS (SELECT DISTINCT l_orderkey ok, l_partkey pk
                                FROM '{sf_small}/lineitem.parquet')
                    SELECT a.pk, b.pk FROM bsk a JOIN bsk b
                    ON a.ok = b.ok AND a.pk < b.pk
                    GROUP BY 1, 2 HAVING COUNT(*) >= 2"""
            ).fetchall(),
        )
    )
    for rnd in (1, 2, 3):
        deg: dict[int, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {v for v, d in deg.items() if d >= 3}
        edges = {(a, b) for a, b in edges if a in keep and b in keep}
        assert got[rnd] == (len(keep), len(edges)), f"round {rnd}"


def test_session_patterns_match_python_re(spark, sf_small):
    row = QUERIES["session_pattern_funnel_regex"](spark, sf_small).collect()[0]
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT user_id, CAST(ts AS DATE), ts, event_id, event_type
            FROM '{sf_small}/events.parquet' ORDER BY user_id, 2, ts, event_id"""
    ).fetchall()
    sess: dict[tuple, list[str]] = {}
    for uid, d, ts, eid, et in rows:
        sess.setdefault((uid, d), []).append(et)
    seqs = [",".join(v) for v in sess.values()]
    assert row["n_sessions"] == len(seqs)
    assert row["views_then_purchase"] == sum(
        1 for s in seqs if re.search(r"(^|,)view(,view)*,purchase", s)
    )
    assert row["signup_to_purchase"] == sum(
        1 for s in seqs if re.search(r"(^|,)signup(,[a-z]+)*,purchase", s)
    )
    assert row["error_free"] == sum(1 for s in seqs if "error" not in s)


def test_dsir_scores_match_python_lm_reference(spark, sf_small):
    out = QUERIES["dsir_importance_topk"](spark, sf_small).collect()
    assert len(out) == 20
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, lang, text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    tok = {
        doc_id: re.sub(r"\s+", " ", text).strip().split(" ")
        for doc_id, _, text in docs
    }
    va: dict[str, int] = {}
    vt: dict[str, int] = {}
    for doc_id, lang, _ in docs:
        for t in tok[doc_id]:
            va[t] = va.get(t, 0) + 1
            if lang == "en":
                vt[t] = vt.get(t, 0) + 1
    na, nt, v = sum(va.values()), sum(vt.values()), len(va)
    lr = {
        t: math.log(((vt.get(t, 0) + 1) / (nt + v)) / ((ca + 1) / (na + v)))
        for t, ca in va.items()
    }
    score = {
        doc_id: sum(lr[t] for t in ts) / len(ts) for doc_id, ts in tok.items() if ts
    }
    for r in out:
        assert abs(r["dsir_logratio"] - score[r["doc_id"]]) < 1e-4, r["doc_id"]
    # ordering is (score desc, doc_id) and the top-20 is the true top-20
    scores = [r["dsir_logratio"] for r in out]
    assert scores == sorted(scores, reverse=True)
    true_top = sorted(score.values(), reverse=True)[19]
    assert scores[-1] >= true_top - 1e-4
    # enrichment sanity: the en share of the top-20 is at least the corpus
    # en share (the synthetic corpus shares vocabulary across langs, so
    # dominance is not expected — enrichment is)
    langs = {doc_id: lang for doc_id, lang, _ in docs}
    en_share = sum(1 for lang in langs.values() if lang == "en") / len(langs)
    assert sum(1 for r in out if langs[r["doc_id"]] == "en") >= int(20 * en_share)
