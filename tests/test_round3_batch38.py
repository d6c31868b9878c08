"""Reference-implementation tests for batch 38: Adamic-Adar link
prediction vs a brute-force Python graph computation, Cramér's V vs the
textbook contingency formula, dispersion index vs direct variance/mean,
Simpson's slope audit vs exact least-squares, temperature sampling
weights vs the closed form, and repeated-n-gram span coverage vs a
brute-force span merger on the raw tokens."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as m

QUERIES = m.queries()


def _edges(sf_small):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT DISTINCT a.l_partkey, b.l_partkey
        FROM '{sf_small}/lineitem.parquet' a
        JOIN '{sf_small}/lineitem.parquet' b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        """
    ).fetchall()
    return {(a, b) for a, b in rows}


def test_adamic_adar_matches_bruteforce(spark, sf_small):
    out = QUERIES["adamic_adar_linkpred_topk"](spark, sf_small).collect()
    edges = _edges(sf_small)
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    scores = defaultdict(lambda: [0, 0])  # (i,j) -> [cn, aa_micro]
    for z, ns in nbrs.items():
        if not (2 <= len(ns) <= 64):
            continue
        w = round(1e6 / math.log(len(ns)))
        ns_sorted = sorted(ns)
        for ii in range(len(ns_sorted)):
            for jj in range(ii + 1, len(ns_sorted)):
                pair = (ns_sorted[ii], ns_sorted[jj])
                scores[pair][0] += 1
                scores[pair][1] += w
    ranked = sorted(
        ((p, cn, aa) for p, (cn, aa) in scores.items() if p not in edges),
        key=lambda t: (-t[2], t[0]),
    )[:20]
    assert len(out) == len(ranked)
    for row, (pair, cn, aa) in zip(out, ranked):
        assert (row["src"], row["dst"]) == pair
        assert row["common_neighbors"] == cn
        assert abs(row["adamic_adar"] - aa / 1e6) < 1e-9


def test_cramers_v_matches_textbook(spark, sf_small):
    out = {
        (r["var_x"], r["var_y"]): r
        for r in QUERIES["cramers_v_pairs"](spark, sf_small).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT o_orderstatus, o_orderpriority,
                   CAST(isodow(CAST(o_orderdate AS DATE)) - 1 AS INTEGER),
                   CAST(month(o_orderdate) AS INTEGER)
            FROM '{sf_small}/orders.parquet'"""
    ).fetchall()
    cols = {"status": 0, "priority": 1, "weekday": 2, "month": 3}
    for (xn, yn), r in out.items():
        xs = [t[cols[xn]] for t in rows]
        ys = [t[cols[yn]] for t in rows]
        n = len(xs)
        obs = Counter(zip(xs, ys))
        rt, ct = Counter(xs), Counter(ys)
        chi2 = sum(
            round(1e6 * (obs.get((x, y), 0) - rt[x] * ct[y] / n) ** 2 / (rt[x] * ct[y] / n))
            for x in rt
            for y in ct
        ) / 1e6
        dof = min(len(rt) - 1, len(ct) - 1)
        v = math.sqrt(chi2 / (n * dof))
        assert r["n"] == n and r["dof"] == dof
        assert abs(r["chi2"] - chi2) < 2e-6
        assert abs(r["cramers_v"] - v) < 1e-6
        assert 0.0 <= r["cramers_v"] <= 1.0


def test_dispersion_index_matches_direct(spark, sf_small):
    out = {r["event_type"]: r for r in QUERIES["dispersion_index_by_type"](spark, sf_small).collect()}
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT event_type, CAST(ts AS DATE), COUNT(*)
            FROM '{sf_small}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    per = defaultdict(list)
    for et, _, c in rows:
        per[et].append(c)
    assert set(out) == set(per)
    for et, cs in per.items():
        n = len(cs)
        mean = sum(cs) / n
        var = sum((c - mean) ** 2 for c in cs) / (n - 1)
        r = out[et]
        assert r["n_days"] == n and r["n_events"] == sum(cs)
        assert abs(r["dispersion_index"] - var / mean) < 1e-5
        assert r["overdispersed"] == (var / mean > 1.5)


def test_simpsons_slopes_match_exact_ols(spark, sf_small):
    out = {r["scope"]: r for r in QUERIES["simpsons_paradox_slopes"](spark, sf_small).collect()}
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT coalesce(l_returnflag, 'ALL'), l_quantity, l_extendedprice
            FROM '{sf_small}/lineitem.parquet'"""
    ).fetchall()
    groups = defaultdict(list)
    for g, x, y in rows:
        groups[g].append((int(x), round(y * 100)))
        groups["ALL"].append((int(x), round(y * 100)))
    for scope, pts in groups.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx) / 100.0
        r = out[scope]
        assert r["n"] == n
        assert abs(r["slope"] - slope) < 1e-5
    overall = out["ALL"]["slope"]
    for scope, r in out.items():
        assert r["overall_slope"] == overall
        assert r["sign_disagrees"] == (math.copysign(1, r["slope"]) != math.copysign(1, overall))


def test_temperature_weights_closed_form(spark, sf_small):
    out = {r["lang"]: r for r in QUERIES["temperature_sampling_weights"](spark, sf_small).collect()}
    con = duckdb.connect()
    counts = dict(
        con.execute(
            f"SELECT lang, COUNT(*) FROM '{sf_small}/documents.parquet' GROUP BY lang"
        ).fetchall()
    )
    total = sum(counts.values())
    w_micro = {l: round(1e6 * (c / total) ** 0.3) for l, c in counts.items()}
    wsum = sum(w_micro.values())
    for lang, c in counts.items():
        r = out[lang]
        assert r["n_docs"] == c
        assert abs(r["prob"] - c / total) < 1e-6
        assert abs(r["sample_weight"] - w_micro[lang] / wsum) < 1e-6
        # temperature < 1 compresses: rare langs boosted, dominant damped
        if c / total < 1 / len(counts):
            assert r["boost"] > 1.0
    assert abs(sum(r["sample_weight"] for r in out.values()) - 1.0) < 1e-4


def test_repeated_ngram_spans_match_bruteforce(spark, sf_small):
    out = {r["doc_id"]: r for r in QUERIES["repeated_ngram_span_coverage"](spark, sf_small).collect()}
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    n = 8
    toks = {d: re.sub(r"\s+", " ", t).strip().split(" ") for d, t in rows}
    gram_docs = defaultdict(set)
    grams = {}
    for d, ts in toks.items():
        gs = [" ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)]
        grams[d] = gs
        for g in gs:
            gram_docs[g].add(d)
    for d, ts in toks.items():
        spans = [
            (i, i + n - 1) for i, g in enumerate(grams[d]) if len(gram_docs[g]) >= 2
        ]
        merged = []
        for s, e in spans:
            if merged and s <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        dup_tokens = sum(e - s + 1 for s, e in merged)
        r = out[d]
        assert r["total_tokens"] == len(ts)
        assert r["n_dup_grams"] == len(spans)
        assert r["n_spans"] == len(merged)
        assert r["dup_tokens"] == dup_tokens
        assert abs(r["dup_pct"] - dup_tokens / len(ts)) < 1e-6
