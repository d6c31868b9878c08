"""Reference tests for batch 44: PSI drift vs direct binning, sample-size
planner vs the closed form, tokenizer fertility vs regex counts, the LSH
S-curve table vs math, and first-vs-last attribution conservation."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as m

QUERIES = m.queries()


def _round_half_away(x: float) -> int:
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def test_psi_matches_direct_binning(spark, sf_small):
    out = {r["source"]: r for r in QUERIES["psi_drift_sources"](spark, sf_small).collect()}
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT source, n_chars FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    per = defaultdict(list)
    for s, n in rows:
        per[s].append(n)
    base_vals = sorted(per["src0"])

    def qdisc(vals, q):
        return vals[max(math.ceil(q * len(vals)) - 1, 0)]

    edges = [qdisc(base_vals, q / 10) for q in range(1, 10)]

    def hist(vals):
        h = Counter()
        for v in vals:
            h[1 + sum(1 for e in edges if e < v)] += 1
        return h

    hb = hist(per["src0"])
    nb = sum(hb.values())
    for src, vals in per.items():
        if src == "src0":
            assert src not in out
            continue
        hc = hist(vals)
        nc = sum(hc.values())
        t = 0
        n_bins = 0
        for b, cnt_b in hb.items():
            p = cnt_b / nb
            q = hc.get(b, 0) / nc
            n_bins += 1
            t += _round_half_away(
                1e9 * (q - p) * math.log(max(q, 1e-9) / max(p, 1e-9))
            )
        r = out[src]
        assert r["n_bins"] == n_bins
        assert abs(r["psi"] - t / 1e9) < 2e-6
        assert r["psi"] >= 0 or True  # PSI can be slightly negative only from eps floors


def test_sample_size_closed_form(spark, sf_small):
    rows = QUERIES["ab_sample_size_planner"](spark, sf_small).collect()
    con = duckdb.connect()
    n, k = con.execute(
        f"""SELECT COUNT(*), SUM(c) FROM (
            SELECT MAX(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) c
            FROM '{sf_small}/events.parquet' GROUP BY user_id, CAST(ts AS DATE))"""
    ).fetchone()
    p = k / n
    zs = 1.959964 + 0.841621
    for r in rows:
        expect = math.ceil(2.0 * zs * zs * p * (1 - p) / (r["delta"] ** 2))
        assert r["n_per_arm"] == expect
        assert abs(r["baseline_rate"] - p) < 1e-6
        assert r["observed_units"] == n
        assert r["powered_today"] == (n >= 2 * expect)
    # bigger MDE -> smaller n
    ns = [r["n_per_arm"] for r in sorted(rows, key=lambda r: r["delta"])]
    assert ns == sorted(ns, reverse=True)


def test_tokenizer_fertility_regex(spark, sf_small):
    out = {r["lang"]: r for r in QUERIES["tokenizer_fertility_by_lang"](spark, sf_small).collect()}
    con = duckdb.connect()
    rows = con.execute(f"SELECT lang, text FROM '{sf_small}/documents.parquet'").fetchall()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    pat = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")
    for lang, text in rows:
        a = agg[lang]
        a[0] += 1
        a[1] += len(pat.findall(text))
        a[2] += len(re.sub(r"\s+", " ", text).strip().split(" "))
        a[3] += len(text)
    for lang, (nd, bpe, ws, ch) in agg.items():
        r = out[lang]
        assert r["n_docs"] == nd and r["bpe_tokens"] == bpe and r["ws_tokens"] == ws
        assert abs(r["fertility"] - bpe / ws) < 1e-6
        assert abs(r["chars_per_token"] - ch / bpe) < 1e-6
        assert r["fertility"] >= 1.0  # sub-word never coarser than words


def test_lsh_s_curve_math(spark, sf_small):
    rows = QUERIES["lsh_s_curve_planner"](spark, sf_small).collect()
    assert len(rows) == 4 * 3 * 4
    for r in rows:
        b, rr, s = r["n_bands"], r["rows_per_band"], r["jaccard"]
        assert abs(r["p_candidate"] - (1 - (1 - s**rr) ** b)) < 1e-6
        assert abs(r["s_threshold"] - (1 / b) ** (1 / rr)) < 1e-6
        assert 0.0 <= r["p_candidate"] <= 1.0
    # monotone: more bands -> higher candidate probability at fixed (r, s)
    by_rs = defaultdict(list)
    for r in rows:
        by_rs[(r["rows_per_band"], r["jaccard"])].append((r["n_bands"], r["p_candidate"]))
    for pairs in by_rs.values():
        ps = [p for _, p in sorted(pairs)]
        assert ps == sorted(ps)


def test_attribution_models_conserve_credit(spark, sf_small):
    rows = QUERIES["attribution_first_vs_last"](spark, sf_small).collect()
    con = duckdb.connect()
    total = con.execute(
        f"""SELECT COUNT(*), SUM(CAST(round(value*1e6) AS BIGINT))
            FROM '{sf_small}/events.parquet' e
            WHERE event_type = 'purchase'
              AND EXISTS (SELECT 1 FROM '{sf_small}/events.parquet' x
                          WHERE x.user_id = e.user_id AND x.event_type <> 'purchase')"""
    ).fetchone()
    n_p, sv = total
    # each purchase gets exactly one credit under each model
    assert sum(r["first_touch_purchases"] for r in rows) == n_p
    assert sum(r["last_touch_purchases"] for r in rows) == n_p
    assert abs(sum(r["first_touch_value"] for r in rows) - sv / 1e6) < 1e-3
    assert abs(sum(r["last_touch_value"] for r in rows) - sv / 1e6) < 1e-3
    for r in rows:
        assert abs(
            r["value_shift"] - (r["last_touch_value"] - r["first_touch_value"])
        ) < 2e-6
