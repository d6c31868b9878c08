"""Reference-implementation tests for batch-32: calibration bins,
vocabulary coverage, repetition run-lengths, MASE, the Hampel filter,
Neyman allocation, and second-order Markov transitions."""

from __future__ import annotations

import math
import re
import statistics

import duckdb

import __spark_entry__ as m

QUERIES = m.queries()


def _toks(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text).strip().split(" ")


def test_calibration_bins_match_direct_computation(spark, sf_small):
    out = {
        r["bucket"]: r
        for r in QUERIES["calibration_reliability_bins"](spark, sf_small).collect()
    }
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, lang, text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    stops = {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"}
    by_bucket: dict[int, list[tuple[float, bool]]] = {}
    for _, lang, text in docs:
        ts = _toks(text)
        stop_r = sum(1 for t in ts if t in stops) / len(ts) if ts else 0.0
        n_punct = len(re.findall(r"[^\w\s]", text))
        punct_r = n_punct / len(text) if text else 1.0
        len_norm = min(len(text), 2000) / 2000.0
        score = round(
            1.0 / (1.0 + math.exp(-(-1.5 + 3.0 * stop_r - 2.0 * punct_r + 1.0 * len_norm))),
            6,
        )
        by_bucket.setdefault(int(score * 10), []).append((score, lang == "en"))
    for b, rows in by_bucket.items():
        n = len(rows)
        assert out[b]["n"] == n, b
        assert abs(out[b]["mean_pred"] - sum(s for s, _ in rows) / n) < 1e-5, b
        assert abs(out[b]["frac_en"] - sum(1 for _, e in rows if e) / n) < 1e-9, b


def test_vocab_coverage_monotone_and_exact(spark, sf_small):
    out = {r["k"]: r for r in QUERIES["vocab_coverage_topk"](spark, sf_small).collect()}
    con = duckdb.connect()
    docs = con.execute(f"SELECT text FROM '{sf_small}/documents.parquet'").fetchall()
    freq: dict[str, int] = {}
    for (text,) in docs:
        for t in _toks(text):
            freq[t] = freq.get(t, 0) + 1
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(freq.values())
    for k in (10, 100, 1000):
        covered = sum(c for _, c in ranked[:k])
        assert out[k]["covered"] == covered, k
        assert out[k]["n_vocab_used"] == min(k, len(ranked))
        assert abs(out[k]["share"] - covered / total) < 1e-12
    assert out[10]["share"] <= out[100]["share"] <= out[1000]["share"]


def test_max_runlength_matches_python_scan(spark, sf_small):
    got = {
        r["max_run"]: r["n_docs"]
        for r in QUERIES["max_token_runlength"](spark, sf_small).collect()
    }
    con = duckdb.connect()
    docs = con.execute(f"SELECT text FROM '{sf_small}/documents.parquet'").fetchall()
    hist: dict[int, int] = {}
    for (text,) in docs:
        ts = _toks(text)
        best = cur = 1
        for a, b in zip(ts, ts[1:]):
            cur = cur + 1 if a == b else 1
            best = max(best, cur)
        hist[best] = hist.get(best, 0) + 1
    assert got == hist


def test_mase_matches_python_lags(spark, sf_small):
    row = QUERIES["mase_seasonal_naive"](spark, sf_small).collect()[0]
    con = duckdb.connect()
    daily = con.execute(
        f"""SELECT CAST(SUM(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT)
            FROM '{sf_small}/orders.parquet'
            GROUP BY CAST(o_orderdate AS DATE)
            ORDER BY CAST(o_orderdate AS DATE)"""
    ).fetchall()
    ys = [y for (y,) in daily]
    en, es = [], []
    for t in range(7, len(ys)):
        en.append(abs(ys[t] - ys[t - 1]))
        es.append(abs(ys[t] - ys[t - 7]))
    assert row["n_days_scored"] == len(en)
    assert abs(row["mae_naive"] - sum(en) / len(en) / 1e6) < 1e-5
    assert abs(row["mae_seasonal"] - sum(es) / len(es) / 1e6) < 1e-5
    assert abs(row["mase_ratio"] - (sum(es) / len(es)) / (sum(en) / len(en))) < 1e-8


def test_hampel_matches_python_rolling_median(spark, sf_small):
    out = {r["day"]: r for r in QUERIES["hampel_outliers_daily"](spark, sf_small).collect()}
    con = duckdb.connect()
    daily = con.execute(
        f"""SELECT CAST(CAST(ts AS DATE) AS VARCHAR), COUNT(*)
            FROM '{sf_small}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    xs = [c for _, c in daily]
    for t, (day, cnt) in enumerate(daily):
        lo, hi = max(0, t - 3), min(len(xs), t + 4)
        wnd = xs[lo:hi]
        med = statistics.median(wnd)
        mad = statistics.median([abs(x - med) for x in wnd])
        r = out[day]
        assert r["cnt"] == cnt
        assert abs(r["med"] - med) < 1e-6
        assert abs(r["mad"] - mad) < 1e-6
        assert r["is_outlier"] == (abs(cnt - med) > 4.4478 * mad)


def test_neyman_allocation_properties(spark, sf_small):
    rows = QUERIES["neyman_allocation_by_type"](spark, sf_small).collect()
    con = duckdb.connect()
    data = con.execute(
        f"""SELECT event_type, CAST(round(value * 1e3) AS BIGINT)
            FROM '{sf_small}/events.parquet' WHERE value IS NOT NULL"""
    ).fetchall()
    by_type: dict[str, list[int]] = {}
    for et, v in data:
        by_type.setdefault(et, []).append(v)
    weights = {}
    for et, vs in by_type.items():
        sd = statistics.stdev(vs) / 1e3
        weights[et] = len(vs) * sd
        got = next(r for r in rows if r["event_type"] == et)
        assert got["n_rows"] == len(vs)
        assert abs(got["stddev"] - sd) < 1e-4
    wtot = sum(weights.values())
    for r in rows:
        expect = 1000.0 * weights[r["event_type"]] / wtot
        assert abs(r["alloc"] - expect) <= 1.0, r["event_type"]
    # rounding keeps the budget within one unit per stratum of 1000
    assert abs(sum(r["alloc"] for r in rows) - 1000) <= len(rows)


def test_markov2_conditional_probs_match_python(spark, sf_small):
    out = QUERIES["markov2_transitions_topk"](spark, sf_small).collect()
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT user_id, CAST(ts AS DATE), event_type
            FROM '{sf_small}/events.parquet' ORDER BY user_id, 2, ts, event_id"""
    ).fetchall()
    sess: dict[tuple, list[str]] = {}
    for uid, d, et in rows:
        sess.setdefault((uid, d), []).append(et)
    tri: dict[tuple, int] = {}
    pair: dict[tuple, int] = {}
    for seq in sess.values():
        for a, b, c in zip(seq, seq[1:], seq[2:]):
            tri[(a, b, c)] = tri.get((a, b, c), 0) + 1
            pair[(a, b)] = pair.get((a, b), 0) + 1
    ranked = sorted(
        ((n / pair[(a, b)], a, b, c, n) for (a, b, c), n in tri.items()),
        key=lambda t: (-t[0], t[1], t[2], t[3]),
    )[:15]
    assert len(out) == 15
    for r, (p, a, b, c, n) in zip(out, ranked):
        assert (r["prev2"], r["prev1"], r["next_type"]) == (a, b, c)
        assert r["n3"] == n and r["n2"] == pair[(a, b)]
        assert abs(r["cond_prob"] - p) < 1e-9
