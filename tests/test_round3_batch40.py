"""Reference-implementation tests for batch 40: STL residual
decomposition vs a direct Python pass, cohort LTV vs brute force, the
relational Bloom filter's guarantees (no false negatives, exact md5
replay), BPE first-merge counts vs a Python scan, local bridges vs a
networkx-free triangle check, and nth-purchase latency vs sorted gaps."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as m

QUERIES = m.queries()


def _round_half_away(x: float) -> int:
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def test_stl_decomposition_matches_python(spark, sf_small):
    rows = QUERIES["stl_residual_outliers"](spark, sf_small).collect()
    con = duckdb.connect()
    daily = con.execute(
        f"""SELECT CAST(ts AS DATE) d, COUNT(*) FROM '{sf_small}/events.parquet'
            GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    days = [d for d, _ in daily]
    cs = [c for _, c in daily]
    recs = []
    for i in range(3, len(cs) - 3):
        trend = sum(cs[i - 3 : i + 4]) / 7.0
        det = _round_half_away(1e6 * (cs[i] - trend))
        recs.append([days[i], cs[i], days[i].weekday(), trend, det])
    sea = {}
    for dow in set(r[2] for r in recs):
        ds = [r[4] for r in recs if r[2] == dow]
        sea[dow] = _round_half_away(sum(ds) / len(ds))
    res = [r[4] - sea[r[2]] for r in recs]
    n = len(res)
    s1, s2 = sum(res), sum(x * x for x in res)
    var = (n * s2 - s1 * s1) / (n * (n - 1))
    assert len(rows) == len(recs)
    for row, rec, rm in zip(rows, recs, res):
        assert row["day"] == str(rec[0]) and row["n_events"] == rec[1]
        assert row["dow"] == rec[2]
        assert abs(row["trend"] - rec[3]) < 1e-6
        assert abs(row["seasonal"] - sea[rec[2]] / 1e6) < 2e-6
        assert abs(row["residual"] - rm / 1e6) < 2e-6
        assert row["is_outlier"] == (rm * rm > 4.0 * var)
    # decomposition identity: trend + seasonal + residual == count (to µ)
    for row in rows:
        recon = row["trend"] + row["seasonal"] + row["residual"]
        assert abs(recon - row["n_events"]) < 5e-6


def test_cohort_ltv_matches_bruteforce(spark, sf_small):
    out = {(r["cohort_m"], r["age_m"]): r for r in QUERIES["cohort_cumulative_ltv"](spark, sf_small).collect()}
    con = duckdb.connect()
    orders = con.execute(
        f"""SELECT o_custkey, year(o_orderdate)*12 + month(o_orderdate),
                   CAST(round(o_totalprice*100) AS BIGINT)
            FROM '{sf_small}/orders.parquet'"""
    ).fetchall()
    first = {}
    for k, om, _ in orders:
        first[k] = min(first.get(k, om), om)
    size = Counter(first.values())
    rev = defaultdict(lambda: [0, 0])
    for k, om, cents in orders:
        c = first[k]
        rev[(c, om - c)][0] += cents
        rev[(c, om - c)][1] += 1
    cum = {}
    for c in {c for c, _ in rev}:
        ages = sorted(a for cc, a in rev if cc == c)
        running = 0
        for a in ages:
            running += rev[(c, a)][0]
            cum[(c, a)] = running
    for (c, a), r in out.items():
        assert r["cohort_size"] == size[c]
        assert r["n_orders"] == rev[(c, a)][1]
        assert abs(r["cum_revenue"] - cum[(c, a)] / 100.0) < 0.01
        assert abs(r["ltv_per_customer"] - cum[(c, a)] / 100.0 / size[c]) < 1e-4
        assert a <= 12
    # every present (cohort, age<=12) cell is reported
    assert set(out) == {(c, a) for (c, a) in cum if a <= 12}


def _bucket(r: int, key, width: int) -> int:
    h = hashlib.md5(f"{r}:{key}".encode()).hexdigest()[:13]
    return int(h, 16) % width


def test_bloom_filter_guarantees(spark, sf_small):
    row = QUERIES["bloom_filter_fpr"](spark, sf_small).collect()[0]
    con = duckdb.connect()
    members = {
        k
        for (k,) in con.execute(
            f"SELECT c_custkey FROM '{sf_small}/customer.parquet' WHERE c_nationkey = 5"
        ).fetchall()
    }
    probes = {
        k
        for (k,) in con.execute(
            f"SELECT DISTINCT o_custkey FROM '{sf_small}/orders.parquet'"
        ).fetchall()
    }
    bits = {(r, _bucket(r, k, 4096)) for k in members for r in range(3)}
    passes = {k for k in probes if all((r, _bucket(r, k, 4096)) in bits for r in range(3))}
    tp = len(passes & members)
    fp = len(passes - members)
    assert row["n_members"] == len(members)
    assert row["n_probes"] == len(probes)
    assert row["n_pass"] == len(passes)
    assert row["n_true_pos"] == tp and row["n_false_pos"] == fp
    assert row["n_false_neg"] == 0  # Bloom filters never miss members
    negatives = len(probes - members)
    assert abs(row["fpr"] - fp / negatives) < 1e-6


def test_bpe_first_merge_matches_python(spark, sf_small):
    rows = QUERIES["bpe_first_merge"](spark, sf_small).collect()
    con = duckdb.connect()
    texts = [t for (t,) in con.execute(f"SELECT text FROM '{sf_small}/documents.parquet'").fetchall()]
    tf = Counter()
    for t in texts:
        tf.update(re.sub(r"\s+", " ", t).strip().split(" "))
    pair_count = Counter()
    pair_vocab = Counter()
    for tok, f in tf.items():
        seen = set()
        for i in range(len(tok) - 1):
            p = tok[i : i + 2]
            pair_count[p] += f
            if p not in seen:
                pair_vocab[p] += 1
                seen.add(p)
    ranked = sorted(pair_count.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["pair"], r["pair_count"]) for r in rows] == ranked
    for r in rows:
        assert r["n_vocab_tokens"] == pair_vocab[r["pair"]]


def test_local_bridges_match_triangle_free_edges(spark, sf_small):
    row = QUERIES["local_bridges_count"](spark, sf_small).collect()[0]
    con = duckdb.connect()
    edges = con.execute(
        f"""WITH bsk AS (SELECT DISTINCT l_orderkey ok, l_partkey pk
                         FROM '{sf_small}/lineitem.parquet')
            SELECT a.pk, b.pk FROM bsk a JOIN bsk b
            ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2 HAVING COUNT(*) >= 2"""
    ).fetchall()
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    bridges = sum(1 for a, b in edges if not (nbrs[a] & nbrs[b] - {a, b}))
    assert row["n_edges"] == len(edges)
    assert row["n_local_bridges"] == bridges
    assert abs(row["bridge_pct"] - bridges / len(edges)) < 1e-6


def test_nth_purchase_latency_matches_sorted_gaps(spark, sf_small):
    out = {r["nth"]: r for r in QUERIES["nth_purchase_latency"](spark, sf_small).collect()}
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT user_id, event_id, epoch_us(ts) FROM '{sf_small}/events.parquet'
            WHERE event_type = 'purchase' ORDER BY user_id, 3, 2"""
    ).fetchall()
    per = defaultdict(list)
    for u, _, us in rows:
        per[u].append(us)
    for nth in (2, 3):
        lats = sorted(ts[nth - 1] - ts[0] for ts in per.values() if len(ts) >= nth)
        if not lats:
            assert nth not in out
            continue
        r = out[nth]
        assert r["n_users"] == len(lats)

        def qdisc(q):
            # percentile_disc: smallest value with cume_dist >= q
            idx = math.ceil(q * len(lats)) - 1
            return lats[max(idx, 0)]

        assert r["median_us"] == qdisc(0.5)
        assert r["p90_us"] == qdisc(0.9)
        assert abs(r["median_hours"] - r["median_us"] / 3.6e9) < 1e-6
