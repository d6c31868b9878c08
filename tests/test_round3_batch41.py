"""Reference-implementation tests for batch 41: 3-NN label accuracy vs
a brute-force numpy/python evaluation, the Markov stationary power
iteration vs direct matrix-vector products, and the MapType token stats
vs plain Counter arithmetic."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import duckdb

import __spark_entry__ as m

QUERIES = m.queries()


def _round_half_away(x: float) -> int:
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def test_knn_accuracy_matches_bruteforce(spark, sf_small):
    out = {r["true_label"]: r for r in QUERIES["knn_label_accuracy"](spark, sf_small).collect()}
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding, label FROM '{sf_small}/embeddings.parquet'"
    ).fetchall()
    vecs = {vid: ([float(x) for x in emb], lab) for vid, emb, lab in rows}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 6)

    per_label = defaultdict(lambda: [0, 0])
    for qid, (qv, ql) in vecs.items():
        if qid % 10 != 0:
            continue
        scored = sorted(
            ((cos(qv, cv), nid, nl) for nid, (cv, nl) in vecs.items() if nid != qid),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        votes = Counter(nl for _, _, nl in scored)
        predicted = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        per_label[ql][0] += 1
        per_label[ql][1] += predicted == ql
    assert set(out) == set(per_label)
    for lab, (n, correct) in per_label.items():
        r = out[lab]
        assert r["n_queries"] == n and r["n_correct"] == correct
        assert abs(r["accuracy"] - correct / n) < 1e-6


def test_markov_stationary_matches_power_iteration(spark, sf_small):
    out = {r["event_type"]: r for r in QUERIES["markov_stationary_distribution"](spark, sf_small).collect()}
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT user_id, event_id, epoch_us(ts), event_type
            FROM '{sf_small}/events.parquet' ORDER BY user_id, 3, 2"""
    ).fetchall()
    per = defaultdict(list)
    for u, _, _, et in rows:
        per[u].append(et)
    trans = Counter()
    for seq in per.values():
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    row_tot = Counter()
    for (a, _), n in trans.items():
        row_tot[a] += n
    states = sorted(row_tot)
    p = {(a, b): n / row_tot[a] for (a, b), n in trans.items()}
    x = {s: _round_half_away(1e9 / len(states)) for s in states}
    hist = [x]
    for _ in range(3):
        nxt = defaultdict(float)
        for (a, b), pp in p.items():
            nxt[b] += x[a] * pp
        x = {s: _round_half_away(v) for s, v in nxt.items()}
        hist.append(x)
    x3, x2 = hist[3], hist[2]
    assert set(out) == set(x3)
    for s in x3:
        r = out[s]
        assert abs(r["stationary_p"] - x3[s] / 1e9) < 2e-6
        assert abs(r["delta_ratio"] - x3[s] / x2[s]) < 1e-5
    # a distribution: components sum to ~1
    assert abs(sum(r["stationary_p"] for r in out.values()) - 1.0) < 1e-3


def test_map_token_stats_match_counter(spark, sf_small):
    out = {r["doc_id"]: r for r in QUERIES["map_functions_token_stats"](spark, sf_small).collect()}
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{sf_small}/documents.parquet' WHERE doc_id < 200"
    ).fetchall()
    assert set(out) == {d for d, _ in rows}
    for d, text in rows:
        c = Counter(re.sub(r"\s+", " ", text).strip().split(" "))
        r = out[d]
        assert r["n_distinct_tokens"] == len(c)
        assert r["n_repeated_tokens"] == sum(1 for v in c.values() if v > 1)
        assert r["max_count"] == max(c.values())
        assert r["repeated_occurrences"] == sum(v for v in c.values() if v > 1)


def test_catalog_multi_format_roundtrip(spark, sf_small, tmp_path):
    """ORC / JSON / CSV catalog tiers round-trip values AND exact types
    (schema sidecar for the schema-free interchange formats)."""
    from unified_firmographic_data_pipeline_spark.sources.catalog import Catalog

    src = (
        spark.read.parquet(f"{sf_small}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .limit(100)
    )
    expected = sorted(tuple(r) for r in src.collect())
    for fmt in ("parquet", "orc", "json", "csv"):
        cat = Catalog(spark, str(tmp_path / fmt), fmt=fmt)
        cat.overwrite(src, "core", "orders_sample")
        assert cat.exists("core", "orders_sample")
        back = cat.read("core", "orders_sample")
        assert back.schema == src.schema, f"{fmt}: schema drift"
        assert sorted(tuple(r) for r in back.collect()) == expected, f"{fmt}: values"


def test_catalog_rejects_unknown_format(spark, tmp_path):
    import pytest as _pytest

    from unified_firmographic_data_pipeline_spark.sources.catalog import Catalog

    with _pytest.raises(ValueError):
        Catalog(spark, str(tmp_path), fmt="avro")
