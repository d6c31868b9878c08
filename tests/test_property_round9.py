"""Property-based checks (hypothesis) for the round-9 operators: RRF
fusion, the sentinel-classifying JSON key drift, B-cubed with NULL-id
singleton semantics, and the leakage-safe cluster split must agree with
brute-force Python references on arbitrary small inputs."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from unified_firmographic_data_pipeline_spark.operators.similarity import rrf_fuse
from unified_firmographic_data_pipeline_spark.quality.drift import json_key_drift

# rankings: per ranker, per query, a permutation prefix of candidate ids
ranking_strategy = st.lists(  # rankers
    st.dictionaries(  # query_id -> ranked candidate list
        st.integers(0, 2),
        st.lists(st.integers(10, 19), min_size=1, max_size=6, unique=True),
        min_size=1,
        max_size=3,
    ),
    min_size=1,
    max_size=3,
)


import pytest

# heavy property sweep / e2e tier (see pytest.ini): excluded from the
# default driver-window run, executed by the full tier at close-out
pytestmark = pytest.mark.slow


def _brute_rrf(rankers, k=60):
    scores: dict[tuple[int, int], list[int]] = {}
    for ranker in rankers:
        for q, ids in ranker.items():
            for rank, d in enumerate(ids, start=1):
                scores.setdefault((q, d), []).append(round(1e9 / (k + rank)))
    out = {}
    for (q, d), terms in scores.items():
        out[(q, d)] = (sum(terms), len(terms))
    # fused rank: per query by (score desc, id asc)
    ranks = {}
    for q in {q for q, _ in out}:
        docs = sorted(
            ((d, s) for (qq, d), (s, _) in out.items() if qq == q),
            key=lambda t: (-t[1], t[0]),
        )
        for i, (d, _) in enumerate(docs, start=1):
            ranks[(q, d)] = i
    return out, ranks


@given(ranking_strategy)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_rrf_fuse_matches_bruteforce(spark, rankers):
    frames = [
        spark.createDataFrame(
            [
                (q, d, rank)
                for q, ids in ranker.items()
                for rank, d in enumerate(ids, start=1)
            ],
            "query_id bigint, neighbor_id bigint, rank int",
        )
        for ranker in rankers
    ]
    got = {
        (r["query_id"], r["neighbor_id"]): (
            r["rrf_score_nano"],
            r["n_rankers"],
            r["fused_rank"],
        )
        for r in rrf_fuse(frames, k_rrf=60).collect()
    }
    exp_scores, exp_ranks = _brute_rrf(rankers)
    assert set(got) == set(exp_scores)
    for key, (score, n, rank) in got.items():
        assert (score, n) == exp_scores[key], key
        assert rank == exp_ranks[key], key


# dirty-ish payload generator: valid objects, valid non-objects, garbage,
# NULLs — the full sentinel domain
payload_strategy = st.one_of(
    st.none(),
    st.sampled_from(["", "{", "not json", "1,2", '"a","b"', "null", "[1, 2]"]),
    st.dictionaries(
        st.sampled_from(["k", "v2", "renamed", "legacy"]),
        st.integers(0, 9),
        max_size=3,
    ).map(json.dumps),
)


def _brute_keys(payload):
    if payload is None:
        return ["__null__"]
    try:
        v = json.loads(payload)
    except ValueError:
        return ["__malformed__"]
    if not isinstance(v, dict):
        return ["__nonobject__"]
    return list(v.keys())  # [] for {}


def _brute_drift(before, after):
    def side(rows):
        counts: dict[str, int] = {}
        for p in rows:
            for k in _brute_keys(p):
                counts[k] = counts.get(k, 0) + 1
        return counts

    b, a = side(before), side(after)
    bn, an = len(before), len(after)
    rate = lambda n, tot: 0 if tot == 0 else round(n / tot * 1e6)  # noqa: E731
    out = {}
    for k in set(b) | set(a):
        status = "added" if k not in b else ("removed" if k not in a else "stable")
        out[k] = (
            b.get(k, 0),
            a.get(k, 0),
            status,
            rate(a.get(k, 0), an) - rate(b.get(k, 0), bn),
        )
    return out


@given(
    st.lists(payload_strategy, max_size=12),
    st.lists(payload_strategy, max_size=12),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_json_key_drift_matches_bruteforce(spark, before, after):
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        [(p,) for p in rows], "p string"
    )
    got = {
        r["key"]: (r["before_n"], r["after_n"], r["status"], r["rate_delta_micro"])
        for r in json_key_drift(mk(before), mk(after), "p").collect()
    }
    assert got == _brute_drift(before, after)


# pred/truth with occasional NULLs — the round-9 singleton semantics
cluster_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.sampled_from(["c1", "c2", "c3"])),
        st.one_of(st.none(), st.sampled_from(["t1", "t2"])),
    ),
    max_size=14,
)


def _brute_bcubed(rows):
    # NULL ids become per-record singletons
    recs = []
    for i, (p, t) in enumerate(rows):
        recs.append((p if p is not None else f"__np{i}", t if t is not None else f"__nt{i}"))
    n = len(recs)
    if n == 0:
        return (0, 0, 0, 0.0, 0.0, 0.0)
    from collections import Counter

    cells = Counter(recs)
    nc = Counter()
    nt = Counter()
    for (p, t), m in cells.items():
        nc[p] += m
        nt[t] += m
    # nano-quantized terms, mirroring the operator's order-free sums
    sp = sum(round(1e9 * m * m / nc[p]) for (p, t), m in cells.items())
    sr = sum(round(1e9 * m * m / nt[t]) for (p, t), m in cells.items())
    prec = sp / 1e9 / n
    rec = sr / 1e9 / n
    f1 = 0.0 if prec + rec == 0 else 2.0 * prec * rec / (prec + rec)
    return (n, len(nc), len(nt), round(prec, 6), round(rec, 6), round(f1, 6))


@given(cluster_rows)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_bcubed_matches_bruteforce_with_nulls(spark, rows):
    from unified_firmographic_data_pipeline_spark.operators.linkage import bcubed_scores

    df = spark.createDataFrame(rows, "pred string, truth string") if rows else (
        spark.createDataFrame([], "pred string, truth string")
    )
    r = bcubed_scores(df, "pred", "truth").collect()[0]
    got = (
        r["n_records"], r["n_pred_clusters"], r["n_truth_classes"],
        r["b3_precision"], r["b3_recall"], r["b3_f1"],
    )
    assert got == _brute_bcubed(rows)


edges_strategy = st.lists(
    st.tuples(st.integers(1, 8), st.integers(1, 8)), max_size=10
)


@given(edges_strategy, st.floats(0.1, 0.9))
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_leakage_split_matches_brute_components(spark, edges, frac):
    """Component labels match brute-force union-find (min reachable id);
    the split matches the md5 uniform threshold on the label; and no
    edge ever crosses the split boundary."""
    import hashlib

    from unified_firmographic_data_pipeline_spark.operators.curation import (
        leakage_safe_split,
    )

    nodes = list(range(1, 9))
    adj = {v: set() for v in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    label = {}
    for s in nodes:
        if s in label:
            continue
        comp, stack = [], [s]
        seen = {s}
        while stack:
            v = stack.pop()
            comp.append(v)
            for u in adj[v]:
                if u not in seen:
                    seen.add(u)
                    stack.append(u)
        m = min(comp)
        for v in comp:
            label[v] = m

    def exp_split(component):
        u = int(hashlib.md5(str(component).encode()).hexdigest()[:13], 16) / 16**13
        return "train" if u < frac else "eval"

    docs = spark.createDataFrame([(i,) for i in nodes], "doc_id bigint")
    pairs = spark.createDataFrame(edges, "src bigint, dst bigint") if edges else (
        spark.createDataFrame([], "src bigint, dst bigint")
    )
    out = {
        r["doc_id"]: (r["component"], r["split"])
        for r in leakage_safe_split(docs, pairs, train_frac=frac).collect()
    }
    assert {k: v[0] for k, v in out.items()} == label
    for v in nodes:
        assert out[v][1] == exp_split(label[v])
    for a, b in edges:
        assert out[a][1] == out[b][1]
