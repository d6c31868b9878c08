"""Property-based checks (hypothesis) for the round-9 operators: RRF
fusion and the sentinel-classifying JSON key drift must agree with
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
