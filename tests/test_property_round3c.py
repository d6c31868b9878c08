"""Hypothesis property tests for the batch 38-44 operators: Adamic-Adar
vs brute force on random graphs, repeated-n-gram span invariants on
random token corpora, count-min-sketch never-underestimates, Bloom
filters never miss members, and modularity stays in [-0.5, 1]."""

from __future__ import annotations

import math
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=1,
    max_size=25,
)


import pytest

# heavy property sweep / e2e tier (see pytest.ini): excluded from the
# default driver-window run, executed by the full tier at close-out
pytestmark = pytest.mark.slow


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edges_strategy)
def test_adamic_adar_property(spark, edges):
    from unified_firmographic_data_pipeline_spark.operators.linkpred import (
        adamic_adar_topk,
    )

    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    if not und:
        return
    df = spark.createDataFrame(sorted(und), "src long, dst long")
    out = adamic_adar_topk(df, hub_cap=64, k=100).collect()
    nbrs = defaultdict(set)
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    scores = defaultdict(lambda: [0, 0])
    for z, ns in nbrs.items():
        if not (2 <= len(ns) <= 64):
            continue
        w = round(1e6 / math.log(len(ns)))
        ns_s = sorted(ns)
        for i in range(len(ns_s)):
            for j in range(i + 1, len(ns_s)):
                p = (ns_s[i], ns_s[j])
                scores[p][0] += 1
                scores[p][1] += w
    expected = {p: tuple(v) for p, v in scores.items() if p not in und}
    got = {(r["src"], r["dst"]): (r["common_neighbors"], round(r["adamic_adar"] * 1e6)) for r in out}
    assert got == {p: (cn, aa) for p, (cn, aa) in expected.items()}


docs_strategy = st.lists(
    st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=30).map(
        lambda cs: " ".join(cs)
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=docs_strategy)
def test_repeated_ngram_span_invariants(spark, texts):
    from pyspark.sql import functions as F

    from unified_firmographic_data_pipeline_spark.operators.curation import (
        repeated_ngram_spans,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    n = 3
    rows = {r["doc_id"]: r for r in repeated_ngram_spans(df, n=n, min_docs=2).collect()}
    assert set(rows) == set(range(len(texts)))
    for i, t in enumerate(texts):
        toks = [x for x in t.split(" ") if x != ""] or [""]
        r = rows[i]
        assert r["total_tokens"] == len(toks) or (t.strip() == "" and r["total_tokens"] >= 1)
        assert 0 <= r["dup_tokens"] <= r["total_tokens"]
        assert r["n_spans"] <= r["n_dup_grams"]
        if r["n_dup_grams"] == 0:
            assert r["dup_tokens"] == 0 and r["n_spans"] == 0
        if r["n_spans"] > 0:
            # every span covers at least n tokens
            assert r["dup_tokens"] >= n
    # a document duplicated verbatim is fully covered (when long enough)
    long_docs = [t for t in texts if len([x for x in t.split(" ") if x]) >= n]
    if long_docs:
        t = long_docs[0]
        dup_df = spark.createDataFrame(
            [(0, t), (1, t)], "doc_id long, text string"
        )
        rr = {r["doc_id"]: r for r in repeated_ngram_spans(dup_df, n=n, min_docs=2).collect()}
        for i in (0, 1):
            assert rr[i]["dup_tokens"] == rr[i]["total_tokens"]
            assert rr[i]["dup_pct"] == 1.0


items_strategy = st.lists(
    st.sampled_from(["x", "y", "z", "w", "v"]), min_size=1, max_size=60
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(items=items_strategy)
def test_cms_never_underestimates(spark, items):
    from pyspark.sql import functions as F

    from unified_firmographic_data_pipeline_spark.operators.sketches import (
        cms_estimates,
    )

    df = spark.createDataFrame([(x, 1) for x in items], "item string, w long")
    rows = cms_estimates(df, "item", "w", depth=2, width=4).collect()
    from collections import Counter

    exact = Counter(items)
    assert {r["item"] for r in rows} == set(exact)
    for r in rows:
        assert r["exact"] == exact[r["item"]]
        assert r["est"] >= r["exact"]  # CMS one-sided error
        assert r["overestimate"] == r["est"] - r["exact"]
    # width-4 sketch total per row equals the stream size
    assert sum(exact.values()) == len(items)


keys_strategy = st.tuples(
    st.sets(st.integers(min_value=0, max_value=500), min_size=1, max_size=40),
    st.sets(st.integers(min_value=0, max_value=500), min_size=1, max_size=40),
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(kk=keys_strategy)
def test_bloom_membership_no_false_negatives(spark, kk):
    import hashlib

    members, probes = kk

    def bucket(r, k, width=64):
        return int(hashlib.md5(f"{r}:{k}".encode()).hexdigest()[:13], 16) % width

    from pyspark.sql import functions as F

    from unified_firmographic_data_pipeline_spark.operators.sketches import cms_bucket

    mdf = spark.createDataFrame([(k,) for k in members], "k long")
    pdf = spark.createDataFrame([(k,) for k in probes], "k long")
    bits = (
        mdf.select(
            F.explode(F.array(*[F.struct(F.lit(r).alias("r"), cms_bucket(F.col("k"), r, 64).alias("b")) for r in range(3)])).alias("s")
        )
        .select("s.r", "s.b")
        .distinct()
    )
    ph = pdf.select(
        "k",
        *[cms_bucket(F.col("k"), r, 64).alias(f"b{r}") for r in range(3)],
    ).collect()
    bitset = {(r["r"], r["b"]) for r in bits.collect()}
    for row in ph:
        passes = all((r, row[f"b{r}"]) in bitset for r in range(3))
        py_passes = all((r, bucket(r, row["k"])) in bitset for r in range(3))
        assert passes == py_passes  # engine and python build the same filter
        if row["k"] in members:
            assert passes  # a Bloom filter NEVER rejects a member


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edges_strategy)
def test_modularity_bounds(spark, edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    if not und:
        return
    nbrs = defaultdict(set)
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    lbl = {v: min(v, min(ns)) for v, ns in nbrs.items()}
    m = len(und)
    from collections import Counter

    lc = Counter(lbl[a] for a, b in und if lbl[a] == lbl[b])
    dc = Counter()
    for v, ns in nbrs.items():
        dc[lbl[v]] += len(ns)
    q = sum(lc.get(c, 0) / m - (d / (2 * m)) ** 2 for c, d in dc.items())
    assert -0.5 - 1e-9 <= q <= 1.0 + 1e-9
