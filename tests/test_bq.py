"""Binary-quantization (1-bit) tier: signature packing exact vs a
Python model, Hamming exactness, NULL-strict malformed handling, and
re-ranked recall vs the exact cosine baseline."""

from __future__ import annotations

import pytest

from unified_firmographic_data_pipeline_spark.operators.bq import (
    bq_encode,
    bq_topk,
    bq_train,
    hamming_dist,
)
from unified_firmographic_data_pipeline_spark.operators.pq import l2_normalized

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    from unified_firmographic_data_pipeline_spark.plans.driver_queries import _t

    return _t(spark, SF, "embeddings").select("vec_id", "embedding")


def _py_sig(v, thresholds):
    words = []
    for w in range(0, len(thresholds), 32):
        ts = thresholds[w : w + 32]
        acc = 0
        for x, t in zip(v[w : w + 32], ts):
            acc = acc * 2 + (1 if float(x) > t else 0)
        words.append(acc)
    return words


def test_bq_signature_matches_python(spark, emb):
    norm = l2_normalized(emb)
    thr = bq_train(norm)
    assert len(thr) == 64
    got = {r["vec_id"]: list(r["sig"]) for r in bq_encode(norm, thr).collect()}
    for r in norm.collect():
        want = _py_sig(list(r["embedding"]), thr)
        assert got[r["vec_id"]] == want, r["vec_id"]
        assert len(want) == 2 and all(0 <= w < 2**32 for w in want)


def test_bq_hamming_matches_python(spark, emb):
    norm = l2_normalized(emb)
    thr = bq_train(norm)
    sigs = {r["vec_id"]: list(r["sig"]) for r in bq_encode(norm, thr).collect()}
    df = bq_encode(norm, thr)
    a = df.filter("vec_id < 3").selectExpr("vec_id as qa", "sig as sa")
    pairs = (
        a.crossJoin(df.filter("vec_id < 20").selectExpr("vec_id as qb", "sig as sb"))
        .select("qa", "qb", hamming_dist("sa", "sb").alias("h"))
        .collect()
    )
    for r in pairs:
        expect = sum(
            bin(x ^ y).count("1") for x, y in zip(sigs[r["qa"]], sigs[r["qb"]])
        )
        assert r["h"] == expect, (r["qa"], r["qb"])


def test_bq_malformed_rows_never_outrank(spark):
    """Short/NULL vectors must produce NULL signature words (slice +
    zip_with pad -> NULL bit -> NULL Horner fold), hence NULL Hamming,
    ranked behind every real candidate."""
    train = spark.createDataFrame(
        [(i, [float(i % 2)] * 64) for i in range(1, 5)],
        "vec_id long, embedding array<double>",
    )
    thr = bq_train(train)
    corrupt = spark.createDataFrame(
        [(99, [1.0] * 10), (98, None)], "vec_id long, embedding array<double>"
    )
    allv = train.unionByName(corrupt)
    sigs = bq_encode(allv, thr)
    bad = {r["vec_id"]: r["sig"] for r in sigs.filter("vec_id > 90").collect()}
    assert bad[99] is None or any(w is None for w in bad[99])
    got = bq_topk(sigs, allv, train.filter("vec_id = 1"), thr, k=3, shortlist=3)
    assert not any(r["neighbor_id"] > 90 for r in got.collect())


def test_bq_rerank_recall_vs_exact(spark, emb):
    """1 bit/component is the coarsest tier, so the wide-shortlist
    re-rank carries the recall: floor pinned from the measured value on
    the clustered fixture."""
    from unified_firmographic_data_pipeline_spark.operators.similarity import cosine_topk

    norm = l2_normalized(emb)
    thr = bq_train(norm)
    sigs = bq_encode(norm, thr)
    q = norm.filter((norm.vec_id % 25) == 0)
    got = bq_topk(sigs, norm, q, thr, k=10, shortlist=100)
    rows = got.collect()
    assert len(rows) == q.count() * 10
    assert all(1 <= r["rank"] <= 10 for r in rows)
    exact = cosine_topk(emb, emb.filter(emb.vec_id % 25 == 0), k=10)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in rows}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, recall
