"""Random-projection (JL) dimensionality reduction (operators.rp)."""

import math
import random

import pytest

from pyspark.sql import functions as F

from unified_firmographic_data_pipeline_spark.operators.rp import (
    cosine_topk_rp,
    gaussian_matrix,
    project_df,
)


def _vecs(n, dim, seed=7):
    rnd = random.Random(seed)
    return [(i, [rnd.gauss(0, 1) for _ in range(dim)]) for i in range(n)]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        _vecs(80, 32), "vec_id long, embedding array<float>"
    ).cache()


def test_matrix_is_seeded_and_scaled(spark):
    m1 = gaussian_matrix(8, 32, seed=1)
    m2 = gaussian_matrix(8, 32, seed=1)
    m3 = gaussian_matrix(8, 32, seed=2)
    assert m1 == m2 and m1 != m3
    assert len(m1) == 8 and len(m1[0]) == 32
    # entries drawn as N(0,1)/sqrt(out_dim): sample std ~ 1/sqrt(8)
    flat = [v for row in m1 for v in row]
    std = math.sqrt(sum(v * v for v in flat) / len(flat))
    assert 0.25 < std < 0.5  # 1/sqrt(8) = 0.354


def test_projection_preserves_distances_jl(spark, emb):
    """Empirical JL check on seeded data: pairwise Euclidean distances in
    the projected space stay within a loose distortion band (deterministic
    given the fixed seeds — not a flaky statistical test)."""
    mat = gaussian_matrix(16, 32, seed=42)
    rows = project_df(emb, mat).orderBy("vec_id").collect()
    orig = {r.vec_id: r.embedding for r in rows}
    proj = {r.vec_id: r.embedding_rp for r in rows}

    def d(u, v):
        return math.sqrt(sum((a - b) ** 2 for a, b in zip(u, v)))

    ratios = []
    ids = sorted(orig)[:30]
    for i in ids:
        for j in ids:
            if i < j:
                ratios.append(d(proj[i], proj[j]) / d(orig[i], orig[j]))
    mean = sum(ratios) / len(ratios)
    assert 0.85 < mean < 1.15  # unbiased on average
    assert all(0.4 < r < 1.8 for r in ratios)  # no catastrophic distortion


def test_projection_null_and_wrong_length(spark):
    mat = gaussian_matrix(4, 3, seed=1)
    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, None), (3, [1.0, 2.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r.embedding_rp for r in project_df(df, mat).collect()}
    assert rows[1] is not None and len(rows[1]) == 4
    assert rows[2] is None  # NULL vector -> NULL projection
    assert rows[3] is None  # length mismatch -> NULL, never silent truncation


def test_projection_is_narrow(spark, emb):
    plan = (
        project_df(emb, gaussian_matrix(8, 32))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure expression, no shuffle


def test_projection_matches_python_matmul(spark):
    mat = gaussian_matrix(4, 3, seed=5)
    v = [0.5, -1.0, 2.0]
    df = spark.createDataFrame([(1, v)], "vec_id long, embedding array<double>")
    got = project_df(df, mat).collect()[0].embedding_rp
    want = [sum(r[d] * v[d] for d in range(3)) for r in mat]
    assert got == pytest.approx(want, rel=1e-12)


def test_cosine_topk_rp_recall_vs_exact(spark, emb):
    """With out_dim=16 of 32 and a 30-deep shortlist, the RP tier's
    top-3 should largely agree with exact brute force (deterministic
    seeds -> stable recall)."""
    from unified_firmographic_data_pipeline_spark.operators.similarity import (
        cosine_topk,
    )

    queries = emb.where(F.col("vec_id") < 5)
    exact = cosine_topk(emb, queries, k=3)
    approx = cosine_topk_rp(
        emb, queries, k=3, out_dim=16, shortlist=30, seed=42
    )
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    assert len(e) == 15 and len(a) == 15
    recall = len(e & a) / len(e)
    assert recall >= 0.6, f"recall {recall}"
    # and the re-rank stage reports EXACT cosine values for agreed pairs
    ex = {(r.query_id, r.neighbor_id): r.cosine_sim for r in exact.collect()}
    ap = {(r.query_id, r.neighbor_id): r.cosine_sim for r in approx.collect()}
    for pair in e & a:
        assert ex[pair] == ap[pair]

def test_cosine_topk_rp_empty_corpus_raises(spark):
    """in_dim inference must fail with a contract error on an empty or
    all-null corpus, not an opaque TypeError (round-4 advice item)."""
    import pytest

    from unified_firmographic_data_pipeline_spark.operators.rp import cosine_topk_rp

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    nulls = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<float>"
    )
    q = spark.createDataFrame(
        [(9, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="no non-null"):
        cosine_topk_rp(empty, q)
    with pytest.raises(ValueError, match="no non-null"):
        cosine_topk_rp(nulls, q)
