"""Product-quantization tier: determinism, ADC exactness on the table
lookups, and recall against the exact cosine baseline on the embeddings
fixture."""

from __future__ import annotations

import os

import pytest

from unified_firmographic_data_pipeline_spark.operators.pq import (
    pq_encode,
    pq_topk,
    pq_train,
)

# heavy property sweep / e2e tier (see pytest.ini): excluded from the
# default driver-window run, executed by the full tier at close-out
pytestmark = pytest.mark.slow


TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{TESTDATA}/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def books(emb):
    return pq_train(emb, m=8, k=16, n_iter=1)


def test_train_shape_and_determinism(emb, books):
    assert len(books) == 8 and all(len(b) == 16 for b in books)
    assert all(len(cw) == 8 for b in books for cw in b)
    # integer-micro Lloyd sums -> a second run is bit-identical
    assert pq_train(emb, m=8, k=16, n_iter=1) == books


def test_encode_codes_in_range(emb, books):
    codes = pq_encode(emb, books)
    rows = codes.collect()
    assert len(rows) == emb.count()
    assert all(len(r["codes"]) == 8 for r in rows)
    assert all(0 <= c <= 15 for r in rows for c in r["codes"])


def test_adc_distance_matches_python(spark, emb, books):
    """The ADC sum must equal the Python table-lookup computation for the
    same codes — the plan does lookups, not math, on the corpus side."""
    q = emb.orderBy("vec_id").limit(2)
    codes = pq_encode(emb, books)
    got = {
        (r["query_id"], r["neighbor_id"]): r["adc_dist_micro"]
        for r in pq_topk(codes, q, books, k=3).collect()
    }
    qv = {r["vec_id"]: list(r["embedding"]) for r in q.collect()}
    cv = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}

    def table(v):
        t = []
        for j, book in enumerate(books):
            svec = v[j * 8 : (j + 1) * 8]
            t.append(
                [
                    sum(
                        int(round((float(x) - y) * (float(x) - y) * 1e6))
                        for x, y in zip(svec, cw)
                    )
                    for cw in book
                ]
            )
        return t

    for (qid, nid), d in got.items():
        t = table(qv[qid])
        expect = sum(t[j][cv[nid][j]] for j in range(8))
        assert d == expect, (qid, nid, d, expect)


def test_ivfpq_recall_and_candidate_bound(spark, emb):
    """IVF-PQ end to end: candidates only come from probed lists (the
    scan-reduction contract), and shortlist + re-rank still recovers a
    solid share of the exact top-10 despite BOTH loss sources (unprobed
    lists + quantization)."""
    from unified_firmographic_data_pipeline_spark.operators.pq import (
        l2_normalized,
        pq_topk_ivf,
    )
    from unified_firmographic_data_pipeline_spark.operators.similarity import cosine_topk

    norm = l2_normalized(emb)
    nbooks = pq_train(norm, m=8, k=32, n_iter=4)
    q = norm.filter((norm.vec_id % 25) == 0)
    got = pq_topk_ivf(norm, q, nbooks, k=10, n_lists=8, n_probe=2, shortlist=50)
    rows = got.collect()
    nq = q.count()
    assert {r["query_id"] for r in rows} == {r["vec_id"] for r in q.collect()}
    assert all(1 <= r["rank"] <= 10 for r in rows)
    exact = cosine_topk(emb, emb.filter((emb.vec_id % 25) == 0), k=10)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in rows}
    recall = len(e & a) / len(e)
    assert recall >= 0.4, recall
    assert len(rows) == nq * 10


def test_rerank_recall_vs_exact_baseline(spark, emb):
    """The deployed shape — L2-normalize, ADC shortlist, exact re-rank —
    must recover most of the exact cosine top-10. Raw ADC@10 measured
    0.25-0.38 on this tightly-clustered fixture (quantization reorders
    near-ties; that is why the re-rank stage exists); shortlist-50 +
    re-rank measured 0.75. Deterministic data + integer-micro codebooks
    => a fixed number; 0.6 is the floor."""
    from unified_firmographic_data_pipeline_spark.operators.pq import (
        l2_normalized,
        pq_topk_rerank,
    )
    from unified_firmographic_data_pipeline_spark.operators.similarity import cosine_topk

    norm = l2_normalized(emb)
    nbooks = pq_train(norm, m=8, k=32, n_iter=4)
    q = norm.filter((norm.vec_id % 25) == 0)
    exact = cosine_topk(emb, emb.filter((emb.vec_id % 25) == 0), k=10)
    approx = pq_topk_rerank(
        pq_encode(norm, nbooks), norm, q, nbooks, k=10, shortlist=50
    )
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, recall


def test_pq_malformed_rows_never_outrank(spark, emb):
    """Wrong-length / NULL embeddings must yield NULL codes (the
    null-d argmin struct sorts FIRST, which would otherwise fabricate a
    codeword id for garbage) and therefore NULL ADC distances, ranked
    behind every real candidate by asc_nulls_last."""
    from unified_firmographic_data_pipeline_spark.operators.pq import l2_normalized

    norm = l2_normalized(emb)
    books = pq_train(norm, m=8, k=16, n_iter=1)
    corrupt = spark.createDataFrame(
        [(9_000_001, [1.0] * 8), (9_000_002, None)],
        "vec_id long, embedding array<double>",
    )
    codes = pq_encode(
        norm.select("vec_id", "embedding").unionByName(corrupt), books
    )
    bad = {r["vec_id"]: r["codes"] for r in codes.filter("vec_id >= 9000000").collect()}
    assert all(c is None for c in bad[9_000_001][1:])  # tail subspaces padded -> NULL
    assert bad[9_000_002] is None or all(c is None for c in bad[9_000_002])
    q = norm.filter(norm.vec_id < 3)
    got = pq_topk(codes, q, books, k=10)
    assert not any(r["neighbor_id"] >= 9_000_000 for r in got.collect())


def test_pq_train_excludes_malformed_rows(spark):
    """Malformed rows are filtered BEFORE training: 15 valid + 1 NULL
    with k=16 fails the valid-row count, and with k=15 the NULL row
    must not perturb the codebooks vs training on the 15 valid rows."""
    rows = [(i, [0.25 * ((i + j) % 5) for j in range(64)]) for i in range(15)]
    good = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    bad = good.unionByName(
        spark.createDataFrame(
            [(15, None), (16, [1.0] * 8)], "vec_id long, embedding array<double>"
        )
    )
    with pytest.raises(ValueError, match="need >= 16 valid"):
        pq_train(bad, m=8, k=16, n_iter=1)
    assert pq_train(bad, m=8, k=15, n_iter=2) == pq_train(good, m=8, k=15, n_iter=2)
