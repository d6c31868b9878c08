"""LLM-data-pipeline extension operators: exact/near dedup, similarity
search, multimodal plumbing (SURVEY.md §2.M)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from unified_firmographic_data_pipeline_spark.operators.dedup import dedup_exact
from unified_firmographic_data_pipeline_spark.operators.neardup import (
    jaccard_pairs,
    minhash_lsh_candidates,
    minhash_signature,
    simhash,
    simhash_near_pairs,
)
from unified_firmographic_data_pipeline_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_lsh,
)
from unified_firmographic_data_pipeline_spark.sources.multimodal import (
    decode_media_meta,
    media_from_text,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
        (2, "The  Quick Brown Fox jumps over the lazy dog"),  # exact dup of 0 (normalized)
        (3, "completely different text about spark engines"),
        (4, "completely different text about spark engines"),  # exact dup of 3
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact(docs):
    kept = sorted(r["doc_id"] for r in dedup_exact(docs, "text", "doc_id").collect())
    assert kept == [0, 1, 3]  # 2 collapses into 0 (case/ws-normalized), 4 into 3


def test_dedup_exact_unnormalized(docs):
    kept = sorted(r["doc_id"] for r in dedup_exact(docs, "text", "doc_id", normalize=False).collect())
    assert kept == [0, 1, 2, 3]  # only the byte-identical pair collapses


def test_jaccard_pairs_exact_values(docs):
    out = {(r["id_a"], r["id_b"]): r for r in jaccard_pairs(docs, shingle_n=1).collect()}
    # docs 3 & 4 identical -> jaccard 1.0
    assert out[(3, 4)]["jaccard"] == 1.0
    # docs 0 & 1 share 7 of 9 distinct tokens (dog vs cat)
    r01 = out[(0, 1)]
    assert r01["n_common"] == 7 and r01["n_a"] == 8 and r01["n_b"] == 8
    assert r01["jaccard"] == pytest.approx(7 / 9)


def test_minhash_lsh_finds_exact_dups(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_candidates(docs).collect()}
    # identical docs share every band -> must be candidates
    assert (3, 4) in pairs
    # normalized-identical docs tokenize identically except case -> not required;
    # near-dups 0/1 are *likely* but not guaranteed; exact dup is the contract.


def test_minhash_signature_is_deterministic(docs):
    sig1 = docs.select(minhash_signature("text").alias("s")).collect()
    sig2 = docs.select(minhash_signature("text").alias("s")).collect()
    assert [r["s"] for r in sig1] == [r["s"] for r in sig2]
    # identical texts -> identical signatures
    sigs = {r["doc_id"]: r["s"] for r in docs.select("doc_id", minhash_signature("text").alias("s")).collect()}
    assert sigs[3] == sigs[4]


def test_simhash_properties(docs):
    fps = {r["doc_id"]: r["fp"] for r in docs.select("doc_id", simhash("text").alias("fp")).collect()}
    assert fps[3] == fps[4]  # identical -> same fingerprint
    assert all(isinstance(v, int) for v in fps.values())
    # near-dups within small hamming distance; 0 vs 3 far apart
    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFF).count("1")
    assert ham(fps[0], fps[1]) <= 6
    assert ham(fps[0], fps[3]) > 6


def test_simhash_near_pairs(docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_near_pairs(docs, max_hamming=3).collect()}
    assert pairs[(3, 4)] == 0


@pytest.fixture()
def vecs(spark):
    rng = np.random.RandomState(7)
    rows = []
    for i in range(40):
        v = rng.randn(16)
        rows.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), rows


def test_cosine_topk_matches_numpy(vecs):
    df, rows = vecs
    out = cosine_topk(df, df.filter(F.col("vec_id") < 3), k=4)
    got = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in out.collect()}
    M = np.array([np.array(v, dtype=np.float32).astype(np.float64) for _, v in rows])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    sims = M @ M.T
    for q in range(3):
        order = [
            i for i in sorted(range(40), key=lambda i: (-round(sims[q, i], 6), i)) if i != q
        ][:4]
        for rank, nid in enumerate(order, 1):
            assert got[(q, rank)] == nid, (q, rank)


def test_cosine_topk_lsh_recall(spark):
    # clustered vectors: tight clusters land in the same hyperplane bucket,
    # so true neighbors survive the bucketing (random vectors would not —
    # there LSH recall is legitimately poor because no near neighbors exist)
    rng = np.random.RandomState(11)
    centers = [rng.randn(16) * 5 for _ in range(4)]
    rows = []
    for i in range(40):
        v = centers[i % 4] + rng.randn(16) * 0.05
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = cosine_topk(df, df.filter(F.col("vec_id") < 5), k=3)
    approx = cosine_topk_lsh(df, df.filter(F.col("vec_id") < 5), k=3, num_planes=4, dim=16)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(a & e) >= len(e) * 0.8
    assert all(r["rank"] <= 3 for r in approx.collect())


def test_multimodal_decode_meta(docs):
    media = media_from_text(docs, "doc_id", "text")
    meta = {r["media_id"]: r for r in decode_media_meta(media).collect()}
    assert len(meta) == 5
    txt = "the quick brown fox jumps over the lazy dog"
    assert meta[0]["n_bytes"] == len(txt.encode())
    assert meta[0]["sha256"] == hashlib.sha256(txt.encode()).hexdigest()
    # fake-decoded dims are deterministic and in the plausible band
    assert 64 <= meta[0]["width"] < 64 + 1024
    assert meta[0]["duration_ms"] is None  # images have no duration
    again = {r["media_id"]: r for r in decode_media_meta(media).collect()}
    assert again[0]["width"] == meta[0]["width"]


def test_multimodal_garbage_payloads_raise(spark, docs):
    """Undecodable payloads fail at execution like real codecs: resize on
    non-PNG bytes raises (PIL-style), frame_sample on non-RAWV video
    raises (demuxer-style). The happy paths are exercised for real in
    test_png_codec.py and test_round3_batch23.py's RAWV test."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    from unified_firmographic_data_pipeline_spark.sources.multimodal import (
        frame_sample,
        resize_images,
    )

    media = media_from_text(docs, "doc_id", "text")  # text bytes != PNG
    with pytest.raises((PythonException, Py4JJavaError)):
        resize_images(media).collect()
    vid = media_from_text(docs, "doc_id", "text", kind="video")
    with pytest.raises((PythonException, Py4JJavaError)):
        frame_sample(vid).collect()


def test_multimodal_null_payload(spark):
    """Column-wise decode must keep NULL payloads NULL (n_bytes 0)."""
    from unified_firmographic_data_pipeline_spark.sources.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(
        [(1, "image", b"abc", "x"), (2, "audio", None, "x")], MEDIA_SCHEMA
    )
    meta = {r["media_id"]: r for r in decode_media_meta(media).collect()}
    assert meta[1]["n_bytes"] == 3 and meta[1]["sha256"] is not None
    assert meta[2]["n_bytes"] == 0 and meta[2]["sha256"] is None
    assert meta[2]["width"] is None and meta[2]["duration_ms"] is None


def test_resize_images_pil_path(spark):
    """Exercises the real PIL codec when the environment provides it."""
    from unified_firmographic_data_pipeline_spark.sources import multimodal as mm

    if not mm.IMAGE_CODEC_AVAILABLE:
        pytest.skip("PIL not installed in this container")
    import io

    img = mm._PILImage.new("RGB", (640, 320), color=(200, 10, 10))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    media = spark.createDataFrame(
        [(1, "image", buf.getvalue(), "image/png")], mm.MEDIA_SCHEMA
    )
    out = mm.resize_images(media, max_side=256).collect()
    assert len(out) == 1
    assert (out[0]["width"], out[0]["height"]) == (256, 128)
    assert out[0]["mime"] == "image/png" and out[0]["payload"]


def test_cosine_topk_numpy_matches_expression(spark, sf_small):
    """The numpy tier must return the same top-k pairs as the expression
    fold (sims agree to ~1e-12, far beyond the 6-digit round)."""
    from pyspark.sql import functions as F

    from unified_firmographic_data_pipeline_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_numpy,
    )

    e = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    q_set = e.filter(F.col("vec_id") < 5)
    expr_out = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine_sim"])
        for r in cosine_topk(e, q_set, k=3).collect()
    }
    np_out = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine_sim"])
        for r in cosine_topk_numpy(e, q_set, k=3).collect()
    }
    assert expr_out.keys() == np_out.keys()
    for key, (nid, sim) in expr_out.items():
        nid2, sim2 = np_out[key]
        assert nid == nid2, (key, nid, nid2)
        assert abs(sim - sim2) < 1e-9


def test_stratified_sample(spark, sf_small):
    from unified_firmographic_data_pipeline_spark.operators.dedup import stratified_sample

    d = spark.read.parquet(f"{sf_small}/documents.parquet")
    fr = {"en": 0.2, "de": 1.0}  # drop es/fr entirely, keep all de
    got = stratified_sample(d, "lang", fr, seed=7)
    counts = {r["lang"]: r["n"] for r in got.groupBy("lang").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    full = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert set(counts) <= {"en", "de"}
    assert counts.get("de") == full.get("de")  # rate 1.0 keeps everything
    if "en" in full and full["en"] >= 50:
        assert 0 < counts["en"] < full["en"]  # rate 0.2 strictly downsamples
    # deterministic per seed
    again = stratified_sample(d, "lang", fr, seed=7).count()
    assert again == got.count()


def test_hll_sketch_estimate_and_merge(spark, sf_small):
    """HLL sketches: estimate within a few % of exact, and the union of
    per-group partial sketches must equal the direct global sketch exactly
    (register-max merge is associative/deterministic) — the property that
    makes sketch aggregation safe to distribute across 1000 executors."""
    from pyspark.sql import functions as F

    c = spark.read.parquet(f"{sf_small}/customer.parquet")
    per = c.groupBy("c_nationkey").agg(F.hll_sketch_agg("c_custkey").alias("sk"))
    merged = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).first()["est"]
    direct = c.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("c_custkey")).alias("est")
    ).first()["est"]
    exact = c.select("c_custkey").distinct().count()
    assert merged == direct  # partial-merge == single-pass, exactly
    assert abs(direct - exact) / exact < 0.05


def test_winnow_fingerprint_guarantee(spark):
    """Winnowing guarantee: two documents sharing a substring of length
    >= k + w - 1 share at least one selected fingerprint; disjoint texts
    share none."""
    from unified_firmographic_data_pipeline_spark.operators.neardup import (
        winnow_overlap_pairs,
    )

    shared = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (1, "PREFIX one " + shared + " SUFFIX alpha"),
        (2, "totally different lead-in " + shared + " and another tail"),
        (3, "zzz qqq vvv completely unrelated content 12345 67890 xxyyzz"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r["id_a"], r["id_b"]): r["n_common"]
        for r in winnow_overlap_pairs(df, k=8, w=4, min_common=1).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_mmr_rerank_diversifies_and_matches_reference(spark):
    """MMR must pick the most relevant doc first, then penalize docs similar
    to already-picked ones; verified against a plain-Python greedy
    reference on two query groups."""
    import numpy as np

    from unified_firmographic_data_pipeline_spark.operators.similarity import mmr_rerank

    # q1: docs 1 and 2 are near-identical, doc 3 is orthogonal but less
    # relevant -> MMR at lambda=0.5 should pick 1 then 3 (not the dup 2)
    rows = [
        (1, 1, [1.0, 0.0], 0.9),
        (1, 2, [0.999, 0.01], 0.88),
        (1, 3, [0.0, 1.0], 0.5),
        (2, 7, [1.0, 1.0], 0.7),
        (2, 8, [1.0, 0.9], 0.6),
    ]
    df = spark.createDataFrame(
        rows, "query_id long, doc_id long, embedding array<double>, relevance double"
    )
    got = (
        mmr_rerank(df, k=2, lambda_mult=0.5)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert [(r.query_id, r.rank, r.doc_id) for r in got] == [
        (1, 1, 1),
        (1, 2, 3),
        (2, 1, 7),
        (2, 2, 8),
    ]

    # reference recompute of q1's second pick
    unit = lambda v: np.array(v) / np.linalg.norm(v)
    sim_12 = round(float(unit([0.999, 0.01]) @ unit([1.0, 0.0])), 6)
    score_2 = round(0.5 * 0.88 - 0.5 * sim_12, 6)
    score_3 = round(0.5 * 0.5 - 0.5 * 0.0, 6)
    assert score_3 > score_2  # the dup is penalized below the orthogonal doc


def test_mmr_fold_exact_matches_blas_path(spark):
    """fold_exact=True (the oracle-replayable arithmetic: sequential-fold
    cosines + half-away rounding) must produce the SAME PICKS as the
    production BLAS path — only the last-ulp arithmetic differs, and the
    6-decimal rounding absorbs it except at boundaries the test data
    doesn't sit on. Pin ranks/doc order identical."""
    import random

    from pyspark.sql import functions as F

    from unified_firmographic_data_pipeline_spark.operators.similarity import (
        mmr_rerank,
    )

    rnd = random.Random(11)
    rows = []
    for qid in range(3):
        for did in range(10, 22):
            rows.append(
                (qid, did, [rnd.gauss(0, 1) for _ in range(16)], rnd.random())
            )
    df = spark.createDataFrame(
        [(q, d, [float(x) for x in v], float(r)) for q, d, v, r in rows],
        "query_id long, doc_id long, embedding array<float>, relevance double",
    )
    # pre-round relevance like the registered query does (cosine_topk
    # rounds to 6) — this is exactly the regime where np.round half-even
    # and half-away disagree on the SCORE, but never on the pick order
    df = df.withColumn("relevance", F.round("relevance", 6))
    fast = mmr_rerank(df, k=4, lambda_mult=0.7)
    fold = mmr_rerank(df, k=4, lambda_mult=0.7, fold_exact=True)
    key = ["query_id", "rank"]
    fast_rows = [(r.query_id, r.rank, r.doc_id) for r in fast.orderBy(*key).collect()]
    fold_rows = [(r.query_id, r.rank, r.doc_id) for r in fold.orderBy(*key).collect()]
    assert fast_rows == fold_rows and len(fast_rows) == 12
