"""Tests for the round-4 training-prep batch: overlapping token-window
chunking, stratified-rate sampling, ANN recall@k, and drift detection."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from unified_firmographic_data_pipeline_spark.operators.curation import (
    chunk_documents,
    token_chunks,
    token_windows,
)
from unified_firmographic_data_pipeline_spark.operators.sampling import (
    bernoulli_hash_sample,
    stratified_fractions_sample,
)
from unified_firmographic_data_pipeline_spark.operators.similarity import (
    cosine_topk,
    recall_at_k,
)
from unified_firmographic_data_pipeline_spark.quality.drift import (
    categorical_psi,
    numeric_psi,
    schema_drift,
)


# ---------------------------------------------------------------- chunking
def _doc(spark, text):
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_token_windows_overlap_and_coverage(spark):
    # 10 tokens, width 4, stride 2 -> starts 0,2,4,6 -> 4 windows
    text = " ".join(f"t{i}" for i in range(10))
    out = _doc(spark, text).select(
        token_windows("text", width=4, stride=2).alias("w")
    ).collect()[0].w
    assert out == [
        "t0 t1 t2 t3",
        "t2 t3 t4 t5",
        "t4 t5 t6 t7",
        "t6 t7 t8 t9",
    ]


def test_token_windows_partial_tail_and_short_doc(spark):
    # 7 tokens, width 4, stride 3 -> starts 0,3 -> second window partial
    text = " ".join(f"t{i}" for i in range(7))
    out = _doc(spark, text).select(
        token_windows("text", width=4, stride=3).alias("w")
    ).collect()[0].w
    assert out == ["t0 t1 t2 t3", "t3 t4 t5 t6"]
    # doc shorter than width -> exactly one window, no padding
    short = _doc(spark, "a b").select(
        token_windows("text", width=8, stride=4).alias("w")
    ).collect()[0].w
    assert short == ["a b"]


def test_token_windows_empty_doc_yields_no_windows(spark):
    for text in ("", "   ", None):
        out = _doc(spark, text).select(
            token_windows("text", width=4, stride=2).alias("w")
        ).collect()[0].w
        assert out == []


def test_token_windows_stride_eq_width_matches_token_chunks(spark):
    text = " ".join(f"t{i}" for i in range(11))
    df = _doc(spark, text)
    a = df.select(token_windows("text", width=4, stride=4).alias("w")).collect()[0].w
    b = df.select(token_chunks("text", width=4).alias("w")).collect()[0].w
    assert a == b


def test_token_windows_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        token_windows("text", width=4, stride=5)
    with pytest.raises(ValueError):
        token_windows("text", width=0, stride=1)


def test_chunk_documents_provenance(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"a{i}" for i in range(10))), (2, ""), (3, "x y z")],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, width=4, stride=3).orderBy(
        "doc_id", "chunk_id"
    ).collect()
    # doc 2 (empty) contributes no rows; doc 3 one short window;
    # doc 1: n = 1 + ceil((10-4)/3) = 3 windows at starts 0, 3, 6
    assert [(r.doc_id, r.chunk_id, r.chunk_start, r.n_tokens) for r in rows] == [
        (1, 0, 0, 4),
        (1, 1, 3, 4),
        (1, 2, 6, 4),
        (3, 0, 0, 3),
    ]
    # every token of doc 1 is covered by at least one chunk
    covered = set()
    for r in rows[:3]:
        covered |= set(r.chunk_text.split())
    assert covered == {f"a{i}" for i in range(10)}


# ---------------------------------------------------------------- sampling
def test_stratified_fractions_sample_rates(spark):
    n = 4000
    df = spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "web").otherwise("books").alias("src"),
    )
    out = stratified_fractions_sample(
        df, "src", {"web": 0.1, "books": 1.0}, key="id"
    )
    counts = {r.src: r.n for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert counts["books"] == n // 2  # rate 1.0 keeps everything
    assert 0.05 * n / 2 < counts.get("web", 0) < 0.15 * n / 2

    # unlisted strata use default_fraction (0.0 -> dropped entirely)
    df2 = df.withColumn("src", F.lit("logs"))
    assert stratified_fractions_sample(df2, "src", {"web": 0.5}, key="id").count() == 0


def test_stratified_sample_is_deterministic_and_consistent(spark):
    df = spark.range(1000).select(
        F.col("id"), F.lit("web").alias("src")
    )
    a = sorted(
        r.id
        for r in stratified_fractions_sample(df, "src", {"web": 0.2}, key="id").collect()
    )
    b = sorted(
        r.id
        for r in stratified_fractions_sample(df, "src", {"web": 0.2}, key="id").collect()
    )
    assert a == b
    # same rows as a plain Bernoulli sample at the same rate (same hash)
    c = sorted(r.id for r in bernoulli_hash_sample(df, F.col("id"), 0.2).collect())
    assert a == c


def test_stratified_fractions_rejects_bad_rate(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        stratified_fractions_sample(df, "id", {"x": 1.5}, key="id")


# ---------------------------------------------------------------- recall@k
def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_recall_at_k_perfect_and_partial(spark):
    import random

    rnd = random.Random(7)
    corpus = _vecs(
        spark,
        [(i, [rnd.gauss(0, 1) for _ in range(8)]) for i in range(40)],
    )
    queries = _vecs(spark, [(100, [rnd.gauss(0, 1) for _ in range(8)])])
    exact = cosine_topk(corpus, queries, k=5)
    # tier == truth -> recall 1.0
    r = recall_at_k(exact, exact, k=5).collect()[0]
    assert (r.n_exact, r.n_hit, r.recall) == (5, 5, 1.0)
    # drop 2 of 5 -> recall 0.6
    partial = exact.filter(F.col("rank") <= 3)
    r = recall_at_k(partial, exact, k=5).collect()[0]
    assert (r.n_exact, r.n_hit) == (5, 3)
    assert abs(r.recall - 0.6) < 1e-12


def test_recall_at_k_missing_query_scores_zero(spark):
    exact = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (2, 10, 1)],
        "query_id long, neighbor_id long, rank int",
    )
    approx = spark.createDataFrame(
        [(1, 10, 1)], "query_id long, neighbor_id long, rank int"
    )
    out = {r.query_id: r for r in recall_at_k(approx, exact, k=5).collect()}
    assert out[1].recall == 0.5
    assert out[2].n_hit == 0 and out[2].recall == 0.0


def test_rp_tier_recall_is_reasonable(spark):
    import random

    rnd = random.Random(11)
    dim = 32
    corpus = _vecs(
        spark, [(i, [rnd.gauss(0, 1) for _ in range(dim)]) for i in range(120)]
    )
    queries = _vecs(
        spark, [(200 + i, [rnd.gauss(0, 1) for _ in range(dim)]) for i in range(5)]
    )
    from unified_firmographic_data_pipeline_spark.operators.rp import cosine_topk_rp

    exact = cosine_topk(corpus, queries, k=5)
    approx = cosine_topk_rp(corpus, queries, k=5, out_dim=16, shortlist=40)
    mean = recall_at_k(approx, exact, k=5).agg(F.avg("recall")).collect()[0][0]
    assert mean > 0.6  # JL at half dim with a wide shortlist


# ------------------------------------------------------------------- drift
def test_schema_drift_add_remove_retype(spark):
    before = spark.createDataFrame([(1, "a", 2.0)], "id long, name string, v double")
    after = spark.createDataFrame([(1, 2, True)], "id long, v int, flag boolean")
    rows = {r.column: r for r in schema_drift(before, after).collect()}
    assert rows["name"].change == "removed"
    assert rows["flag"].change == "added"
    assert rows["v"].change == "retyped"
    assert (rows["v"].before_type, rows["v"].after_type) == ("double", "int")
    assert "id" not in rows
    # identical schemas -> zero rows
    assert schema_drift(before, before).count() == 0


def test_numeric_psi_identical_is_zero_and_shift_registers(spark):
    ref = spark.range(1000).select((F.col("id") % 100).cast("double").alias("x"))
    same = numeric_psi(ref, ref, "x", bins=10)
    total = same.agg(F.sum("psi_term")).collect()[0][0]
    assert abs(total) < 1e-9
    # shifted distribution -> PSI clearly above the 0.25 drift threshold
    cur = spark.range(1000).select((F.col("id") % 100 + 50).cast("double").alias("x"))
    drifted = numeric_psi(ref, cur, "x", bins=10).agg(F.sum("psi_term")).collect()[0][0]
    assert drifted > 0.25
    # out-of-range mass folds into the edge bucket, never dropped
    buckets = numeric_psi(ref, cur, "x", bins=10).collect()
    assert math.isclose(sum(b.p_cur for b in buckets), 1.0, rel_tol=1e-9)


def test_numeric_psi_guards(spark):
    ref = spark.createDataFrame([(None,)], "x double")
    with pytest.raises(ValueError):
        numeric_psi(ref, ref, "x")
    const = spark.createDataFrame([(5.0,), (5.0,)], "x double")
    out = numeric_psi(const, const, "x", bins=4)
    assert abs(out.agg(F.sum("psi_term")).collect()[0][0]) < 1e-9


def test_categorical_psi_new_category_lands_in_other(spark):
    ref = spark.createDataFrame([("a",)] * 50 + [("b",)] * 50, "v string")
    cur = spark.createDataFrame([("a",)] * 50 + [("zz",)] * 50, "v string")
    rows = {r.value: r for r in categorical_psi(ref, cur, "v", top_k=5).collect()}
    assert rows["__other__"].p_cur == 0.5 and rows["__other__"].p_ref == 0.0
    assert rows["b"].p_cur == 0.0
    total = sum(r.psi_term for r in rows.values())
    assert total > 0.25
    # nulls are a category of their own
    curn = spark.createDataFrame([("a",), (None,)], "v string")
    rows = {r.value: r for r in categorical_psi(ref, curn, "v").collect()}
    assert rows["__null__"].p_cur == 0.5


# ------------------------------------------------------------- plan shapes
def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_chunking_and_stratified_sample_are_narrow(spark):
    """The scan-stage contract: chunking and per-row sampling must add NO
    shuffle — they pipeline inside whatever stage reads the data."""
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "f g")], "doc_id long, text string"
    )
    assert "Exchange" not in _physical_plan(chunk_documents(docs, width=2, stride=1))
    sampled = stratified_fractions_sample(
        docs.withColumn("src", F.lit("web")), "src", {"web": 0.5}, key="doc_id"
    )
    assert "Exchange" not in _physical_plan(sampled)


def test_recall_at_k_no_cartesian(spark):
    exact = spark.createDataFrame(
        [(1, 10, 1)], "query_id long, neighbor_id long, rank int"
    )
    plan = _physical_plan(recall_at_k(exact, exact, k=5))
    assert "CartesianProduct" not in plan


def test_psi_is_nonnegative_on_random_frames(spark):
    """Each PSI term (p_cur - p_ref)·ln(p_cur/p_ref) has matching signs in
    both factors, so the total is >= 0 for ANY pair of distributions —
    pinned over seeded random frames."""
    import random

    rnd = random.Random(17)
    for trial in range(3):
        a = spark.createDataFrame(
            [(rnd.gauss(0, 1 + trial),) for _ in range(300)], "x double"
        )
        b = spark.createDataFrame(
            [(rnd.gauss(trial - 1, 2),) for _ in range(200)], "x double"
        )
        total = numeric_psi(a, b, "x", bins=8).agg(F.sum("psi_term")).collect()[0][0]
        assert total >= -1e-12
        cat_a = spark.createDataFrame(
            [(rnd.choice("abcde"),) for _ in range(200)], "v string"
        )
        cat_b = spark.createDataFrame(
            [(rnd.choice("cdefg"),) for _ in range(200)], "v string"
        )
        rows = categorical_psi(cat_a, cat_b, "v").collect()
        assert sum(r.psi_term for r in rows) >= -1e-12


def test_sentence_chunks_packing_and_edges(spark):
    from unified_firmographic_data_pipeline_spark.operators.curation import (
        sentence_chunks,
    )

    docs = spark.createDataFrame(
        [
            (1, "One two three. Four five six seven. Eight nine. Ten."),
            (2, ""),     # no sentences -> no rows
            (3, None),   # NULL text -> no rows
            (4, "Single sentence only here."),
        ],
        "doc_id long, text string",
    )
    rows = sentence_chunks(docs, capacity=6).orderBy("doc_id", "chunk_id").collect()
    # doc 1 sentences are 3/4/2/1 tokens; preceding 0,3,7,9 -> chunks 0,0,1,1
    assert [(r.doc_id, r.chunk_id, r.n_sentences, r.n_tokens) for r in rows] == [
        (1, 0, 2, 7),  # overshoots capacity by one sentence: documented
        (1, 1, 2, 3),
        (4, 0, 1, 4),
    ]
    assert rows[0].chunk_text == "One two three Four five six seven"
    assert rows[1].chunk_text == "Eight nine Ten"  # sentence order preserved
    # a sentence longer than capacity owns its chunk; later sentences skip ids
    # note: the locale-aware splitter needs real words AND an uppercase
    # sentence start — "e." reads as an initial, a lowercase continuation
    # does not open a new sentence
    big = spark.createDataFrame(
        [(9, "Alpha beta gamma delta epsilon. Foo bar.")],
        "doc_id long, text string",
    )
    out = sentence_chunks(big, capacity=2).orderBy("chunk_id").collect()
    assert [(r.chunk_id, r.n_tokens) for r in out] == [(0, 5), (2, 2)]
    import pytest

    with pytest.raises(ValueError):
        sentence_chunks(docs, capacity=0)

