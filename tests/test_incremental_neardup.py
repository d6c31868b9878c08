"""Incremental near-dup: persistable LSH band-bucket index + new-vs-corpus
candidate join (operators/neardup.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from unified_firmographic_data_pipeline_spark.operators.neardup import (
    lsh_candidates_from_buckets,
    minhash_band_buckets,
    minhash_lsh_candidates,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and then it sat down "
    "by the river to rest for a while in the afternoon sun"
)
UNIQ_A = (
    "completely unrelated content about the history of movable type "
    "printing in early modern europe and its effect on literacy rates"
)
UNIQ_B = (
    "a third topic entirely describing the migration patterns of arctic "
    "terns across two hemispheres during a single calendar year"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _old_new(spark):
    old = _docs(
        spark,
        [
            (1, BASE),
            (2, BASE.replace("sun", "moon")),  # near-dup of 1 (old x old)
            (5, UNIQ_A),
        ],
    )
    new = _docs(
        spark,
        [
            (11, BASE.replace("sun", "star")),  # near-dup of 1/2 (new x old)
            (12, UNIQ_B),
            (13, UNIQ_B.replace("year", "season")),  # near-dup (new x new)
        ],
    )
    return old, new


def test_incremental_candidates_complete_the_batch_result(spark):
    """old-run pairs ∪ incremental pairs == full-corpus batch pairs: the
    nightly-append protocol loses nothing vs re-running from scratch."""
    old, new = _old_new(spark)
    full = old.unionByName(new)

    batch_pairs = {
        (r.id_a, r.id_b) for r in minhash_lsh_candidates(full).collect()
    }
    old_pairs = {(r.id_a, r.id_b) for r in minhash_lsh_candidates(old).collect()}

    old_idx = minhash_band_buckets(old)
    new_idx = minhash_band_buckets(new)
    incr_pairs = {
        (r.id_a, r.id_b)
        for r in lsh_candidates_from_buckets(
            new_idx, old_idx.unionByName(new_idx)
        ).collect()
    }
    assert old_pairs | incr_pairs == batch_pairs
    # sanity: the planted dup structure is actually found
    assert (1, 2) in old_pairs and (12, 13) in incr_pairs
    assert any(11 in p for p in incr_pairs)  # the cross-boundary near-dup
    # every incremental pair touches at least one NEW doc — old x old never
    # recomputes
    new_ids = {11, 12, 13}
    assert all(a in new_ids or b in new_ids for a, b in incr_pairs)


def test_bucket_index_round_trips_through_parquet(spark, tmp_path):
    """The index is a plain (id, band, bucket) table: landing it to
    parquet and reading it back joins identically — the persistence
    contract the nightly append relies on."""
    old, new = _old_new(spark)
    path = str(tmp_path / "lsh_index")
    minhash_band_buckets(old).write.parquet(path)
    landed = spark.read.parquet(path)
    new_idx = minhash_band_buckets(new)
    via_landed = {
        (r.id_a, r.id_b)
        for r in lsh_candidates_from_buckets(
            new_idx, landed.unionByName(new_idx)
        ).collect()
    }
    direct = {
        (r.id_a, r.id_b)
        for r in lsh_candidates_from_buckets(
            new_idx, minhash_band_buckets(old).unionByName(new_idx)
        ).collect()
    }
    assert via_landed == direct and via_landed


def test_bucket_index_parameters_are_identity(spark):
    """Different LSH parameters produce different bucket values — mixing
    indexes built under different settings would silently join garbage,
    so the parameter-identity contract is real, not stylistic."""
    docs = _docs(spark, [(1, BASE)])
    b3 = {(r.band, r.bucket) for r in minhash_band_buckets(docs, shingle_n=3).collect()}
    b4 = {(r.band, r.bucket) for r in minhash_band_buckets(docs, shingle_n=4).collect()}
    assert b3 != b4


def test_refactored_batch_candidates_unchanged(spark):
    """minhash_lsh_candidates (now built on minhash_band_buckets) still
    finds the planted near-dup and emits ordered distinct pairs."""
    old, _ = _old_new(spark)
    pairs = minhash_lsh_candidates(old).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}
    assert all(r.id_a < r.id_b for r in pairs)


def test_embedding_incremental_matches_full_batch(spark, tmp_path):
    """Vector-space incremental near-dup: landed buckets ∪ increment
    buckets joined increment-first reproduces exactly the full-batch
    pair set restricted to pairs touching a new vector — and the union
    with previous runs' output equals the full batch (the text-side
    old∪incr == full-batch contract, in embedding space)."""
    import random

    from pyspark.sql import functions as F

    from unified_firmographic_data_pipeline_spark.operators.similarity import (
        embedding_buckets,
        embedding_dup_candidates_from_buckets,
        embedding_dup_pairs_lsh,
    )

    rnd = random.Random(3)
    base = [rnd.gauss(0, 1) for _ in range(8)]

    def jitter(eps):
        return [x + rnd.gauss(0, eps) for x in base]

    rows = (
        [(i, jitter(0.01)) for i in range(6)]          # a dup cluster
        + [(i, [rnd.gauss(0, 1) for _ in range(8)]) for i in range(6, 12)]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    old = df.filter(F.col("vec_id") % 3 != 0)
    new = df.filter(F.col("vec_id") % 3 == 0)
    kw = dict(num_planes=4, dim=8, seed=42)

    # the landed index round-trips parquet like any real deployment
    path = str(tmp_path / "emb_buckets")
    embedding_buckets(old, **kw).write.parquet(path)
    old_b = spark.read.parquet(path)
    new_b = embedding_buckets(new, **kw)

    incr = embedding_dup_candidates_from_buckets(
        new_b, old_b.unionByName(new_b), df, threshold=0.9
    )
    full = embedding_dup_pairs_lsh(df, threshold=0.9, **kw)
    new_ids = {r.vec_id for r in new.collect()}
    want = {
        (r.id_a, r.id_b, r.cosine_sim)
        for r in full.collect()
        if r.id_a in new_ids or r.id_b in new_ids
    }
    got = {(r.id_a, r.id_b, r.cosine_sim) for r in incr.collect()}
    assert got == want and len(got) > 0
    # previous runs' (old x old) output ∪ increment == full batch
    old_only = {
        (r.id_a, r.id_b, r.cosine_sim)
        for r in embedding_dup_pairs_lsh(old, threshold=0.9, **kw).collect()
    }
    assert old_only | got == {
        (r.id_a, r.id_b, r.cosine_sim) for r in full.collect()
    }


def test_embedding_candidates_strict_flags_index_vector_drift(spark):
    """Round-5 advisor finding: the scoring joins are inner, so an id in
    the bucket index with no row in `vectors` silently dropped its pairs.
    strict=True must raise naming the missing ids; strict=False keeps the
    documented silent-inner-join contract; a drift-free strict call is a
    no-op."""
    import random

    import pytest

    from unified_firmographic_data_pipeline_spark.operators.similarity import (
        embedding_buckets,
        embedding_dup_candidates_from_buckets,
    )

    rnd = random.Random(7)
    base = [rnd.gauss(0, 1) for _ in range(8)]
    rows = [(i, [float(x + rnd.gauss(0, 0.01)) for x in base]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kw = dict(num_planes=4, dim=8, seed=42)
    buckets = embedding_buckets(df, **kw)

    # drift: id 3 is indexed but absent from the vector store
    vectors = df.filter(F.col("vec_id") != 3)
    with pytest.raises(ValueError, match=r"drift.*\[3\]"):
        embedding_dup_candidates_from_buckets(
            buckets, buckets, vectors, threshold=0.5, strict=True
        )
    # non-strict: documented silent inner-join behavior (pairs with 3 drop)
    lax = embedding_dup_candidates_from_buckets(
        buckets, buckets, vectors, threshold=0.5
    )
    assert {(r.id_a, r.id_b) for r in lax.collect()} == {(0, 1), (0, 2), (1, 2)}
    # no drift -> strict passes and matches non-strict
    ok = embedding_dup_candidates_from_buckets(
        buckets, buckets, df, threshold=0.5, strict=True
    )
    assert {(r.id_a, r.id_b) for r in ok.collect()} == {
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)
    }
