"""Round-10 fixes (round-9 ADVICE items):

1. The production xxhash64 ``simhash`` coalesces NULL text to '' like its
   md5 twins (round 9 fixed only the md5 family, so the two families
   disagreed on NULL-doc semantics: xxhash packed NULL text to fingerprint
   0 while md5 gave the real empty-token fingerprint).
2. ``rrf_fuse`` collapses duplicate (query, id) rows WITHIN one ranker to
   that ranker's best rank instead of silently inflating the fused score
   and ``n_rankers``.
"""

from __future__ import annotations

from unified_firmographic_data_pipeline_spark.operators.neardup import (
    simhash,
    simhash_near_pairs,
)
from unified_firmographic_data_pipeline_spark.operators.similarity import rrf_fuse


# ------------------------------------ 1. xxhash simhash NULL-text parity
def test_simhash_xxhash_null_equals_empty(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, None), (3, ""), (4, "   ")],
        "doc_id bigint, text string",
    )
    fp = {
        r["doc_id"]: r["fp"]
        for r in df.select("doc_id", simhash("text").alias("fp")).collect()
    }
    # NULL, '', and whitespace-only all tokenize to the [''] token set —
    # same convention as simhash_md5 / simhash_md5_fingerprints
    assert fp[2] == fp[3] == fp[4]
    assert fp[1] != fp[2]
    # the empty-token fingerprint is a real vote pack, not the all-NULL 0
    # (one token votes -1/+1 on every bit, so at least one bit is set
    # unless every one of the 32 low hash bits of '' is 0 — it is not)
    assert fp[2] != 0


def test_simhash_near_pairs_includes_null_text_docs(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "totally different words here xyz")],
        "doc_id bigint, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(df, max_hamming=3).collect()
    }
    assert (1, 2) in pairs  # NULL and '' now carry identical fingerprints


# ------------------------------- 2. rrf_fuse within-ranker duplicate rows
def test_rrf_fuse_collapses_within_ranker_duplicates(spark):
    clean = spark.createDataFrame(
        [("q", 10, 1), ("q", 11, 2)],
        "query_id string, neighbor_id int, rank int",
    )
    # same candidate set but doc 10 listed twice by the one ranker
    dirty = spark.createDataFrame(
        [("q", 10, 1), ("q", 10, 3), ("q", 11, 2)],
        "query_id string, neighbor_id int, rank int",
    )
    fused_clean = {
        (r["neighbor_id"]): (r["rrf_score_nano"], r["n_rankers"], r["fused_rank"])
        for r in rrf_fuse([clean], k_rrf=60).collect()
    }
    fused_dirty = {
        (r["neighbor_id"]): (r["rrf_score_nano"], r["n_rankers"], r["fused_rank"])
        for r in rrf_fuse([dirty], k_rrf=60).collect()
    }
    # the duplicate collapses to its best rank: identical output
    assert fused_dirty == fused_clean
    assert fused_clean[10][1] == 1  # n_rankers counts rankers, not rows


def test_rrf_fuse_two_rankers_still_sum(spark):
    a = spark.createDataFrame(
        [("q", 10, 1)], "query_id string, neighbor_id int, rank int"
    )
    b = spark.createDataFrame(
        [("q", 10, 2)], "query_id string, neighbor_id int, rank int"
    )
    row = rrf_fuse([a, b], k_rrf=60).collect()[0]
    assert row["n_rankers"] == 2
    assert row["rrf_score_nano"] == round(1e9 / 61) + round(1e9 / 62)
