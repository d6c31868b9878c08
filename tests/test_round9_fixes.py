"""Round-9 regression tests for the round-8 verdict/advice items:

1. json_key_drift classifies dirty payloads as first-class sentinel keys
   (``__null__`` / ``__malformed__`` / ``__nonobject__``) on the exact
   malformed-props case list, instead of dropping them,
2. json_key_drift is defined on EMPTY before/after frames (the 0/0 rate
   division previously hit ANSI round(Inf) → runtime error),
3. bcubed_scores returns the defined zero row on empty input and treats
   NULL cluster ids as singletons (previously silently dropped),
4. simhash md5 paths agree on NULL/empty text (coalesce-to-'' fix) and
   NULL-text docs survive into the pair operator,
5. temperature_mix_plan quota arithmetic survives products past 2^63
   (DECIMAL(38,0) widening — the round-8 advice overflow),
6. fs_exists resolves local and scheme-qualified paths via Hadoop FS.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from unified_firmographic_data_pipeline_spark.operators.linkage import bcubed_scores
from unified_firmographic_data_pipeline_spark.operators.neardup import (
    simhash_md5,
    simhash_md5_fingerprints,
)
from unified_firmographic_data_pipeline_spark.quality.drift import json_key_drift

# the round-4 dirty-payload case list (tests/test_round4_fixes.py), inlined
# so this module stands alone: malformed, empty, SQL NULL, JSON null,
# arrays, scalars, nested objects, valid-prefix comma fragments
DIRTY = [
    '{"k": 1}', '{"k": 0}', "{}", '{"k": null}', "null", "", None,
    "{", "not json", "[1, 2, 3]", '{"k": "12"}', '{"k": 1e308}',
    '{"other": 5}', '{"k": {"nested": 1}}',
    "1,2", '{"k":1},{"k":2}', '"a","b"',
]


# ----------------------------------------- 1. sentinel classification
def test_json_key_drift_dirty_payload_sentinels(spark):
    before = spark.createDataFrame([(p,) for p in DIRTY], "p string")
    after = spark.createDataFrame([('{"k": 1}',)], "p string")
    out = {r["key"]: r.asDict() for r in json_key_drift(before, after, "p").collect()}
    # every row is accounted for: real keys + sentinels; '{}' alone drops
    assert out["__null__"]["before_n"] == 1  # the SQL NULL
    # "", "{", "not json", "1,2", '{"k":1},{"k":2}', '"a","b"'
    assert out["__malformed__"]["before_n"] == 6
    # "null", "[1, 2, 3]" (valid JSON, not objects)
    assert out["__nonobject__"]["before_n"] == 2
    # k appears in 6 valid objects; 'other' and 'nested' never top-level
    assert out["k"]["before_n"] == 6
    assert out["other"]["before_n"] == 1
    assert "nested" not in out
    total = sum(r["before_n"] for r in out.values())
    assert total == len(DIRTY) - 1  # only '{}' contributes no row
    # dirty classes vanished in the after frame -> reported as removed
    assert out["__malformed__"]["status"] == "removed"
    assert out["__null__"]["status"] == "removed"


# ----------------------------------------- 2. empty-side definedness
def test_json_key_drift_empty_sides(spark):
    empty = spark.createDataFrame([], "p string")
    frame = spark.createDataFrame([('{"k": 1}',), ("junk",)], "p string")
    added = {r["key"]: r.asDict() for r in json_key_drift(empty, frame, "p").collect()}
    assert added["k"]["status"] == "added"
    assert added["k"]["rate_delta_micro"] == 500_000  # 1/2 rows - 0
    assert added["__malformed__"]["rate_delta_micro"] == 500_000
    removed = {r["key"]: r.asDict() for r in json_key_drift(frame, empty, "p").collect()}
    assert removed["k"]["status"] == "removed"
    assert removed["k"]["rate_delta_micro"] == -500_000
    assert json_key_drift(empty, empty, "p").count() == 0


# ----------------------------------------- 3. bcubed edge semantics
def test_bcubed_empty_input_zero_row(spark):
    df = spark.createDataFrame([], "pred string, truth string")
    row = bcubed_scores(df, "pred", "truth").collect()[0]
    assert row.asDict() == {
        "n_records": 0, "n_pred_clusters": 0, "n_truth_classes": 0,
        "b3_precision": 0.0, "b3_recall": 0.0, "b3_f1": 0.0,
    }


def test_bcubed_null_ids_are_singletons(spark):
    # 2 records share pred+truth; 2 records have NULL pred -> each its own
    # singleton cluster. Brute-force B3: per-record precision/recall.
    df = spark.createDataFrame(
        [("c1", "t1"), ("c1", "t1"), (None, "t1"), (None, "t2")],
        "pred string, truth string",
    )
    row = bcubed_scores(df, "pred", "truth").collect()[0]
    assert row["n_records"] == 4
    assert row["n_pred_clusters"] == 3  # c1 + two null singletons
    # precision: records in c1 -> 2/2; singletons -> 1/1  => 1.0
    assert row["b3_precision"] == 1.0
    # recall per record: t1 has 3 records: the two c1 records each see 2/3,
    # the null-pred t1 record sees 1/3; t2 singleton sees 1/1
    expected_recall = round((2 / 3 + 2 / 3 + 1 / 3 + 1.0) / 4, 6)
    assert row["b3_recall"] == expected_recall


def test_bcubed_mixed_type_ids_group_exactly(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "pred bigint, truth string"
    )
    row = bcubed_scores(df, "pred", "truth").collect()[0]
    assert (row["n_records"], row["n_pred_clusters"]) == (3, 2)
    assert row["b3_precision"] == 1.0 and row["b3_recall"] == 1.0


# ----------------------------------------- 4. simhash NULL-text parity
def test_simhash_md5_null_and_empty_text_parity(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, None), (3, ""), (4, "   ")],
        "doc_id bigint, text string",
    )
    col_fp = {
        r["doc_id"]: r["fp"]
        for r in df.select("doc_id", simhash_md5("text", 60).alias("fp")).collect()
    }
    agg_fp = {
        r["doc_id"]: r["__fp"]
        for r in simhash_md5_fingerprints(df, "doc_id", "text", 60).collect()
    }
    assert set(agg_fp) == {1, 2, 3, 4}  # nobody dropped
    assert col_fp == agg_fp
    # NULL, '', and whitespace-only all coalesce to the [''] token set
    assert col_fp[2] == col_fp[3] == col_fp[4]
    assert col_fp[1] != col_fp[2]


def test_simhash_pairs_include_null_text_docs(spark):
    from unified_firmographic_data_pipeline_spark.operators.neardup import (
        simhash_near_pairs_md5,
    )

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "totally different words here xyz")],
        "doc_id bigint, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs_md5(df, max_hamming=3, bits=60).collect()
    }
    assert (1, 2) in pairs  # identical (empty) fingerprints pair up


# ----------------------------------------- 5. mix-plan overflow headroom
def test_temperature_mix_plan_huge_budget_no_overflow(spark):
    from unified_firmographic_data_pipeline_spark.operators.mixing import (
        temperature_mix_plan,
    )

    docs = spark.createDataFrame(
        [("a", "one two three"), ("a", "four five"), ("b", "six")],
        "source string, text string",
    )
    budget = 4_000_000_000_000_000_000  # weight_micro * budget >> 2^63
    rows = temperature_mix_plan(docs, alpha=0.7, budget=budget).collect()
    assert sum(r["quota_tokens"] for r in rows) == budget
    assert all(r["quota_tokens"] > 0 for r in rows)


# ----------------------------------------- 6. fs_exists via Hadoop FS
def test_fs_exists_local_and_scheme_qualified(spark, tmp_path):
    from unified_firmographic_data_pipeline_spark.sources.catalog import fs_exists

    d = tmp_path / "t"
    d.mkdir()
    assert fs_exists(spark, str(d))
    assert fs_exists(spark, "file:" + str(d))  # scheme-qualified resolves
    assert not fs_exists(spark, str(tmp_path / "missing"))
    assert not fs_exists(spark, "file:" + str(tmp_path / "missing"))
