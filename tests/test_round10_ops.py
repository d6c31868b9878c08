"""Round-10 operators: multi-turn conversation (chat-transcript) family
(round-9 verdict item #6) — flatten, per-role stats, turn-level dedup."""

from __future__ import annotations

from unified_firmographic_data_pipeline_spark.operators.conversations import (
    dedup_turns,
    flatten_turns,
    role_token_stats,
)


def _chat(spark):
    rows = [
        # 2-turn clean conversation
        (1, '{"messages":[{"role":"system","content":"be brief"},'
            '{"role":"user","content":"hello world"}]}'),
        # duplicate of conversation 1's user turn + its own assistant turn
        (2, '{"messages":[{"role":"user","content":"hello world"},'
            '{"role":"assistant","content":""}]}'),
        # malformed payload
        (3, '{"messages": [{'),
        # valid JSON, no messages key
        (4, '{"other": 1}'),
        # present-but-empty conversation
        (5, '{"messages":[]}'),
        # NULL payload
        (6, None),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, chat string")


def test_flatten_turns_keeps_dirty_payloads(spark):
    flat = flatten_turns(_chat(spark), "chat").collect()
    by_doc = {}
    for r in flat:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # clean conversations explode to their turns, 0-based
    assert [(r["turn_idx"], r["role"]) for r in by_doc[1]] == [
        (0, "system"),
        (1, "user"),
    ]
    # malformed / missing-key / empty / NULL each keep ONE null row —
    # the conversation id survives for parse-rate accounting
    for doc in (3, 4, 5, 6):
        assert len(by_doc[doc]) == 1
        r = by_doc[doc][0]
        assert r["turn_idx"] is None and r["role"] is None and r["content"] is None


def test_role_token_stats_counts(spark):
    stats = {
        r["role"]: r
        for r in role_token_stats(flatten_turns(_chat(spark), "chat")).collect()
    }
    assert stats["user"]["n_turns"] == 2
    assert stats["user"]["n_conversations"] == 2
    assert stats["user"]["n_tokens"] == 4  # "hello world" twice
    assert stats["assistant"]["n_empty_turns"] == 1
    assert stats["assistant"]["n_tokens"] == 0
    # the four dirty payloads aggregate under the NULL role
    assert stats[None]["n_turns"] == 4
    assert stats[None]["n_conversations"] == 4


def test_dedup_turns_keep_first_and_null_passthrough(spark):
    out = dedup_turns(flatten_turns(_chat(spark), "chat")).collect()
    kept = {(r["role"], r["content"]): r for r in out if r["role"] is not None}
    # the duplicated user turn keeps doc 1's occurrence with n_dups=2
    r = kept[("user", "hello world")]
    assert (r["doc_id"], r["turn_idx"], r["n_dups"]) == (1, 1, 2)
    assert kept[("system", "be brief")]["n_dups"] == 1
    # NULL-role rows pass through untouched, one per dirty payload
    assert sum(1 for r in out if r["role"] is None) == 4


def test_dedup_turns_drop_content(spark):
    out = dedup_turns(flatten_turns(_chat(spark), "chat"), keep_content=False)
    assert "content" not in out.columns
    assert "n_dups" in out.columns


# ---------------- VariantType raw tier (round-9 verdict item #5) ----------
def test_flatten_turns_variant_matches_string_tier(spark):
    df = _chat(spark)
    a = sorted(
        (r["doc_id"], r["turn_idx"], r["role"], r["content"])
        for r in flatten_turns(df, "chat").collect()
    )
    from unified_firmographic_data_pipeline_spark.operators.conversations import (
        flatten_turns_variant,
    )

    b = sorted(
        (r["doc_id"], r["turn_idx"], r["role"], r["content"])
        for r in flatten_turns_variant(df, "chat").collect()
    )
    # identical rows INCLUDING the dirty-payload one-NULL-row contract
    assert a == b


def test_read_json_landing_variant_roundtrip(spark, tmp_path):
    import json

    from pyspark.sql import functions as F
    from pyspark.sql.types import VariantType
    from unified_firmographic_data_pipeline_spark.sources.landing import (
        read_json_landing_variant,
    )

    land = tmp_path / "land"
    land.mkdir()
    (land / "a.json").write_text(json.dumps({"items": [1, 2, 3]}))
    (land / "b.json").write_text("{not json")
    df = read_json_landing_variant(spark, str(land), "fortune500", glob="*.json")
    assert set(df.columns) == {"id", "source", "ingested_at", "payload"}
    assert isinstance(df.schema["payload"].dataType, VariantType)
    rows = df.select(
        F.try_variant_get("payload", "$.items[1]", "int").alias("second"),
        F.col("payload").isNull().alias("is_null"),
    ).collect()
    # lenient tier: the malformed document lands as NULL payload (COPY
    # ON_ERROR=CONTINUE), the clean one answers variant paths
    assert sorted(
        ((r["second"], r["is_null"]) for r in rows),
        key=lambda t: (t[0] is None, t[0] or 0),
    ) == [(2, False), (None, True)]
    # the variant column survives a parquet write/read (the raw-tier sink)
    out = tmp_path / "raw"
    df.write.mode("overwrite").parquet(str(out))
    back = spark.read.parquet(str(out))
    assert isinstance(back.schema["payload"].dataType, VariantType)
    vals = sorted(
        (
            r[0]
            for r in back.select(
                F.try_variant_get("payload", "$.items[0]", "int")
            ).collect()
        ),
        key=lambda x: (x is None, x),
    )
    assert vals == [1, None]


def test_read_json_landing_variant_strict_raises(spark, tmp_path):
    import pytest

    from unified_firmographic_data_pipeline_spark.sources.landing import (
        read_json_landing_variant,
    )

    land = tmp_path / "land"
    land.mkdir()
    (land / "bad.json").write_text("{not json")
    df = read_json_landing_variant(
        spark, str(land), "fortune500", glob="*.json", strict=True
    )
    with pytest.raises(Exception, match="MALFORMED_RECORD_IN_PARSING|JSON"):
        df.collect()


# ------------- streaming LSH near-dup sink (round-9 verdict item #4) ------
def test_stream_lsh_neardup_sink_matches_batch(spark, tmp_path, sf_small):
    """Union of landed candidate partitions == from-scratch batch
    minhash_lsh_candidates after every micro-batch; the index equals the
    batch band table; a checkpoint replay and a direct re-fold change
    nothing."""
    from pyspark.sql import functions as F
    from unified_firmographic_data_pipeline_spark.operators.neardup import (
        minhash_band_buckets,
        minhash_lsh_candidates,
    )
    from unified_firmographic_data_pipeline_spark.streaming.ingest import (
        lsh_neardup_fold,
        stream_lsh_neardup_sink,
    )

    docs = (
        spark.read.parquet(f"{sf_small}/documents.parquet")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "text")
    )
    batches = [
        docs.filter(F.col("doc_id") % 3 == i) for i in range(3)
    ]
    src = str(tmp_path / "src")
    index = str(tmp_path / "index")
    cands = str(tmp_path / "cands")
    ckpt = str(tmp_path / "ckpt")
    sch = "doc_id long, text string"

    def run():
        q = stream_lsh_neardup_sink(
            spark.readStream.schema(sch).parquet(src), index, cands, ckpt
        )
        q.awaitTermination()

    ingested = None
    for batch in batches:
        ingested = batch if ingested is None else ingested.unionByName(batch)
        batch.coalesce(1).write.mode("append").parquet(src)
        run()
        landed_pairs = {
            (r["id_a"], r["id_b"])
            for r in spark.read.parquet(cands).select("id_a", "id_b").collect()
        }
        expected_pairs = {
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_candidates(ingested).collect()
        }
        assert landed_pairs == expected_pairs
        landed_index = {
            tuple(r) for r in spark.read.parquet(index).collect()
        }
        expected_index = {
            tuple(r) for r in minhash_band_buckets(ingested).collect()
        }
        assert landed_index == expected_index

    # checkpoint replay: nothing changes
    run()
    assert {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(cands).select("id_a", "id_b").collect()
    } == landed_pairs
    # direct re-fold of an already-applied batch: returns False, no writes
    applied = lsh_neardup_fold(batches[2], batch_id=2, index_path=index,
                               candidates_path=cands)
    assert applied is False
    assert {
        tuple(r) for r in spark.read.parquet(index).collect()
    } == landed_index


def test_lsh_neardup_fold_crash_between_writes_replays_clean(spark, tmp_path, sf_small):
    """Simulate the crash window: candidates landed, index append lost.
    The replayed fold recomputes the identical candidate set and
    completes the index — no duplicates, no loss."""
    from pyspark.sql import functions as F
    from unified_firmographic_data_pipeline_spark.streaming.ingest import (
        lsh_neardup_fold,
    )

    docs = (
        spark.read.parquet(f"{sf_small}/documents.parquet")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", "text")
    )
    b0 = docs.filter(F.col("doc_id") < 20)
    b1 = docs.filter(F.col("doc_id") >= 20)
    index = str(tmp_path / "index")
    cands = str(tmp_path / "cands")
    assert lsh_neardup_fold(b0, 0, index, cands) is True
    assert lsh_neardup_fold(b1, 1, index, cands) is True
    after = {
        (r["id_a"], r["id_b"], r["batch_id"])
        for r in spark.read.parquet(cands).collect()
    }
    # "crash": batch 1's index append never happened — rebuild the index
    # to its post-batch-0 state, keep batch 1's candidate partition
    import shutil

    shutil.rmtree(index)
    assert lsh_neardup_fold(b0, 0, index, str(tmp_path / "scratch")) is True
    # replay batch 1: overwrites its own partition with identical content
    assert lsh_neardup_fold(b1, 1, index, cands) is True
    replayed = {
        (r["id_a"], r["id_b"], r["batch_id"])
        for r in spark.read.parquet(cands).collect()
    }
    assert replayed == after
