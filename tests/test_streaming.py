"""Streaming ingest tests: exactly-once-per-file semantics (the COPY INTO
analogue) and batch/stream expression parity for windowed counts."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from unified_firmographic_data_pipeline_spark.streaming.ingest import (
    stream_file_ingest,
    windowed_counts_batch,
)

import pytest

# heavy property sweep / e2e tier (see pytest.ini): excluded from the
# default driver-window run, executed by the full tier at close-out
pytestmark = pytest.mark.slow


SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_exactly_once_per_file(spark, tmp_path):
    src = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, src, [(1, datetime(2024, 1, 1, 10), "click", 1.0)])

    q = stream_file_ingest(spark, src, SCHEMA, ckpt, out)
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 1

    # rerun with no new files: checkpoint must prevent reprocessing
    q = stream_file_ingest(spark, src, SCHEMA, ckpt, out)
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 1

    # new file: only the delta is ingested
    _write_batch(spark, src, [(2, datetime(2024, 1, 1, 11), "view", 2.0)])
    q = stream_file_ingest(spark, src, SCHEMA, ckpt, out)
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == 2
    assert "ingested_at" in got.columns  # metadata stamp (A4 semantics)


def test_windowed_counts_batch(spark):
    rows = [
        (1, datetime(2024, 1, 1, 10, 5), "click", 1.0),
        (2, datetime(2024, 1, 1, 10, 55), "click", 2.0),
        (3, datetime(2024, 1, 1, 11, 5), "click", 4.0),
        (4, datetime(2024, 1, 1, 10, 30), "view", 8.0),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_counts_batch(df, "1 hour").collect()
    }
    assert out[(datetime(2024, 1, 1, 10), "click")] == (2, 3.0)
    assert out[(datetime(2024, 1, 1, 11), "click")] == (1, 4.0)
    assert out[(datetime(2024, 1, 1, 10), "view")] == (1, 8.0)


def test_streaming_windowed_counts_runs(spark, tmp_path):
    """The watermarked streaming plan executes end-to-end on a file source."""
    from unified_firmographic_data_pipeline_spark.streaming.ingest import (
        stream_windowed_counts,
    )

    src = str(tmp_path / "landing2")
    _write_batch(
        spark,
        src,
        [
            (1, datetime(2024, 1, 1, 10, 5), "click", 1.0),
            (2, datetime(2024, 1, 1, 10, 15), "click", 2.0),
        ],
    )
    agg = stream_windowed_counts(spark, src, SCHEMA, str(tmp_path / "ckpt2"))
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM win_counts").collect()
    assert len(rows) == 1
    assert rows[0]["n_events"] == 2 and rows[0]["sum_value"] == 3.0


def test_streaming_session_counts(spark, tmp_path):
    """Session windows close after the gap; two bursts 2h apart -> two
    sessions for the same user."""
    from unified_firmographic_data_pipeline_spark.streaming.ingest import stream_session_counts

    src = str(tmp_path / "landing3")
    _write_batch(
        spark,
        src,
        [
            (1, datetime(2024, 1, 1, 10, 0), "click", 1.0),
            (2, datetime(2024, 1, 1, 10, 10), "click", 1.0),
            (3, datetime(2024, 1, 1, 12, 30), "click", 1.0),
        ],
    )
    agg = stream_session_counts(
        spark, src, SCHEMA, gap="30 minutes", key_col="event_type", ts_col="ts"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted(
        spark.sql("SELECT * FROM sess_counts").collect(),
        key=lambda r: r["session_start"],
    )
    assert [r["n_events"] for r in rows] == [2, 1]
    assert rows[0]["session_start"] == datetime(2024, 1, 1, 10, 0)
    assert rows[0]["session_end"] == datetime(2024, 1, 1, 10, 40)  # last + gap


def test_stream_stream_interval_join(spark, tmp_path):
    """Purchases join clicks of the same user within the preceding hour;
    a click 2h earlier must not match."""
    from unified_firmographic_data_pipeline_spark.streaming.ingest import (
        stream_stream_interval_join,
    )
    from pyspark.sql.types import LongType, StructField, StructType, TimestampType

    sch = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("event_id", LongType()),
        ]
    )
    clicks_dir = str(tmp_path / "clicks")
    buys_dir = str(tmp_path / "buys")
    t = datetime(2024, 1, 1)
    spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 9, 30), 100),   # within 1h of the buy
            (1, datetime(2024, 1, 1, 8, 0), 101),    # 2h before -> excluded
            (2, datetime(2024, 1, 1, 9, 45), 102),   # other user
        ],
        sch,
    ).coalesce(1).write.parquet(clicks_dir)
    spark.createDataFrame([(1, datetime(2024, 1, 1, 10, 0), 200)], sch).coalesce(
        1
    ).write.parquet(buys_dir)

    clicks = spark.readStream.schema(sch).parquet(clicks_dir).withColumnRenamed(
        "ts", "click_ts"
    ).withColumnRenamed("event_id", "click_id")
    buys = spark.readStream.schema(sch).parquet(buys_dir).withColumnRenamed(
        "ts", "buy_ts"
    ).withColumnRenamed("event_id", "buy_id")
    joined = stream_stream_interval_join(
        buys, clicks, key="user_id", left_ts="buy_ts", right_ts="click_ts"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT buy_id, click_id FROM ssj").collect()
    assert [(r["buy_id"], r["click_id"]) for r in rows] == [(200, 100)]


def test_stream_upsert_sink(spark, tmp_path):
    """foreachBatch MERGE: later batches overwrite earlier rows by key;
    rerunning with no new files changes nothing (idempotent)."""
    from unified_firmographic_data_pipeline_spark.streaming.ingest import stream_upsert_sink
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    sch = StructType(
        [StructField("k", LongType()), StructField("v", StringType())]
    )
    src = str(tmp_path / "updates")
    table = str(tmp_path / "state_table")
    ckpt = str(tmp_path / "ckpt_ups")

    spark.createDataFrame([(1, "a"), (2, "b")], sch).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = stream_upsert_sink(
        spark.readStream.schema(sch).parquet(src), table, keys=["k"], checkpoint=ckpt
    )
    q.awaitTermination()
    assert {(r["k"], r["v"]) for r in spark.read.parquet(table).collect()} == {
        (1, "a"),
        (2, "b"),
    }

    spark.createDataFrame([(2, "B2"), (3, "c")], sch).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = stream_upsert_sink(
        spark.readStream.schema(sch).parquet(src), table, keys=["k"], checkpoint=ckpt
    )
    q.awaitTermination()
    assert {(r["k"], r["v"]) for r in spark.read.parquet(table).collect()} == {
        (1, "a"),
        (2, "B2"),
        (3, "c"),
    }

    # replay with nothing new: checkpoint skips, table unchanged
    q = stream_upsert_sink(
        spark.readStream.schema(sch).parquet(src), table, keys=["k"], checkpoint=ckpt
    )
    q.awaitTermination()
    assert spark.read.parquet(table).count() == 3

    # atomic swap leaves no .tmp-/.old- staging dirs next to the table
    import os

    assert [
        d for d in os.listdir(tmp_path) if d.startswith("state_table") and d != "state_table"
    ] == []


def test_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicate event_ids arriving within
    the watermark horizon collapse to one row, and state for expired keys
    is evictable (the unbounded-state hazard of plain dropDuplicates on a
    24x7 stream). Batch-squashed via availableNow over one file batch."""
    src = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    _write_batch(
        spark,
        src,
        [
            (1, datetime(2024, 1, 1, 10, 0), "click", 1.0),
            (1, datetime(2024, 1, 1, 10, 5), "click", 1.0),   # dup inside horizon
            (2, datetime(2024, 1, 1, 10, 7), "view", 2.0),
        ],
    )
    q = (
        spark.readStream.schema(SCHEMA)
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == 2
    assert sorted(r["event_id"] for r in got.collect()) == [1, 2]


def test_stream_static_enrich(spark, tmp_path):
    """Stream-static broadcast join: streaming events enriched with a
    static dimension, exactly-once per input file, no stream state."""
    import time

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from unified_firmographic_data_pipeline_spark.streaming.ingest import (
        stream_static_enrich,
    )

    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    schema = StructType(
        [StructField("user_id", LongType()), StructField("event_type", StringType())]
    )
    spark.createDataFrame(
        [(1, "click"), (2, "view"), (3, "purchase")], schema
    ).coalesce(1).write.mode("overwrite").parquet(str(src))
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, segment string"
    )
    stream = spark.readStream.schema(schema).parquet(str(src))
    enriched = stream_static_enrich(stream, dim, key="user_id")
    q = (
        enriched.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["segment"])
        for r in spark.read.parquet(str(out)).collect()
    }
    # left join: unmatched stream rows survive with NULL segment
    assert got == {(1, "gold"), (2, "silver"), (3, None)}
    # replay idempotence: restarting with the same checkpoint adds nothing
    q2 = (
        stream_static_enrich(
            spark.readStream.schema(schema).parquet(str(src)), dim, key="user_id"
        )
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(str(out)).count() == 3


def test_windowed_counts_with_rocksdb_state_store(spark, tmp_path):
    """The same watermark + tumbling-window aggregation with the RocksDB
    state store provider — the state-larger-than-executor-memory tier a
    100 TB streaming job runs on (HDFS-backed in-memory state caps at heap
    size; RocksDB spills keyed state to local disk with incremental
    checkpointing). Asserting parity with the default provider proves the
    aggregation logic is provider-agnostic."""
    src = tmp_path / "src_rocks"
    out = tmp_path / "out_rocks"
    ckpt = tmp_path / "ckpt_rocks"
    src.mkdir()
    rows = [
        (1, datetime(2024, 1, 1, 0, 1), "click", 1.0),
        (2, datetime(2024, 1, 1, 0, 2), "view", 1.0),
        (3, datetime(2024, 1, 1, 0, 16), "click", 1.0),
        (4, datetime(2024, 1, 1, 0, 17), "click", 1.0),
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        str(src)
    )
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "15 minutes"), F.col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("ws"), "event_type", "n")
    )
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName("rocks_counts")
            .option("checkpointLocation", str(ckpt))
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    got = {
        (r["ws"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM rocks_counts").collect()
    }
    assert got == {
        (datetime(2024, 1, 1, 0, 0), "click"): 1,
        (datetime(2024, 1, 1, 0, 0), "view"): 1,
        (datetime(2024, 1, 1, 0, 15), "click"): 2,
    }
    # the RocksDB provider actually engaged: its checkpoint layout writes
    # per-partition rocksdb artifacts (zip/sst/changelog), unlike the
    # default HDFS provider's .delta files
    state_dir = ckpt / "state"
    assert state_dir.exists()
    found = (
        list(state_dir.rglob("*.zip"))
        + list(state_dir.rglob("*.sst"))
        + list(state_dir.rglob("*.changelog"))
    )
    assert found, "no RocksDB state artifacts under the checkpoint"


def test_stream_kmv_sketch_sink_converges_to_batch_sketch(spark, tmp_path):
    """Incremental streaming sketch maintenance == one batch sketch over
    all data seen so far, after every micro-batch load; replay with
    nothing new changes nothing."""
    from pyspark.sql.types import StringType, StructField, StructType

    from unified_firmographic_data_pipeline_spark.operators.sketches import kmv_sketch
    from unified_firmographic_data_pipeline_spark.streaming.ingest import (
        stream_kmv_sketch_sink,
    )

    sch = StructType(
        [StructField("source", StringType()), StructField("val", StringType())]
    )
    src = str(tmp_path / "vals")
    table = str(tmp_path / "kmv_table")
    ckpt = str(tmp_path / "ckpt_kmv")

    def run():
        q = stream_kmv_sketch_sink(
            spark.readStream.schema(sch).parquet(src),
            table, checkpoint=ckpt, value_col="val", k=16,
        )
        q.awaitTermination()

    def landed():
        return {(r["grp"], r["hv"]) for r in spark.read.parquet(table).collect()}

    def batch_equiv(rows):
        df = spark.createDataFrame(rows, sch)
        return {(r["grp"], r["hv"]) for r in kmv_sketch(df, "val", k=16).collect()}

    batch1 = [("s1", f"a{i}") for i in range(40)]
    spark.createDataFrame(batch1, sch).coalesce(1).write.mode("append").parquet(src)
    run()
    assert landed() == batch_equiv(batch1)

    # overlapping second load (a20..a39 repeat) + a new group
    batch2 = [("s1", f"a{i}") for i in range(20, 60)] + [("s2", f"b{i}") for i in range(5)]
    spark.createDataFrame(batch2, sch).coalesce(1).write.mode("append").parquet(src)
    run()
    assert landed() == batch_equiv(batch1 + batch2)

    # replay with nothing new: checkpoint skips, sketch unchanged
    before = landed()
    run()
    assert landed() == before


def test_stream_entity_attach_matches_batch(spark, tmp_path):
    """Streaming entity attach (stream_entity_attach_sink) == the
    from-scratch batch resolve of everything seen so far, after every
    micro-batch — sequential increments compose; replay changes nothing."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from unified_firmographic_data_pipeline_spark.plans.entities import (
        resolve_entities,
    )
    from unified_firmographic_data_pipeline_spark.streaming.ingest import (
        stream_entity_attach_sink,
    )

    sch = StructType(
        [
            StructField("id", LongType()),
            StructField("blk", LongType()),
            StructField("seg", StringType()),
            StructField("nat", LongType()),
        ]
    )
    src = str(tmp_path / "feed")
    recs = str(tmp_path / "er_records")
    asg = str(tmp_path / "er_assignments")
    ckpt = str(tmp_path / "ckpt_er")
    fields = ["seg", "nat"]
    # stored model: agreement on both fields clears 2.0 bits, one misses
    weights = {"seg": (1_500_000, -800_000), "nat": (1_200_000, -500_000)}

    def run():
        q = stream_entity_attach_sink(
            spark.readStream.schema(sch).parquet(src),
            recs, asg, checkpoint=ckpt,
            id_col="id", block_col="blk", fields=fields,
            weights=weights, threshold_micro=2_000_000,
        )
        q.awaitTermination()

    def landed():
        return {(r["id"], r["entity_id"]) for r in spark.read.parquet(asg).collect()}

    def batch_equiv(rows):
        df = spark.createDataFrame(rows, sch)
        out = resolve_entities(
            df, "id", "blk", fields, threshold_micro=2_000_000, weights=weights
        )
        return {(r["id"], r["entity_id"]) for r in out.collect()}

    # batch 1: ids 5/7 match (same seg+nat in block 0); 9 is a singleton
    b1 = [(5, 0, "T", 1), (7, 0, "T", 1), (9, 0, "R", 2)]
    spark.createDataFrame(b1, sch).coalesce(1).write.mode("append").parquet(src)
    run()
    assert landed() == batch_equiv(b1) == {(5, 5), (7, 5), (9, 9)}

    # batch 2: id 3 matches the existing {5,7} entity with a SMALLER id ->
    # the landed entity must relabel to 3; id 8 attaches to 9's singleton
    b2 = [(3, 0, "T", 1), (8, 0, "R", 2)]
    spark.createDataFrame(b2, sch).coalesce(1).write.mode("append").parquet(src)
    run()
    assert landed() == batch_equiv(b1 + b2)
    assert (5, 3) in landed() and (7, 3) in landed() and (8, 8) in landed()
    assert (9, 8) in landed()  # 8 < 9: the new record becomes the min label

    # replay with nothing new: checkpoint skips, state unchanged
    before = landed()
    run()
    assert landed() == before
