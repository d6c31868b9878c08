"""Streaming CDC apply sink (streaming/ingest.py:stream_cdc_apply_sink):
micro-batched I/U/D application converges to a one-shot batch apply."""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from unified_firmographic_data_pipeline_spark.streaming.ingest import (
    stream_cdc_apply_sink,
)

SCH = StructType(
    [
        StructField("k", LongType()),
        StructField("v", StringType()),
        StructField("price", DoubleType()),
        StructField("op", StringType()),
        StructField("seq", LongType()),
    ]
)


def _batch_apply(events):
    """Reference semantics: latest event per key wins; D removes."""
    latest = {}
    for k, v, price, op, seq in sorted(events, key=lambda e: (e[0], e[4])):
        latest[k] = (v, price, op)
    return {
        (k, v, price) for k, (v, price, op) in latest.items() if op != "D"
    }


def test_stream_cdc_apply_converges_and_replays(spark, tmp_path):
    src = str(tmp_path / "cdc_events")
    table = str(tmp_path / "cdc_table")
    ckpt = str(tmp_path / "ckpt_cdc")

    def run():
        q = stream_cdc_apply_sink(
            spark.readStream.schema(SCH).parquet(src),
            table, checkpoint=ckpt, keys=["k"], seq_col="seq",
        )
        q.awaitTermination()

    def landed():
        return {
            (r["k"], r["v"], r["price"])
            for r in spark.read.parquet(table).collect()
        }

    b1 = [(1, "a", 1.0, "I", 1), (2, "b", 2.0, "I", 2), (3, "c", 3.0, "I", 3)]
    spark.createDataFrame(b1, SCH).coalesce(1).write.mode("append").parquet(src)
    run()
    assert landed() == _batch_apply(b1)

    # update 1, delete 2, insert 4; and a same-batch I-then-U on key 5
    b2 = [
        (1, "a2", 1.5, "U", 4),
        (2, "b", 2.0, "D", 5),
        (4, "d", 4.0, "I", 6),
        (5, "e", 5.0, "I", 7),
        (5, "e2", 5.5, "U", 8),
    ]
    spark.createDataFrame(b2, SCH).coalesce(1).write.mode("append").parquet(src)
    run()
    assert landed() == _batch_apply(b1 + b2)
    assert (4, "d", 4.0) in landed() and (5, "e2", 5.5) in landed()
    assert not any(k == 2 for k, _, _ in landed())

    # replay with nothing new: checkpoint skips, table unchanged
    before = landed()
    run()
    assert landed() == before

    # delete of a nonexistent key is a no-op
    b3 = [(99, "zz", 0.0, "D", 9)]
    spark.createDataFrame(b3, SCH).coalesce(1).write.mode("append").parquet(src)
    run()
    assert landed() == _batch_apply(b1 + b2)
