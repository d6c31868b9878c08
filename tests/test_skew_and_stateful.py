"""Tests for the skew-mitigation helpers and custom stateful streaming
operators (applyInPandasWithState)."""

from __future__ import annotations

from datetime import datetime

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from unified_firmographic_data_pipeline_spark.operators.skew import salted_aggregate, salted_join
from unified_firmographic_data_pipeline_spark.streaming.stateful import (
    streaming_dedup_by_key,
    streaming_running_totals,
)


# ---------------------------------------------------------------- skew ----

def test_salted_aggregate_matches_plain_groupby(spark):
    # one hot key (90% of rows) + a tail
    rows = [("hot", i % 7) for i in range(900)] + [
        (f"k{i % 10}", i % 5) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["k", "v"])
    expected = {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    got = {
        r["k"]: (r["n"], r["s"])
        for r in salted_aggregate(
            df,
            ["k"],
            [F.count("*").alias("n"), F.sum("v").alias("s")],
            [F.sum("n").alias("n"), F.sum("s").alias("s")],
        ).collect()
    }
    assert got == expected


def test_salted_join_matches_plain_join(spark):
    big = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("k1", 1), ("k2", 2), ("miss", 9)],
        ["k", "v"],
    )
    small = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k2", "B"), ("absent", "Z")], ["k", "tag"]
    )
    expected = sorted(
        (r["k"], r["v"], r["tag"]) for r in big.join(small, "k").collect()
    )
    got = sorted(
        (r["k"], r["v"], r["tag"]) for r in salted_join(big, small, "k").collect()
    )
    assert got == expected
    # row-multiplicity preserved: hot key keeps all 500 rows, exactly once each
    assert sum(1 for k, _, _ in got if k == "hot") == 500


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([("a", 1), ("nomatch", 2)], ["k", "v"])
    small = spark.createDataFrame([("a", "A")], ["k", "tag"])
    got = {r["k"]: r["tag"] for r in salted_join(big, small, "k", how="left").collect()}
    assert got == {"a": "A", "nomatch": None}


def test_salted_join_rejects_outer_and_semi(spark):
    import pytest

    big = spark.createDataFrame([("a", 1)], ["k", "v"])
    small = spark.createDataFrame([("a", "A"), ("b", "B")], ["k", "tag"])
    # replication would emit unmatched small-side rows num_salts times
    for how in ("right", "full", "outer", "left_semi", "left_anti"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(big, small, "k", how=how)


# ------------------------------------------------------------ stateful ----

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("key", LongType()),
        StructField("value", LongType()),
    ]
)


def _run_stream(spark, tmp_path, rows_batches, op, query_name, mode):
    """Write each batch as a file, run the stateful op over a file stream,
    processing all batches with availableNow; return collected rows."""
    src = str(tmp_path / f"src_{query_name}")
    for rows in rows_batches:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = op(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{query_name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {query_name}").collect()


def test_streaming_dedup_by_key(spark, tmp_path):
    t = datetime(2024, 1, 1, 10)
    rows = [
        (1, t, 100, 1),
        (2, t, 100, 2),  # duplicate key within batch
        (3, t, 200, 3),
    ]
    got = _run_stream(
        spark,
        tmp_path,
        [rows],
        lambda s: streaming_dedup_by_key(s, "key"),
        "dedup_out",
        "append",
    )
    by_key = {r["key"]: r["first_seen_batch_rows"] for r in got}
    assert by_key == {100: 2, 200: 1}


def test_streaming_running_totals(spark, tmp_path):
    t = datetime(2024, 1, 1, 10)
    rows = [
        (1, t, 1, 10),
        (2, t, 1, 20),
        (3, t, 2, 5),
    ]
    got = _run_stream(
        spark,
        tmp_path,
        [rows],
        lambda s: streaming_running_totals(s, "key", "value"),
        "totals_out",
        "update",
    )
    by_key = {r["key"]: (r["n_events"], r["total"]) for r in got}
    assert by_key == {1: (2, 30), 2: (1, 5)}


def test_tws_running_totals(spark, tmp_path):
    from unified_firmographic_data_pipeline_spark.streaming.stateful import (
        TWS_RUNTIME_AVAILABLE,
        tws_running_totals,
    )

    if not TWS_RUNTIME_AVAILABLE:
        pytest.skip("transformWithStateInPandas needs Spark >= 4.0 + protobuf")
    t = datetime(2024, 1, 1, 10)
    rows = [
        (1, t, 1, 10),
        (2, t, 1, 20),
        (3, t, 2, 5),
    ]
    got = _run_stream(
        spark,
        tmp_path,
        [rows],
        lambda s: tws_running_totals(s, "key", "value"),
        "tws_totals_out",
        "update",
    )
    by_key = {r["key"]: (r["n_events"], r["total"]) for r in got}
    assert by_key == {1: (2, 30), 2: (1, 5)}


def test_tws_dedup_by_key_across_batches(spark, tmp_path):
    from unified_firmographic_data_pipeline_spark.streaming.stateful import (
        TWS_RUNTIME_AVAILABLE,
        tws_dedup_by_key,
    )

    if not TWS_RUNTIME_AVAILABLE:
        pytest.skip("transformWithStateInPandas needs Spark >= 4.0 + protobuf")
    t = datetime(2024, 1, 1, 10)
    batch1 = [(1, t, 100, 1), (2, t, 100, 2), (3, t, 200, 3)]
    batch2 = [(4, t, 100, 4), (5, t, 300, 5)]  # 100 replays -> dropped
    got = _run_stream(
        spark,
        tmp_path,
        [batch1, batch2],
        lambda s: tws_dedup_by_key(s, "key"),
        "tws_dedup_out",
        "append",
    )
    assert sorted(r["key"] for r in got) == [100, 200, 300]


def test_diagnose_skew_surfaces_heavy_keys(spark):
    from unified_firmographic_data_pipeline_spark.operators.skew import diagnose_skew

    rows = [("hot",)] * 80 + [("warm",)] * 15 + [("cold",)] * 5
    df = spark.createDataFrame(rows, "k string")
    got = diagnose_skew(df, ["k"], top=2).collect()
    assert [(r.k, r.n, r.permille) for r in got] == [("hot", 80, 800), ("warm", 15, 150)]
