"""AQE skew-join splitting — the engine's first line of defense for hot
keys (session default: spark.sql.adaptive.skewJoin.enabled=true). This test
forces skew-detection thresholds down to local-data sizes and asserts the
EXECUTED plan shows the skewed partition being split, proving the defense
actually engages (the salted operators in operators/skew.py cover the
shapes AQE can't)."""

from __future__ import annotations

from pyspark.sql import functions as F

CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "128KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
}


def test_aqe_splits_skewed_join(spark):
    saved = {k: spark.conf.get(k, None) for k in CONFS}
    try:
        for k, v in CONFS.items():
            spark.conf.set(k, v)
        # one hot key holding ~86% of the left side
        big = spark.range(300_000).select(
            F.lit(7).alias("k"), F.col("id").alias("v")
        ).union(
            spark.range(50_000).select(
                (F.col("id") % 1000 + 10).alias("k"), F.col("id").alias("v")
            )
        )
        right = spark.range(2000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = big.join(right, "k").select(F.sum("v").alias("s"))
        [row] = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE did not split the skewed partition"
        # correctness unaffected by the split
        expected = 300_000 * (300_000 - 1) // 2 + sum(
            i for i in range(50_000) if (i % 1000 + 10) < 2000
        )
        assert row["s"] == expected
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
