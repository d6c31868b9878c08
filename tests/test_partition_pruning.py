"""Partition layout + pruning: the table-layout half of the 100 TB story.

- static pruning: a date-partitioned table filtered on the partition column
  must show the predicate in PartitionFilters (directories skipped at
  planning, not rows filtered after read)
- dynamic partition pruning (DPP): joining a partitioned fact to a filtered
  dim must inject a dynamicpruning subquery so only matching partitions of
  the fact are read at runtime
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _write_events_partitioned(spark, sf_small, path):
    from unified_firmographic_data_pipeline_spark.plans.driver_queries import _t

    e = _t(spark, sf_small, "events").withColumn("event_date", F.to_date("ts"))
    e.write.mode("overwrite").partitionBy("event_date").parquet(path)
    return e


def test_static_partition_pruning(spark, sf_small, tmp_path):
    path = str(tmp_path / "events_by_date")
    _write_events_partitioned(spark, sf_small, path)
    q = (
        spark.read.parquet(path)
        .filter(F.col("event_date") == "2024-01-03")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )
    plan = _plan(q)
    assert "PartitionFilters" in plan
    # the partition predicate must be IN PartitionFilters, not a post-scan Filter
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "event_date" in pf_line, pf_line


def test_dynamic_partition_pruning(spark, sf_small, tmp_path):
    path = str(tmp_path / "events_by_date2")
    _write_events_partitioned(spark, sf_small, path)
    fact = spark.read.parquet(path)
    # a small "dim" of dates derived from orders; the filter on the dim side
    # should dynamically prune fact partitions
    dim = (
        spark.read.parquet(f"{sf_small}/orders.parquet")
        .select(F.to_date("o_orderdate").alias("event_date"), "o_orderpriority")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .dropDuplicates(["event_date"])
    )
    q = fact.join(dim, "event_date").groupBy("event_type").agg(F.count("*").alias("n"))
    plan = _plan(q)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
