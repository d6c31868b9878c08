"""Bucketed co-located joins: same-key same-count bucketed tables must
join with NO shuffle exchange (the 100 TB join strategy), and bucket
pruning must hit for single-bucket point predicates."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from unified_firmographic_data_pipeline_spark.sources.catalog import write_bucketed


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, sf_small, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '{tmp_path / 'wh'}'")
    l = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_small}/orders.parquet")
    write_bucketed(l, "bktdb.lineitem_b", ["l_orderkey"], num_buckets=8)
    write_bucketed(o, "bktdb.orders_b", ["o_orderkey"], num_buckets=8)

    lb = spark.table("bktdb.lineitem_b")
    ob = spark.table("bktdb.orders_b")
    joined = lb.join(
        ob.hint("merge"), lb.l_orderkey == ob.o_orderkey
    ).groupBy("o_orderpriority").agg(F.count("*").alias("n"))

    plan = _plan(joined)
    join_section = plan.split("HashAggregate")[0]
    assert "SortMergeJoin" in plan
    assert "Exchange" not in join_section, (
        "bucketed join should read co-located buckets, not shuffle:\n" + join_section
    )

    # and it computes the right thing
    expected = {
        r["o_orderpriority"]: r["n"]
        for r in l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()
    }
    got = {r["o_orderpriority"]: r["n"] for r in joined.collect()}
    assert got == expected

    spark.sql("DROP TABLE bktdb.lineitem_b")
    spark.sql("DROP TABLE bktdb.orders_b")
