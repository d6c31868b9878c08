"""Round-11 optimization invariants.

The optimizations must not change what any operator computes:

- triangles: the new in-memory adjacency-intersection regime
  (``_closed_wedges_adjacency``, ``broadcast_closure=True``) must be
  bit-equal to the >memory wedge-join + shuffled-probe regime
  (``broadcast_closure=False``) for both the count and the enumeration.
- driver_queries._t: the scan-parallelism guard is opt-in and memoized.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _graph_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_triangle_regimes_bit_equal_count(spark):
    from unified_firmographic_data_pipeline_spark.operators.triangles import (
        triangle_stats,
    )

    # adversarial micro-graph: K4, pendant, C4, self-loop, dup/reversed edges
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5),
        (10, 11), (11, 12), (12, 13), (13, 10),
        (7, 7),
        (2, 1), (1, 2),
    ]
    df = _graph_df(spark, edges)
    a = triangle_stats(df, broadcast_closure=True).collect()[0]
    b = triangle_stats(df, broadcast_closure=False).collect()[0]
    assert tuple(a) == tuple(b)
    assert a["n_triangles"] == 4


def test_triangle_regimes_bit_equal_enumeration_random_graph(spark):
    from unified_firmographic_data_pipeline_spark.operators.triangles import (
        enumerate_triangles,
    )

    rng = random.Random(7)
    edges = list({(rng.randrange(40), rng.randrange(40)) for _ in range(300)})
    df = _graph_df(spark, edges)
    a = sorted(map(tuple, enumerate_triangles(df, broadcast_closure=True).collect()))
    b = sorted(map(tuple, enumerate_triangles(df, broadcast_closure=False).collect()))
    assert a == b
    assert len(a) > 0  # 300 random edges on 40 nodes are dense enough
    # canonical id order within each row, no duplicate triangles
    assert all(v1 < v2 < v3 for v1, v2, v3 in a)
    assert len(set(a)) == len(a)


def test_triangle_adjacency_helper_matches_wedge_join(spark):
    from unified_firmographic_data_pipeline_spark.operators.triangles import (
        _canonical_undirected,
        _closed_wedges_adjacency,
        _degrees,
        _orient,
        _oriented_wedges,
    )

    rng = random.Random(11)
    edges = list({(rng.randrange(25), rng.randrange(25)) for _ in range(150)})
    und = _canonical_undirected(_graph_df(spark, edges), "src", "dst")
    ori = _orient(und, _degrees(und))
    canon = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    wedge_closed = _oriented_wedges(ori).join(canon, ["x", "y"])
    adj_closed = _closed_wedges_adjacency(ori)
    a = sorted(map(tuple, wedge_closed.select("pivot", "x", "y").collect()))
    b = sorted(map(tuple, adj_closed.select("pivot", "x", "y").collect()))
    assert a == b


def test_scan_guard_memoized_and_opt_in(spark, sf_small):
    import unified_firmographic_data_pipeline_spark.plans.driver_queries as dq

    dq._SCAN_UNDERPAR.clear()
    d0 = dq._t(spark, sf_small, "documents")  # default: no guard probe
    assert dq._SCAN_UNDERPAR == {}
    d1 = dq._t(spark, sf_small, "documents", spread=True)
    key = (f"{sf_small}/documents.parquet", spark.sparkContext.defaultParallelism)
    assert key in dq._SCAN_UNDERPAR
    # second guarded load answers from the memo (same decision, no re-probe)
    before = dict(dq._SCAN_UNDERPAR)
    d2 = dq._t(spark, sf_small, "documents", spread=True)
    assert dq._SCAN_UNDERPAR == before
    assert d0.count() == d1.count() == d2.count()
