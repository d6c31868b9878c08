"""Deterministic random walks (operators/walks.py) and CDC event
derivation (operators/incremental.py:cdc_events)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from unified_firmographic_data_pipeline_spark.operators.incremental import cdc_events
from unified_firmographic_data_pipeline_spark.operators.walks import (
    random_walks,
    walk_step_scores,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _ring_edges(spark, n=6):
    # directed ring + chords: every node has out-degree 2
    rows = [(i, (i + 1) % n) for i in range(n)] + [(i, (i + 2) % n) for i in range(n)]
    return spark.createDataFrame(rows, "src long, dst long")


def test_walks_replay_the_md5_argmin_choice(spark):
    edges = _ring_edges(spark)
    seeds = spark.createDataFrame([(0,), (3,)], "node long")
    out = {
        (r["walk_id"], r["step"]): r["node"]
        for r in random_walks(edges, seeds, length=2).collect()
    }
    # replay in plain python
    adj = {i: [(i + 1) % 6, (i + 2) % 6] for i in range(6)}
    for w in (0, 3):
        node = w
        assert out[(w, 0)] == w
        for s in (1, 2):
            node = min(adj[node], key=lambda d: (_md5(f"{w}:{s}:{d}"), d))
            assert out[(w, s)] == node


def test_walk_dead_end_truncates(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    rows = random_walks(edges, seeds, length=3).collect()
    # step 0 at node 1, step 1 at node 2, then dead end: no steps 2/3
    assert sorted((r["step"], r["node"]) for r in rows) == [(0, 1), (1, 2)]


def test_walk_step_scores_schema(spark):
    edges = _ring_edges(spark)
    frontier = spark.createDataFrame([(9, 0)], "walk_id long, node long")
    rows = walk_step_scores(frontier, edges, step=5).collect()
    assert {r["dst"] for r in rows} == {1, 2}
    for r in rows:
        assert r["score"] == _md5(f"9:5:{r['dst']}")


def test_walks_materialize_matches_lazy(spark):
    edges = _ring_edges(spark, n=9)
    seeds = spark.createDataFrame([(i,) for i in range(9)], "node long")
    lazy = random_walks(edges, seeds, length=3).collect()
    mat = random_walks(edges, seeds, length=3, materialize=True).collect()
    assert sorted(map(tuple, lazy)) == sorted(map(tuple, mat))


# ------------------------------------------------------------------- CDC
def test_cdc_events_classification_and_mask(spark):
    old = spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 20.0), (3, "C", 30.0), (4, "D", None)],
        "k long, status string, price double",
    )
    new = spark.createDataFrame(
        [(2, "B", 20.0), (3, "X", 31.0), (4, "D", 40.0), (5, "E", 50.0)],
        "k long, status string, price double",
    )
    rows = {
        r["k"]: (r["op"], r["changed_cols"])
        for r in cdc_events(old, new, ["k"]).collect()
    }
    assert rows[1] == ("D", None)
    assert 2 not in rows  # unchanged
    assert rows[3] == ("U", "price,status")  # sorted column order
    assert rows[4] == ("U", "price")  # NULL -> value counts as a change
    assert rows[5] == ("I", None)


def test_cdc_events_single_shuffle_plan(spark):
    import contextlib
    import io

    old = spark.range(10).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    new = spark.range(8).select(F.col("id").alias("k"), F.lit(2).alias("v"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cdc_events(old, new, ["k"]).explain("formatted")
    plan = buf.getvalue()
    # a keyed full-outer join and nothing scale-hostile: no cartesian,
    # no nested loop (formatted mode repeats node names in the detail
    # section, so an exact count would be brittle)
    assert "FullOuter" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
