"""Deterministic random walks over an edge table.

Walk corpora feed graph-embedding trainers (DeepWalk, node2vec — Perozzi
et al. 2014, Grover & Leskovec 2016): sample fixed-length walks from every
seed node, then treat walks as sentences for a skip-gram objective (the
pairing step already exists: operators/lm.py:skipgram_pairs). The
reference has no graph surface (its DAG stops at staged tables —
dags/firmographic_dag.py:24-62); this is part of the training-data
extension surface SURVEY.md §2 calls for.

Spark-first shape: one walk step == one equi-join of the walk frontier
against the (bucketable) edge table on the current node, followed by a
per-walk argmin — both key-partitioned, no driver loop over nodes, no
collect. L steps are a fixed-depth chain of narrow shuffles, so the cost
is L * (frontier x avg-degree) — linear in walk count, NOT in graph size,
and each step's shuffle key is the node id (salting composes for
power-law hubs the same way it does for the join family).

Determinism: the "random" choice is the argmin of md5(walk_id:step:dst)
— i.i.d. uniform over out-neighbors per (walk, step) in distribution,
yet bit-reproducible across runs/engines, so an external verifier (or a
resumed pipeline) replays the exact walk set. Swap ``xxhash64`` for md5
in production for ~2x cheaper scoring with the same plan (the md5 twin
exists so DuckDB can replay choices — same rationale as
operators/neardup.py's signature twins).
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def walk_step_scores(
    frontier: DataFrame, edges: DataFrame, step: int
) -> DataFrame:
    """Score every out-neighbor of the walk frontier for one step:
    (walk_id, dst, score) where score = md5(walk_id:step:dst). Exposed
    separately so tests can pin the choice rule the oracle replays."""
    return (
        frontier.join(edges, frontier["node"] == edges["src"])
        .select(
            "walk_id",
            "dst",
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("walk_id").cast("string"),
                    F.lit(str(step)),
                    F.col("dst").cast("string"),
                )
            ).alias("score"),
        )
    )


def random_walks(
    edges: DataFrame,
    seeds: DataFrame,
    length: int,
    node_col: str = "node",
    materialize: bool = False,
) -> DataFrame:
    """Fixed-length deterministic walks: one row per (walk_id, step, node),
    step 0 = the seed. ``edges`` must be DIRECTED (src, dst) — pass both
    orientations for an undirected graph. Dead-end nodes truncate their
    walk (no rows at later steps), matching the reference-free semantics
    a sentence generator wants (short sentences, not self-loop padding).

    Per step: frontier-x-edges equi-join, then min(struct(score, dst))
    per walk — `dst` in the struct breaks md5-collision ties
    deterministically. The frontier stays (walk_id, node): walks never
    materialize as arrays mid-flight, so a 10^9-walk corpus is just a
    tall skinny table at every stage.

    The output unions every step's frontier, and step s is also step
    s+1's input — lazily that subtree re-executes once per later branch
    (AQE's ReusedExchange usually collapses it, but that's best-effort).
    ``materialize=True`` localCheckpoints each frontier so every step
    computes exactly once — the right call for long walks or wide
    frontiers; leave it off for short plan-audited chains (the
    components/triangles materialize convention).
    """
    state = seeds.select(
        F.col(node_col).cast("long").alias("walk_id"),
        F.col(node_col).cast("long").alias("node"),
    )
    out = [state.select("walk_id", F.lit(0).alias("step"), "node")]
    for s in range(1, length + 1):
        scored = walk_step_scores(state, edges, s)
        state = (
            scored.groupBy("walk_id")
            .agg(F.min(F.struct("score", "dst")).alias("m"))
            .select("walk_id", F.col("m.dst").alias("node"))
        )
        if materialize:
            state = state.localCheckpoint(eager=False)
        out.append(state.select("walk_id", F.lit(s).alias("step"), "node"))
    return functools.reduce(lambda a, b: a.unionByName(b), out).select(
        "walk_id", F.col("step").cast("int").alias("step"), "node"
    )
