"""Quantized PageRank over DataFrame edge lists.

The iterative-algorithm sibling of ``components.connected_components``:
each round is one equi-join (ranks onto edges, on the uniform node key)
plus one aggregation (contributions by destination) — the standard
Pregel-on-MapReduce shape ("Pregel: a system for large-scale graph
processing", Malewicz et al., SIGMOD'10; PageRank from Brin & Page '98).

Determinism: per-edge contributions are quantized to integer micro-units
(``round(rank / out_degree * 1e6)`` as BIGINT) BEFORE the destination sum,
so the aggregate is exact integer addition — reassociation-proof across
partitionings AND engines. The new rank is one fixed scalar double
expression over that exact integer. A float-summed PageRank differs in
final ULPs from run to run at scale; the quantized variant is bit-stable
at a quantization error (1e-6 per edge) far below any ranking use. The
same recurrence is SQL-expressible, so DuckDB oracles can verify rounds
bit-exactly.

Scale: ranks and degrees live on the node key; every round shuffles the
edge list once (join on src) and the contributions once (groupBy dst) —
both on uniform keys. ``localCheckpoint`` truncates lineage per round
(iterative Catalyst plans otherwise grow exponentially). Dangling nodes
(out-degree 0) keep the damping base; their lost mass is NOT
redistributed (the common simplification; add a dangling-sum broadcast
term if mass conservation matters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 2,
    damping: float = 0.85,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Run ``iterations`` rounds of quantized PageRank over the directed
    ``edges`` (duplicates are collapsed). Returns ``(node, rank)`` for every
    node appearing as src or dst; initial rank 1.0.

    ``checkpoint_every`` bounds lineage: the rank frame localCheckpoints
    every N rounds (plan depth grows ~linearly per round; materializing
    every round pays an unnecessary exchange for shallow runs, while never
    checkpointing re-derives the whole chain each action at high N)."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).distinct()
    if iterations > 1:
        e = e.localCheckpoint(eager=True)  # edges re-enter every round
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("deg"))
    # node -> (deg or null); rank starts at exactly 1.0
    ranks = nodes.join(deg, "node", "left").select(
        "node", "deg", F.lit(1.0).alias("rank")
    )

    one_minus_d = 1.0 - damping
    for i in range(iterations):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .select(
                "dst",
                F.round(F.col("rank") / F.col("deg") * 1e6).cast("long").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("in_micro"))
        )
        ranks = (
            ranks.drop("rank")
            .join(contrib, ranks["node"] == contrib["dst"], "left")
            .select(
                "node",
                "deg",
                (
                    F.lit(one_minus_d)
                    + F.lit(damping)
                    * (F.coalesce(F.col("in_micro"), F.lit(0)).cast("double") / F.lit(1e6))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", "rank")
