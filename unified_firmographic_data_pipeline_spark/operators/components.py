"""Connected components over candidate-pair graphs — dedup cluster
resolution.

Every near-duplicate pipeline ends with this step: LSH/SimHash/chunk-sharing
produce candidate PAIRS, but retention decisions need CLUSTERS (keep one
document per component). The public scale algorithm family is min-label
propagation / alternating star contraction ("Connected Components in
MapReduce and Beyond", Kiveris et al., SOCC'14).

Implementation: iterative min-label propagation entirely in DataFrame ops.
Each round joins labels onto the (pre-partitioned, checkpointed) edge list
to form neighbor messages, unions each node's OWN label row in as one more
message, and takes ``min`` per node in a single map-side-combinable
aggregation — one shuffle per round on the uniform node key. (Round 10
optimization: the original shape aggregated neighbor minima and then joined
them back onto the label table, paying a second exchange + join per round;
the union-aggregate form computes ``least(own, min(neighbors))`` and the
convergence flag ``min < own`` in the same aggregate, with the own-label
row doubling as the change detector. Labels converge to the minimum node
id reachable in the component either way — bit-identical output, one
exchange and one join fewer per round.) Rounds are bounded by the graph
diameter; dedup graphs are union-of-near-cliques, so 2-4 rounds in
practice (star contraction's O(log n) bound matters for pathological
chains; the loop shares the same per-round shape so swapping the step is
local). Each round ``localCheckpoint``s the label frame: iterative plans
otherwise grow exponentially in Catalyst and re-execute from the source
every round. The edge list is hash-repartitioned on the join key ``d``
BEFORE its one-time checkpoint, so every round's message join reuses that
partitioning instead of re-exchanging the (much larger) edge side.

The result (min reachable id) is partition- and iteration-order-independent,
so it is deterministic and SQL-expressible — the DuckDB oracle computes the
same labels with a recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with the smallest node id in its connected
    component. ``nodes`` may contain isolated nodes (they label themselves)
    and MUST be distinct (one row per node id) — the union-aggregate round
    groups by node, so a duplicated input id would collapse to one output
    row where the round-9 join-back shape echoed the duplicate; every
    caller passes a key/distinct projection. ``edges`` is treated as
    undirected (symmetrized internally).

    Returns ``(node, component)``. Raises if ``max_iter`` rounds don't
    converge (diameter > max_iter — raise the bound for chain-shaped
    graphs)."""
    sym = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .unionByName(edges.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d")))
        .distinct()
        # partition once on the per-round join key: every round's message
        # join then reuses this layout instead of re-exchanging the edges
        .repartition("d")
    )
    labels = nodes.select(F.col(node_col).alias("node"), F.col(node_col).alias("component"))
    labels = labels.localCheckpoint(eager=True)
    sym = sym.localCheckpoint(eager=True)

    for _ in range(max_iter):
        # one message per directed edge (the neighbor's current label) plus
        # each node's OWN label row; a single min-aggregate per node yields
        # least(own, min(neighbors)) AND the old label (the own row is the
        # only one with __own=true) for the convergence flag — one shuffle
        # per round, no join-back
        msgs = (
            sym.join(labels, sym["d"] == labels["node"])
            .select(
                F.col("s").alias("node"),
                F.col("component").alias("__lbl"),
                F.lit(False).alias("__own"),
            )
        )
        own = labels.select(
            "node", F.col("component").alias("__lbl"), F.lit(True).alias("__own")
        )
        new_labels = (
            msgs.unionByName(own)
            .groupBy("node")
            .agg(
                F.min("__lbl").alias("component"),
                F.min(F.when(F.col("__own"), F.col("__lbl"))).alias("__old"),
            )
            # edges may reference ids outside `nodes`; groups with no own
            # row are not label rows (matches the old left-join semantics)
            .filter(F.col("__old").isNotNull())
            .select(
                "node",
                "component",
                (F.col("component") < F.col("__old")).alias("__changed"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        n_changed = new_labels.filter(F.col("__changed")).count()
        labels = new_labels.drop("__changed")
        if n_changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds the bound)"
    )


def component_representatives(
    labeled: DataFrame,
    score_col: str,
    id_col: str = "node",
) -> DataFrame:
    """Keep-one-per-cluster retention: for each component pick the member
    with the highest ``score_col`` (id asc tiebreak) — the step that turns
    near-dup clusters into a deduplicated corpus while keeping the BEST
    copy (highest quality score), not an arbitrary one.

    Input is the (node, component[, score...]) frame from
    :func:`connected_components` joined with per-node scores. One window
    shuffle on the component key. Returns ``(component, rep_id, rep_score,
    n_members)``."""
    from pyspark.sql import Window

    w = Window.partitionBy("component").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    wc = Window.partitionBy("component")
    return (
        labeled.withColumn("__rn", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(wc))
        .filter(F.col("__rn") == 1)
        .select(
            "component",
            F.col(id_col).alias("rep_id"),
            F.col(score_col).alias("rep_score"),
            "n_members",
        )
    )
