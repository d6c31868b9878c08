"""Triangle counting + clustering coefficient over an edge DataFrame.

Graph metrics extension (SURVEY.md §2 extension family next to
``components.py`` / ``pagerank.py``): triangles measure local cohesion —
the standard signal for community structure and link-spam detection, and
the classic "one MapReduce job done wrong explodes" operator.

Scale design (Suri & Vassilvitskii, WWW'11 "Counting Triangles and the
Curse of the Last Reducer"): orient every undirected edge from its
lower-(degree, id) endpoint to the higher one. Every triangle then has
exactly ONE vertex with two outgoing oriented edges, so it is counted once
as a wedge (a->b, a->c) closed by oriented edge (b->c). Because out-degree
under degree-orientation is bounded by O(sqrt(edges)), the wedge fan-out
join never suffers the hub blowup a naive (all wedges at high-degree
nodes) plan hits — THE difference between feasible and impossible on a
power-law graph at 100 TB.

Everything is equi-joins + aggregations: degree (one groupBy), orientation
(two broadcast-able degree lookups), wedge generation (self-join on the
low vertex), closure (equi-join on the (b, c) pair). Counts are exact
integers — bit-identical on any engine, so the DuckDB oracle can verify
via the simpler id-ordered 3-way join (triangle COUNT is orientation-
invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orient_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Degree-orient an undirected edge set: returns ``(lo, hi)`` rows with
    each undirected edge appearing once, directed from the endpoint with
    smaller (degree, id) to the larger. Input may contain (a,b) either way
    or both ways; self-loops are dropped."""
    und = (
        edges.filter(F.col(src) != F.col(dst))
        .select(
            F.least(src, dst).alias("a"),
            F.greatest(src, dst).alias("b"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    j = und.join(da, "a").join(db, "b")
    lo_is_a = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    return j.select(
        F.when(lo_is_a, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(lo_is_a, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )


def triangle_stats(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """One-row global graph cohesion summary: ``n_nodes, n_edges, n_wedges,
    n_triangles, global_clustering`` (= 3*triangles / wedges, the fraction
    of open wedges that close; 0.0 when the graph has no wedges).

    ``n_wedges`` counts unordered wedges (paths of length 2) in the
    UNDIRECTED graph: sum over nodes of C(deg, 2) — an integer expression
    off the degree table, no join."""
    und = (
        edges.filter(F.col(src) != F.col(dst))
        .select(F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    base = deg.agg(
        F.count("*").alias("n_nodes"),
        (F.sum("deg") / F.lit(2)).cast("long").alias("n_edges"),
        F.sum(F.col("deg") * (F.col("deg") - 1) / F.lit(2)).cast("long").alias(
            "n_wedges"
        ),
    )
    ori = orient_edges(und, "a", "b")
    w1 = ori.select(F.col("lo").alias("pivot"), F.col("hi").alias("x"))
    w2 = ori.select(F.col("lo").alias("pivot"), F.col("hi").alias("y"))
    wedges = w1.join(w2, "pivot").filter(F.col("x") < F.col("y"))
    # closure: is (x, y) an (undirected) edge? id-ordered canonical form
    canon = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    tri = wedges.join(canon, ["x", "y"]).agg(
        F.count("*").alias("n_triangles")
    )
    out = base.crossJoin(F.broadcast(tri))  # 1-row x 1-row
    return out.select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.when(F.col("n_wedges") > 0,
               F.round(F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6)
               ).otherwise(F.lit(0.0)).alias("global_clustering"),
    )
