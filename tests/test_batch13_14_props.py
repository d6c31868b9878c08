"""Property / brute-force cross-checks for the batch-13/14 analytics
queries: market-basket pair generation, gaps-and-islands streaks, and the
closed-form A/B variance must agree with independent Python references."""

from __future__ import annotations

import itertools
import math

from pyspark.sql import Window
from pyspark.sql import functions as F


def _basket_pairs_brute(baskets):
    counts = {}
    for parts in baskets:
        for p1, p2 in itertools.combinations(sorted(set(parts)), 2):
            counts[(p1, p2)] = counts.get((p1, p2), 0) + 1
    return counts


def test_market_basket_pair_generation_matches_brute_force(spark):
    baskets = [
        [1, 2, 3],
        [2, 3],
        [3, 1, 2, 2],  # dup part within an order counts once
        [4],
        [],
        [5, 1],
    ]
    rows = [(oid, p) for oid, parts in enumerate(baskets) for p in parts]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long").distinct()
    b = df.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    left = b.select("parts", F.posexplode("parts").alias("i", "p1"))
    pairs = left.select(
        "p1", F.explode(F.expr("slice(parts, i + 2, size(parts))")).alias("p2")
    )
    got = {
        (r.p1, r.p2): r.n
        for r in pairs.groupBy("p1", "p2").agg(F.count("*").alias("n")).collect()
    }
    assert got == _basket_pairs_brute(baskets)


def _streaks_brute(events):
    # events: list of (user, type) in time order -> per-type list of run lengths
    runs = {}
    for user in {u for u, _ in events}:
        seq = [t for u, t in events if u == user]
        for typ, grp in itertools.groupby(seq):
            runs.setdefault(typ, []).append(len(list(grp)))
    return runs


def test_event_streaks_row_number_trick_matches_brute_force(spark):
    events = [
        (1, "a"), (1, "a"), (1, "b"), (1, "a"), (1, "a"), (1, "a"),
        (2, "b"), (2, "b"), (2, "b"), (2, "a"),
        (3, "c"),
    ]
    rows = [(u, t, i) for i, (u, t) in enumerate(events)]
    df = spark.createDataFrame(rows, "user_id long, event_type string, seq long")
    w_all = Window.partitionBy("user_id").orderBy("seq")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy("seq")
    s = df.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_typ)).alias("grp"),
    )
    r = s.groupBy("user_id", "event_type", "grp").agg(
        F.count("*").alias("streak_len")
    )
    got = {}
    for row in r.collect():
        got.setdefault(row.event_type, []).append(row.streak_len)
    expected = _streaks_brute(events)
    assert {k: sorted(v) for k, v in got.items()} == {
        k: sorted(v) for k, v in expected.items()
    }


def test_closed_form_variance_matches_two_pass_reference(spark):
    values = [1.25, 3.5, 2.75, 10.0, 0.125, 6.625, 3.0]
    df = spark.createDataFrame([(v,) for v in values], "value double")
    a = df.select(
        F.round(F.col("value") * 1e3).cast("long").alias("v")
    ).agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1").cast("double"), F.col("s2").cast("double")
    row = a.select(
        (s1 / n / F.lit(1e3)).alias("mean"),
        ((s2 - s1 * s1 / n) / (n - 1) / F.lit(1e6)).alias("var"),
    ).collect()[0]
    mean_ref = sum(values) / len(values)
    var_ref = sum((v - mean_ref) ** 2 for v in values) / (len(values) - 1)
    assert math.isclose(row["mean"], mean_ref, rel_tol=1e-12)
    assert math.isclose(row["var"], var_ref, rel_tol=1e-9)


def test_dense_rank_keeps_ties_row_number_drops_them(spark):
    df = spark.createDataFrame(
        [("g", 10.0, 1), ("g", 10.0, 2), ("g", 9.0, 3), ("g", 8.0, 4), ("g", 8.0, 5)],
        "grp string, score double, id long",
    )
    w = Window.partitionBy("grp").orderBy(F.col("score").desc())
    with_ties = df.select("id", F.dense_rank().over(w).alias("rk")).filter(
        F.col("rk") <= 2
    )
    # dense_rank<=2 keeps BOTH score-10 rows and the score-9 row
    assert sorted(r.id for r in with_ties.collect()) == [1, 2, 3]


def test_quantized_pagerank_matches_reference_power_iteration(spark):
    from unified_firmographic_data_pipeline_spark.operators.pagerank import pagerank

    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (4, 1)]  # 4 -> 1 dangling-free chain
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, iterations=3, damping=0.85).collect()}

    # reference: identical quantized recurrence in plain Python
    from collections import defaultdict

    out = defaultdict(set)
    for s, d in edges:
        out[s].add(d)
    nodes = {n for e in edges for n in e}
    rank = {n: 1.0 for n in nodes}
    for _ in range(3):
        contrib = defaultdict(int)
        for s in out:
            c = round(rank[s] / len(out[s]) * 1e6)
            for d in out[s]:
                contrib[d] += c
        rank = {
            n: (1.0 - 0.85) + 0.85 * (contrib[n] / 1e6) for n in nodes
        }
    assert got == rank  # bit-exact, including the dangling node 4
