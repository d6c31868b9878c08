"""Reference-implementation tests for the round-3 statistics queries:
Mann-Whitney U (vs a direct rank-based Python computation), burstiness,
CUSUM argmax, and the Zipf/OLS slope — semantics the oracle-parity hash
confirms but cannot explain."""

import math

from pyspark.sql import functions as F


def _mannwhitney_ref(a: list[float], b: list[float]) -> tuple[float, float]:
    """Direct U + tie-corrected z for sample a (vs b), average ranks."""
    allv = sorted([(v, 0) for v in a] + [(v, 1) for v in b])
    n = len(allv)
    ranks: dict[int, float] = {}
    i = 0
    tie_term = 0
    r1 = 0.0
    while i < n:
        j = i
        while j < n and allv[j][0] == allv[i][0]:
            j += 1
        t = j - i
        avg_rank = (i + 1 + j) / 2.0  # ranks i+1..j
        r1 += avg_rank * sum(1 for k in range(i, j) if allv[k][1] == 0)
        tie_term += t * t * t - t
        i = j
    n1, n2 = len(a), len(b)
    u1 = r1 - n1 * (n1 + 1) / 2.0
    var = n1 * n2 / 12.0 * ((n + 1.0) - tie_term / (n * (n - 1.0)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var)
    return u1, z


def test_mannwhitney_query_matches_rank_reference(spark, sf_small):
    import duckdb

    import __spark_entry__ as m

    out = {
        r["event_type"]: r
        for r in m.queries()["mannwhitney_value_by_variant"](spark, sf_small).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT event_type, CAST(user_id % 2 AS INTEGER) AS variant,
                   CAST(round(value * 1e3) AS BIGINT) AS v
            FROM '{sf_small}/events.parquet' WHERE value IS NOT NULL"""
    ).fetchall()
    by_type: dict[str, tuple[list, list]] = {}
    for et, var, v in rows:
        by_type.setdefault(et, ([], []))[0 if var == 0 else 1].append(v)
    for et, (a, b) in by_type.items():
        if len(a) < 1 or len(b) < 1:
            continue
        u1, z = _mannwhitney_ref(a, b)
        assert out[et]["n1"] == len(a) and out[et]["n2"] == len(b)
        assert out[et]["u1"] == round(u1, 6), et
        assert abs(out[et]["z"] - z) < 1e-6, et


def test_burstiness_formula_on_known_sequence(spark):
    from unified_firmographic_data_pipeline_spark.plans.driver_queries import QUERIES
    import duckdb  # noqa: F401  (parity covers the full query; here: formula)

    # one user, gaps 10, 20, 30 -> n=3, s=60, ss=1400
    # sigma_scaled = sqrt(3*1400 - 3600) = sqrt(600); B=(sqrt600-60)/(sqrt600+60)
    rows = [(1, i, t) for i, t in enumerate([0, 10, 30, 60])]
    df = spark.createDataFrame(rows, "user_id long, event_id long, t long").select(
        "user_id", "event_id", F.timestamp_seconds("t").alias("ts")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = df.select(
        "user_id",
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    m = g.groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("gap").alias("s"),
        F.sum(F.col("gap") * F.col("gap")).alias("ss"),
    ).collect()[0]
    assert (m["n"], m["s"], m["ss"]) == (3, 60, 1400)
    sig = math.sqrt(3 * 1400 - 60 * 60)
    expect = round((sig - 60) / (sig + 60), 6)
    # the full query buckets floor(B*10); B ~ -0.4529 -> bucket -5
    assert math.floor(expect * 10) == -5


def test_cusum_peak_locates_level_shift(spark):
    """A series with a hard level shift must put the CUSUM argmax at the
    shift boundary."""
    import datetime

    import duckdb

    # 10 days at 5/day then 10 days at 50/day -> peak |cusum| at day 10
    days = []
    base = datetime.date(2024, 1, 1)
    for i in range(20):
        n = 5 if i < 10 else 50
        for j in range(n):
            days.append((i * 86400 + j,))
    df = spark.createDataFrame(days, "t long").select(
        F.timestamp_seconds("t").alias("ts"),
        F.lit(1).alias("event_id"), F.lit(1).alias("user_id"),
        F.lit("e").alias("event_type"), F.lit(None).cast("double").alias("value"),
        F.lit("{}").alias("props"),
    )
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        # reuse the registered query by materializing a mini events table
        df.write.parquet(os.path.join(td, "events.parquet"))
        from unified_firmographic_data_pipeline_spark.plans.driver_queries import QUERIES

        row = QUERIES["cusum_changepoint_daily"](spark, td).collect()[0]
    # epoch day 0 is 1970-01-01; day index 9 (the last low day) holds the
    # extreme cumulative deficit before the regime flips
    assert row["n_days"] == 20
    assert row["change_day"] == "1970-01-10"


def test_zipf_slope_on_synthetic_power_law(spark):
    """Tokens with freq ~ C/rank must yield slope ~ -1."""
    import tempfile, os

    words = []
    for rank in range(1, 31):
        freq = 3000 // rank
        words += [f"w{rank:02d}"] * freq
    text = " ".join(words)
    df = spark.createDataFrame([(1, text, "en", "s", len(text))],
                               "doc_id long, text string, lang string, source string, n_chars long")
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        from unified_firmographic_data_pipeline_spark.plans.driver_queries import QUERIES

        row = QUERIES["zipf_slope_tokens"](spark, td).collect()[0]
    assert row["n_points"] == 30
    assert abs(row["zipf_slope"] + 1.0) < 0.05


def test_assortativity_matches_bruteforce_on_known_graph(spark, sf_small):
    """Verify the registered query's closed form against a direct Pearson
    over endpoint degrees computed in Python from the same parquet."""
    import duckdb

    import __spark_entry__ as m

    row = m.queries()["assortativity_copurchase"](spark, sf_small).collect()[0]
    con = duckdb.connect()
    und = con.execute(
        f"""SELECT DISTINCT a.l_partkey, b.l_partkey
            FROM '{sf_small}/lineitem.parquet' a
            JOIN '{sf_small}/lineitem.parquet' b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"""
    ).fetchall()
    deg: dict[int, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in und:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    r = (n * sxy - sx * sy) / math.sqrt(n * sxx - sx * sx) / math.sqrt(n * syy - sy * sy)
    assert row["n_edges"] == len(und)
    assert row["assortativity"] == round(r, 6)


def test_containment_catches_subset_jaccard_misses(spark):
    from unified_firmographic_data_pipeline_spark.operators.neardup import (
        jaccard_pairs,
    )
    from pyspark.sql import functions as F

    # doc 2 is a strict subset of doc 1 (5 of 50 tokens): J ~ 0.1,
    # containment(2 in 1) = 1.0
    big = " ".join(f"w{i}" for i in range(50))
    small = " ".join(f"w{i}" for i in range(5))
    df = spark.createDataFrame([(1, big), (2, small)], "doc_id long, text string")
    p = jaccard_pairs(df, shingle_n=1, threshold=0.0).collect()[0]
    assert p["jaccard"] == 5 / 50  # symmetric metric says "not similar"
    cont_small_in_big = p["n_common"] / min(p["n_a"], p["n_b"])
    assert cont_small_in_big == 1.0  # asymmetric metric catches it


def test_two_hop_reach_on_tiny_graph(spark, sf_small):
    """Cross-check the seeded 2-hop counts against a Python BFS on the
    same bipartite edge list."""
    import duckdb

    import __spark_entry__ as m

    out = {
        r["custkey"]: r
        for r in m.queries()["two_hop_reach_counts"](spark, sf_small).collect()
    }
    con = duckdb.connect()
    edges = con.execute(
        f"""SELECT DISTINCT o_custkey, l_suppkey
            FROM '{sf_small}/orders.parquet' o
            JOIN '{sf_small}/lineitem.parquet' l ON o_orderkey = l_orderkey"""
    ).fetchall()
    c2s: dict[int, set] = {}
    s2c: dict[int, set] = {}
    for c, s in edges:
        c2s.setdefault(c, set()).add(s)
        s2c.setdefault(s, set()).add(c)
    seeds = sorted(c2s)[:10]
    for seed in seeds:
        supp = c2s[seed]
        two_hop = set().union(*(s2c[s] for s in supp)) - {seed}
        assert out[seed]["n_suppliers"] == len(supp), seed
        assert out[seed]["n_two_hop_customers"] == len(two_hop), seed
