"""Round-2 operator tests: deterministic sampling, sketches, k-means,
Z-order data skipping, robust normalization, incremental agg maintenance,
forward/tolerance as-of (reference checked against pandas.merge_asof)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from unified_firmographic_data_pipeline_spark.operators.clustering import (
    assign_clusters,
    cluster_sizes,
    init_centroids_by_id,
    kmeans_fit,
    semantic_dedup_cap,
)
from unified_firmographic_data_pipeline_spark.operators.incremental import (
    agg_state,
    merge_agg_state,
)
from unified_firmographic_data_pipeline_spark.operators.sampling import (
    bernoulli_hash_sample,
    hash_topk_per_group,
    hash_uniform,
    split_train_eval,
)
from unified_firmographic_data_pipeline_spark.operators.sketches import (
    heavy_hitters_exact,
    mg_covers_heavy_hitters,
    misra_gries,
)
from unified_firmographic_data_pipeline_spark.operators.stats import (
    winsorize,
    zscore_normalize,
)
from unified_firmographic_data_pipeline_spark.operators.temporal import asof_join
from unified_firmographic_data_pipeline_spark.operators.zorder import (
    cluster_by_zorder,
    file_minmax_stats,
    files_touched,
    z_value,
)


# -- sampling ---------------------------------------------------------------


def test_hash_uniform_distribution_and_determinism(spark):
    df = spark.range(0, 4000).select(hash_uniform(F.col("id")).alias("u"))
    stats = df.agg(
        F.min("u").alias("lo"), F.max("u").alias("hi"), F.avg("u").alias("m")
    ).first()
    assert 0.0 <= stats["lo"] and stats["hi"] < 1.0
    assert abs(stats["m"] - 0.5) < 0.02  # uniform mean, 4k draws
    # rerun with a different layout -> identical values per key
    a = {r["id"]: r["u"] for r in spark.range(0, 100).repartition(7)
         .select("id", hash_uniform(F.col("id")).alias("u")).collect()}
    b = {r["id"]: r["u"] for r in spark.range(0, 100).coalesce(1)
         .select("id", hash_uniform(F.col("id")).alias("u")).collect()}
    assert a == b


def test_bernoulli_sample_fraction_and_salt(spark):
    df = spark.range(0, 5000)
    n = bernoulli_hash_sample(df, "id", 0.2).count()
    assert abs(n / 5000 - 0.2) < 0.03
    s1 = set(r["id"] for r in bernoulli_hash_sample(df, "id", 0.2, salt="a").collect())
    s2 = set(r["id"] for r in bernoulli_hash_sample(df, "id", 0.2, salt="b").collect())
    assert s1 != s2  # salts decorrelate
    # nested property: smaller fraction of same salt is a subset
    s_small = set(r["id"] for r in bernoulli_hash_sample(df, "id", 0.1, salt="a").collect())
    assert s_small <= s1


def test_hash_topk_exact_k_per_group(spark):
    df = spark.range(0, 1000).withColumn("g", (F.col("id") % 7).cast("int"))
    out = hash_topk_per_group(df, ["g"], "id", 5)
    counts = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert all(v == 5 for v in counts.values())
    # group smaller than k keeps all its rows
    tiny = spark.range(0, 3).withColumn("g", F.lit(0))
    assert hash_topk_per_group(tiny, ["g"], "id", 5).count() == 3


def test_split_train_eval_stable_and_disjoint(spark):
    df = spark.range(0, 2000)
    s = split_train_eval(df, "id", eval_fraction=0.25)
    agg = {r["split"]: r["n"] for r in s.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(agg) == {"train", "eval"}
    assert abs(agg["eval"] / 2000 - 0.25) < 0.04
    # same key always lands in the same split
    again = split_train_eval(df.repartition(13), "id", eval_fraction=0.25)
    assert s.select("id", "split").subtract(again.select("id", "split")).count() == 0


# -- sketches ---------------------------------------------------------------


def test_misra_gries_superset_and_bound(spark):
    # zipf-ish: item i appears ~ 2000/i times
    rows = [(f"w{i}",) for i in range(1, 40) for _ in range(2000 // i)]
    df = spark.createDataFrame(rows, ["item"]).repartition(8)
    n = df.count()
    k = 16
    sketch = {r["item"]: r["weight_lower_bound"] for r in misra_gries(df, "item", k=k).collect()}
    exact = {r["item"]: r["n"] for r in heavy_hitters_exact(df, "item", 1).collect()}
    assert len(sketch) <= k - 1
    for item, w in sketch.items():
        assert w <= exact[item]  # lower bound
        assert exact[item] - w <= n / k + 1  # MG error bound
    # every item above n/k share must be present
    assert mg_covers_heavy_hitters(df, "item", k=k, min_share=1.0 / k)


# -- k-means ----------------------------------------------------------------


def test_kmeans_fit_matches_numpy_lloyd(spark):
    rng = np.random.RandomState(7)
    pts = np.vstack(
        [rng.normal(c, 0.15, size=(40, 4)) for c in (0.0, 2.0, 5.0)]
    ).astype("float32")
    pdf = pd.DataFrame({"vec_id": range(len(pts)), "embedding": [list(map(float, p)) for p in pts]})
    df = spark.createDataFrame(pdf)
    cents, assigned = kmeans_fit(df, k=3, n_iter=8)

    # numpy Lloyd with the SAME deterministic init (first k by id)
    c = pts[:3].astype("float64")
    x = pts.astype("float64")
    for _ in range(8):
        # integer-micro distances, id tiebreak == argmin on (d, cid)
        d = ((x[:, None, :] - c[None, :, :]) ** 2 * 1e6).round().sum(axis=2)
        lab = d.argmin(axis=1)
        for j in range(3):
            if (lab == j).any():
                c[j] = x[lab == j].mean(axis=0)
    got = {int(r["vec_id"]): int(r["cluster_id"]) for r in assigned.collect()}
    # cluster ids are centroid seed ids (0,1,2 here)
    assert got == {i: int(lab[i]) for i in range(len(pts))}
    inertia = cluster_sizes(assigned).agg(F.sum("inertia_micro")).first()[0]
    d = ((x[:, None, :] - c[None, :, :]) ** 2 * 1e6).round().sum(axis=2)
    assert inertia == int(d.min(axis=1).sum())


def test_semantic_dedup_cap(spark):
    pdf = pd.DataFrame(
        {"vec_id": range(20), "embedding": [[float(i % 2), 0.0] for i in range(20)]}
    )
    df = spark.createDataFrame(pdf)
    cents = init_centroids_by_id(df, 2)
    assigned = assign_clusters(df, cents)
    capped = semantic_dedup_cap(assigned, per_cluster_cap=3)
    sizes = [r["n"] for r in capped.groupBy("cluster_id").agg(F.count("*").alias("n")).collect()]
    assert all(s <= 3 for s in sizes)
    # kept rows are nearest-to-centroid: here all dists are 0 within a
    # cluster, so the id tiebreak keeps the 3 smallest ids
    kept = sorted(r["vec_id"] for r in capped.filter("cluster_id = 0").collect())
    assert kept == [0, 2, 4]


# -- z-order ----------------------------------------------------------------


def test_z_value_interleaves_bits(spark):
    row = (
        spark.createDataFrame([(0b1011, 0b0001)], ["x", "y"])
        .select(z_value(["x", "y"], bits=4).alias("z"))
        .first()
    )
    # x bits land at even positions, y bits at odd: x=1011 -> 1,2? compute:
    # bit i of x at 2i: 1<<0, 1<<2, 0<<4, 1<<6 = 1+4+64 = 69
    # bit i of y at 2i+1: 1<<1 = 2 -> z = 71
    assert row["z"] == 69 + 2


def test_zorder_clustering_improves_skipping(spark, tmp_path):
    # two independent uniform keys: a linear sort on x gives no locality on
    # y; the Z-curve bounds both
    df = spark.range(0, 40_000).select(
        F.pmod(F.xxhash64("id"), F.lit(1024)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1024)).alias("y"),
    )
    n_files = 16
    z_path = str(tmp_path / "zorder")
    lin_path = str(tmp_path / "linear")
    cluster_by_zorder(df, ["x", "y"], z_path, n_files, bits=10)
    df.repartitionByRange(n_files, "x").sortWithinPartitions("x").write.parquet(lin_path)

    z_stats = file_minmax_stats(spark, z_path, ["x", "y"]).cache()
    lin_stats = file_minmax_stats(spark, lin_path, ["x", "y"]).cache()
    # x-sorted layout: perfect on x, NO pruning on y (reads every file).
    # z-order: prunes on BOTH dimensions — that is the whole point.
    zy = files_touched(z_stats, "y", 100, 131)
    liny = files_touched(lin_stats, "y", 100, 131)
    assert zy < liny, f"z-order touched {zy} files on y vs linear {liny}"
    zx = files_touched(z_stats, "x", 100, 131)
    assert zx <= n_files // 2, f"z-order lost x locality: {zx}/{n_files} files"
    assert zy <= n_files // 2, f"z-order lost y locality: {zy}/{n_files} files"


# -- robust normalization ---------------------------------------------------


def test_winsorize_bounds_and_flags(spark):
    df = spark.range(0, 1000).select(F.col("id").cast("double").alias("v"))
    w = winsorize(df, "v", 0.10, 0.90)
    row = w.agg(
        F.min("v_w").alias("lo"), F.max("v_w").alias("hi"),
        F.count(F.when(F.col("v_clipped"), 1)).alias("nc"),
    ).first()
    assert row["lo"] == pytest.approx(99.9)   # 0.10 * 999 interpolated
    assert row["hi"] == pytest.approx(899.1)
    assert row["nc"] == 200  # 0..99 below 99.9, 900..999 above 899.1


def test_zscore_moments(spark):
    df = spark.range(0, 3000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 0.37).alias("v"),
    )
    z = zscore_normalize(df, "v", ["g"])
    m = z.groupBy("g").agg(
        F.avg("v_z").alias("mean"), F.stddev_samp("v_z").alias("sd")
    ).collect()
    for r in m:
        assert abs(r["mean"]) < 1e-6
        assert r["sd"] == pytest.approx(1.0, abs=1e-4)


# -- incremental aggregate maintenance --------------------------------------


def test_merge_agg_state_equals_full_recompute(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 11).alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
    )
    aggs = {"n": ("count", "*"), "s": ("sum", "v"), "mn": ("min", "v"), "mx": ("max", "v")}
    full = agg_state(df, ["k"], aggs)
    # fold in three arbitrary chunks
    state = None
    for i in range(3):
        chunk = df.filter(F.col("id") % 3 == i)
        state = merge_agg_state(state, agg_state(chunk, ["k"], aggs), ["k"], aggs)
    assert sorted(map(tuple, state.collect())) == sorted(map(tuple, full.collect()))


def test_merge_agg_state_rejects_non_mergeable(spark):
    df = spark.range(3).select(F.col("id").alias("k"), F.col("id").alias("v"))
    with pytest.raises(ValueError, match="non-mergeable"):
        agg_state(df, ["k"], {"a": ("avg", "v")})


# -- as-of join vs pandas merge_asof ----------------------------------------


def _asof_frames():
    rng = np.random.RandomState(3)
    left = pd.DataFrame({
        "key": rng.randint(0, 5, 200),
        "ts": pd.to_datetime(rng.randint(0, 100_000, 200), unit="s"),
        "lid": range(200),
    }).sort_values("ts").reset_index(drop=True)
    right = pd.DataFrame({
        "key": rng.randint(0, 5, 300),
        "ts": pd.to_datetime(rng.randint(0, 100_000, 300), unit="s"),
        "rval": rng.randint(0, 1000, 300),
    })
    # merge_asof breaks ties arbitrarily; keep right (key, ts) unique
    right = right.drop_duplicates(["key", "ts"]).sort_values("ts").reset_index(drop=True)
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("tolerance", [None, "10 minutes"])
def test_asof_join_matches_pandas(spark, direction, tolerance):
    left, right = _asof_frames()
    expected = pd.merge_asof(
        left, right, on="ts", by="key", direction=direction,
        tolerance=None if tolerance is None else pd.Timedelta(minutes=10),
    )
    got = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        key="key", ts="ts", right_cols=["rval"],
        direction=direction, tolerance=tolerance,
    ).toPandas().sort_values("lid").reset_index(drop=True)
    exp = expected.sort_values("lid").reset_index(drop=True)
    assert got["rval_asof"].astype("float64").equals(exp["rval"].astype("float64")), (
        pd.concat([got[["lid", "key", "ts", "rval_asof"]], exp[["rval"]]], axis=1)
        [lambda d: d["rval_asof"].astype("float64") != d["rval"].astype("float64")]
        .head()
        .to_string()
    )


# -- weighted sampling -------------------------------------------------------


def test_weighted_hash_sample_respects_weights(spark):
    from unified_firmographic_data_pipeline_spark.operators.sampling import (
        weighted_hash_sample,
    )

    # two strata: ids < 500 carry weight 9, the rest weight 1. A k=200
    # weighted draw from 1000 rows should strongly favor the heavy stratum.
    df = spark.range(0, 1000).select(
        F.col("id"), F.when(F.col("id") < 500, 9.0).otherwise(1.0).alias("w")
    )
    got = weighted_hash_sample(df, "id", "w", k=200)
    heavy = got.filter("id < 500").count()
    assert got.count() == 200
    assert heavy > 150, f"heavy stratum underdrawn: {heavy}/200"
    # deterministic: same draw every time, any layout
    again = weighted_hash_sample(df.repartition(17), "id", "w", k=200)
    assert set(r["id"] for r in got.collect()) == set(r["id"] for r in again.collect())
    # per-group variant returns exactly k per group
    g = df.withColumn("grp", (F.col("id") % 2).cast("int"))
    per = weighted_hash_sample(g, "id", "w", k=10, group_cols=["grp"])
    assert {r["n"] for r in per.groupBy("grp").agg(F.count("*").alias("n")).collect()} == {10}


# -- format round-trips ------------------------------------------------------


@pytest.mark.parametrize("fmt", ["orc", "csv", "json"])
def test_columnar_and_text_format_round_trips(spark, tmp_path, fmt):
    """The engine's tables survive ORC / CSV / JSON round-trips with schema
    intact (CSV/JSON re-apply the schema on read; ORC carries it)."""
    df = spark.range(0, 100).select(
        F.col("id"),
        (F.col("id") * 0.5).alias("v"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
    )
    path = str(tmp_path / fmt)
    w = df.write.mode("overwrite")
    if fmt == "csv":
        w = w.option("header", True)
    w.format(fmt).save(path)
    r = spark.read
    if fmt in ("csv", "json"):
        r = r.schema(df.schema)
        if fmt == "csv":
            r = r.option("header", True)
    got = r.format(fmt).load(path)
    # nullability flags legitimately widen on text-format reads; names and
    # types must survive exactly
    assert [(f.name, f.dataType) for f in got.schema] == [
        (f.name, f.dataType) for f in df.schema
    ]
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, df.collect()))


# -- CDC snapshot diff -------------------------------------------------------


def test_table_diff_classifies_null_transitions(spark):
    from unified_firmographic_data_pipeline_spark.operators.incremental import table_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, "d")], ["k", "v"]
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (5, "e")], ["k", "v"]
    )
    got = {r["k"]: r["change_type"] for r in table_diff(old, new, ["k"]).collect()}
    # NULL -> value and value -> NULL are CHANGES (null-safe compare), not
    # unchanged; missing keys classify by side
    assert got == {1: "unchanged", 2: "changed", 3: "changed", 4: "deleted", 5: "inserted"}


def test_incremental_join_delta_matches_full_recompute(spark):
    from unified_firmographic_data_pipeline_spark.operators.incremental import (
        incremental_join_delta,
    )

    a_old = spark.createDataFrame([(1, "x"), (2, "y")], "k long, a string")
    a_new = spark.createDataFrame([(2, "y2"), (3, "z")], "k long, a string")
    b_old = spark.createDataFrame([(1, 10), (3, 30)], "k long, b long")
    b_new = spark.createDataFrame([(2, 20), (3, 31)], "k long, b long")

    delta = incremental_join_delta(a_old, a_new, b_old, b_new, ["k"])
    old_join = a_old.join(b_old, ["k"])
    incremental = old_join.unionByName(delta)

    full = a_old.unionByName(a_new).join(b_old.unionByName(b_new), ["k"])
    got = sorted(map(tuple, incremental.collect()))
    want = sorted(map(tuple, full.collect()))
    assert got == want


def test_versioned_catalog_time_travel_and_retention(spark, tmp_path):
    from unified_firmographic_data_pipeline_spark.sources.catalog import VersionedCatalog

    cat = VersionedCatalog(spark, str(tmp_path), retain=2)
    for i in range(4):  # v0..v3; retain=2 keeps v2, v3
        df = spark.range(i + 1).withColumnRenamed("id", "k")
        assert cat.write_version(df, "core", "t") == i
    assert cat.latest_version("core", "t") == 3
    assert cat.read("core", "t").count() == 4          # latest
    assert cat.read("core", "t", version=2).count() == 3  # time travel
    assert cat._versions("core", "t") == [2, 3]        # pruned v0, v1
    import pytest

    with pytest.raises(Exception):
        cat.read("core", "t", version=0).count()  # pruned -> unreadable


def test_profile_columns_single_pass_counts_nulls_and_extrema(spark):
    from unified_firmographic_data_pipeline_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [("a", 1.5), ("b", None), (None, 3.5), ("a", 2.0)],
        "s string, v double",
    )
    got = {r["col_name"]: r.asDict() for r in profile_columns(df, ["s", "v"]).collect()}
    assert got["s"]["n"] == 4 and got["s"]["n_null"] == 1
    assert got["s"]["n_distinct"] == 2
    assert got["s"]["min_str"] == "a" and got["s"]["max_str"] == "b"
    assert got["s"]["min_num"] is None
    assert got["v"]["n_null"] == 1 and got["v"]["n_distinct"] == 3
    assert got["v"]["min_num"] == 1.5 and got["v"]["max_num"] == 3.5
    assert got["v"]["min_str"] is None
    # one-pass: the plan contains exactly one scan of the input
    plan = profile_columns(df, ["s", "v"])._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("logicalrdd") == 1


def test_overwrite_partitions_touches_only_written_partitions(spark, tmp_path):
    from unified_firmographic_data_pipeline_spark.sources.catalog import Catalog

    cat = Catalog(spark, str(tmp_path))
    full = spark.createDataFrame(
        [("2024-01-01", 1), ("2024-01-01", 2), ("2024-01-02", 3)], "d string, v long"
    )
    cat.overwrite_partitions(full, "core", "fact", ["d"])
    # rewrite ONLY day 2 with different content
    day2 = spark.createDataFrame([("2024-01-02", 99)], "d string, v long")
    cat.overwrite_partitions(day2, "core", "fact", ["d"])
    # partition-dir values are type-inferred on read -> cast back to string
    got = sorted(
        map(
            tuple,
            cat.read("core", "fact").selectExpr("CAST(d AS STRING) d", "v").collect(),
        )
    )
    assert got == [("2024-01-01", 1), ("2024-01-01", 2), ("2024-01-02", 99)]
