"""Frequency sketches: exact heavy hitters and distributed Misra–Gries.

Token/host/url frequency is a standard corpus-curation signal (boilerplate
detection, stopword induction, hot-key discovery for skew handling). Two
tiers, mirroring the HLL/exact-distinct pair in plans/driver_queries.py:

- ``heavy_hitters_exact``: the plain groupBy — one shuffle of (item, count)
  partials thanks to map-side combine; the full-fidelity path while item
  cardinality fits a shuffle.
- ``misra_gries``: a mergeable bounded-memory summary (k counters per
  partition, then one merge) for when the item universe itself is too large
  to shuffle. Guarantees: every item with true count > n/k is present, and
  each reported weight is an UNDER-estimate by at most n/k (classic MG
  error bound; see Misra & Gries 1982 / the summary-merge analysis in
  Agarwal et al., "Mergeable Summaries", PODS'12 — public literature).

The MG pass is an ``applyInPandas`` over a pre-shuffled partition id — NOT
``mapPartitions`` over arbitrary input splits — so the summary set's size
(and thus the merge's cost) is fixed by the chosen fan-in, independent of
file layout. The merge itself is a second MG fold over ≤ fan_in × k rows:
driver-free, deterministic given the data, and safe at any scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def heavy_hitters_exact(
    df: DataFrame, item: F.Column | str, min_count: int
) -> DataFrame:
    """Items whose exact count exceeds ``min_count``: groupBy + HAVING.
    Partial (map-side) aggregation means the shuffle carries one row per
    (partition, item) — the scan dominates, as it should."""
    item = F.col(item) if isinstance(item, str) else item
    return (
        df.groupBy(item.alias("item"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
    )


def _mg_fold(items: pd.Series, weights: pd.Series, k: int) -> dict[str, int]:
    """Sequential Misra–Gries fold of (item, weight) pairs into ≤ k-1
    counters (weighted variant: decrement by the minimum counter when
    full)."""
    counters: dict[str, int] = {}
    for it, w in zip(items, weights):
        if it in counters:
            counters[it] += int(w)
        elif len(counters) < k - 1:
            counters[it] = int(w)
        else:
            dec = min(min(counters.values()), int(w))
            counters = {i: c - dec for i, c in counters.items() if c - dec > 0}
            if int(w) - dec > 0:
                counters[it] = int(w) - dec
    return counters


def misra_gries(
    df: DataFrame,
    item: F.Column | str,
    k: int = 64,
    fan_in: int = 32,
) -> DataFrame:
    """Bounded-memory approximate heavy hitters: ≤ ``k-1`` (item,
    weight_lower_bound) rows. ``weight`` under-counts the true frequency by
    at most n/k (summed across both MG folds the bound stays n/k because
    decrements are global row-count-bounded).

    Stage 1 groups rows into ``fan_in`` hash buckets (one shuffle of the
    item column only) and folds each bucket to ≤ k-1 counters; stage 2
    folds the ≤ fan_in·(k-1) partials on a single task — a few KB, not a
    driver collect.
    """
    item = F.col(item) if isinstance(item, str) else item
    schema = StructType(
        [StructField("item", df.select(item).schema[0].dataType), StructField("w", LongType())]
    )

    def fold_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        counters = _mg_fold(pdf["item"], pdf["w"], k)
        return pd.DataFrame({"item": list(counters), "w": list(counters.values())})

    # pre-aggregate exact per-bucket counts for the common skewed case:
    # the fold then sees each distinct item once with its full weight
    stage1 = (
        df.select(item.alias("item"))
        .withColumn("__b", F.pmod(F.xxhash64("item"), F.lit(fan_in)))
        .groupBy("__b", "item")
        .agg(F.count("*").alias("w"))
        .groupBy("__b")
        .applyInPandas(lambda pdf: fold_bucket(pdf), schema)
    )
    merged = (
        stage1.withColumn("__b", F.lit(0))
        .groupBy("__b")
        .applyInPandas(lambda pdf: fold_bucket(pdf), schema)
        .drop("__b")
    )
    return merged.withColumnRenamed("w", "weight_lower_bound")


def mg_covers_heavy_hitters(
    df: DataFrame, item: F.Column | str, k: int, min_share: float
) -> bool:
    """Check the MG guarantee on real data: every item with share >
    max(1/k, min_share) appears in the sketch. Used by tests; also a
    runtime self-check a pipeline can assert cheaply."""
    item = F.col(item) if isinstance(item, str) else item
    n = df.count()
    exact = set(
        r["item"]
        for r in heavy_hitters_exact(df, item, int(n * max(1.0 / k, min_share)) + 1).collect()
    )
    sketch = set(r["item"] for r in misra_gries(df, item, k).collect())
    return exact <= sketch


def cms_bucket(item, row: int, width: int):
    """Count-min-sketch bucket for ``item`` in hash row ``row``: the first
    13 hex digits of md5(row || ':' || item) taken mod ``width`` — fully
    engine-independent (any system with md5 + hex parse reproduces it), the
    same derivation family as ``sampling.hash_uniform``."""
    item = F.col(item) if isinstance(item, str) else item
    key = F.concat(F.lit(f"{row}:"), item.cast("string"))
    return (F.conv(F.substring(F.md5(key), 1, 13), 16, 10).cast("long") % width).cast(
        "int"
    )


def cms_estimates(
    items: DataFrame,
    item_col: str = "item",
    weight_col: str = "w",
    *,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Count-min-sketch frequency estimates (Cormode & Muthukrishnan 2005)
    rebuilt as pure relational algebra so the sketch itself is
    cross-engine verifiable:

    1. counters: for each of ``depth`` hash rows, sum weights per bucket —
       ``depth`` shuffles of (row, bucket) partials with map-side combine,
       each only ``width`` cells wide (mergeable by construction: the
       counter table IS the map-side-combinable aggregate);
    2. estimate(item) = MIN over rows of its bucket's counter (classic CMS
       upper-bound estimate: always >= true count, over by collisions).

    Returns (item, exact, est, overestimate) for every distinct item —
    the exact column rides along to expose the sketch error, which is the
    point of the operator's tests.
    """
    base = items.groupBy(item_col).agg(F.sum(weight_col).cast("long").alias("exact"))
    with_buckets = base.select(
        item_col,
        "exact",
        *[cms_bucket(item_col, r, width).alias(f"b{r}") for r in range(depth)],
    )
    ests = []
    for r in range(depth):
        counters = (
            with_buckets.groupBy(F.col(f"b{r}").alias("bucket"))
            .agg(F.sum("exact").alias("counter"))
        )
        ests.append(
            with_buckets.select(item_col, "exact", F.col(f"b{r}").alias("bucket"))
            .join(F.broadcast(counters), "bucket")
            .select(item_col, "exact", F.col("counter").alias("est"))
        )
    u = ests[0]
    for e in ests[1:]:
        u = u.unionByName(e)
    return (
        u.groupBy(item_col, "exact")
        .agg(F.min("est").cast("long").alias("est"))
        .select(
            item_col,
            "exact",
            "est",
            (F.col("est") - F.col("exact")).cast("long").alias("overestimate"),
        )
    )


def kmv_sketch(
    df: DataFrame, col: str, group_col: str = "source", k: int = 64
) -> DataFrame:
    """Per-group KMV (k-minimum-values) distinct sketch: the ``k`` smallest
    md5 hash fractions of the column's distinct values per group —
    ``(grp, hv)`` rows, ``hv`` in (0, 1). Bar-Yossef et al., "Counting
    distinct elements in a data stream" (RANDOM'02); the theta-sketch
    family's base construction (Dasgupta et al., "Theta sketches").

    Why next to HLL: HLL unions but cannot INTERSECT; a KMV sketch
    supports union AND intersection/Jaccard estimates (``kmv_pairwise_
    overlap``) — the audience-overlap / cross-source-containment question
    at 100 TB. And unlike HLL's register state, the sketch is plain rows:
    landable to parquet, mergeable by union + re-truncation, and — built
    on md5 — bit-replayable by a SQL oracle, so the estimate itself is
    externally verifiable, not just bounded.

    Scale shape: one narrow projection (13 hex chars → a 52-bit exact
    double fraction, the repo's established conv pattern), one distinct
    shuffle on (grp, hv), one per-group window for the k-truncation.
    State per group is k rows regardless of cardinality.
    """
    from pyspark.sql import Window

    h = (
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 13), 16, 10)
        .cast("double")
        / F.lit(float(16**13))
    )
    distinct = (
        df.select(F.col(group_col).alias("grp"), h.alias("hv"))
        .filter(F.col("hv").isNotNull())
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("hv")
    return (
        distinct.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("grp", "hv")
    )


def kmv_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Distinct-count estimate per group from a KMV sketch: ``(k-1) /
    max(hv)`` when the sketch is full, the EXACT row count when the group
    had fewer than ``k`` distinct hashes (the sketch then holds every
    value and the estimate degrades gracefully to exact). Returns
    ``(grp, n_sketch, distinct_est)``."""
    g = sketch.groupBy("grp").agg(
        F.count("*").alias("n_sketch"), F.max("hv").alias("__vmax")
    )
    est = F.when(
        F.col("n_sketch") < k, F.col("n_sketch").cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.col("__vmax"))
    return g.select("grp", "n_sketch", F.round(est, 6).alias("distinct_est"))


def kmv_pairwise_overlap(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Jaccard / union / intersection estimates for EVERY group pair from
    one KMV sketch table — the sketch-only protocol (no raw-data rejoin):
    for groups a < b, take X = the ``k`` smallest hashes of the two
    sketches' union; then ``jaccard_est = |X ∩ A ∩ B| / |X|``,
    ``union_est = (k-1)/max(X)`` (exact |X| when X is complete), and
    ``intersection_est = jaccard_est * union_est``.

    Scale shape: the pair axis is |groups|² — bounded by construction
    (sources, tenants, crawls), the ``js_divergence_sources`` contract —
    and each pair carries at most 2k sketch rows, so the whole analysis
    is groups²·k rows independent of data size. Returns ``(grp_a, grp_b,
    k_used, n_common, jaccard_est, union_est, intersection_est)``."""
    from pyspark.sql import Window

    grps = sketch.select("grp").distinct()
    # bounded-axis cross pair (the js_divergence_sources contract):
    # broadcast so the pairing plans as BNLJ, never CartesianProduct
    pairs = (
        grps.select(F.col("grp").alias("grp_a"))
        .crossJoin(F.broadcast(grps.select(F.col("grp").alias("grp_b"))))
        .filter(F.col("grp_a") < F.col("grp_b"))
    )
    ra = pairs.join(
        sketch.withColumnRenamed("grp", "grp_a"), "grp_a"
    ).select("grp_a", "grp_b", "hv", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    rb = pairs.join(
        sketch.withColumnRenamed("grp", "grp_b"), "grp_b"
    ).select("grp_a", "grp_b", "hv", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    u = (
        ra.unionByName(rb)
        .groupBy("grp_a", "grp_b", "hv")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("grp_a", "grp_b").orderBy("hv")
    x = u.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    stats = x.groupBy("grp_a", "grp_b").agg(
        F.count("*").alias("k_used"),
        F.max("hv").alias("__vmax"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_common"),
    )
    union_est = F.when(
        F.col("k_used") < k, F.col("k_used").cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.col("__vmax"))
    jac = F.col("n_common").cast("double") / F.col("k_used").cast("double")
    return stats.select(
        "grp_a",
        "grp_b",
        F.col("k_used").cast("int").alias("k_used"),
        F.col("n_common").cast("long").alias("n_common"),
        F.round(jac, 6).alias("jaccard_est"),
        F.round(union_est, 6).alias("union_est"),
        F.round(jac * union_est, 6).alias("intersection_est"),
    )


def kmv_merge(*sketches: DataFrame, k: int = 64) -> DataFrame:
    """Merge KMV sketches of DISJOINT or OVERLAPPING loads of the same
    groups: union the rows, dedupe (grp, hv) — the same value hashed in
    two loads is one sketch entry — and re-truncate to the k smallest per
    group. ``kmv_merge(sketch(A), sketch(B)) == kmv_sketch(A ∪ B)`` (the
    mergeable-summary property, Agarwal et al. PODS'12), so nightly
    parquet-landed sketches fold into the running corpus sketch without
    ever touching raw history — the KMV analogue of the incremental
    near-dup index contract. Cost: |inputs| × k rows per group in, k out."""
    from pyspark.sql import Window

    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    w = Window.partitionBy("grp").orderBy("hv")
    return (
        u.distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("grp", "hv")
    )
