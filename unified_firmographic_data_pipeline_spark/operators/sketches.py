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
