"""Skew-mitigation helpers (SURVEY.md §7.3d: "salting hooks for skewed keys").

AQE's skew-join splitting handles most cases at runtime; these are the
explicit hooks for the two shapes AQE doesn't cover:

- ``salted_aggregate``: two-phase aggregation for heavily-skewed group keys
  (phase 1 aggregates on (key, salt) spreading a hot key over N reducers;
  phase 2 merges the N partials). Works for any algebraic aggregate list.
- ``salted_join``: broadcast-free skewed equi-join — replicate the small
  side N ways, salt the big side uniformly, join on (key, salt). For when
  the small side is too big to broadcast but the big side has hot keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    merge_aggs: Sequence[Column],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``partial_aggs`` run per (keys..., salt); ``merge_aggs`` combine the
    partials per keys. Example (count + sum):

        salted_aggregate(df, ["k"],
            [F.count("*").alias("n"), F.sum("v").alias("s")],
            [F.sum("n").alias("n"), F.sum("s").alias("s")])
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * num_salts).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join without broadcast: salt the big side with a uniform
    random salt, replicate the small side across all salt values (explode of
    a literal range — ``num_salts``× duplication), join on (key, salt).

    Only ``inner`` and ``left`` (big side preserved) are semantically valid:
    the small side is replicated ``num_salts``×, so any join shape that emits
    unmatched small-side rows (right/full outer) or tests small-side
    existence (right_semi/anti) would emit each such row once per salt."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' only (got {how!r}): the "
            "replicated small side duplicates unmatched rows under outer/semi "
            "variants"
        )
    big_s = big.withColumn("__salt", (F.rand(seed=42) * num_salts).cast("int"))
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return big_s.join(small_s, [key, "__salt"], how).drop("__salt")


def diagnose_skew(df: DataFrame, keys: list[str], top: int = 10) -> DataFrame:
    """Skew report for a prospective join/groupBy key: top-N heaviest key
    values with absolute counts and integer-exact permille share — the
    decision input for ``salted_aggregate``/``salted_join`` (rule of thumb:
    a key holding >1/num_partitions of the rows straggles its reducer).
    One aggregation on the key; the total re-enters as a 1-row broadcast."""
    counts = df.groupBy(*keys).agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            *keys,
            "n",
            # integer DIV keeps the permille exact at any count magnitude
            # (double division + cast can perturb the truncated value once
            # n*1000 exceeds 2^53)
            F.expr("n * 1000L DIV total").alias("permille"),
        )
        .orderBy(F.col("n").desc(), *keys)
        .limit(top)
    )
