"""Z-order (Morton-curve) clustering for multi-column data skipping.

Parquet scans prune on per-file/rowgroup min-max ranges. Sorting by a
single column gives perfect pruning on that column and none on any other;
interleaving the bits of several columns (the Z / Morton curve) keeps every
interleaved column's values locally clustered, so point/range predicates on
ANY of them skip most files. This is the standard layout device behind
Delta/Iceberg ``OPTIMIZE ZORDER BY`` — here expressed as plain Spark
expressions plus a range-partitioned sorted write, no table format needed.

At 100 TB the write is one repartitionByRange shuffle (sampled range
boundaries → balanced files) and the benefit is at read time, forever:
a predicate on either key touches O(n^(1/2)) of the files instead of all
of them (classic Z-curve locality bound for 2 dims).

``file_minmax_stats`` computes the same manifest a table format would keep,
from the data itself (one narrow scan + tiny groupBy on file name) — used
by tests to PROVE the skipping improvement rather than assert it by faith.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def z_value(cols: list[F.Column | str], bits: int = 16) -> F.Column:
    """Interleave the low ``bits`` bits of each column into one Morton key.

    Pure integer expression (shifts + masks), whole-stage-codegen friendly;
    columns must be non-negative integers (callers quantize floats /
    timestamps first). With d columns the result uses d·bits bits — keep
    ≤ 62 total. Bit i of column j lands at position i·d + j, so columns
    alternate per bit plane (lower index = lower significance at each
    plane).
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    d = len(cols)
    if d * bits > 62:
        raise ValueError(f"{d} cols x {bits} bits exceeds a signed long")
    parts = [
        F.shiftleft(F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)), i * d + j)
        for i in range(bits)
        for j, c in enumerate(cols)
    ]
    # contributions occupy disjoint bit positions, so + == bitwise OR (and
    # matches the SQL twin, which also sums)
    return functools.reduce(operator.add, parts)


def z_value_sql(cols: list[str], bits: int = 16) -> str:
    """The byte-identical ANSI/DuckDB twin of :func:`z_value` (a sum of
    disjoint bit contributions equals their OR), for oracle queries."""
    d = len(cols)
    terms = [
        f"((({c} >> {i}) & 1) << {i * d + j})"
        for i in range(bits)
        for j, c in enumerate(cols)
    ]
    return "(" + " + ".join(terms) + ")"


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files ordered along the Z-curve
    of ``cols``: range-partition on the z-key (sampled quantile boundaries
    → balanced file sizes even under skew), sort within each file (tight
    rowgroup min-max), drop the key before writing."""
    (
        df.withColumn("__z", z_value(cols, bits))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_minmax_stats(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """Per-file min/max manifest for ``cols`` — the pruning metadata a
    lakehouse format materializes, derived here by one narrow scan grouped
    on ``input_file_name()``. Output: file, <c>_min, <c>_max per col."""
    df = spark.read.parquet(path).select(*cols, F.input_file_name().alias("file"))
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return df.groupBy("file").agg(*aggs)


def files_touched(stats: DataFrame, col: str, lo, hi) -> int:
    """How many files a range predicate on ``col`` must read, given a
    :func:`file_minmax_stats` manifest: count files whose [min,max]
    intersects [lo, hi]. The test-side measure of skipping quality."""
    return stats.filter(
        (F.col(f"{col}_min") <= F.lit(hi)) & (F.col(f"{col}_max") >= F.lit(lo))
    ).count()
