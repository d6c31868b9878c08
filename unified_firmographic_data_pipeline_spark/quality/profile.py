"""One-pass column profiler — the data-profiling layer next to the
dbt-test analogue (``quality.expect``).

What Deequ/dbt-profiler provide for warehouse tables: per-column
completeness, cardinality, ranges, moments and quantiles, computed for
ALL columns in ONE aggregate pass over the table (reference analogue:
the ad-hoc quality queries around ``firmographics_dbt/models``; the
profiler is the systematized form).

Two-tier ladder with ``operators.profile``: that module is the EXACT,
oracle-checkable tier (exact COUNT(DISTINCT) via one Expand, typed
extrema, registered as a driver query); this module is the sketch tier
for wide tables at scale — HLL distincts, approx quantiles, moments,
plus the opt-in ``frequent_values`` / ``numeric_histogram`` passes that
exact-tier semantics cannot ride a scalar aggregate.

Scale design (100 TB):
- ``profile_columns`` is a single ``df.agg(...)`` — one scan, map-side
  partial aggregation, a one-row result collected on the driver. Adding
  columns widens the aggregate but never adds passes or shuffles.
- approx sketches only on the unbounded stats: ``approx_count_distinct``
  (HLL) and ``approx_percentile`` (KLL-style) are mergeable fixed-size
  state; exact distincts/medians would shuffle the whole column.
- ``frequent_values`` / ``numeric_histogram`` are opt-in second passes
  (each a bounded-output groupBy) because per-value frequencies cannot
  ride a scalar aggregate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType

#: profile row schema (stable contract for sinks/tests)
PROFILE_SCHEMA = (
    "column string, dtype string, n_rows long, n_nonnull long, n_null long, "
    "approx_distinct long, min string, max string, "
    "mean double, stddev double, p25 double, p50 double, p75 double, "
    "avg_len double, max_len long"
)


def profile_columns(
    df: DataFrame, columns: Sequence[str] | None = None
) -> DataFrame:
    """Profile ``columns`` (default: all top-level columns) in ONE
    aggregate pass. Returns one row per column (PROFILE_SCHEMA): counts
    and approx-distinct for every type, min/max rendered as strings (so
    heterogeneous columns share one report schema), moments + quartiles
    for numeric columns, length stats for string columns.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns) if columns is not None else list(fields)
    missing = [c for c in cols if c not in fields]
    if missing:
        raise ValueError(f"unknown columns: {missing}")

    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        dt = fields[c]
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"{c}__n"),
            F.approx_count_distinct(col).alias(f"{c}__d"),
            F.min(col).cast("string").alias(f"{c}__min"),
            F.max(col).cast("string").alias(f"{c}__max"),
        ]
        if isinstance(dt, NumericType):
            dc = col.cast("double")
            aggs += [
                F.avg(dc).alias(f"{c}__mean"),
                F.stddev_samp(dc).alias(f"{c}__std"),
                F.expr(
                    f"approx_percentile(cast({c} as double), array(0.25, 0.5, 0.75))"
                ).alias(f"{c}__q"),
            ]
        elif isinstance(dt, StringType):
            aggs += [
                F.avg(F.length(col)).alias(f"{c}__avg_len"),
                F.max(F.length(col)).cast("long").alias(f"{c}__max_len"),
            ]
    row = df.agg(*aggs).collect()[0]  # bounded: exactly one row

    out = []
    for c in cols:
        q = row[f"{c}__q"] if f"{c}__q" in row.__fields__ else None
        out.append(
            (
                c,
                fields[c].simpleString(),
                row["__n_rows"],
                row[f"{c}__n"],
                row["__n_rows"] - row[f"{c}__n"],
                row[f"{c}__d"],
                row[f"{c}__min"],
                row[f"{c}__max"],
                row[f"{c}__mean"] if f"{c}__mean" in row.__fields__ else None,
                row[f"{c}__std"] if f"{c}__std" in row.__fields__ else None,
                q[0] if q else None,
                q[1] if q else None,
                q[2] if q else None,
                row[f"{c}__avg_len"] if f"{c}__avg_len" in row.__fields__ else None,
                row[f"{c}__max_len"] if f"{c}__max_len" in row.__fields__ else None,
            )
        )
    return df.sparkSession.createDataFrame(out, PROFILE_SCHEMA)


def frequent_values(df: DataFrame, column: str, k: int = 10) -> DataFrame:
    """Exact top-``k`` most frequent values of one column:
    ``(value string, n long)`` ordered by (n desc, value asc) for a
    deterministic report. One groupBy (map-side combine) + a
    TakeOrderedAndProject — output bounded at ``k`` rows. For streaming /
    strictly-one-pass settings use ``operators.sketches`` (Misra-Gries)
    instead."""
    return (
        df.groupBy(F.col(column).cast("string").alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc_nulls_last("value"))
        .limit(k)
    )


def numeric_histogram(df: DataFrame, column: str, bins: int = 20) -> DataFrame:
    """Equi-width histogram ``(bucket, lo, hi, n)`` over a numeric column.

    Two bounded passes by necessity (bucket edges need min/max first):
    pass 1 collects the two scalars; pass 2 is one groupBy on the bucket
    id. NULLs are excluded; a constant column degenerates to one bucket.
    ``width_bucket`` puts x == max into bucket ``bins + 1`` — folded back
    into the last bucket so the histogram covers [min, max] exactly."""
    if bins < 1:
        raise ValueError("bins must be >= 1")
    dc = F.col(column).cast("double")
    mm = df.agg(F.min(dc).alias("lo"), F.max(dc).alias("hi")).collect()[0]
    if mm.lo is None:
        return df.sparkSession.createDataFrame(
            [], "bucket int, lo double, hi double, n long"
        )
    lo, hi = float(mm.lo), float(mm.hi)
    if lo == hi:
        n = df.where(dc.isNotNull()).count()
        return df.sparkSession.createDataFrame(
            [(1, lo, hi, n)], "bucket int, lo double, hi double, n long"
        )
    width = (hi - lo) / bins
    bucket = F.least(
        F.expr(f"width_bucket(cast({column} as double), {lo!r}, {hi!r}, {bins})"),
        F.lit(bins),
    ).cast("int")
    counts = (
        df.where(dc.isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return counts.select(
        "bucket",
        (F.lit(lo) + (F.col("bucket") - 1) * F.lit(width)).alias("lo"),
        (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("hi"),
        "n",
    ).orderBy("bucket")
