"""One-pass column profiling — the data-quality sibling of the expect suite.

``profile_columns`` computes per-column (count, nulls, distinct, min/max)
in a SINGLE scan with multi-distinct aggregation (Catalyst plans one Expand
over the scan — not one job per column, the trap most hand-rolled profilers
fall into), then unpivots to one row per column. Numeric and string extrema
are kept in typed column pairs so the long format stays schema-stable.

Scale: exact COUNT(DISTINCT) per column is the oracle-checkable tier used
here; at 100 TB swap in ``approx_count_distinct`` (HLL, one pass, no
Expand blowup) via ``exact=False`` — same output shape. The full sketch
tier (HLL + moments + approx quantiles + top-k + histogram, Deequ-style)
lives in ``quality.profile``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile_columns(
    df: DataFrame, cols: list[str], exact: bool = True
) -> DataFrame:
    """Profile ``cols`` of ``df`` -> rows of
    ``(col_name, n, n_null, n_distinct, min_num, max_num, min_str, max_str)``.
    Numeric columns fill the ``*_num`` extrema (as double), everything else
    the ``*_str`` pair; the other pair is NULL."""
    schema = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        is_num = isinstance(schema[c], NumericType)
        nd = F.count_distinct(F.col(c)) if exact else F.approx_count_distinct(c)
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            nd.alias(f"{c}__nd"),
            (F.min(c).cast("double") if is_num else F.lit(None).cast("double")).alias(
                f"{c}__minn"
            ),
            (F.max(c).cast("double") if is_num else F.lit(None).cast("double")).alias(
                f"{c}__maxn"
            ),
            (F.lit(None).cast("string") if is_num else F.min(c).cast("string")).alias(
                f"{c}__mins"
            ),
            (F.lit(None).cast("string") if is_num else F.max(c).cast("string")).alias(
                f"{c}__maxs"
            ),
        ]
    wide = df.agg(*aggs)
    # melt via stack() so the 1-row aggregate is evaluated ONCE (a union of
    # per-column selects would re-run the whole aggregation per column)
    tuples = ", ".join(
        f"'{c}', `{c}__nn`, `{c}__nd`, `{c}__minn`, `{c}__maxn`, `{c}__mins`, `{c}__maxs`"
        for c in cols
    )
    stacked = wide.select(
        "__n",
        F.expr(
            f"stack({len(cols)}, {tuples}) AS "
            "(col_name, nn, n_distinct, min_num, max_num, min_str, max_str)"
        ),
    )
    return stacked.select(
        "col_name",
        F.col("__n").alias("n"),
        (F.col("__n") - F.col("nn")).alias("n_null"),
        "n_distinct",
        "min_num",
        "max_num",
        "min_str",
        "max_str",
    )
