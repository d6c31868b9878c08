"""Hilbert-curve clustering — the locality-tight sibling of Z-order.

The Morton/Z curve (operators/zorder.py) is cheap to compute but takes
long diagonal jumps: consecutive curve positions can be far apart in key
space, so file min-max ranges along the curve stay wider than necessary.
The Hilbert curve visits every cell of the 2^bits × 2^bits grid exactly
once with EVERY consecutive step adjacent (|Δx| + |Δy| = 1, no jumps),
which is why lakehouse engines offer it as the higher-quality layout for
multi-dimensional data skipping (e.g. Delta Lake's liquid clustering);
the construction is the classic bit-level rotation algorithm (Hilbert
1891; Hamilton, "Compact Hilbert indices", CS-2006-07).

Plan-shape note (the Catalyst trap from operators/pq.py applies): each
bit level's (x', y') depends on the previous level's (x, y), so inlining
all levels into one expression tree doubles per level — 2^bits nodes.
:func:`with_hilbert` instead chains one narrow ``select`` per level with
NAMED intermediate columns; because each level's outputs are referenced
more than once by the next level and are not cheap, Catalyst's
CollapseProject keeps the projections separate and the plan stays linear
in ``bits`` (pinned by a plan-size test). All levels still fuse into one
WholeStageCodegen span — no shuffle, no UDF.

At 100 TB the write is the same one-shuffle range-partitioned sort as
``cluster_by_zorder``; the benefit is the tighter per-file min-max boxes
every scan prunes against, forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hilbert_index_py(x: int, y: int, bits: int = 16) -> int:
    """Pure-Python reference (the Wikipedia xy2d loop) — the test oracle
    and the documentation of exactly what the column version computes."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def with_hilbert(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    out: str = "hilbert",
) -> DataFrame:
    """Append the 2-D Hilbert index of ``(x_col, y_col)`` as column
    ``out``. Inputs must be non-negative integers below ``2**bits``
    (callers quantize floats/timestamps first, as with ``z_value``);
    the index ranges over ``[0, 4**bits)`` and needs ``2*bits <= 62``.

    One chained narrow projection per bit level (see the module note on
    why this is deliberate), integer-only expressions end to end."""
    if 2 * bits > 62:
        raise ValueError(f"2 x {bits} bits exceeds a signed long")
    orig = df.columns
    work = df.select(
        "*",
        F.col(x_col).cast("long").alias("__hx"),
        F.col(y_col).cast("long").alias("__hy"),
        F.lit(0).cast("long").alias("__hd"),
    )
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = F.shiftright(F.col("__hx"), i).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col("__hy"), i).bitwiseAND(F.lit(1))
        d_new = F.col("__hd") + F.lit(s * s).cast("long") * (
            (F.lit(3) * rx).bitwiseXOR(ry).cast("long")
        )
        # rotate/reflect the quadrant frame:
        #   ry==1            -> (x, y) unchanged
        #   ry==0 and rx==1  -> (s-1-y, s-1-x)   (flip both, then swap)
        #   ry==0 and rx==0  -> (y, x)           (swap)
        x_new = (
            F.when(ry == 1, F.col("__hx"))
            .when(rx == 1, F.lit(s - 1) - F.col("__hy"))
            .otherwise(F.col("__hy"))
        )
        y_new = (
            F.when(ry == 1, F.col("__hy"))
            .when(rx == 1, F.lit(s - 1) - F.col("__hx"))
            .otherwise(F.col("__hx"))
        )
        work = work.select(
            *orig,
            x_new.alias("__hx"),
            y_new.alias("__hy"),
            d_new.alias("__hd"),
        )
    return work.select(*orig, F.col("__hd").alias(out))


def hilbert_sql(x_col: str, y_col: str, bits: int = 16) -> str:
    """The DuckDB twin of :func:`with_hilbert`: the same bit-level loop
    as one ``list_reduce`` over the levels with a ``[x, y, d]`` state
    list (an unrolled CASE chain would re-explode exponentially — the
    fold keeps the SQL linear in ``bits`` exactly like the chained
    projections keep the Spark plan linear). Exact integer arithmetic,
    verified equal to :func:`hilbert_index_py` on the full 32x32 grid;
    the oracle building block for when the operator is registered."""
    levels = ", ".join(
        f"[CAST({i} AS BIGINT), 0, 0]" for i in range(bits - 1, -1, -1)
    )
    return f"""
    list_reduce(
        list_concat([[CAST({x_col} AS BIGINT), CAST({y_col} AS BIGINT),
                      CAST(0 AS BIGINT)]], [{levels}]),
        (acc, lvl) -> [
            CASE WHEN ((acc[2] >> CAST(lvl[1] AS INT)) & 1) = 1 THEN acc[1]
                 WHEN ((acc[1] >> CAST(lvl[1] AS INT)) & 1) = 1
                      THEN (CAST(1 AS BIGINT) << CAST(lvl[1] AS INT)) - 1 - acc[2]
                 ELSE acc[2] END,
            CASE WHEN ((acc[2] >> CAST(lvl[1] AS INT)) & 1) = 1 THEN acc[2]
                 WHEN ((acc[1] >> CAST(lvl[1] AS INT)) & 1) = 1
                      THEN (CAST(1 AS BIGINT) << CAST(lvl[1] AS INT)) - 1 - acc[1]
                 ELSE acc[1] END,
            acc[3] + (CAST(1 AS BIGINT) << CAST(lvl[1] AS INT))
                   * (CAST(1 AS BIGINT) << CAST(lvl[1] AS INT))
                   * xor(3 * ((acc[1] >> CAST(lvl[1] AS INT)) & 1),
                         (acc[2] >> CAST(lvl[1] AS INT)) & 1)
        ]
    )[3]"""


def cluster_by_hilbert(
    df: DataFrame,
    x_col: str,
    y_col: str,
    path: str,
    n_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files ordered along the Hilbert
    curve of ``(x_col, y_col)`` — same one-shuffle range-partitioned sorted
    write as ``zorder.cluster_by_zorder``, tighter per-file min-max boxes."""
    (
        with_hilbert(df, x_col, y_col, bits, out="__h")
        .repartitionByRange(n_files, "__h")
        .sortWithinPartitions("__h")
        .drop("__h")
        .write.mode("overwrite")
        .parquet(path)
    )
