"""Scalable exact order statistics.

``F.percentile`` / ``F.median`` are exact but collect every value into the
aggregation buffer and merge on a single reducer — fine at thousands of
rows, an OOM at 100 TB. ``exact_quantiles_bracketed`` is the standard
scale-out rewrite:

1. one pass: ``count`` + ``approx_percentile`` with a rank-error bound to
   get a narrow value bracket around each requested quantile;
2. one pass: exact ``count(col < bracket_lo)`` for the global rank offset;
3. per quantile: sort only the (tiny) in-bracket subset and index into it
   for the exact order statistics, interpolating like ``percentile_cont``.

Every pass is fully parallel and memory-bounded by the bracket width
(~2 * n/accuracy rows + ties), not by n. Falls back to ``F.percentile``
if the bracket check fails (never observed; defensive).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles_pairs(
    df: DataFrame,
    pairs: list[tuple[str, float]],
    accuracy: int = 10_000,
) -> list[float]:
    """Exact interpolated quantiles (``percentile_cont`` semantics) for a
    list of (column, probability) pairs — the same column may appear under
    several probabilities (winsorize needs p05 AND p95 of one column) and
    all pairs share the same three passes. Returns driver scalars (the same
    tier as watermark reads), one per pair, in order."""
    cols = list(dict.fromkeys(c for c, _ in pairs))
    # Pass 1: per-column NON-NULL counts (percentile / approx_percentile /
    # percentile_cont all ignore NULLs, so ranks must be computed over the
    # non-null population — df.count() would shift every rank on a column
    # containing NULLs and could silently return a wrong quantile).
    row0 = df.agg(*[F.count(c).alias(c) for c in cols]).first()
    n_nonnull = {c: row0[c] for c in cols}
    out: list[float | None] = [None] * len(pairs)
    live = [i for i, (c, _) in enumerate(pairs) if n_nonnull[c] > 0]
    for i, (c, _) in enumerate(pairs):
        if n_nonnull[c] == 0:
            out[i] = float("nan")
    if not live:
        return out  # type: ignore[return-value]
    # Pass 1b: bracket values for every requested quantile, one job.
    brackets: dict[int, float] = {}
    agg_exprs = []
    for i in live:
        c, p = pairs[i]
        n = n_nonnull[c]
        rank = p * (n - 1)  # 0-indexed fractional rank within non-nulls
        delta = max(2.0 * n / accuracy, 2.0)
        p_lo = max(0.0, (math.floor(rank) - delta) / max(n - 1, 1))
        p_hi = min(1.0, (math.floor(rank) + 1 + delta) / max(n - 1, 1))
        agg_exprs.append(
            F.approx_percentile(c, F.array(F.lit(p_lo), F.lit(p_hi)), F.lit(accuracy)).alias(
                f"q{i}"
            )
        )
        brackets[i] = rank
    row = df.agg(*agg_exprs).first()
    bounds = {i: (row[f"q{i}"][0], row[f"q{i}"][1]) for i in live}

    # Pass 2: exact global rank of each bracket's lower bound, one job.
    row2 = df.agg(
        *[
            F.count(F.when(F.col(pairs[i][0]) < F.lit(bounds[i][0]), 1)).alias(f"q{i}")
            for i in live
        ]
    ).first()
    n_below = {i: row2[f"q{i}"] for i in live}

    for i in live:
        c, p = pairs[i]
        rank = brackets[i]
        lo, hi = bounds[i]
        k = math.floor(rank)
        frac = rank - k
        need_hi = min(k + 1, n_nonnull[c] - 1)
        # Histogram of the bracket subset: one row per DISTINCT value, so the
        # collect is bounded by bracket width even under massive ties.
        hist = (
            df.filter((F.col(c) >= F.lit(lo)) & (F.col(c) <= F.lit(hi)))
            .groupBy(c)
            .count()
            .orderBy(c)
            .collect()
        )
        # walk cumulative counts: global rank range of value v_i is
        # [n_below + cum_before, n_below + cum_after)
        vals: dict[int, float] = {}  # needed global rank -> value
        cum = n_below[i]
        for r in hist:
            nxt = cum + r["count"]
            for target in (k, need_hi):
                if cum <= target < nxt:
                    vals[target] = r[c]
            cum = nxt
        if k not in vals or need_hi not in vals:
            # bracket missed (approx error beyond bound) — exact fallback
            out[i] = df.agg(F.percentile(c, F.lit(p))).first()[0]
            continue
        if frac > 0:
            lower, upper = vals[k], vals[need_hi]
            # the weighted form both Spark's Percentile and DuckDB's
            # quantile_cont evaluate (bit-different from lower+(upper-lower)*f)
            out[i] = lower * (1.0 - frac) + upper * frac
        else:
            out[i] = vals[k]
    return out  # type: ignore[return-value]


def exact_quantiles_bracketed(
    df: DataFrame,
    cols_probs: dict[str, float],
    accuracy: int = 10_000,
) -> dict[str, float]:
    """Dict convenience wrapper over :func:`exact_quantiles_pairs` — one
    probability per column."""
    items = list(cols_probs.items())
    vals = exact_quantiles_pairs(df, items, accuracy)
    return {c: v for (c, _), v in zip(items, vals)}


def winsorize(
    df: DataFrame, col: str, p_lo: float = 0.05, p_hi: float = 0.95
) -> DataFrame:
    """Clip ``col`` to its [p_lo, p_hi] exact interpolated quantiles —
    the standard outlier-robust normalization before scoring/weighting a
    corpus. Adds ``<col>_w`` (clipped) and ``<col>_clipped`` (bool).

    Quantiles come from :func:`exact_quantiles_pairs` (bounded memory; both
    bounds share the same three passes); the clip itself is a narrow
    codegen'd projection, so the whole thing is scan-dominated at any
    scale."""
    lo, hi = exact_quantiles_pairs(df, [(col, p_lo), (col, p_hi)])
    c = F.col(col)
    return df.withColumn(
        f"{col}_w", F.least(F.greatest(c, F.lit(lo)), F.lit(hi))
    ).withColumn(f"{col}_clipped", (c < F.lit(lo)) | (c > F.lit(hi)))


def zscore_normalize(df: DataFrame, col: str, by: list[str]) -> DataFrame:
    """Per-group z-score with CROSS-ENGINE-EXACT two-pass moments.

    Single-pass variance (sum of squares minus squared sum) is both
    numerically unstable and engine-order-dependent. Instead:

    - pass 1: per-group micro-unit integer sum + count -> mean (exact —
      every engine derives the identical double from the same integers);
    - pass 2: per-group integer sum of ``round((x-mean)^2 * 1e6)`` —
      deviations from an identical mean, squared and quantized identically,
      summed as integers (order-free) -> sample stddev.

    Two shuffles on ``by`` + two broadcast joins of the tiny moment tables.
    Adds ``<col>_z`` rounded to 6 digits (the quantization noise floor).
    """
    c = F.col(col).cast("double")
    m1 = df.groupBy(*by).agg(
        F.sum(F.round(c * 1e6).cast("long")).alias("__s"),
        F.count(c).alias("__n"),
    ).withColumn("__mean", F.col("__s").cast("double") / F.lit(1e6) / F.col("__n"))
    with_mean = df.join(F.broadcast(m1.select(*by, "__mean", "__n")), by)
    dev = F.round((c - F.col("__mean")) * (c - F.col("__mean")) * 1e6).cast("long")
    m2 = with_mean.groupBy(*by).agg(F.sum(dev).alias("__ss"))
    with_sd = with_mean.join(F.broadcast(m2), by).withColumn(
        "__sd",
        F.sqrt(F.col("__ss").cast("double") / F.lit(1e6) / (F.col("__n") - 1)),
    )
    return with_sd.withColumn(
        f"{col}_z",
        F.when(
            F.col("__sd") > 0, F.round((c - F.col("__mean")) / F.col("__sd"), 6)
        ),
    ).drop("__s", "__n", "__mean", "__ss", "__sd")


def gini_by_group(df: DataFrame, group: str, value, tiebreak: str) -> DataFrame:
    """Gini coefficient of ``value`` within each group — the standard
    inequality/concentration measure (Pareto-front sibling of the
    cumulative-share report). Uses the rank formulation over ascending
    values

        G = (2 * Σ i·x_i − (n+1) · Σ x_i) / (n · Σ x_i),   i = 1..n

    with ``value`` quantized to exact micro-unit BIGINTs so both the rank
    products and the sums are order-independent integers; the single final
    division is the only double op. One sort-window shuffle on the group
    plus the group aggregation — no self-join, no n² pair scan. ``tiebreak``
    makes ranks (and hence G under ties) deterministic. Range bound:
    n · max|x| · 1e6 must stay under 2^63 — holds to ~1e6 rows per group of
    1e6-unit values; beyond that, pre-scale to coarser units.
    """
    v_micro = F.round(F.col(value).cast("double") * 1e6).cast("long")
    w = Window.partitionBy(group).orderBy(v_micro.asc(), F.col(tiebreak).asc())
    ranked = df.select(
        F.col(group),
        v_micro.alias("__v"),
        F.row_number().over(w).alias("__i"),
    )
    agg = ranked.groupBy(group).agg(
        F.count("*").alias("n"),
        F.sum("__v").alias("__sx"),
        F.sum(F.col("__i") * F.col("__v")).alias("__six"),
    )
    gini = (
        (2.0 * F.col("__six").cast("double") - (F.col("n") + 1).cast("double") * F.col("__sx").cast("double"))
        / (F.col("n").cast("double") * F.col("__sx").cast("double"))
    )
    return agg.select(
        group,
        "n",
        F.round(F.col("__sx").cast("double") / 1e6, 6).alias("total_value"),
        F.round(gini, 6).alias("gini"),
    )


def skyline_2d(
    df: DataFrame,
    minimize: str,
    maximize: str,
    tiebreak: str,
) -> DataFrame:
    """2-D skyline (Pareto front): rows not dominated under (minimize ↓,
    maximize ↑). A dominates B iff A.min <= B.min, A.max >= B.max, and one
    is strict; equal points are mutually non-dominating and all kept.

    The window rewrite avoids the quadratic dominance self-join entirely:
    (1) within each ``minimize`` value keep only rows tied for the best
    ``maximize`` (same-coordinate dominance), then (2) keep rows whose
    ``maximize`` strictly exceeds the running max over all strictly smaller
    ``minimize`` values (a RANGE window, so ties in ``minimize`` never see
    each other). Two window passes over one sort order — linear after the
    sort shuffle, and Catalyst plans both windows in a single exchange.
    """
    w_same = Window.partitionBy(minimize)
    w_prev = (
        Window.orderBy(F.col(minimize).asc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    best_same = F.max(maximize).over(w_same)
    prev_best = F.max(maximize).over(w_prev)
    return (
        df.withColumn("__best_same", best_same)
        .filter(F.col(maximize) == F.col("__best_same"))
        .withColumn("__prev_best", prev_best)
        .filter(F.col("__prev_best").isNull() | (F.col(maximize) > F.col("__prev_best")))
        .drop("__best_same", "__prev_best")
    )
