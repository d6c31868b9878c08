"""Isotonic regression (pool-adjacent-violators) for score calibration.

A quality classifier's raw scores are rarely calibrated probabilities;
isotonic regression is the standard nonparametric fix (Zadrozny & Elkan
KDD'02): fit the monotone step function minimizing squared error against
observed labels. It complements the engine's reliability diagram
(`calibration_reliability_bins`) — the diagram shows miscalibration, PAV
repairs it.

Spark-first decomposition: the O(rows) part — binning scores and counting
labels — is one distributed aggregation; PAV itself runs over the BOUNDED
bin table (n_bins rows, constant at any data scale) as a driver-side fold,
the same bounded-driver-fold contract as the Fellegi-Sunter EM
(operators/linkage.py). Means stay INTEGER rationals throughout
(compare a1/w1 < a2/w2 as a1*w2 < a2*w1), so the pooling decisions are
bit-replayable by an external verifier; floats appear only in the final
fitted-rate division.

The reference has no modeling surface (execution delegated wholesale to
warehouse SQL — models/marts/cr_company_complete.sql); this extends the
training-data quality family per SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binned_label_rates(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int,
    lo: float,
    hi: float,
) -> DataFrame:
    """Fixed-width score bins with label counts: (bin, n, pos). One
    combinable groupBy; the bin expression clamps to [0, n_bins-1] so
    out-of-range scores land in the edge bins (never dropped — a
    calibration fit must see every LABELED row). Rows with a NULL score
    or NULL label carry no calibration information and are filtered
    before binning — a NULL score would otherwise floor to a NULL bin
    and a NULL label would break pav_pools' integer arithmetic."""
    width = (hi - lo) / n_bins
    bin_ = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((F.col(score_col) - lo) / width)),
    ).cast("int")
    return (
        df.filter(F.col(score_col).isNotNull() & F.col(label_col).isNotNull())
        .select(bin_.alias("bin"), F.col(label_col).cast("long").alias("y"))
        .groupBy("bin")
        .agg(F.count("*").alias("n"), F.sum("y").alias("pos"))
    )


def pav_pools(items: list[tuple[int, int, int]]) -> list[tuple[int, int, int, int]]:
    """Stack PAV over (bin, n, pos) rows sorted by bin: returns pools
    (lo_bin, hi_bin, n, pos). Merge rule: pool means must be
    non-decreasing; a STRICT decrease (pos2*n1 < pos1*n2, integer
    cross-multiplication — no float ever enters a decision) merges the
    top two pools and cascades. Equal means stay separate; their fitted
    values coincide, so the output function is the unique isotonic
    L2 projection either way."""
    stack: list[tuple[int, int, int, int]] = []
    for b, n, p in items:
        stack.append((b, b, n, p))
        while len(stack) >= 2:
            lo1, hi1, n1, p1 = stack[-2]
            lo2, hi2, n2, p2 = stack[-1]
            if p2 * n1 < p1 * n2:
                stack[-2:] = [(lo1, hi2, n1 + n2, p1 + p2)]
            else:
                break
    return stack


def isotonic_calibrate_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 16,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Per-bin isotonic fit: (bin, n, pos, raw_rate, fitted_rate), rates
    rounded to 6dp. The distributed agg runs once; the collect is the
    bounded bin table (n_bins rows); pools broadcast back as a per-bin
    literal frame (equi-join on bin). ``fitted_rate`` is pool_pos/pool_n — the
    isotonic L2 projection of the empirical rates under count weights."""
    bins = binned_label_rates(df, score_col, label_col, n_bins, lo, hi)
    rows = sorted(
        ((r["bin"], r["n"], r["pos"]) for r in bins.collect()),
        key=lambda t: t[0],
    )
    pools = pav_pools(rows)
    spark = df.sparkSession
    # one row per COVERED bin (pool spans are disjoint and bounded), so the
    # map-back is a broadcast EQUI-join on bin — a range join here would
    # plan as a nested-loop, which the plan gate rightly rejects
    pools_df = spark.createDataFrame(
        [
            (b, n, p)
            for lo, hi, n, p in pools
            for b in range(lo, hi + 1)
        ],
        "bin int, pool_n long, pool_pos long",
    )
    return (
        bins.join(F.broadcast(pools_df), "bin")
        .select(
            "bin",
            "n",
            "pos",
            F.round(F.col("pos").cast("double") / F.col("n").cast("double"), 6).alias(
                "raw_rate"
            ),
            F.round(
                F.col("pool_pos").cast("double") / F.col("pool_n").cast("double"), 6
            ).alias("fitted_rate"),
        )
    )
