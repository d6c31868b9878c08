"""Privacy audits for published / training datasets: k-anonymity and
l-diversity over quasi-identifier combinations.

A record is k-anonymous if at least ``k`` rows share its full
quasi-identifier (QI) combination (Sweeney 2002); an equivalence class is
l-diverse if its sensitive attribute takes at least ``l`` distinct values
(Machanavajjhala et al. 2007). These are the standard release gates a
data pipeline runs before publishing row-level extracts — and a
PII-adjacent complement to the redaction pass in ``plans/pretrain.py``
(redaction removes literal identifiers; these audits catch
RE-identification risk from benign-looking column combinations).

Scale shape: both audits are ONE map-side-combinable groupBy on the QI
columns (the class axis is data-dependent but each class reduces to one
row; the shuffle carries QI keys + counts only), plus a tiny summary
aggregate. No self-joins, no windows over the full table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kanonymity_classes(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str | None = None
) -> DataFrame:
    """Equivalence classes of the quasi-identifier combination:
    ``(*quasi_cols, class_size[, l_distinct])`` — one row per distinct QI
    combination, with the sensitive attribute's distinct count when a
    ``sensitive_col`` is given (exact; sensitive domains are small by
    definition, so count_distinct's state is bounded per class)."""
    aggs = [F.count("*").alias("class_size")]
    if sensitive_col is not None:
        aggs.append(F.count_distinct(F.col(sensitive_col)).alias("l_distinct"))
    return df.groupBy(*quasi_cols).agg(*aggs)


def kanonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
    sensitive_col: str | None = None,
    l: int = 2,
) -> DataFrame:
    """One-row release-gate summary: is the dataset k-anonymous (every QI
    class has >= k rows), how many rows/classes violate, the smallest
    class (= the dataset's actual k), and — with a sensitive column — the
    l-diversity counterpart. ``rows_at_risk`` is the number of ROWS in
    violating classes (the re-identifiable population, the number a
    release review asks for), not the class count."""
    cls = kanonymity_classes(df, quasi_cols, sensitive_col)
    aggs = [
        F.count("*").alias("n_classes"),
        F.sum("class_size").cast("long").alias("n_rows"),
        F.min("class_size").cast("long").alias("min_class_size"),
        F.count_if(F.col("class_size") < k).cast("long").alias("classes_below_k"),
        F.sum(F.when(F.col("class_size") < k, F.col("class_size")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
        (F.min("class_size") >= k).alias("is_k_anonymous"),
    ]
    if sensitive_col is not None:
        aggs += [
            F.min("l_distinct").cast("long").alias("min_l"),
            F.count_if(F.col("l_distinct") < l).cast("long").alias("classes_below_l"),
            (F.min("l_distinct") >= l).alias("is_l_diverse"),
        ]
    return cls.agg(*aggs).select(F.lit(k).cast("int").alias("k"), "*")


def generalization_candidates(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Which single QI column, if DROPPED from the combination, yields the
    largest reduction in at-risk rows — the first move of a
    generalization search (full Incognito-style lattice search is a
    policy decision; this emits the evidence). One groupBy per candidate
    (|quasi_cols| bounded passes over the QI projection)."""
    base = kanonymity_report(df, quasi_cols, k).select(
        F.lit("(none)").alias("dropped"), "rows_at_risk"
    )
    outs = [base]
    for c in quasi_cols:
        rest = [q for q in quasi_cols if q != c]
        outs.append(
            kanonymity_report(df, rest, k).select(
                F.lit(c).alias("dropped"), "rows_at_risk"
            )
        )
    u = outs[0]
    for o in outs[1:]:
        u = u.unionByName(o)
    return u.orderBy("rows_at_risk", "dropped")


def tcloseness_classes(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian ICDE 2007): per
    QI equivalence class, the Earth Mover's Distance between the class's
    sensitive-value distribution and the GLOBAL distribution, for an
    ORDERED sensitive attribute with m equally-spaced values:

        EMD = (1/(m-1)) * sum_i | sum_{j<=i} (p_j - q_j) |

    k-anonymity bounds class size and l-diversity bounds distinct values,
    but neither stops skew disclosure (a class whose salary distribution
    sits entirely in the top bucket leaks even with l=3 distinct values);
    t-closeness is the release gate for that.

    Exactness: p_j - q_j = n_cvj/n_c - n_vj/n is kept as the INTEGER
    numerator (n_cvj*n - n_vj*n_c) over the per-class-constant
    denominator n_c*n; the cumulative sums and absolute values fold as
    BIGINTs (bounded by n_c*n <= n^2 — fine to ~3e9 rows; larger tables
    should pre-aggregate or sample classes) and ONE double division at
    the end makes ``t_emd`` bit-replayable cross-engine.

    Scale shape: one (class x value) groupBy, one value groupBy, a
    bounded (classes x m) axis from the crossJoin of the two DISTINCT
    frames (axes, never data), a cumsum window partitioned BY CLASS, and
    a final per-class fold. The raw table shuffles once. NOTE: ``m`` and
    ``n`` are two plan-time count() jobs (scalars must be literals for
    the integer numerators) — the documented eager-count contract of the
    triangle auto-switch applies.
    """
    from pyspark.sql.window import Window

    cls = df.groupBy(*quasi_cols).agg(F.count("*").alias("n_c"))
    vals = df.groupBy(sensitive_col).agg(F.count("*").alias("n_v"))
    n_total = df.count()
    m = vals.count()
    axis = cls.crossJoin(vals.select(sensitive_col, "n_v"))
    cv = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count("*").alias("n_cv")
    )
    joined = axis.join(cv, [*quasi_cols, sensitive_col], "left").fillna(
        0, subset=["n_cv"]
    )
    num = (
        F.col("n_cv") * F.lit(n_total) - F.col("n_v") * F.col("n_c")
    ).alias("num")
    w = (
        Window.partitionBy(*quasi_cols)
        .orderBy(sensitive_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = joined.select(*quasi_cols, sensitive_col, "n_c", num).withColumn(
        "cum_abs", F.abs(F.sum("num").over(w))
    )
    return (
        cum.groupBy(*quasi_cols, "n_c")
        .agg(F.sum("cum_abs").alias("abs_sum"))
        .select(
            *quasi_cols,
            "n_c",
            # m <= 1: every class's distribution IS the global one (the
            # numerators are identically zero), so clamping the divisor
            # keeps t_emd an exact 0.0 instead of an ANSI divide-by-zero
            # on a single-valued sensitive column (degenerate-sweep case)
            F.round(
                F.col("abs_sum").cast("double")
                / (F.lit(float(max(m - 1, 1))) * F.col("n_c") * F.lit(float(n_total))),
                6,
            ).alias("t_emd"),
        )
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    salt: str = "dp",
) -> DataFrame:
    """Seeded Laplace mechanism over group counts (Dwork et al. 2006,
    sensitivity-1 count queries): ``noisy = n + Lap(1/epsilon)``, with the
    noise drawn by INVERSE CDF from a keyed md5 uniform instead of an RNG
    — ``u = hash_uniform(salt || group key)`` — so a release is
    reproducible run to run and a SQL twin replays it exactly (the same
    determinism stance as the leakage-safe train/eval split,
    operators/sampling.py:hash_uniform).

    noise = -(1/eps) * sign(u - 0.5) * ln(1 - 2|u - 0.5|), micro-rounded
    to a BIGINT so the only cross-engine float op is one ln (micro
    rounding absorbs its final-ULP license). The 1e-12 floor guards the
    u -> 0/1 tails where the inverse CDF diverges. NOTE: reproducible
    noise weakens the formal DP guarantee to "per-release DP" — re-running
    the SAME release re-uses the noise rather than re-drawing it, which is
    exactly what a data-release pipeline wants (fresh noise per rerun
    would let an observer average it away).

    Output: (group_cols..., n, noise_micro, noisy). One combinable
    groupBy; noise is a per-group scalar expression — no extra shuffle."""
    from unified_firmographic_data_pipeline_spark.operators.sampling import (
        hash_uniform,
    )

    counts = df.groupBy(*group_cols).agg(F.count("*").alias("n"))
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in group_cols])
    u = hash_uniform(F.concat(F.lit(salt), key))
    c = u - F.lit(0.5)
    mag = F.greatest(F.lit(1.0) - F.lit(2.0) * F.abs(c), F.lit(1e-12))
    noise = -F.lit(1.0 / epsilon) * F.signum(c) * F.log(mag)
    return counts.select(
        *group_cols,
        "n",
        F.round(noise * 1e6).cast("long").alias("noise_micro"),
        F.round(
            F.col("n") + F.round(noise * 1e6).cast("long").cast("double") / 1e6, 6
        ).alias("noisy"),
    )
