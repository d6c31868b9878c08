"""Unsupervised probabilistic record linkage: Fellegi-Sunter EM.

The registered ``fellegi_sunter_weights`` query estimates per-field
agreement probabilities from LABELED pairs (nation agreement as truth).
Real entity-resolution runs have no labels — the standard answer is
Winkler's EM fit of the Fellegi-Sunter mixture (Winkler 1988, "Using the
EM algorithm for weight computation in the Fellegi-Sunter model"; Fellegi
& Sunter 1969): candidate pairs are a two-component mixture (matches /
unmatches) over binary field-agreement vectors, and EM recovers the
mixture weight ``p`` and per-field ``m_i = P(agree_i | M)``,
``u_i = P(agree_i | U)`` without any labels.

Scale design (the k-means / BPE-argmax contract): the pair table is
aggregated ONCE to its agreement PATTERNS — K binary fields give at most
``2^K`` pattern rows regardless of pair count (one map-side-combinable
groupBy) — and the EM fixed-point then runs driver-side over that bounded
table. Driver work is pattern-space-sized, never pair-proportional; the
cluster never re-scans pairs across iterations.

Determinism (oracle-replay contract): patterns are iterated in SORTED
pattern order and every accumulation is a sequential left-to-right fold,
so a SQL engine replaying the same fold over the same sorted pattern list
(DuckDB ``list_reduce``) reproduces the trajectory bit-for-bit — the same
device the Hilbert and MMR oracles use. Fixed init, fixed iteration
count, no randomness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def agreement_patterns(pairs: DataFrame, agree_cols: list[str]) -> list[tuple]:
    """Aggregate candidate pairs to sorted (pattern..., n) tuples — the
    bounded sufficient statistic EM runs on. One groupBy; ≤ 2^K rows
    collected (K = len(agree_cols), small by construction)."""
    if not agree_cols or len(agree_cols) > 16:
        raise ValueError("agree_cols must name 1..16 binary agreement columns")
    rows = (
        pairs.groupBy(*[F.col(c).cast("int").alias(c) for c in agree_cols])
        .agg(F.count("*").alias("n"))
        .collect()
    )
    return sorted((*(r[c] for c in agree_cols), int(r["n"])) for r in rows)


def fs_em_fit(
    patterns: list[tuple],
    n_fields: int,
    n_iter: int = 25,
    init_p: float = 0.1,
    init_m: float = 0.9,
    init_u: float = 0.1,
) -> dict:
    """Pure-Python EM fixed point over the sorted pattern table (tiny, so
    this IS the reference implementation, not a shortcut — the Spark work
    already happened in :func:`agreement_patterns`). Returns
    ``{"p": float, "m": [..], "u": [..]}``."""
    p, m, u = float(init_p), [float(init_m)] * n_fields, [float(init_u)] * n_fields
    for _ in range(n_iter):
        sw = 0.0          # Σ w·n
        sn = 0.0          # Σ n
        sma = [0.0] * n_fields  # Σ w·n·a_i
        sua = [0.0] * n_fields  # Σ (1-w)·n·a_i
        su = 0.0          # Σ (1-w)·n
        for row in patterns:
            a, n = row[:n_fields], float(row[n_fields])
            pm, pu = p, 1.0 - p
            for i in range(n_fields):
                pm *= m[i] if a[i] else (1.0 - m[i])
                pu *= u[i] if a[i] else (1.0 - u[i])
            w = pm / (pm + pu)
            sw += w * n
            su += (1.0 - w) * n
            sn += n
            for i in range(n_fields):
                if a[i]:
                    sma[i] += w * n
                    sua[i] += (1.0 - w) * n
        # clamp away from the boundary (standard Winkler practice): on
        # well-separated data EM happily drives m -> 1 / u -> 0, where the
        # log-weights blow up and the next E-step divides by zero
        eps = 1e-6
        clamp = lambda v: min(1.0 - eps, max(eps, v))  # noqa: E731
        p = clamp(sw / sn)
        m = [clamp(sma[i] / sw) for i in range(n_fields)]
        u = [clamp(sua[i] / su) for i in range(n_fields)]
    return {"p": p, "m": m, "u": u}


def fs_em_parameters(
    pairs: DataFrame,
    agree_cols: list[str],
    n_iter: int = 25,
    init_p: float = 0.1,
    init_m: float = 0.9,
    init_u: float = 0.1,
) -> DataFrame:
    """End-to-end unsupervised Fellegi-Sunter fit: pairs → pattern counts
    (one Spark aggregation) → EM (driver, bounded) → the per-field weight
    table ``(field, m, u, weight_agree, weight_disagree, p)`` with the
    classic log2 match weights. ``p`` (the estimated match proportion)
    repeats per row so the frame is self-contained."""
    import math

    spark: SparkSession = pairs.sparkSession
    pats = agreement_patterns(pairs, agree_cols)
    fit = fs_em_fit(pats, len(agree_cols), n_iter, init_p, init_m, init_u)
    out = []
    for i, c in enumerate(agree_cols):
        mi, ui = fit["m"][i], fit["u"][i]
        out.append(
            (
                c,
                round(mi, 6),
                round(ui, 6),
                round(math.log2(mi / ui), 6),
                round(math.log2((1.0 - mi) / (1.0 - ui)), 6),
                round(fit["p"], 6),
            )
        )
    return spark.createDataFrame(
        out, "field string, m double, u double, weight_agree double, "
        "weight_disagree double, p double"
    )


def bcubed_scores(
    df: DataFrame,
    pred_col: str,
    truth_col: str,
) -> DataFrame:
    """B-cubed precision/recall/F1 of a predicted clustering against
    truth classes (Bagga & Baldwin 1998 — the per-RECORD clustering
    metric standard in entity-resolution evaluation; complements the
    PAIRWISE precision/recall the detector-PR and ER-sweep queries
    report, and unlike pairwise it neither explodes on large clusters
    nor ignores singletons).

    Via the contingency identity: B³ precision = (1/N) Σ_{c,t} n_ct²/n_c
    and recall = (1/N) Σ_{c,t} n_ct²/n_t — so the whole metric reduces
    to ONE (pred, truth) cell aggregate plus two marginal joins; no
    record pair is ever materialized. Per-cell rational terms quantize
    to integer NANO units before the BIGINT sums (order-free), and the
    final P/R/F1 are single double expressions over those integers.
    Returns one row: ``(n_records, n_pred_clusters, n_truth_classes,
    b3_precision, b3_recall, b3_f1)``.

    Edge semantics (round-9 fixes): a NULL pred or truth cluster id
    means *unclustered* and becomes its own SINGLETON cluster (the
    standard ER convention — round-8 advice flagged that inner joins
    previously dropped such records from the metric silently); cluster
    ids are compared as strings internally, so mixed-type id columns
    still group exactly. An EMPTY input returns the defined zero row
    ``(0, 0, 0, 0.0, 0.0, 0.0)`` instead of a NULL/NaN row."""
    mid = F.monotonically_increasing_id().cast("string")
    work = df.select(
        F.coalesce(
            F.col(pred_col).cast("string"), F.concat(F.lit("__null_pred__"), mid)
        ).alias("__pred"),
        F.coalesce(
            F.col(truth_col).cast("string"), F.concat(F.lit("__null_truth__"), mid)
        ).alias("__truth"),
    )
    pred_col, truth_col = "__pred", "__truth"
    cells = work.groupBy(pred_col, truth_col).agg(F.count("*").alias("n_ct"))
    nc = cells.groupBy(pred_col).agg(F.sum("n_ct").alias("n_c"))
    nt = cells.groupBy(truth_col).agg(F.sum("n_ct").alias("n_t"))
    j = cells.join(nc, pred_col).join(nt, truth_col)
    sq = (F.col("n_ct") * F.col("n_ct")).cast("double")
    terms = j.select(
        "n_ct",
        F.round(F.lit(1e9) * sq / F.col("n_c").cast("double")).cast("long").alias("pn"),
        F.round(F.lit(1e9) * sq / F.col("n_t").cast("double")).cast("long").alias("rn"),
    )
    agg = terms.agg(
        F.sum("n_ct").alias("n"),
        F.sum("pn").alias("sp"),
        F.sum("rn").alias("sr"),
    )
    counts = agg.crossJoin(
        cells.select(pred_col).distinct().agg(F.count("*").alias("npc"))
    ).crossJoin(cells.select(truth_col).distinct().agg(F.count("*").alias("ntc")))
    # empty input: the global agg yields n=NULL — emit the defined zero
    # row (0/0 would be NaN, and ANSI round(NaN).cast would error)
    n_ok = F.col("n").isNotNull() & (F.col("n") > 0)
    p = F.when(n_ok, F.col("sp").cast("double") / F.lit(1e9) / F.col("n").cast("double")).otherwise(F.lit(0.0))
    r = F.when(n_ok, F.col("sr").cast("double") / F.lit(1e9) / F.col("n").cast("double")).otherwise(F.lit(0.0))
    f1 = F.when(p + r > 0, F.lit(2.0) * p * r / (p + r)).otherwise(F.lit(0.0))
    return counts.select(
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_records"),
        F.col("npc").cast("long").alias("n_pred_clusters"),
        F.col("ntc").cast("long").alias("n_truth_classes"),
        F.round(p, 6).alias("b3_precision"),
        F.round(r, 6).alias("b3_recall"),
        F.round(f1, 6).alias("b3_f1"),
    )


def krippendorff_alpha_nominal(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
) -> DataFrame:
    """Krippendorff's alpha (nominal metric, two raters) — the
    reliability coefficient that generalizes Cohen's kappa: it is
    chance-corrected against the POOLED value distribution of both
    raters (kappa uses per-rater marginals), which makes alpha the
    standard when raters are interchangeable annotation pipelines
    rather than two fixed judges (Krippendorff 2004, "Content
    Analysis"). Complements ``cohens_kappa_langid``.

    Closed form for two raters, no missing values (units with a NULL
    rating carry no pairable values and are dropped, per the method):
    with n units, N = 2n pooled values, D = disagreeing units and
    ``n_c`` the pooled count of category c,

        Do = D / n
        De = (N^2 - sum_c n_c^2) / (N * (N - 1))
        alpha = 1 - Do / De
              = 1 - D * N * (N - 1) / (n * (N^2 - sum_c n_c^2))

    — every term is an exact BIGINT until the final division, so any
    engine replays the number bit-for-bit after one round(, 6).

    Edge semantics: empty input returns the defined zero row with NULL
    alpha; a degenerate table where BOTH raters always emit one single
    category has De = 0 (no disagreement is even possible by chance)
    and alpha is undefined -> NULL, never a division error.

    Scale shape: one (a, b) disagreement aggregate + one pooled
    category aggregate (category-axis-sized), folded into a single
    summary row via 1-row broadcasts."""
    rated = df.filter(F.col(rater_a).isNotNull() & F.col(rater_b).isNotNull())
    tot = rated.agg(
        F.count("*").cast("long").alias("n_units"),
        F.coalesce(
            F.sum(F.when(F.col(rater_a) != F.col(rater_b), 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("n_disagree"),
    )
    pooled = (
        rated.select(F.col(rater_a).alias("c"))
        .unionAll(rated.select(F.col(rater_b).alias("c")))
        .groupBy("c")
        .agg(F.count("*").cast("long").alias("nc"))
        .agg(F.coalesce(F.sum(F.col("nc") * F.col("nc")), F.lit(0)).cast("long").alias("sum_nc_sq"))
    )
    n = F.col("n_units").cast("double")
    big_n = n * 2
    d = F.col("n_disagree").cast("double")
    de_num = big_n * big_n - F.col("sum_nc_sq").cast("double")
    do_ = F.when(F.col("n_units") > 0, d / n).otherwise(F.lit(None))
    de = F.when(
        (F.col("n_units") > 0) & (big_n > 1), de_num / (big_n * (big_n - 1))
    ).otherwise(F.lit(None))
    alpha = F.when(
        de_num > 0, F.lit(1.0) - d * big_n * (big_n - 1) / (n * de_num)
    ).otherwise(F.lit(None))
    return tot.crossJoin(F.broadcast(pooled)).select(
        "n_units",
        "n_disagree",
        F.round(do_, 6).alias("do_obs"),
        F.round(de, 6).alias("de_exp"),
        F.round(alpha, 6).alias("alpha"),
    )
