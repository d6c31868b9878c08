"""Deterministic, reproducible sampling operators.

Training-data pipelines need samples that are (a) stable across reruns and
engines (an audit at 100 TB must reproduce the same subset), (b) computable
in one narrow pass with no shuffle for the Bernoulli form, and (c) exactly
k-per-group for the reservoir-analogue form. Spark's ``df.sample`` is
seed-stable only within one Spark version *and* one partition layout, so
none of these use it: the randomness source is a cryptographic hash of the
row key, which is layout- and engine-independent (the DuckDB oracles
reproduce it bit-for-bit).

Reference surface: the reference pipeline has no sampling operator; this
extends SURVEY.md §2's LLM-curation set (stratified sampling already exists
in operators/dedup.py — these are its deterministic exact-k / Bernoulli
cousins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_uniform(key: F.Column) -> F.Column:
    """A uniform-in-[0,1) double derived from md5(key): the first 13 hex
    digits (52 bits — exactly a double's mantissa, so the int->double cast
    is lossless) scaled by 16^-13. Engine-independent: any system with md5
    and hex parsing reproduces it exactly."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 13), 16, 10).cast(
        "double"
    ) / F.lit(float(16**13))


def bernoulli_hash_sample(
    df: DataFrame, key: F.Column | str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep rows whose ``hash_uniform(salt || key)`` < ``fraction``.

    A narrow per-row filter: no shuffle, no state, pushes below joins, and
    the SAME rows survive on any cluster size, engine, or rerun. ``salt``
    decorrelates independent samples of the same population.
    """
    key = F.col(key) if isinstance(key, str) else key
    if salt:
        key = F.concat(F.lit(salt), key.cast("string"))
    return df.filter(hash_uniform(key) < F.lit(fraction))


def hash_topk_per_group(
    df: DataFrame, group_cols: list[str], key: F.Column | str, k: int
) -> DataFrame:
    """Exactly min(k, group size) rows per group, chosen by smallest
    ``hash_uniform(key)`` — the deterministic analogue of per-group
    reservoir sampling (each subset of size k is equally likely over the
    hash's uniformity, but the draw is reproducible).

    One window shuffle on ``group_cols``; rank-filter prunes before any
    downstream work. The hash itself tiebreaks identically in every engine
    because md5 collisions aside, keys are unique.
    """
    key = F.col(key) if isinstance(key, str) else key
    w = Window.partitionBy(*group_cols).orderBy(
        hash_uniform(key).asc(), key.asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def split_train_eval(
    df: DataFrame, key: F.Column | str, eval_fraction: float = 0.1, salt: str = "split"
) -> DataFrame:
    """Adds a deterministic ``split`` column ('train' / 'eval') from the
    keyed hash — the standard leakage-safe corpus split: a document lands in
    the same split in every run, pipeline stage, and engine, so train/eval
    contamination cannot creep in through re-partitioning."""
    key = F.col(key) if isinstance(key, str) else key
    u = hash_uniform(F.concat(F.lit(salt), key.cast("string")))
    return df.withColumn(
        "split", F.when(u < F.lit(eval_fraction), "eval").otherwise("train")
    )


def stratified_fractions_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key: F.Column | str,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum Bernoulli sampling with explicit rates — the
    source-mixing knob of a pretraining pipeline ("keep 100% of books,
    10% of web, 1% of logs"). ``fractions`` maps stratum value → keep
    rate; strata not listed keep ``default_fraction``.

    Still a narrow per-row filter (the rate lookup is one bounded CASE
    expression over the literal map — no join, no shuffle, pushes into
    the scan), deterministic in the keyed hash like every sampler here.
    For exact-k per stratum use :func:`hash_topk_per_group` instead.
    """
    if not all(0.0 <= v <= 1.0 for v in fractions.values()):
        raise ValueError("fractions must be in [0, 1]")
    key = F.col(key) if isinstance(key, str) else key
    if salt:
        key = F.concat(F.lit(salt), key.cast("string"))
    rate = F.lit(float(default_fraction))
    for stratum, frac in sorted(fractions.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(float(frac))).otherwise(rate)
    return df.filter(hash_uniform(key) < rate)


def token_budget_sample(
    df: DataFrame,
    budget: int,
    size_col: F.Column | str,
    key: F.Column | str,
    group_cols: list[str] | None = None,
    salt: str = "",
) -> DataFrame:
    """Fill a size budget deterministically: walk rows in keyed-hash order
    (a uniformly random but reproducible permutation) and keep rows while
    the running total of ``size_col`` stays within ``budget`` — "give me
    ~1B tokens of this source", the last knob of a pretraining data mix.
    The first row of a group always survives, so one oversized document
    cannot empty its group (the greedy-packing contract of
    ``curation.pack_sequences``).

    Scale shape: ONE window pass per group. With ``group_cols`` (the
    recommended form — per-source budgets) the cumulative sum
    parallelizes across groups; without them the running total is a
    single global ordering, which Spark executes on one task — fine for
    a bounded driver-side selection, wrong for a corpus-wide budget (use
    per-source budgets that sum to the target instead).
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")
    key = F.col(key) if isinstance(key, str) else key
    size_col = F.col(size_col) if isinstance(size_col, str) else size_col
    hk = F.concat(F.lit(salt), key.cast("string")) if salt else key
    w = (
        Window.partitionBy(*group_cols) if group_cols else Window.partitionBy()
    ).orderBy(hash_uniform(hk).asc(), key.asc())
    cum = F.sum(size_col.cast("long")).over(w)
    first = F.row_number().over(w) == 1
    return (
        df.withColumn("__cum", cum)
        .withColumn("__first", first)
        .filter((F.col("__cum") <= budget) | F.col("__first"))
        .drop("__cum", "__first")
    )


def weighted_hash_sample(
    df: DataFrame,
    key: F.Column | str,
    weight: F.Column | str,
    k: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Weighted sample without replacement, deterministic: the
    Efraimidis–Spirakis A-Res scheme with the keyed hash as the randomness
    source — row priority ``u^(1/w)`` (equivalently ``ln(u)/w``, larger is
    better), take the global (or per-group) top k. Inclusion probability is
    proportional to weight; reruns and engines agree because ``u`` does.

    One window shuffle (or a global top-k) — the standard scalable
    weighted-reservoir rewrite.
    """
    key = F.col(key) if isinstance(key, str) else key
    weight = F.col(weight) if isinstance(weight, str) else weight
    # ln(u) < 0; dividing by a larger weight moves priority toward 0 (best)
    prio = F.log(hash_uniform(key)) / weight.cast("double")
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy(prio.desc(), key.asc())
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )
    return df.withColumn("__prio", prio).orderBy(F.col("__prio").desc(), key.asc()).limit(k).drop("__prio")
